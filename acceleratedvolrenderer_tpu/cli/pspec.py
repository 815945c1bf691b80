"""pspec — sampler power spectra (cmd/pspec.cpp / pspec_gpu).

Accumulates the Fourier power spectrum of each sampler strategy's 2D point
sets over many independent realizations and writes it as an EXR; radially
averaged profiles print to stdout.  Blue-noise samplers (zsobol/pmj02bn)
show the characteristic low-frequency energy deficit.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def power_spectrum(kind: str, n_points: int, res: int, n_sets: int,
                   seed: int = 0):
    import jax.numpy as jnp

    from ..models import samplers

    acc = np.zeros((res, res), np.float64)
    for trial in range(n_sets):
        pix = jnp.full((n_points,), trial, jnp.uint32)   # one pixel per set
        pts = []
        for s in range(n_points):
            u1, u2, _ = samplers.film_sample(
                kind, pix[:1], jnp.full((1,), s, jnp.uint32), n_points,
                seed=seed + trial)
            pts.append([float(u1[0]), float(u2[0])])
        pts = np.asarray(pts)
        # continuous Fourier transform of the point set (pspec.cpp):
        # P(f) = |sum_j exp(-2 pi i f . x_j)|^2 / N
        fx = np.fft.fftshift(np.fft.fftfreq(res, d=1.0 / res))
        FX, FY = np.meshgrid(fx, fx)
        phase = -2j * np.pi * (FX[..., None] * pts[:, 0]
                               + FY[..., None] * pts[:, 1])
        F = np.exp(phase).sum(-1)
        acc += (np.abs(F) ** 2) / n_points
    return acc / n_sets


def radial_average(spec: np.ndarray, n_bins: int = 32):
    res = spec.shape[0]
    yy, xx = np.mgrid[0:res, 0:res]
    r = np.hypot(xx - res / 2, yy - res / 2)
    bins = np.minimum((r / (res / 2) * n_bins).astype(int), n_bins - 1)
    out = np.zeros(n_bins)
    for b in range(n_bins):
        m = bins == b
        out[b] = spec[m].mean() if m.any() else 0.0
    return out


def main(argv=None):
    ap = argparse.ArgumentParser("avrt-pspec")
    ap.add_argument("sampler", help="independent|stratified|sobol|"
                                    "paddedsobol|zsobol|pmj02bn|halton")
    ap.add_argument("--npoints", type=int, default=64)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--nsets", type=int, default=16)
    ap.add_argument("-o", "--outfile", default=None)
    args = ap.parse_args(argv)
    spec = power_spectrum(args.sampler, args.npoints, args.resolution,
                          args.nsets)
    prof = radial_average(spec)
    for i, v in enumerate(prof):
        print(f"{i / len(prof):.3f} {v:.4f}")
    if args.outfile:
        from ..utils.image import write_exr

        write_exr(args.outfile, spec.astype(np.float32)[..., None],
                  channel_names=("Y",))
    return 0


if __name__ == "__main__":
    sys.exit(main())
