"""rgb2spec_opt — generate sigmoid-polynomial RGB->spectrum tables.

Reference: cmd/rgb2spec_opt.cpp (Jakob & Hanika 2019 "A Low-Dimensional
Function Space for Efficient Spectral Upsampling"): per-lattice-point
Gauss-Newton on CPU threads, emitting a C header of coefficients.

TPU reshape: the entire lattice is fit as one batched Levenberg-Marquardt
(utils/spectrum.fit_sigmoid_polynomial) — every (max-axis, z, y, x) point a
lane.  Output is an .npz with the (3, res, res, res, 3) coefficient array
plus the lattice metadata, loadable with numpy anywhere.

Usage:  avrt-rgb2spec-opt <resolution> <out.npz> [--iters N]
"""
import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="avrt-rgb2spec-opt")
    ap.add_argument("resolution", type=int)
    ap.add_argument("output")
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args(argv)

    import numpy as np

    from ..utils import spectrum as sp

    t0 = time.time()
    table = sp.make_rgb2spec_table(res=args.resolution, iters=args.iters)
    np.savez_compressed(
        args.output, coeffs=table, resolution=args.resolution,
        lambda_min=sp.LAMBDA_MIN, lambda_max=sp.LAMBDA_MAX,
        layout="(max_axis, z=max_component, y, x, coeff) — coefficients in "
               "the nanometer domain for sigmoid_polynomial_eval")
    n = 3 * args.resolution ** 3
    print(f"fit {n} lattice points in {time.time() - t0:.1f}s -> "
          f"{args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
