"""BSSRDF — subsurface scattering via normalized-diffusion exit sampling.

Reference: the TabulatedBSSRDF + SampleSp machinery (bssrdf.{h,cpp}) and
VolPath's BSSRDF random-walk branch (cpu/integrators.cpp:526-592).  The
tabulated photon-beam-diffusion profile is replaced by the
Christensen-Burley normalized diffusion fit (the profile pbrt's tables
approximate): Sp(r) = A s (e^{-s r / l} + e^{-s r / (3 l)}) / (8 pi l r),
which integrates to the diffuse albedo A over the plane and has the
closed-form CDF  1 - e^{-x}/4 - 3 e^{-x/3}/4  (x = s r / l), inverted here
with a few Newton steps.

Exit sampling (the SampleSp probe): a radius is drawn per-lane from the
profile of a uniformly chosen RGB channel, a probe ray is cast through the
disk point along the inward normal against the scene's primitives, and the
hit on the SAME primitive becomes the exit vertex.  The spectral weight is
the channel-MIS estimator  A_k p_k(d) / mean_j p_j(d)  at the realized
exit distance; the directional exit lobe is folded into a Lambertian vertex
(the (1-F)/(c pi) Sw factor with the average-Fresnel normalization), so the
path integrator continues with its ordinary diffuse NEE + bounce machinery.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def scaling_factor(albedo):
    """Burley's fit s(A) for the searchlight configuration."""
    a = jnp.asarray(albedo)
    return 1.85 - a + 7.0 * jnp.abs(a - 0.8) ** 3


def profile(r, albedo, ell):
    """Sp(r) per channel; r (N,), albedo/ell (N, C) -> (N, C)."""
    s = scaling_factor(albedo)
    x = s * r[:, None] / jnp.maximum(ell, 1e-6)
    rr = jnp.maximum(r[:, None], 1e-6)
    return (albedo * s * (jnp.exp(-x) + jnp.exp(-x / 3.0))
            / (8.0 * jnp.pi * jnp.maximum(ell, 1e-6) * rr))


def pdf_r(r, albedo, ell):
    """Normalized radial pdf p(r) = Sp(r) / A (planar measure, per ch)."""
    s = scaling_factor(albedo)
    x = s * r[:, None] / jnp.maximum(ell, 1e-6)
    rr = jnp.maximum(r[:, None], 1e-6)
    return (s * (jnp.exp(-x) + jnp.exp(-x / 3.0))
            / (8.0 * jnp.pi * jnp.maximum(ell, 1e-6) * rr))


def sample_r(u, albedo_ch, ell_ch, n_newton: int = 8):
    """Invert cdf(x) = 1 - e^{-x}/4 - 3 e^{-x/3}/4 for x, return r.

    u (N,), albedo_ch/ell_ch (N,) for the selected channel."""
    u = jnp.clip(u, 1e-5, 1.0 - 1e-5)
    # initialize from the larger-exponential approximation
    x = -3.0 * jnp.log1p(-u)
    for _ in range(n_newton):
        cdf = 1.0 - 0.25 * jnp.exp(-x) - 0.75 * jnp.exp(-x / 3.0)
        pdf = 0.25 * jnp.exp(-x) + 0.25 * jnp.exp(-x / 3.0)
        x = jnp.clip(x - (cdf - u) / jnp.maximum(pdf, 1e-9), 1e-6, 80.0)
    s = scaling_factor(albedo_ch)
    return x * jnp.maximum(ell_ch, 1e-6) / jnp.maximum(s, 1e-6)


def fresnel_moment_c(eta: float) -> float:
    """c = 1 - 2 * integral of Fr(cos) cos dcos — the Sw normalizer
    (bssrdf.h FresnelMoment1-based constant), via the pbrt polynomial."""
    # FresnelMoment1 polynomial fit (util/scattering.cpp)
    if eta < 1:
        fm1 = (0.45966 - 1.73965 * eta + 3.37668 * eta ** 2
               - 3.904945 * eta ** 3 + 2.49277 * eta ** 4
               - 0.68441 * eta ** 5)
    else:
        fm1 = (-4.61686 + 11.1136 * eta - 10.4646 * eta ** 2
               + 5.11455 * eta ** 3 - 1.27198 * eta ** 4
               + 0.12746 * eta ** 5)
    return max(1.0 - 2.0 * fm1, 1e-3)


def sample_exit(prims, prim_ids, entry_p, entry_n, albedo, ell,
                u_ch, u_r, u_phi, r_max_factor: float = 12.0):
    """Probe-based exit sampling along the inward normal.

    prims: static primitive tuple; prim_ids (N,) entry primitive indices;
    entry_p/entry_n (N, 3); albedo/ell (N, C); u_* (N,) uniforms.

    Returns (exit_p, exit_n, weight (N, C), valid)."""
    from . import shapes as shapes_mod
    from ..utils import vecmath as vmu

    N = entry_p.shape[0]
    C = albedo.shape[-1]
    ch = jnp.minimum((u_ch * C).astype(jnp.int32), C - 1)
    alb_ch = jnp.take_along_axis(albedo, ch[:, None], 1)[:, 0]
    ell_ch = jnp.take_along_axis(ell, ch[:, None], 1)[:, 0]
    r = sample_r(u_r, alb_ch, ell_ch)
    # cap: beyond ~r_max the profile carries negligible energy
    r = jnp.minimum(r, r_max_factor * jnp.max(ell, -1))
    phi = 2.0 * jnp.pi * u_phi
    bx, by, bz = vmu.frame_from_z(entry_n)
    disk = (jnp.cos(phi) * r)[:, None] * bx + (jnp.sin(phi) * r)[:, None] * by
    h = jnp.maximum(2.0 * r, 1e-4)
    probe_o = entry_p + disk + entry_n * h[:, None]
    probe_d = -entry_n
    hit = shapes_mod.intersect_all(prims, probe_o, probe_d, 4.0 * h)
    same = hit.prim_id == prim_ids
    found = jnp.isfinite(hit.t) & same
    exit_p = jnp.where(found[:, None],
                       probe_o + hit.t[:, None] * probe_d, entry_p)
    exit_n = jnp.where(found[:, None], hit.n, entry_n)
    d = jnp.linalg.norm(exit_p - entry_p, axis=-1)
    d = jnp.maximum(d, 1e-5)
    # channel-MIS weight at the realized distance
    p_all = pdf_r(d, albedo, ell)                 # (N, C)
    sel_pdf = jnp.mean(p_all, axis=-1)            # uniform channel choice
    w = albedo * p_all / jnp.maximum(sel_pdf, 1e-12)[:, None]
    return exit_p, exit_n, w, found
