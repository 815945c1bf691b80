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


# ---------------------------------------------------------------------------
# Tabulated photon-beam-diffusion profile — the reference's actual BSSRDF
# (bssrdf.cpp ComputeBeamDiffusionBSSRDF / TabulatedBSSRDF; PBR book
# §15.5).  The table is generated numpy-side at material build (like
# pbrt's startup bake): for each single-scattering albedo rho, the radial
# profile 2*pi*r*Sr(r) at UNIT sigma_t combines the multiple-scattering
# dipole with Grosjean's non-classical diffusion coefficient
# (beam_diffusion_ms) and the single-scattering integral
# (beam_diffusion_ss); scaling to a real medium is Sr(r) =
# sigma_t^2 * Sr_unit(sigma_t * r).
# ---------------------------------------------------------------------------


def fresnel_moment1(eta: float) -> float:
    e2, e3, e4, e5 = eta ** 2, eta ** 3, eta ** 4, eta ** 5
    if eta < 1:
        return (0.45966 - 1.73965 * eta + 3.37668 * e2 - 3.904945 * e3
                + 2.49277 * e4 - 0.68441 * e5)
    return (-4.61686 + 11.1136 * eta - 10.4646 * e2 + 5.11455 * e3
            - 1.27198 * e4 + 0.12746 * e5)


def fresnel_moment2(eta: float) -> float:
    e2, e3, e4, e5 = eta ** 2, eta ** 3, eta ** 4, eta ** 5
    if eta < 1:
        return (0.27614 - 0.87350 * eta + 1.12077 * e2 - 0.65095 * e3
                - 0.07883 * e4 + 0.04860 * e5)
    r_1 = (-547.033 + 45.3087 / e3 - 218.725 / e2 + 458.843 / eta
           + 404.557 * eta - 189.519 * e2 + 54.9327 * e3 - 9.00603 * e4
           + 0.63942 * e5)
    return r_1


def _fr_dielectric_np(cos_i, eta):
    """Scalar/array Fresnel for the SS integrand (numpy)."""
    cos_i = np.clip(cos_i, -1.0, 1.0)
    flip = cos_i < 0
    eta_p = np.where(flip, 1.0 / eta, eta)
    cos_i = np.abs(cos_i)
    sin2_t = (1.0 - cos_i ** 2) / eta_p ** 2
    tir = sin2_t >= 1.0
    cos_t = np.sqrt(np.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta_p * cos_i - cos_t) / np.maximum(eta_p * cos_i + cos_t, 1e-9)
    r_per = (cos_i - eta_p * cos_t) / np.maximum(cos_i + eta_p * cos_t, 1e-9)
    return np.where(tir, 1.0, 0.5 * (r_par ** 2 + r_per ** 2))


def beam_diffusion_ms(sigma_s, sigma_a, g, eta, r, n_samples=100):
    """Multiple-scattering beam diffusion at radius r (vectorized in r)."""
    r = np.atleast_1d(np.asarray(r, np.float64))
    sigmap_s = sigma_s * (1 - g)
    sigmap_t = sigma_a + sigmap_s
    if sigmap_t <= 0:
        return np.zeros_like(r)
    rhop = sigmap_s / sigmap_t
    d_g = (2 * sigma_a + sigmap_s) / (3 * sigmap_t ** 2)
    sigma_tr = np.sqrt(max(sigma_a / d_g, 0.0))
    fm1, fm2 = fresnel_moment1(eta), fresnel_moment2(eta)
    ze = -2 * d_g * (1 + 3 * fm2) / (1 - 2 * fm1)
    c_phi = 0.25 * (1 - 2 * fm1)
    c_e = 0.5 * (1 - 3 * fm2)
    i = np.arange(n_samples)
    zr = -np.log(1 - (i + 0.5) / n_samples) / sigmap_t          # (S,)
    zv = -zr + 2 * ze
    dr = np.sqrt(r[:, None] ** 2 + zr[None, :] ** 2)            # (R, S)
    dv = np.sqrt(r[:, None] ** 2 + zv[None, :] ** 2)
    inv4pi = 1.0 / (4.0 * np.pi)
    phi_d = inv4pi / d_g * (np.exp(-sigma_tr * dr) / dr
                            - np.exp(-sigma_tr * dv) / dv)
    ed_n = inv4pi * (zr[None, :] * (1 + sigma_tr * dr)
                     * np.exp(-sigma_tr * dr) / dr ** 3
                     - zv[None, :] * (1 + sigma_tr * dv)
                     * np.exp(-sigma_tr * dv) / dv ** 3)
    e_term = phi_d * c_phi + ed_n * c_e
    kappa = 1 - np.exp(-2 * sigmap_t * (dr + zr[None, :]))
    return (rhop * rhop * np.exp(-sigma_a * zr[None, :]) * kappa
            * e_term).mean(axis=1)


def beam_diffusion_ss(sigma_s, sigma_a, g, eta, r, n_samples=100):
    """Single-scattering term along the refracted beam (vectorized in r)."""
    from ..ops.phase import hg_phase_scalar_np

    r = np.atleast_1d(np.asarray(r, np.float64))
    sigma_t = sigma_a + sigma_s
    if sigma_t <= 0:
        return np.zeros_like(r)
    rho = sigma_s / sigma_t
    t_crit = r * np.sqrt(max(eta * eta - 1.0, 0.0))             # (R,)
    i = np.arange(n_samples)
    dt = -np.log(1 - (i + 0.5) / n_samples) / sigma_t           # (S,)
    ti = t_crit[:, None] + dt[None, :]                          # (R, S)
    d = np.sqrt(r[:, None] ** 2 + ti ** 2)
    cos_o = ti / d
    ph = hg_phase_scalar_np(cos_o, g)
    fres = 1.0 - _fr_dielectric_np(-cos_o, eta)
    return (rho * np.exp(-sigma_t * (d + t_crit[:, None])) / d ** 2
            * ph * fres * np.abs(cos_o)).mean(axis=1)


_TABLE_CACHE = {}


def compute_beam_diffusion_table(g: float = 0.0, eta: float = 1.33,
                                 n_rho: int = 40, n_radius: int = 64):
    """BSSRDFTable: (rho (R,), radius (M,), profile (R, M) = 2 pi r Sr_u,
    rho_eff (R,), cdf (R, M)); unit sigma_t; cached per (g, eta)."""
    key = (round(g, 5), round(eta, 5), n_rho, n_radius)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    rho = (1 - np.exp(-8 * np.arange(n_rho) / (n_rho - 1))) / (1 - np.exp(-8.0))
    radius = np.zeros(n_radius)
    radius[1] = 2.5e-3
    for k in range(2, n_radius):
        radius[k] = radius[k - 1] * 1.2
    profile = np.zeros((n_rho, n_radius))
    for j, rh in enumerate(rho):
        if rh <= 0:
            continue
        prof = 2 * np.pi * radius * (
            beam_diffusion_ms(rh, 1 - rh, g, eta, radius)
            + beam_diffusion_ss(rh, 1 - rh, g, eta, radius))
        profile[j] = np.maximum(prof, 0.0)
    # rho_eff = integral of the polar profile over radius (trapezoid over
    # the geometric grid — pbrt uses the Catmull-Rom quadrature)
    rho_eff = np.trapezoid(profile, radius, axis=1)
    cdf = np.concatenate(
        [np.zeros((n_rho, 1)),
         np.cumsum(0.5 * (profile[:, 1:] + profile[:, :-1])
                   * np.diff(radius)[None, :], axis=1)], axis=1)
    cdf = cdf / np.maximum(cdf[:, -1:], 1e-12)
    out = dict(rho=rho, radius=radius, profile=profile, rho_eff=rho_eff,
               cdf=cdf)
    _TABLE_CACHE[key] = out
    return out


def subsurface_from_diffuse(table, reflectance, mfp):
    """Invert the table: per-channel (sigma_a, sigma_s) whose diffusion
    profile has effective albedo `reflectance` at mean free path `mfp`
    (bssrdf.cpp SubsurfaceFromDiffuse)."""
    reflectance = np.clip(np.asarray(reflectance, np.float64), 0.0,
                          float(table["rho_eff"].max()) - 1e-4)
    rho = np.interp(reflectance, table["rho_eff"], table["rho"])
    sigma_t = 1.0 / np.maximum(np.asarray(mfp, np.float64), 1e-6)
    return (1 - rho) * sigma_t, rho * sigma_t, rho


def tabulated_channel_arrays(table, reflectance_rgb, mfp_rgb):
    """Per-channel device arrays for tabulated exit sampling: dict with
    radius (M,), per-channel profile rows (C, M), cdf rows (C, M),
    sigma_t (C,), rho_eff (C,) — rho rows linearly interpolated at each
    channel's inverted albedo."""
    table_rho = table["rho"]
    _, _, rho_ch = subsurface_from_diffuse(table, reflectance_rgb, mfp_rgb)
    sigma_t = 1.0 / np.maximum(np.asarray(mfp_rgb, np.float64), 1e-6)
    idx = np.clip(np.searchsorted(table_rho, rho_ch) - 1, 0,
                  len(table_rho) - 2)
    f = np.clip((rho_ch - table_rho[idx])
                / np.maximum(table_rho[idx + 1] - table_rho[idx], 1e-9),
                0.0, 1.0)
    prof = ((1 - f)[:, None] * table["profile"][idx]
            + f[:, None] * table["profile"][idx + 1])
    cdf = ((1 - f)[:, None] * table["cdf"][idx]
           + f[:, None] * table["cdf"][idx + 1])
    cdf = cdf / np.maximum(cdf[:, -1:], 1e-12)
    rho_eff = np.trapezoid(prof, table["radius"], axis=1)
    return dict(
        radius=jnp.asarray(table["radius"], jnp.float32),
        profile=jnp.asarray(prof, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        sigma_t=jnp.asarray(sigma_t, jnp.float32),
        rho_eff=jnp.asarray(rho_eff, jnp.float32),
    )


def tabulated_sample_r(tab, ch, u):
    """Inverse-CDF radius sample from channel `ch`'s tabulated profile
    (TabulatedBSSRDF::Sample_Sr): returns WORLD radius."""
    cdf = tab["cdf"][ch]                      # (N, M)
    radius = tab["radius"]
    m = radius.shape[0]
    k = jnp.clip(jnp.sum((u[:, None] >= cdf).astype(jnp.int32), -1) - 1,
                 0, m - 2)
    c0 = jnp.take_along_axis(cdf, k[:, None], 1)[:, 0]
    c1 = jnp.take_along_axis(cdf, (k + 1)[:, None], 1)[:, 0]
    t = jnp.clip((u - c0) / jnp.maximum(c1 - c0, 1e-9), 0.0, 1.0)
    r_u = radius[k] * (1 - t) + radius[k + 1] * t
    sig = tab["sigma_t"][ch]
    return r_u / jnp.maximum(sig, 1e-9)


def tabulated_pdf_r(tab, d):
    """Planar pdf of every channel at world distance d (N,) -> (N, C):
    pdf(r) = Sr_u(sigma_t r) sigma_t^2 / rho_eff with
    Sr_u = profile/(2 pi r_u)."""
    radius = tab["radius"]
    m = radius.shape[0]
    sig = tab["sigma_t"][None, :]             # (1, C)
    r_u = d[:, None] * sig                    # (N, C)
    k = jnp.clip(jnp.sum((r_u[..., None] >= radius).astype(jnp.int32), -1)
                 - 1, 0, m - 2)
    r0 = radius[k]
    r1 = radius[k + 1]
    t = jnp.clip((r_u - r0) / jnp.maximum(r1 - r0, 1e-9), 0.0, 1.0)
    prof = tab["profile"][None, :, :]         # (1, C, M)
    prof = jnp.broadcast_to(prof, (d.shape[0],) + prof.shape[1:])
    p0 = jnp.take_along_axis(prof, k[..., None], 2)[..., 0]
    p1 = jnp.take_along_axis(prof, (k + 1)[..., None], 2)[..., 0]
    prof_v = p0 * (1 - t) + p1 * t            # (N, C) = 2 pi r_u Sr_u
    sr_u = prof_v / jnp.maximum(2 * jnp.pi * r_u, 1e-9)
    return sr_u * sig ** 2 / jnp.maximum(tab["rho_eff"][None, :], 1e-9)


def sample_exit_tabulated(prims, prim_ids, entry_p, entry_n, tab,
                          u_ch, u_r, u_phi):
    """Tabulated-profile exit sampling (same probe scheme as sample_exit;
    channel-MIS weight  rho_eff_k p_k(d) / mean_j p_j(d))."""
    from . import shapes as shapes_mod
    from ..utils import vecmath as vmu

    N = entry_p.shape[0]
    C = tab["sigma_t"].shape[0]
    ch = jnp.minimum((u_ch * C).astype(jnp.int32), C - 1)
    r = tabulated_sample_r(tab, ch, u_r)
    r = jnp.minimum(r, tab["radius"][-1]
                    / jnp.maximum(jnp.min(tab["sigma_t"]), 1e-9))
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
    d = jnp.maximum(jnp.linalg.norm(exit_p - entry_p, axis=-1), 1e-5)
    p_all = tabulated_pdf_r(tab, d)                      # (N, C)
    sel_pdf = jnp.mean(p_all, axis=-1)
    w = tab["rho_eff"][None, :] * p_all / jnp.maximum(sel_pdf, 1e-12)[:, None]
    return exit_p, exit_n, w, found
