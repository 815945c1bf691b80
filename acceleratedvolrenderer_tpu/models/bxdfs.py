"""BxDFs — surface scattering lobes, batched over rays in local frames.

Reference: src/pbrt/bxdfs.h (DiffuseBxDF :30, DiffuseTransmissionBxDF,
DielectricBxDF, ThinDielectricBxDF, ConductorBxDF; Trowbridge-Reitz
distribution in util/scattering.h) — reimplemented as branch-free batched
closed forms.  There is no per-ray virtual dispatch: every lobe family is a
pure function over (N,)-batched local directions (shading frame, +z = n),
and material dispatch happens by masked select over a small static set of
material types (models.materials.MATERIAL_*).

Conventions (pbrt's): wo, wi point away from the surface, local frame has
the normal at +z; cos_theta(w) = w.z.  Spectral values carry a trailing
LANES axis.  All sampling runs on detached uniforms so the lobes are safe
inside the differentiable integrators.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.math import safe_sqrt

INV_PI = 1.0 / jnp.pi


def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def same_hemisphere(wa, wb):
    return wa[..., 2] * wb[..., 2] > 0


def reflect(wo, n):
    return -wo + 2.0 * jnp.sum(wo * n, -1, keepdims=True) * n


def refract(wi, n, eta):
    """Snell refraction of wi about n (n on wi's side). Returns (ok, wt,
    etap) with eta relative index of the transmission side."""
    cos_i = jnp.sum(wi * n, -1)
    # flip to wi's side
    flip = cos_i < 0
    cos_i = jnp.abs(cos_i)
    n = jnp.where(flip[..., None], -n, n)
    eta_p = jnp.where(flip, 1.0 / eta, eta)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = sin2_i / (eta_p * eta_p)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    wt = -wi / eta_p[..., None] + (cos_i / eta_p - cos_t)[..., None] * n
    return ~tir, wt, eta_p


def fresnel_dielectric(cos_i, eta):
    """Unpolarized Fresnel reflectance, real eta (pbrt FrDielectric)."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    flip = cos_i < 0
    cos_i = jnp.abs(cos_i)
    eta = jnp.where(flip, 1.0 / eta, eta)
    sin2_i = 1.0 - cos_i * cos_i
    sin2_t = sin2_i / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    r_per = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    F = 0.5 * (r_par * r_par + r_per * r_per)
    return jnp.where(tir, 1.0, F)


def fresnel_conductor(cos_i, eta, k):
    """Unpolarized conductor Fresnel with complex IOR eta - i k (exact,
    complex arithmetic elementwise; eta/k may be spectral)."""
    cos_i = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    eta_c = jax.lax.complex(eta, -k)
    cos_i_c = jax.lax.complex(cos_i, jnp.zeros_like(cos_i))
    sin2 = jax.lax.complex(1.0 - cos_i * cos_i, jnp.zeros_like(cos_i))
    sin2_t = sin2 / (eta_c * eta_c)
    cos_t = jnp.sqrt(1.0 - sin2_t)
    r_par = (eta_c * cos_i_c - cos_t) / (eta_c * cos_i_c + cos_t)
    r_per = (cos_i_c - eta_c * cos_t) / (cos_i_c + eta_c * cos_t)
    return 0.5 * (jnp.abs(r_par) ** 2 + jnp.abs(r_per) ** 2)


# --------------------------------------------------------------------------
# Trowbridge-Reitz (GGX) microfacet distribution, isotropic
# --------------------------------------------------------------------------

def _tr_d(wm, alpha):
    """Normal distribution D(wm), upper hemisphere."""
    c2 = jnp.maximum(wm[..., 2] * wm[..., 2], 1e-12)
    t2 = (1.0 - c2) / c2
    a2 = alpha * alpha
    denom = jnp.pi * a2 * c2 * c2 * (1.0 + t2 / a2) ** 2
    return jnp.where(wm[..., 2] > 0, 1.0 / jnp.maximum(denom, 1e-24), 0.0)


def tr_lambda(w, alpha):
    c2 = jnp.maximum(w[..., 2] * w[..., 2], 1e-12)
    t2 = (1.0 - c2) / c2
    return 0.5 * (safe_sqrt(1.0 + alpha * alpha * t2) - 1.0)


def tr_g1(w, alpha):
    return 1.0 / (1.0 + tr_lambda(w, alpha))


def tr_g(wo, wi, alpha):
    return 1.0 / (1.0 + tr_lambda(wo, alpha) + tr_lambda(wi, alpha))


def tr_d_visible(w, wm, alpha):
    """Visible-normal density D_w(wm) = G1(w) D(wm) |w.wm| / |cos w|."""
    return (tr_g1(w, alpha) / jnp.maximum(abs_cos_theta(w), 1e-7)
            * _tr_d(wm, alpha) * jnp.abs(jnp.sum(w * wm, -1)))


def tr_sample_wm(w, u2, alpha):
    """Sample a visible microfacet normal (Heitz 2018 VNDF, pbrt4
    TrowbridgeReitzDistribution::Sample_wm)."""
    # stretch to hemisphere configuration
    wh = jnp.stack([alpha * w[..., 0], alpha * w[..., 1], w[..., 2]], -1)
    wh = wh * jnp.sign(wh[..., 2:3] + 1e-30)
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-12)
    # orthonormal basis around wh
    up = jnp.where((jnp.abs(wh[..., 2]) < 0.999)[..., None],
                   jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0]))
    t1 = jnp.cross(up, wh)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(wh, t1)
    # uniform disk (polar), warped
    r = safe_sqrt(u2[..., 0])
    phi = 2.0 * jnp.pi * u2[..., 1]
    px = r * jnp.cos(phi)
    py = r * jnp.sin(phi)
    h = safe_sqrt(1.0 - px * px)
    s = 0.5 * (1.0 + wh[..., 2])
    py = (1.0 - s) * h + s * py
    pz = safe_sqrt(jnp.maximum(0.0, 1.0 - px * px - py * py))
    nh = (px[..., None] * t1 + py[..., None] * t2 + pz[..., None] * wh)
    # unstretch
    wm = jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                    jnp.maximum(nh[..., 2], 1e-6)], -1)
    return wm / jnp.maximum(jnp.linalg.norm(wm, axis=-1, keepdims=True), 1e-12)


def tr_pdf(wo, wm, alpha):
    return tr_d_visible(wo, wm, alpha)


def tr_effectively_smooth(alpha):
    return alpha < 1e-3


# --------------------------------------------------------------------------
# Lobe closed forms.  Each returns spectra (N, LANES) / pdfs (N,).
# --------------------------------------------------------------------------

class BSDFSample(NamedTuple):
    wi: jnp.ndarray         # (N, 3) local
    f: jnp.ndarray          # (N, LANES)
    pdf: jnp.ndarray        # (N,)
    specular: jnp.ndarray   # (N,) bool — delta lobe (no MIS vs lights)
    eta_scale: jnp.ndarray  # (N,) radiance scaling (transmission eta^2)
    transmitted: jnp.ndarray  # (N,) bool — wi crosses the surface


def diffuse_f(wo, wi, albedo):
    f = albedo * INV_PI
    return jnp.where(same_hemisphere(wo, wi)[..., None], f, 0.0)


def diffuse_pdf(wo, wi):
    return jnp.where(same_hemisphere(wo, wi),
                     abs_cos_theta(wi) * INV_PI, 0.0)


def diffuse_sample(wo, u2, albedo):
    from ..ops import warps

    local = warps.sample_cosine_hemisphere(u2)
    wi = jnp.where((wo[..., 2:3] < 0), local * jnp.asarray([1.0, 1.0, -1.0]),
                   local)
    pdf = abs_cos_theta(wi) * INV_PI
    zeros = jnp.zeros(wo.shape[:-1], bool)
    return BSDFSample(wi, albedo * INV_PI, pdf, zeros,
                      jnp.ones(wo.shape[:-1]), zeros)


def diffuse_transmission_f(wo, wi, refl, trans):
    same = same_hemisphere(wo, wi)
    return jnp.where(same[..., None], refl * INV_PI, trans * INV_PI)


def diffuse_transmission_pdf(wo, wi, pr, pt):
    same = same_hemisphere(wo, wi)
    tot = jnp.maximum(pr + pt, 1e-12)
    return (abs_cos_theta(wi) * INV_PI
            * jnp.where(same, pr / tot, pt / tot))


def diffuse_transmission_sample(wo, u_lobe, u2, refl, trans):
    from ..ops import warps

    pr = jnp.max(refl, -1)
    pt = jnp.max(trans, -1)
    tot = jnp.maximum(pr + pt, 1e-12)
    go_r = u_lobe < pr / tot
    local = warps.sample_cosine_hemisphere(u2)
    # reflection: same side as wo; transmission: opposite
    sgn_o = jnp.sign(wo[..., 2:3] + 1e-30)
    wi = jnp.where(go_r[..., None], local * jnp.concatenate(
        [jnp.ones_like(sgn_o), jnp.ones_like(sgn_o), sgn_o], -1),
        local * jnp.concatenate(
        [jnp.ones_like(sgn_o), jnp.ones_like(sgn_o), -sgn_o], -1))
    f = jnp.where(go_r[..., None], refl * INV_PI, trans * INV_PI)
    pdf = (abs_cos_theta(wi) * INV_PI
           * jnp.where(go_r, pr / tot, pt / tot))
    zeros = jnp.zeros(wo.shape[:-1], bool)
    return BSDFSample(wi, f, pdf, zeros, jnp.ones(wo.shape[:-1]), ~go_r)


def conductor_f(wo, wi, eta, k, alpha):
    """Rough conductor (torrance-sparrow); 0 for smooth (delta)."""
    cos_o = jnp.maximum(abs_cos_theta(wo), 1e-7)
    cos_i = jnp.maximum(abs_cos_theta(wi), 1e-7)
    wm = wo + wi
    wm_len = jnp.linalg.norm(wm, axis=-1, keepdims=True)
    wm = wm / jnp.maximum(wm_len, 1e-12)
    F = fresnel_conductor(jnp.sum(wo * wm, -1)[..., None] *
                          jnp.ones_like(eta), eta, k)
    val = (_tr_d(wm * jnp.sign(wm[..., 2:3] + 1e-30), alpha)
           * tr_g(wo, wi, alpha) / (4.0 * cos_o * cos_i))[..., None] * F
    ok = same_hemisphere(wo, wi) & (wm_len[..., 0] > 1e-9) & ~tr_effectively_smooth(alpha)
    return jnp.where(ok[..., None], val, 0.0)


def conductor_pdf(wo, wi, alpha):
    wm = wo + wi
    wm_len = jnp.linalg.norm(wm, axis=-1, keepdims=True)
    wm = wm / jnp.maximum(wm_len, 1e-12)
    wm = wm * jnp.sign(wm[..., 2:3] + 1e-30)
    pdf = tr_pdf(wo * jnp.sign(wo[..., 2:3] + 1e-30),
                 wm, alpha) / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(wo * wm, -1)), 1e-9)
    ok = same_hemisphere(wo, wi) & (wm_len[..., 0] > 1e-9) & ~tr_effectively_smooth(alpha)
    return jnp.where(ok, pdf, 0.0)


def conductor_sample(wo, u2, eta, k, alpha):
    smooth = tr_effectively_smooth(alpha)
    # smooth: perfect mirror
    wi_s = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    cos_s = jnp.maximum(abs_cos_theta(wi_s), 1e-7)
    F_s = fresnel_conductor(cos_s[..., None] * jnp.ones_like(eta), eta, k)
    f_smooth = F_s / cos_s[..., None]
    # rough: VNDF
    sgn = jnp.sign(wo[..., 2:3] + 1e-30)
    wo_u = wo * jnp.concatenate([jnp.ones_like(sgn)] * 2 + [sgn], -1)
    wm = tr_sample_wm(wo_u, u2, alpha)
    wm_w = wm * jnp.concatenate([jnp.ones_like(sgn)] * 2 + [sgn], -1)
    wi_r = reflect(wo, wm_w)
    f_rough = conductor_f(wo, wi_r, eta, k, jnp.maximum(alpha, 2e-3))
    pdf_rough = conductor_pdf(wo, wi_r, jnp.maximum(alpha, 2e-3))
    ok_r = same_hemisphere(wo, wi_r)

    wi = jnp.where(smooth[..., None], wi_s, wi_r)
    f = jnp.where(smooth[..., None], f_smooth,
                  jnp.where(ok_r[..., None], f_rough, 0.0))
    pdf = jnp.where(smooth, 1.0, jnp.where(ok_r, pdf_rough, 0.0))
    zeros = jnp.zeros(wo.shape[:-1], bool)
    return BSDFSample(wi, f, pdf, jnp.broadcast_to(smooth, zeros.shape),
                      jnp.ones(wo.shape[:-1]), zeros)


def dielectric_f(wo, wi, eta, alpha):
    """Rough dielectric BTDF+BRDF (pbrt DielectricBxDF::f); 0 when smooth."""
    cos_o = cos_theta(wo)
    cos_i = cos_theta(wi)
    reflecting = cos_o * cos_i > 0
    etap = jnp.where(reflecting, 1.0, jnp.where(cos_o > 0, eta, 1.0 / eta))
    wm = wi * etap[..., None] + wo
    wm_len = jnp.linalg.norm(wm, axis=-1)
    wm_n = wm / jnp.maximum(wm_len[..., None], 1e-12)
    wm_n = wm_n * jnp.sign(wm_n[..., 2:3] + 1e-30)
    # discard backfacing microfacets
    ok = ((jnp.sum(wm_n * wi, -1) * cos_i >= 0)
          & (jnp.sum(wm_n * wo, -1) * cos_o >= 0)
          & (wm_len > 1e-9) & (jnp.abs(cos_o) > 1e-7) & (jnp.abs(cos_i) > 1e-7)
          & ~tr_effectively_smooth(alpha))
    F = fresnel_dielectric(jnp.sum(wo * wm_n, -1), eta)
    D = _tr_d(wm_n, alpha)
    G = tr_g(wo, wi, alpha)
    f_refl = D * F * G / jnp.maximum(
        jnp.abs(4.0 * cos_i * cos_o), 1e-12)
    denom_t = (jnp.sum(wi * wm_n, -1) + jnp.sum(wo * wm_n, -1) / etap) ** 2
    f_trans = (D * (1.0 - F) * G
               * jnp.abs(jnp.sum(wi * wm_n, -1) * jnp.sum(wo * wm_n, -1))
               / jnp.maximum(jnp.abs(cos_i * cos_o) * denom_t, 1e-12)
               / (etap * etap))
    val = jnp.where(reflecting, f_refl, f_trans)
    return jnp.where(ok, val, 0.0)[..., None]


def dielectric_pdf(wo, wi, eta, alpha):
    cos_o = cos_theta(wo)
    cos_i = cos_theta(wi)
    reflecting = cos_o * cos_i > 0
    etap = jnp.where(reflecting, 1.0, jnp.where(cos_o > 0, eta, 1.0 / eta))
    wm = wi * etap[..., None] + wo
    wm_len = jnp.linalg.norm(wm, axis=-1)
    wm_n = wm / jnp.maximum(wm_len[..., None], 1e-12)
    wm_n = wm_n * jnp.sign(wm_n[..., 2:3] + 1e-30)
    ok = ((jnp.sum(wm_n * wi, -1) * cos_i >= 0)
          & (jnp.sum(wm_n * wo, -1) * cos_o >= 0)
          & (wm_len > 1e-9) & ~tr_effectively_smooth(alpha))
    F = fresnel_dielectric(jnp.sum(wo * wm_n, -1), eta)
    pr = F
    pt = 1.0 - F
    tot = jnp.maximum(pr + pt, 1e-12)
    wo_u = wo * jnp.sign(wo[..., 2:3] + 1e-30)
    dwm = tr_pdf(wo_u, wm_n, alpha)
    pdf_refl = dwm / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(wo * wm_n, -1)), 1e-12) * pr / tot
    denom_t = (jnp.sum(wi * wm_n, -1) + jnp.sum(wo * wm_n, -1) / etap) ** 2
    dwm_dwi = jnp.abs(jnp.sum(wi * wm_n, -1)) / jnp.maximum(denom_t, 1e-12)
    pdf_trans = dwm * dwm_dwi * pt / tot
    return jnp.where(ok, jnp.where(reflecting, pdf_refl, pdf_trans), 0.0)


def dielectric_sample(wo, u_lobe, u2, eta, alpha):
    smooth = tr_effectively_smooth(alpha)
    n_loc = jnp.zeros_like(wo).at[..., 2].set(1.0)

    # ---- smooth branch: delta reflection/transmission by Fresnel ----
    F_s = fresnel_dielectric(cos_theta(wo), eta)
    go_r_s = u_lobe < F_s
    wi_refl = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    ok_t, wi_trans, etap_s = refract(wo, n_loc, eta)
    wi_s = jnp.where(go_r_s[..., None], wi_refl, wi_trans)
    cos_ws = jnp.maximum(abs_cos_theta(wi_s), 1e-7)
    f_s = jnp.where(go_r_s, F_s / cos_ws,
                    (1.0 - F_s) / cos_ws / (etap_s * etap_s))
    pdf_s = jnp.where(go_r_s, F_s, 1.0 - F_s)
    valid_s = go_r_s | ok_t
    eta_sc_s = jnp.where(go_r_s, 1.0, etap_s * etap_s)

    # ---- rough branch: VNDF microfacet ----
    sgn = jnp.sign(wo[..., 2:3] + 1e-30)
    wo_u = wo * jnp.concatenate([jnp.ones_like(sgn)] * 2 + [sgn], -1)
    wm = tr_sample_wm(wo_u, u2, jnp.maximum(alpha, 2e-3))
    wm_w = wm * jnp.concatenate([jnp.ones_like(sgn)] * 2 + [sgn], -1)
    F_r = fresnel_dielectric(jnp.sum(wo * wm_w, -1), eta)
    go_r_r = u_lobe < F_r
    wi_rr = reflect(wo, wm_w)
    ok_rt, wi_rt, etap_r = refract(wo, wm_w, eta)
    wi_r = jnp.where(go_r_r[..., None], wi_rr, wi_rt)
    a_r = jnp.maximum(alpha, 2e-3)
    f_r = dielectric_f(wo, wi_r, eta, a_r)[..., 0]
    pdf_r = dielectric_pdf(wo, wi_r, eta, a_r)
    valid_r = jnp.where(go_r_r, same_hemisphere(wo, wi_rr), ok_rt)
    eta_sc_r = jnp.where(go_r_r, 1.0, etap_r * etap_r)

    wi = jnp.where(smooth[..., None], wi_s, wi_r)
    f = jnp.where(smooth, f_s, f_r)[..., None]
    pdf = jnp.where(smooth, pdf_s, pdf_r)
    valid = jnp.where(smooth, valid_s, valid_r)
    eta_sc = jnp.where(smooth, eta_sc_s, eta_sc_r)
    trans = jnp.where(smooth, ~go_r_s, ~go_r_r)
    pdf = jnp.where(valid, pdf, 0.0)
    return BSDFSample(wi, f, pdf, jnp.broadcast_to(smooth, pdf.shape),
                      eta_sc, trans)


def thin_dielectric_sample(wo, u_lobe, eta):
    """Thin slab: specular reflect/pass-through with double-interface
    Fresnel R' = R + TTR/(1-R^2) (pbrt ThinDielectricBxDF)."""
    F = fresnel_dielectric(jnp.abs(cos_theta(wo)), eta)
    F = jnp.minimum(F, 1.0)
    R = F + (1.0 - F) * (1.0 - F) * F / jnp.maximum(1.0 - F * F, 1e-9)
    T = 1.0 - R
    go_r = u_lobe < R
    wi_refl = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    wi_pass = -wo
    wi = jnp.where(go_r[..., None], wi_refl, wi_pass)
    cos_w = jnp.maximum(abs_cos_theta(wi), 1e-7)
    f = jnp.where(go_r, R / cos_w, T / cos_w)
    pdf = jnp.where(go_r, R, T)
    ones = jnp.ones(wo.shape[:-1], bool)
    return BSDFSample(wi, f[..., None], pdf, ones,
                      jnp.ones(wo.shape[:-1]), ~go_r)


# ---------------------------------------------------------------------------
# Coated diffuse — the LayeredBxDF<DielectricBxDF, DiffuseBxDF> capability
# (bxdfs.h:432 CoatedDiffuseBxDF).  The reference evaluates the layer stack
# by stochastic random walk between the interfaces; that estimator's mean
# for a smooth-or-rough dielectric coat over a Lambertian base is well
# approximated by the Fresnel-coupled analytic model used here:
#   f = f_coat_reflection(wo, wi)                       (microfacet, F_diel)
#     + (1 - F(wo)) (1 - F(wi)) albedo/pi / (1 - albedo Fbar)
# where the (1 - albedo*Fbar) term accounts for total-internal-reflection
# energy bouncing between base and coat (Kelemen-Szirmay-Kalos coupling).
# Deterministic -> no per-bounce RNG in the masked dispatch, which is what
# the TPU lockstep loop wants.
# ---------------------------------------------------------------------------

def _fresnel_avg(eta):
    """Average Fresnel reflectance of a dielectric (fitted form)."""
    return (eta - 1.0) / (4.08567 + 1.00071 * eta)


def coated_diffuse_f(wo, wi, albedo, eta, alpha):
    up = same_hemisphere(wo, wi) & (cos_theta(wo) > 0)
    f_o = fresnel_dielectric(abs_cos_theta(wo), eta)
    f_i = fresnel_dielectric(abs_cos_theta(wi), eta)
    # coupled-diffuse normalization: the interreflection denominator uses
    # the INTERNAL diffuse Fresnel reflectance ri = 1 - (1 - re)/eta^2
    # (TIR traps most upward diffuse light for eta > 1), and the exit
    # compression contributes 1/eta^2.  Validated against the stochastic
    # LayeredBxDF walk (layered_sample): directional albedo agrees to ~2%.
    re = _fresnel_avg(eta)
    eta2 = jnp.maximum(eta * eta, 1e-6)
    ri = 1.0 - (1.0 - re) / eta2
    diff = (albedo / jnp.pi
            * ((1.0 - f_o) * (1.0 - f_i) / eta2)[..., None]
            / jnp.maximum(1.0 - albedo * ri[..., None], 1e-3))
    # coat reflection lobe: Trowbridge-Reitz microfacet with dielectric F
    smooth = tr_effectively_smooth(alpha)
    wm = wo + wi
    wml = jnp.linalg.norm(wm, axis=-1)
    wm_n = wm / jnp.maximum(wml, 1e-12)[..., None]
    d = _tr_d(wm_n, alpha)
    g = tr_g(wo, wi, alpha)
    f_h = fresnel_dielectric(jnp.abs(jnp.sum(wo * wm_n, -1)), eta)
    denom = 4.0 * abs_cos_theta(wo) * abs_cos_theta(wi)
    spec = jnp.where(smooth | (wml < 1e-9), 0.0,
                     d * g * f_h / jnp.maximum(denom, 1e-9))
    f = diff + spec[..., None]
    return jnp.where(up[..., None], f, 0.0)


def coated_diffuse_pdf(wo, wi, eta, alpha):
    up = same_hemisphere(wo, wi) & (cos_theta(wo) > 0)
    q = jnp.clip(fresnel_dielectric(abs_cos_theta(wo), eta), 0.1, 0.9)
    p_diff = diffuse_pdf(wo, wi)
    smooth = tr_effectively_smooth(alpha)
    wm = wo + wi
    wml = jnp.linalg.norm(wm, axis=-1)
    wm_n = wm / jnp.maximum(wml, 1e-12)[..., None]
    p_spec = jnp.where(
        smooth | (wml < 1e-9), 0.0,
        tr_pdf(wo, wm_n, alpha) / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo * wm_n, -1)), 1e-9))
    return jnp.where(up, q * p_spec + (1.0 - q) * p_diff, 0.0)


def coated_diffuse_sample(wo, u_lobe, u2, albedo, eta, alpha):
    """One-sample lobe selection: coat reflection with prob q = F(wo)."""
    q = jnp.clip(fresnel_dielectric(abs_cos_theta(wo), eta), 0.1, 0.9)
    pick_spec = u_lobe < q
    smooth = tr_effectively_smooth(alpha)

    # specular/glossy coat reflection
    wm = tr_sample_wm(wo, u2, alpha)
    wi_rough = reflect(wo, wm)
    wi_smooth = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    wi_spec = jnp.where(smooth[..., None], wi_smooth, wi_rough)

    # diffuse base
    sgn = jnp.sign(jnp.where(cos_theta(wo) == 0, 1.0, cos_theta(wo)))
    z = jnp.sqrt(jnp.clip(1.0 - u2[..., 0], 0.0, 1.0))
    r = jnp.sqrt(jnp.clip(u2[..., 0], 0.0, 1.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    wi_dif = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    wi_dif = wi_dif * jnp.stack([jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)

    wi = jnp.where(pick_spec[..., None], wi_spec, wi_dif)
    f = coated_diffuse_f(wo, wi, albedo, eta, alpha)
    pdf = coated_diffuse_pdf(wo, wi, eta, alpha)
    # smooth-coat specular pick: delta lobe handled explicitly
    f_o = fresnel_dielectric(abs_cos_theta(wo), eta)
    delta_pick = pick_spec & smooth
    f_delta = jnp.zeros_like(f) + (f_o / jnp.maximum(abs_cos_theta(wi), 1e-9))[..., None]
    f = jnp.where(delta_pick[..., None], f_delta, f)
    pdf = jnp.where(delta_pick, q, pdf)
    ok = cos_theta(wo) > 0
    return BSDFSample(
        wi=wi,
        f=jnp.where(ok[..., None], f, 0.0),
        pdf=jnp.where(ok, pdf, 0.0),
        specular=delta_pick,
        eta_scale=jnp.ones_like(pdf),
        transmitted=jnp.zeros_like(ok),
    )


# --------------------------------------------------------------------------
# Stochastic layered BSDF (bxdfs.h:432 LayeredBxDF; CoatedDiffuseBxDF =
# LayeredBxDF<DielectricBxDF, DiffuseBxDF>).  The reference estimates the
# layered BSDF with a random walk between the coat interface and the base;
# this is the batched TPU form: every lane walks in lockstep under masks
# for a fixed max_depth (no data-dependent control flow), RNG from the
# per-lane PCG streams.  Returned pdf is *proportional* (pbrt
# pdfIsProportional): f/pdf is the unbiased throughput weight; use the
# analytic coated_diffuse_pdf for MIS (any partition of unity is valid).
# --------------------------------------------------------------------------

def layered_sample(wo, rng, albedo, eta, alpha, thickness=0.01, g=0.0,
                   med_albedo=None, max_depth=8):
    """Sample the coated-diffuse layered BSDF by random walk.

    wo (N,3) local; rng (N,) PCG states; albedo (N,L) base reflectance;
    eta/alpha (N,) coat IOR/roughness; thickness/g (N,) or scalar slab
    params; med_albedo (N,L) or None — single-scattering albedo of the
    medium between the interfaces (sigma_t = 1, as the reference fixes).
    Returns (BSDFSample, rng); dead walks have f = 0, pdf = 0.
    """
    from ..ops import dda  # local import: ops.dda does not import models
    from ..ops import phase as phase_mod

    N = wo.shape[0]
    L = albedo.shape[-1]
    thickness = jnp.broadcast_to(jnp.asarray(thickness, jnp.float32), (N,))
    g = jnp.broadcast_to(jnp.asarray(g, jnp.float32), (N,))
    has_med = med_albedo is not None

    def draw(rng):
        rng, u = dda.pcg_uniform(rng)
        return rng, u

    def draw2(rng):
        rng, u1 = dda.pcg_uniform(rng)
        rng, u2 = dda.pcg_uniform(rng)
        return rng, jnp.stack([u1, u2], -1)

    # twoSided: walk in the upper-hemisphere frame, flip wi back at the end
    flip = wo[..., 2] < 0
    sflip = jnp.where(flip, -1.0, 1.0)[..., None]
    wo_u = wo * sflip

    # ---- entrance interface: the dielectric coat ----
    rng, uc = draw(rng)
    rng, u2 = draw2(rng)
    bs = dielectric_sample(wo_u, uc, u2, eta, alpha)
    ok0 = (bs.pdf > 0) & (jnp.abs(bs.wi[..., 2]) > 1e-9)
    refl0 = ok0 & ~bs.transmitted
    # coat-reflection lanes exit immediately
    wi_out = bs.wi
    f_out = jnp.where(refl0[..., None], bs.f, 0.0)
    pdf_out = jnp.where(refl0, bs.pdf, 0.0)
    spec_out = refl0 & bs.specular
    exited = refl0

    walking = ok0 & bs.transmitted
    f = bs.f * abs_cos_theta(bs.wi)[..., None]          # (N, L)
    pdf = jnp.maximum(bs.pdf, 1e-30)                    # (N,)
    w = bs.wi                                           # w.z < 0: downward
    z = thickness
    spec_path = bs.specular

    for depth in range(max_depth):
        # Russian roulette (reference: depth > 3 && beta < 0.25)
        rr_beta = jnp.max(f, axis=-1) / pdf
        rng, u_rr = draw(rng)
        if depth > 3:
            q = jnp.where(rr_beta < 0.25,
                          jnp.clip(1.0 - rr_beta, 0.0, 1.0), 0.0)
            die = walking & (u_rr < q)
            pdf = jnp.where(walking & ~die & (q > 0), pdf * (1.0 - q), pdf)
            walking = walking & ~die
        walking = walking & (jnp.abs(w[..., 2]) > 1e-9)

        scattered = jnp.zeros((N,), bool)
        if has_med:
            # possible scattering event in the interior medium (sigma_t=1)
            rng, u_t = draw(rng)
            dz = -jnp.log1p(-jnp.minimum(u_t, 1.0 - 1e-7)) \
                * jnp.abs(w[..., 2])
            zp = jnp.where(w[..., 2] > 0, z + dz, z - dz)
            inside = (zp > 0) & (zp < thickness)
            rng, u_p = draw2(rng)
            wi_ph, p_ph = phase_mod.sample_hg(-w, u_p, g)
            scattered = walking & inside
            f = jnp.where(scattered[..., None],
                          f * med_albedo * p_ph[..., None], f)
            pdf = jnp.where(scattered, pdf * jnp.maximum(p_ph, 1e-30), pdf)
            w = jnp.where(scattered[..., None], wi_ph, w)
            z = jnp.where(scattered, zp,
                          jnp.where(walking, jnp.clip(zp, 0.0, thickness),
                                    z))
            spec_path = spec_path & ~scattered
        else:
            # pure absorber between layers: cross to the other interface
            z_new = jnp.where(z <= 0.0, thickness, 0.0)
            tr = jnp.exp(-thickness / jnp.maximum(
                jnp.abs(w[..., 2]), 1e-9))
            f = jnp.where(walking[..., None], f * tr[..., None], f)
            z = jnp.where(walking, z_new, z)

        at_interface = walking & ~scattered
        at_bottom = at_interface & (z <= 0.0)
        at_top = at_interface & (z >= thickness)

        # ---- interface sample (bottom: diffuse base; top: coat) ----
        rng, uc = draw(rng)
        rng, u2 = draw2(rng)
        bs_b = diffuse_sample(-w, u2, albedo)
        bs_t = dielectric_sample(-w, uc, u2, eta, alpha)
        b_f = jnp.where(at_bottom[..., None], bs_b.f, bs_t.f)
        b_pdf = jnp.where(at_bottom, bs_b.pdf, bs_t.pdf)
        b_wi = jnp.where(at_bottom[..., None], bs_b.wi, bs_t.wi)
        b_spec = jnp.where(at_bottom, bs_b.specular, bs_t.specular)
        b_trans = jnp.where(at_bottom, bs_b.transmitted, bs_t.transmitted)
        ok = (b_pdf > 0) & (jnp.abs(b_wi[..., 2]) > 1e-9) \
            & (jnp.max(b_f, axis=-1) > 0)
        walking = jnp.where(at_interface, walking & ok, walking)

        new_f = f * b_f
        new_pdf = pdf * jnp.maximum(b_pdf, 1e-30)
        upd = at_interface & ok
        f = jnp.where(upd[..., None], new_f, f)
        pdf = jnp.where(upd, new_pdf, pdf)
        spec_path = jnp.where(upd, spec_path & b_spec, spec_path)

        # transmission through the top coat leaves the layers
        exit_now = upd & at_top & b_trans
        wi_out = jnp.where(exit_now[..., None], b_wi, wi_out)
        f_out = jnp.where(exit_now[..., None], f, f_out)
        pdf_out = jnp.where(exit_now, pdf, pdf_out)
        spec_out = jnp.where(exit_now, spec_path, spec_out)
        exited = exited | exit_now
        walking = walking & ~exit_now

        # continuing lanes pick up the interface cosine
        cont = upd & ~exit_now
        f = jnp.where(cont[..., None],
                      f * abs_cos_theta(b_wi)[..., None], f)
        w = jnp.where(cont[..., None], b_wi, w)

    wi_final = wi_out * sflip
    dead = ~exited
    return BSDFSample(
        wi=wi_final,
        f=jnp.where(dead[..., None], 0.0, f_out),
        pdf=jnp.where(dead, 0.0, pdf_out),
        specular=spec_out,
        eta_scale=jnp.ones((N,), jnp.float32),
        transmitted=jnp.zeros((N,), bool),
    ), rng

def layered_f(wo, wi, rng, albedo, eta, alpha, thickness=0.01, g=0.0,
              med_albedo=None, max_depth=8):
    """One-sample stochastic estimate of the layered BSDF value f(wo, wi).

    The NEE/direct-lighting companion of layered_sample — the reference's
    LayeredBxDF::f (bxdfs.h:432, the random-walk estimator with exit-side
    importance transmission): enter the coat along wo, walk between the
    interfaces, and at every interior vertex (medium scatter or diffuse
    base) connect to wi through an exit-transmission sample wis.  Using it
    for NEE makes light sampling integrate the SAME slab-attenuated BRDF
    the walk-based BSDF sampling does (thickness/g/albedo_med included),
    instead of the clear-slab analytic coated_diffuse_f.

    Returns (f_estimate (N, L), rng).  Reflection-only (coated diffuse):
    wo/wi in opposite hemispheres give 0.
    """
    from ..ops import dda
    from ..ops import phase as phase_mod

    N = wo.shape[0]
    thickness = jnp.broadcast_to(jnp.asarray(thickness, jnp.float32), (N,))
    g = jnp.broadcast_to(jnp.asarray(g, jnp.float32), (N,))
    has_med = med_albedo is not None

    def draw(rng):
        rng, u = dda.pcg_uniform(rng)
        return rng, u

    def draw2(rng):
        rng, u1 = dda.pcg_uniform(rng)
        rng, u2 = dda.pcg_uniform(rng)
        return rng, jnp.stack([u1, u2], -1)

    valid = same_hemisphere(wo, wi) & (abs_cos_theta(wo) > 1e-7) \
        & (abs_cos_theta(wi) > 1e-7)
    flip = wo[..., 2] < 0
    sflip = jnp.where(flip, -1.0, 1.0)[..., None]
    wo_u = wo * sflip
    wi_u = wi * sflip

    # term 1: coat-reflection lobe wo -> wi (analytic; zero when the coat
    # is effectively smooth — the delta carries no density at a fixed wi)
    f_est = jnp.where(
        (valid & ~tr_effectively_smooth(alpha))[..., None],
        dielectric_f(wo_u, wi_u, eta, jnp.maximum(alpha, 2e-3)), 0.0)

    # ---- entry transmission sample along wo ----
    rng, uc = draw(rng)
    rng, u2 = draw2(rng)
    bs_o = dielectric_sample(wo_u, uc, u2, eta, alpha)
    walk0 = valid & bs_o.transmitted & (bs_o.pdf > 0) \
        & (jnp.abs(bs_o.wi[..., 2]) > 1e-7)
    # transmission-only estimator: contribute only on transmitted draws;
    # f cos / pdf then matches pbrt's SampleFlags::Transmission weight in
    # expectation (the (1-F) selection probability cancels identically)
    beta = jnp.where(walk0[..., None],
                     bs_o.f * abs_cos_theta(bs_o.wi)[..., None]
                     / jnp.maximum(bs_o.pdf, 1e-30)[..., None], 0.0)

    # ---- exit-side importance transmission sample along wi ----
    rng, uc2 = draw(rng)
    rng, u22 = draw2(rng)
    bs_i = dielectric_sample(wi_u, uc2, u22, eta, alpha)
    ok_i = valid & bs_i.transmitted & (bs_i.pdf > 0) \
        & (jnp.abs(bs_i.wi[..., 2]) > 1e-7)
    # importance-mode transmission drops the radiance 1/eta_p^2 compression
    # (pbrt TransportMode::Importance): undo it on the radiance-mode sample
    beta_exit = jnp.where(
        ok_i[..., None],
        bs_i.f * (bs_i.eta_scale / jnp.maximum(bs_i.pdf, 1e-30))[..., None],
        0.0)
    w_exit = bs_i.wi          # points INTO the slab (z < 0)
    cos_exit = jnp.maximum(jnp.abs(w_exit[..., 2]), 1e-7)

    walking = walk0 & ok_i
    w = bs_o.wi
    z = thickness

    for depth in range(max_depth):
        rr_beta = jnp.max(beta, axis=-1)
        rng, u_rr = draw(rng)
        if depth > 3:
            q = jnp.where(rr_beta < 0.25, jnp.clip(1.0 - rr_beta, 0.0, 1.0),
                          0.0)
            die = walking & (u_rr < q)
            beta = jnp.where((walking & ~die & (q > 0))[..., None],
                             beta / jnp.maximum(1.0 - q, 1e-6)[..., None],
                             beta)
            walking = walking & ~die
        walking = walking & (jnp.abs(w[..., 2]) > 1e-7)

        scattered = jnp.zeros((N,), bool)
        if has_med:
            rng, u_t = draw(rng)
            dz = -jnp.log1p(-jnp.minimum(u_t, 1.0 - 1e-7)) \
                * jnp.abs(w[..., 2])
            zp = jnp.where(w[..., 2] > 0, z + dz, z - dz)
            inside = (zp > 0) & (zp < thickness)
            scattered = walking & inside
            # NEE: phase vertex -> exit connection through wis
            p_conn = phase_mod.hg_phase(-w, -w_exit, g)
            tr_up = jnp.exp(-(thickness - jnp.clip(zp, 0.0, thickness))
                            / cos_exit)
            f_est = f_est + jnp.where(
                scattered[..., None],
                beta * med_albedo * p_conn[..., None] * tr_up[..., None]
                * beta_exit, 0.0)
            # continuation: exact HG sampling (p/pdf = 1)
            rng, u_p = draw2(rng)
            wi_ph, _ = phase_mod.sample_hg(-w, u_p, g)
            beta = jnp.where(scattered[..., None], beta * med_albedo, beta)
            w = jnp.where(scattered[..., None], wi_ph, w)
            z = jnp.where(scattered, zp,
                          jnp.where(walking, jnp.clip(zp, 0.0, thickness), z))
        else:
            tr = jnp.exp(-thickness / jnp.maximum(jnp.abs(w[..., 2]), 1e-7))
            beta = jnp.where(walking[..., None], beta * tr[..., None], beta)
            z = jnp.where(walking, jnp.where(z <= 0.0, thickness, 0.0), z)

        at_interface = walking & ~scattered
        at_bottom = at_interface & (z <= 0.0)
        at_top = at_interface & (z >= thickness)

        # bottom NEE: diffuse base -> exit connection
        f_bot = diffuse_f(-w, -w_exit, albedo)
        tr_full = jnp.exp(-thickness / cos_exit)
        f_est = f_est + jnp.where(
            at_bottom[..., None],
            beta * f_bot * cos_exit[..., None] * tr_full[..., None]
            * beta_exit, 0.0)

        # continuation through the interface (bottom: diffuse bounce;
        # top: dielectric — transmission exits carry no more NEE weight,
        # reflection re-enters)
        rng, uc3 = draw(rng)
        rng, u23 = draw2(rng)
        bs_b = diffuse_sample(-w, u23, albedo)
        bs_t = dielectric_sample(-w, uc3, u23, eta, alpha)
        b_f = jnp.where(at_bottom[..., None], bs_b.f, bs_t.f)
        b_pdf = jnp.where(at_bottom, bs_b.pdf, bs_t.pdf)
        b_wi = jnp.where(at_bottom[..., None], bs_b.wi, bs_t.wi)
        b_trans = jnp.where(at_bottom, bs_b.transmitted, bs_t.transmitted)
        ok = (b_pdf > 0) & (jnp.abs(b_wi[..., 2]) > 1e-7) \
            & (jnp.max(b_f, axis=-1) > 0)
        walking = jnp.where(at_interface, walking & ok, walking)
        # top-transmission = the walk left the slab without touching wi's
        # exit sample: that path's contribution is already counted via the
        # wis connections, so the walk just dies
        exit_top = at_interface & at_top & ok & b_trans
        walking = walking & ~exit_top
        upd = at_interface & ok & ~exit_top
        beta = jnp.where(upd[..., None],
                         beta * b_f * abs_cos_theta(b_wi)[..., None]
                         / jnp.maximum(b_pdf, 1e-30)[..., None], beta)
        w = jnp.where(upd[..., None], b_wi, w)

    return jnp.where(valid[..., None], f_est, 0.0), rng
