"""Hair BxDF — the Chiang et al. 2016 fiber scattering model.

Reference: bxdfs.h:921 HairBxDF / bxdfs.cpp (pMax = 3 lobes + residual):
longitudinal scattering Mp (normalized von-Mises-like in sin-theta with
per-lobe variance v_p from beta_m), azimuthal scattering Np (trimmed
logistic around the perfect-specular azimuth Phi_p(gamma_o, gamma_t) with
width s from beta_n), attenuation A_p from Fresnel + interior absorption.
Sampling picks a lobe by its attenuation energy, then inverts Mp and Np.

Vectorized over ray batches: all lobes are computed branch-free and summed;
hair frames follow pbrt's convention (x = curve tangent, wo/wi in local
frame, theta measured from the normal plane, h in [-1, 1] the azimuthal
offset across the fiber width).

sigma_a_from_concentration / sigma_a_from_reflectance mirror the reference
helpers (bxdfs.h:949-953).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

P_MAX = 3
_SQRT_PI_OVER_8 = 0.626657069


def _i0(x):
    """Modified Bessel I0 (polynomial, as the reference's I0)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    for i in range(10):
        if i > 0:
            ifact *= i
        val = val + x2i / (ifact * ifact * (4.0 ** i) / 1.0)
        x2i = x2i * x * x
    return val


def _log_i0(x):
    big = x > 12.0
    safe = jnp.minimum(x, 12.0)
    return jnp.where(
        big,
        x + 0.5 * (-jnp.log(2 * jnp.pi) + jnp.log(1 / jnp.maximum(x, 1e-9))
                   + 1 / jnp.maximum(8 * x, 1e-9)),
        jnp.log(jnp.maximum(_i0(safe), 1e-30)))


def _mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal lobe (bxdfs.cpp Mp), numerically stable for small v."""
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small = v <= 0.1
    mp_big = (jnp.exp(-b) * _i0(a)
              / (jnp.maximum(jnp.sinh(1 / jnp.maximum(v, 1e-9)), 1e-30)
                 * 2 * v))
    mp_small = jnp.exp(_log_i0(a) - b - 1 / jnp.maximum(v, 1e-9)
                       + 0.6931 + jnp.log(1 / jnp.maximum(2 * v, 1e-30)))
    return jnp.where(small, mp_small, mp_big)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1 + e) ** 2)


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / (_logistic_cdf(b, s) - _logistic_cdf(a, s))


def _sample_trimmed_logistic(u, s, a, b):
    k = _logistic_cdf(b, s) - _logistic_cdf(a, s)
    x = -s * jnp.log(1 / jnp.maximum(u * k + _logistic_cdf(a, s), 1e-12) - 1)
    return jnp.clip(x, a, b)


def _phi(p, gamma_o, gamma_t):
    return 2 * p * gamma_t - 2 * gamma_o + p * jnp.pi


def _fr_dielectric(cos_i, eta):
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1 - cos_i ** 2) / eta ** 2
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.clip(1 - sin2_t, 0.0, 1.0))
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-9)
    r_per = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-9)
    return jnp.where(tir, 1.0, 0.5 * (r_par ** 2 + r_per ** 2))


class HairParams:
    """Precomputed per-material quantities (HairBxDF ctor, bxdfs.cpp)."""

    def __init__(self, eta=1.55, beta_m=0.3, beta_n=0.3, alpha=2.0):
        self.eta = float(eta)
        bm = float(beta_m)
        bn = float(beta_n)
        v0 = (0.726 * bm + 0.812 * bm ** 2 + 3.7 * bm ** 20) ** 2
        self.v = [v0, 0.25 * v0, 4 * v0, 4 * v0]   # per-lobe variances
        self.s = _SQRT_PI_OVER_8 * (
            0.265 * bn + 1.194 * bn ** 2 + 5.372 * bn ** 22)
        a = np.deg2rad(alpha)
        self.sin2k_alpha = [np.sin(a)]
        self.cos2k_alpha = [np.cos(a)]
        for i in range(1, 3):
            sa, ca = self.sin2k_alpha[-1], self.cos2k_alpha[-1]
            self.sin2k_alpha.append(2 * ca * sa)
            self.cos2k_alpha.append(ca * ca - sa * sa)


def _ap(cos_theta_o, eta, h, T):
    """Attenuation per lobe (bxdfs.cpp Ap): returns list of (..., C)."""
    cos_gamma_o = jnp.sqrt(jnp.clip(1 - h ** 2, 0.0, 1.0))
    cos_theta = cos_theta_o * cos_gamma_o
    f = _fr_dielectric(cos_theta, eta)[..., None]
    a0 = jnp.broadcast_to(f, T.shape)
    a1 = (1 - f) ** 2 * T
    a2 = a1 * T * f
    a3 = a2 * T * f / jnp.maximum(1 - T * f, 1e-4)   # residual sum
    return [a0, a1, a2, a3]


def hair_f(wo, wi, h, sigma_a, prm: HairParams):
    """f(wo, wi) (..., C spectral channels).  wo/wi in the hair frame
    (x = tangent)."""
    sin_to = jnp.clip(wo[..., 0], -1, 1)
    cos_to = jnp.sqrt(jnp.clip(1 - sin_to ** 2, 0.0, 1.0))
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    sin_ti = jnp.clip(wi[..., 0], -1, 1)
    cos_ti = jnp.sqrt(jnp.clip(1 - sin_ti ** 2, 0.0, 1.0))
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])

    # refracted ray geometry
    sin_tt = sin_to / prm.eta
    cos_tt = jnp.sqrt(jnp.clip(1 - sin_tt ** 2, 0.0, 1.0))
    etap = jnp.sqrt(jnp.maximum(prm.eta ** 2 - sin_to ** 2, 1e-9)) \
        / jnp.maximum(cos_to, 1e-9)
    sin_gt = jnp.clip(h / etap, -1, 1)
    cos_gt = jnp.sqrt(jnp.clip(1 - sin_gt ** 2, 0.0, 1.0))
    gamma_o = jnp.arcsin(jnp.clip(h, -1, 1))
    gamma_t = jnp.arcsin(sin_gt)

    # interior transmittance
    T = jnp.exp(-sigma_a * (2 * cos_gt / jnp.maximum(cos_tt, 1e-5))[..., None])
    ap = _ap(cos_to, prm.eta, h, T)

    phi = phi_i - phi_o
    fsum = jnp.zeros_like(T)
    for p in range(P_MAX):
        # tilted-scale-angle adjustment (bxdfs.cpp:~ the alpha terms)
        if p == 0:
            sin_top = (sin_to * prm.cos2k_alpha[1]
                       - cos_to * prm.sin2k_alpha[1])
            cos_top = (cos_to * prm.cos2k_alpha[1]
                       + sin_to * prm.sin2k_alpha[1])
        elif p == 1:
            sin_top = (sin_to * prm.cos2k_alpha[0]
                       + cos_to * prm.sin2k_alpha[0])
            cos_top = (cos_to * prm.cos2k_alpha[0]
                       - sin_to * prm.sin2k_alpha[0])
        else:
            sin_top = (sin_to * prm.cos2k_alpha[2]
                       + cos_to * prm.sin2k_alpha[2])
            cos_top = (cos_to * prm.cos2k_alpha[2]
                       - sin_to * prm.sin2k_alpha[2])
        cos_top = jnp.abs(cos_top)
        mp = _mp(cos_ti, cos_top, sin_ti, sin_top, prm.v[p])
        dphi = phi - _phi(p, gamma_o, gamma_t)
        dphi = jnp.arctan2(jnp.sin(dphi), jnp.cos(dphi))  # wrap to [-pi,pi]
        np_ = _trimmed_logistic(dphi, prm.s, -jnp.pi, jnp.pi)
        fsum = fsum + (mp * np_)[..., None] * ap[p]
    mp_last = _mp(cos_ti, cos_to, sin_ti, sin_to, prm.v[P_MAX])
    fsum = fsum + (mp_last / (2 * jnp.pi))[..., None] * ap[P_MAX]
    abs_cos = jnp.abs(wi[..., 2])
    return jnp.where(abs_cos[..., None] > 1e-4,
                     fsum / jnp.maximum(abs_cos, 1e-4)[..., None], fsum)


def _ap_pdf(cos_to, eta, h, sigma_a, prm):
    sin_to = jnp.sqrt(jnp.clip(1 - cos_to ** 2, 0, 1))
    sin_tt = sin_to / eta
    cos_tt = jnp.sqrt(jnp.clip(1 - sin_tt ** 2, 0, 1))
    etap = jnp.sqrt(jnp.maximum(eta ** 2 - sin_to ** 2, 1e-9)) \
        / jnp.maximum(cos_to, 1e-9)
    sin_gt = jnp.clip(h / etap, -1, 1)
    cos_gt = jnp.sqrt(jnp.clip(1 - sin_gt ** 2, 0.0, 1.0))
    T = jnp.exp(-sigma_a * (2 * cos_gt / jnp.maximum(cos_tt, 1e-5))[..., None])
    ap = _ap(cos_to, eta, h, T)
    lum = [a.mean(-1) for a in ap]
    tot = sum(lum)
    return [l / jnp.maximum(tot, 1e-12) for l in lum]


def hair_pdf(wo, wi, h, sigma_a, prm: HairParams):
    sin_to = jnp.clip(wo[..., 0], -1, 1)
    cos_to = jnp.sqrt(jnp.clip(1 - sin_to ** 2, 0.0, 1.0))
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    sin_ti = jnp.clip(wi[..., 0], -1, 1)
    cos_ti = jnp.sqrt(jnp.clip(1 - sin_ti ** 2, 0.0, 1.0))
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])
    etap = jnp.sqrt(jnp.maximum(prm.eta ** 2 - sin_to ** 2, 1e-9)) \
        / jnp.maximum(cos_to, 1e-9)
    sin_gt = jnp.clip(h / etap, -1, 1)
    gamma_o = jnp.arcsin(jnp.clip(h, -1, 1))
    gamma_t = jnp.arcsin(sin_gt)
    apdf = _ap_pdf(cos_to, prm.eta, h, sigma_a, prm)
    phi = phi_i - phi_o
    pdf = jnp.zeros_like(cos_to)
    for p in range(P_MAX):
        if p == 0:
            sin_top = sin_to * prm.cos2k_alpha[1] - cos_to * prm.sin2k_alpha[1]
            cos_top = cos_to * prm.cos2k_alpha[1] + sin_to * prm.sin2k_alpha[1]
        elif p == 1:
            sin_top = sin_to * prm.cos2k_alpha[0] + cos_to * prm.sin2k_alpha[0]
            cos_top = cos_to * prm.cos2k_alpha[0] - sin_to * prm.sin2k_alpha[0]
        else:
            sin_top = sin_to * prm.cos2k_alpha[2] + cos_to * prm.sin2k_alpha[2]
            cos_top = cos_to * prm.cos2k_alpha[2] - sin_to * prm.sin2k_alpha[2]
        cos_top = jnp.abs(cos_top)
        mp = _mp(cos_ti, cos_top, sin_ti, sin_top, prm.v[p])
        dphi = phi - _phi(p, gamma_o, gamma_t)
        dphi = jnp.arctan2(jnp.sin(dphi), jnp.cos(dphi))
        pdf = pdf + mp * apdf[p] * _trimmed_logistic(dphi, prm.s,
                                                     -jnp.pi, jnp.pi)
    mp_last = _mp(cos_ti, cos_to, sin_ti, sin_to, prm.v[P_MAX])
    pdf = pdf + mp_last * apdf[P_MAX] / (2 * jnp.pi)
    return pdf


def hair_sample(wo, h, sigma_a, prm: HairParams, u):
    """Sample wi; u: (..., 4) uniforms.  Returns (wi, f, pdf)."""
    sin_to = jnp.clip(wo[..., 0], -1, 1)
    cos_to = jnp.sqrt(jnp.clip(1 - sin_to ** 2, 0.0, 1.0))
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    apdf = _ap_pdf(cos_to, prm.eta, h, sigma_a, prm)
    # lobe selection by attenuation energy
    c0 = apdf[0]
    c1 = c0 + apdf[1]
    c2 = c1 + apdf[2]
    u0 = u[..., 0]
    p_sel = (jnp.where(u0 < c0, 0, 0)
             + jnp.where(u0 >= c0, 1, 0)
             + jnp.where(u0 >= c1, 1, 0)
             + jnp.where(u0 >= c2, 1, 0))

    def tilted(p):
        if p == 0:
            return (sin_to * prm.cos2k_alpha[1] - cos_to * prm.sin2k_alpha[1],
                    cos_to * prm.cos2k_alpha[1] + sin_to * prm.sin2k_alpha[1])
        if p == 1:
            return (sin_to * prm.cos2k_alpha[0] + cos_to * prm.sin2k_alpha[0],
                    cos_to * prm.cos2k_alpha[0] - sin_to * prm.sin2k_alpha[0])
        if p == 2:
            return (sin_to * prm.cos2k_alpha[2] + cos_to * prm.sin2k_alpha[2],
                    cos_to * prm.cos2k_alpha[2] - sin_to * prm.sin2k_alpha[2])
        return sin_to, cos_to

    sin_top = jnp.zeros_like(sin_to)
    cos_top = jnp.zeros_like(cos_to)
    v_sel = jnp.zeros_like(sin_to)
    for p in range(P_MAX + 1):
        st, ct = tilted(p)
        m = p_sel == p
        sin_top = jnp.where(m, st, sin_top)
        cos_top = jnp.where(m, jnp.abs(ct), cos_top)
        v_sel = jnp.where(m, prm.v[p], v_sel)

    # sample Mp (bxdfs.cpp SampleMp): cosTheta via inversion
    u1 = jnp.maximum(u[..., 1], 1e-5)
    cos_theta = 1 + v_sel * jnp.log(
        u1 + (1 - u1) * jnp.exp(-2 / jnp.maximum(v_sel, 1e-9)))
    sin_theta = jnp.sqrt(jnp.clip(1 - cos_theta ** 2, 0.0, 1.0))
    cos_phi = jnp.cos(2 * jnp.pi * u[..., 2])
    sin_ti = -cos_theta * sin_top + sin_theta * cos_phi * cos_top
    cos_ti = jnp.sqrt(jnp.clip(1 - sin_ti ** 2, 0.0, 1.0))

    # sample Np
    etap = jnp.sqrt(jnp.maximum(prm.eta ** 2 - sin_to ** 2, 1e-9)) \
        / jnp.maximum(cos_to, 1e-9)
    sin_gt = jnp.clip(h / etap, -1, 1)
    gamma_o = jnp.arcsin(jnp.clip(h, -1, 1))
    gamma_t = jnp.arcsin(sin_gt)
    dphi_last = 2 * jnp.pi * u[..., 3]
    dphi_p = _phi(p_sel, gamma_o, gamma_t) + _sample_trimmed_logistic(
        u[..., 3], prm.s, -jnp.pi, jnp.pi)
    dphi = jnp.where(p_sel < P_MAX, dphi_p, dphi_last)
    phi_i = phi_o + dphi
    wi = jnp.stack([sin_ti, cos_ti * jnp.cos(phi_i),
                    cos_ti * jnp.sin(phi_i)], -1)
    f = hair_f(wo, wi, h, sigma_a, prm)
    pdf = hair_pdf(wo, wi, h, sigma_a, prm)
    return wi, f, pdf


def sigma_a_from_concentration(ce, cp):
    """Eumelanin/pheomelanin concentrations -> RGB sigma_a (bxdfs.h:949)."""
    eumelanin = np.array([0.419, 0.697, 1.37])
    pheomelanin = np.array([0.187, 0.4, 1.05])
    return ce * eumelanin + cp * pheomelanin


def sigma_a_from_reflectance(c, beta_n):
    """Inverse mapping from fiber color under white light (bxdfs.h:951)."""
    c = np.asarray(c, np.float64)
    denom = (5.969 - 0.215 * beta_n + 2.532 * beta_n ** 2
             - 10.73 * beta_n ** 3 + 5.574 * beta_n ** 4
             + 0.245 * beta_n ** 5)
    return (np.log(np.maximum(c, 1e-4)) / denom) ** 2
