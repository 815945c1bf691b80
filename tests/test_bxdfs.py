"""BxDF lobe tests — the bsdfs_test.cpp pattern (chi-square-lite):
sampling/pdf consistency, energy conservation, Fresnel closed forms.
Reference: src/pbrt/bsdfs_test.cpp (820 LoC goodness-of-fit per BxDF).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.models import bxdfs
from acceleratedvolrenderer_tpu.models import bxdfs as bx


def _rand_u(key, n, d=None):
    shape = (n,) if d is None else (n, d)
    return jax.random.uniform(jax.random.PRNGKey(key), shape)


def _rand_wo(key, n, upper=True):
    u = jax.random.uniform(jax.random.PRNGKey(key), (n, 2))
    z = u[:, 0] * (0.98 if upper else 1.96) + 0.01 - (0.0 if upper else 0.98)
    phi = 2 * jnp.pi * u[:, 1]
    s = jnp.sqrt(jnp.maximum(0.0, 1 - z * z))
    return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], -1)


def test_fresnel_conductor_matches_dielectric_at_k0():
    cos_i = jnp.linspace(0.05, 1.0, 64)
    eta = jnp.full((64,), 1.5)
    fd = bxdfs.fresnel_dielectric(cos_i, eta)
    fc = bxdfs.fresnel_conductor(cos_i, eta, jnp.zeros_like(eta))
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fd), atol=1e-4)


def test_fresnel_dielectric_normal_incidence():
    # ((eta-1)/(eta+1))^2 at normal incidence
    F = bxdfs.fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.5]))
    np.testing.assert_allclose(float(F[0]), (0.5 / 2.5) ** 2, rtol=1e-5)


def test_diffuse_white_furnace():
    # E[f cos / pdf] over cosine-sampled wi = albedo
    n = 4096
    wo = _rand_wo(1, n)
    albedo = jnp.full((n, 4), 0.7)
    s = bxdfs.diffuse_sample(wo, _rand_u(2, n, 2), albedo)
    est = s.f * bxdfs.abs_cos_theta(s.wi)[:, None] / jnp.maximum(s.pdf, 1e-9)[:, None]
    np.testing.assert_allclose(float(jnp.mean(est)), 0.7, rtol=1e-3)


def test_conductor_rough_sample_pdf_consistency():
    n = 2048
    wo = _rand_wo(3, n)
    eta = jnp.full((n, 1), 0.2)
    k = jnp.full((n, 1), 3.0)
    alpha = jnp.full((n,), 0.3)
    s = bxdfs.conductor_sample(wo, _rand_u(4, n, 2), eta, k, alpha)
    pdf2 = bxdfs.conductor_pdf(wo, s.wi, alpha)
    ok = s.pdf > 1e-5
    np.testing.assert_allclose(
        np.asarray(pdf2[ok]), np.asarray(s.pdf[ok]), rtol=2e-3)
    f2 = bxdfs.conductor_f(wo, s.wi, eta, k, alpha)
    np.testing.assert_allclose(
        np.asarray(f2[ok]), np.asarray(s.f[ok]), rtol=3e-3, atol=1e-5)


def test_conductor_energy_bounded():
    n = 8192
    wo = _rand_wo(5, n)
    eta = jnp.full((n, 1), 0.2)
    k = jnp.full((n, 1), 3.0)   #高 reflectance metal
    alpha = jnp.full((n,), 0.25)
    s = bxdfs.conductor_sample(wo, _rand_u(6, n, 2), eta, k, alpha)
    w = jnp.where(s.pdf > 1e-7,
                  s.f[:, 0] * bxdfs.abs_cos_theta(s.wi) / jnp.maximum(s.pdf, 1e-9),
                  0.0)
    assert float(jnp.mean(w)) <= 1.02


def test_dielectric_smooth_energy():
    # smooth glass: f*cos/pdf * eta_scale-correction conserves energy exactly
    n = 4096
    wo = _rand_wo(7, n, upper=False)
    eta = jnp.full((n,), 1.5)
    alpha = jnp.zeros((n,))
    s = bxdfs.dielectric_sample(wo, _rand_u(8, n), _rand_u(9, n, 2), eta, alpha)
    est = s.f[:, 0] * bxdfs.abs_cos_theta(s.wi) / jnp.maximum(s.pdf, 1e-9)
    # radiance-basis importance: undo the eta^2 radiance scaling
    est = est * s.eta_scale
    np.testing.assert_allclose(np.asarray(est), 1.0, atol=1e-3)


def test_dielectric_rough_sample_pdf_consistency():
    n = 4096
    wo = _rand_wo(10, n, upper=False)
    eta = jnp.full((n,), 1.5)
    alpha = jnp.full((n,), 0.3)
    s = bxdfs.dielectric_sample(wo, _rand_u(11, n), _rand_u(12, n, 2), eta, alpha)
    ok = s.pdf > 1e-4
    pdf2 = bxdfs.dielectric_pdf(wo, s.wi, eta, alpha)
    np.testing.assert_allclose(
        np.asarray(pdf2[ok]), np.asarray(s.pdf[ok]), rtol=5e-3, atol=1e-6)
    f2 = bxdfs.dielectric_f(wo, s.wi, eta, alpha)[:, 0]
    np.testing.assert_allclose(
        np.asarray(f2[ok]), np.asarray(s.f[ok][:, 0]), rtol=1e-2, atol=1e-5)


def test_dielectric_rough_energy_reasonable():
    # single-scattering GGX loses some energy but must stay in (0.7, 1.02]
    n = 16384
    wo = _rand_wo(13, n)
    eta = jnp.full((n,), 1.5)
    alpha = jnp.full((n,), 0.2)
    s = bxdfs.dielectric_sample(wo, _rand_u(14, n), _rand_u(15, n, 2), eta, alpha)
    est = jnp.where(s.pdf > 1e-7,
                    s.f[:, 0] * bxdfs.abs_cos_theta(s.wi)
                    / jnp.maximum(s.pdf, 1e-9) * s.eta_scale, 0.0)
    m = float(jnp.mean(est))
    assert 0.7 < m <= 1.02, m


def test_thin_dielectric_partition():
    n = 1024
    wo = _rand_wo(16, n)
    eta = jnp.full((n,), 1.5)
    s = bxdfs.thin_dielectric_sample(wo, _rand_u(17, n), eta)
    est = s.f[:, 0] * bxdfs.abs_cos_theta(s.wi) / jnp.maximum(s.pdf, 1e-9)
    np.testing.assert_allclose(np.asarray(est), 1.0, atol=1e-3)


def test_diffuse_transmission_partition():
    n = 4096
    wo = _rand_wo(18, n)
    refl = jnp.full((n, 4), 0.4)
    trans = jnp.full((n, 4), 0.35)
    s = bxdfs.diffuse_transmission_sample(
        wo, _rand_u(19, n), _rand_u(20, n, 2), refl, trans)
    est = s.f * bxdfs.abs_cos_theta(s.wi)[:, None] / jnp.maximum(s.pdf, 1e-9)[:, None]
    np.testing.assert_allclose(float(jnp.mean(est)), 0.75, rtol=2e-2)
    pdf2 = bxdfs.diffuse_transmission_pdf(
        wo, s.wi, jnp.max(refl, -1), jnp.max(trans, -1))
    np.testing.assert_allclose(np.asarray(pdf2), np.asarray(s.pdf), rtol=1e-4)


def test_vndf_sampled_normals_visible():
    n = 4096
    wo = _rand_wo(21, n)
    wm = bxdfs.tr_sample_wm(wo, _rand_u(22, n, 2), jnp.full((n,), 0.4))
    assert bool(jnp.all(wm[:, 2] > 0))
    assert bool(jnp.all(jnp.sum(wm * wo, -1) > -1e-5))


# ---------------------------------------------------------------------------
# Stochastic LayeredBxDF walk (bxdfs.h:432; VERDICT r1 #34)
# ---------------------------------------------------------------------------

def _layered_R(alb_val, thickness, med_albedo=None, cosw=0.6, n=16384,
               g=0.0, seed=9):
    from acceleratedvolrenderer_tpu.ops import dda

    rng = dda.seed_stream(jnp.arange(n, dtype=jnp.uint32),
                          jnp.zeros((n,), jnp.uint32), salt=seed)
    wo = jnp.broadcast_to(
        jnp.asarray([np.sqrt(1 - cosw ** 2), 0.0, cosw], np.float32), (n, 3))
    alb = jnp.full((n, 4), alb_val, jnp.float32)
    eta = jnp.full((n,), 1.5, jnp.float32)
    alpha = jnp.zeros((n,), jnp.float32)
    med = (jnp.full((n, 4), med_albedo, jnp.float32)
           if med_albedo is not None else None)
    bs, _ = bx.layered_sample(wo, rng, alb, eta, alpha,
                              thickness=thickness, g=g, med_albedo=med,
                              max_depth=16)
    pdf = np.asarray(bs.pdf)
    w = np.asarray(bs.f[:, 0]) * np.asarray(bx.abs_cos_theta(bs.wi))
    w = np.where(pdf > 0, w / np.maximum(pdf, 1e-30), 0.0)
    return float(w.mean())


def test_layered_white_furnace():
    """Unit-albedo base + lossless thin coat: directional-hemispherical
    reflectance ~ 1 (energy lost only to the walk's depth truncation,
    as the reference's maxDepth cut)."""
    R = _layered_R(1.0, 1e-4)
    assert 0.95 < R < 1.01, R


def test_layered_absorption_monotone():
    """Thicker absorbing interior (albedo=0 medium, sigma_t=1) =>
    monotonically lower reflectance."""
    r0 = _layered_R(0.8, 1e-3)
    r1 = _layered_R(0.8, 0.2)
    r2 = _layered_R(0.8, 0.6)
    assert r0 > r1 > r2, (r0, r1, r2)


def test_layered_scattering_medium_conserves():
    """A scattering (albedo=1) interior returns energy the absorbing one
    loses: R(scattering slab) >> R(absorbing slab), <= white furnace."""
    r_scat = _layered_R(1.0, 0.5, med_albedo=1.0)
    r_abs = _layered_R(1.0, 0.5, med_albedo=None)
    assert r_scat > r_abs + 0.1, (r_scat, r_abs)
    assert r_scat < 1.02, r_scat


def test_layered_matches_analytic_model():
    """The analytic Fresnel-coupled model and the stochastic walk agree
    on directional albedo for a typical thin coat (both approximate the
    same physics; the walk is the ground truth)."""
    from acceleratedvolrenderer_tpu.ops import dda

    n = 16384
    cosw = 0.6
    R_walk = _layered_R(0.5, 1e-3, cosw=cosw, n=n)
    # analytic: importance-sample coated_diffuse and average f cos / pdf
    rng = np.random.default_rng(3)
    u_lobe = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    wo = jnp.broadcast_to(
        jnp.asarray([np.sqrt(1 - cosw ** 2), 0.0, cosw], np.float32), (n, 3))
    s = bx.coated_diffuse_sample(wo, u_lobe, u2,
                                 jnp.full((n, 4), 0.5, jnp.float32),
                                 jnp.full((n,), 1.5, jnp.float32),
                                 jnp.zeros((n,), jnp.float32))
    w = np.asarray(s.f[:, 0]) * np.asarray(bx.abs_cos_theta(s.wi))
    w = np.where(np.asarray(s.pdf) > 0,
                 w / np.maximum(np.asarray(s.pdf), 1e-30), 0.0)
    R_analytic = float(w.mean())
    assert abs(R_walk - R_analytic) < 0.05, (R_walk, R_analytic)


def test_layered_deterministic():
    from acceleratedvolrenderer_tpu.ops import dda

    n = 64
    rng = dda.seed_stream(jnp.arange(n, dtype=jnp.uint32),
                          jnp.zeros((n,), jnp.uint32), salt=1)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)).astype(jnp.float32)
    args = (jnp.full((n, 4), 0.7, jnp.float32),
            jnp.full((n,), 1.5, jnp.float32),
            jnp.zeros((n,), jnp.float32))
    a, _ = bx.layered_sample(wo, rng, *args)
    b, _ = bx.layered_sample(wo, rng, *args)
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))
    np.testing.assert_array_equal(np.asarray(a.wi), np.asarray(b.wi))
