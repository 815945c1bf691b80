"""MeasuredBxDF tests.

Reference: src/pbrt/bxdfs.{h,cpp} MeasuredBxDF (bxdfs.h:1021) — RGL
data-driven BRDF with vndf/luminance warps and 5D spectra interpolant,
plus the tensor_file container (bxdfs.cpp:577).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from acceleratedvolrenderer_tpu.models import measured as ms

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 #9 test tiering)

ALPHA = 0.3


@pytest.fixture(scope="module")
def brdf():
    return ms.synthesize_ggx(alpha=ALPHA, res=64, n_theta=16)


def _wo(theta_deg, n):
    t = np.deg2rad(theta_deg)
    return jnp.broadcast_to(
        jnp.asarray([np.sin(t), 0.0, np.cos(t)], jnp.float32), (n, 3))


def test_tensor_file_roundtrip(tmp_path):
    """write_tensor_file/read_tensor_file reproduce the RGL container
    byte layout (bxdfs.cpp Tensor reader)."""
    rng = np.random.default_rng(0)
    fields = {
        "theta_i": rng.random(8).astype(np.float32),
        "vndf": rng.random((1, 8, 16, 16)).astype(np.float32),
        "description": np.frombuffer(b"hello", np.uint8),
        "jacobian": np.zeros(1, np.uint8),
    }
    p = tmp_path / "t.bsdf"
    ms.write_tensor_file(str(p), fields)
    back = ms.read_tensor_file(str(p))
    assert set(back) == set(fields)
    for k in fields:
        assert np.array_equal(back[k], fields[k]), k


def test_sample_pdf_consistency(brdf):
    """measured_pdf(sampled wi) equals the sample's own pdf (vndf invert is
    the exact inverse of the cell-CDF warp)."""
    rng = np.random.default_rng(1)
    n = 2048
    wo = _wo(30.0, n)
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lam = jnp.broadcast_to(jnp.asarray([450., 550., 650., 600.], jnp.float32),
                           (n, 4))
    wi, fr, pdf, valid = ms.measured_sample(brdf, wo, u2, lam)
    ok = np.asarray(valid)
    assert ok.mean() > 0.85
    p2 = np.asarray(ms.measured_pdf(brdf, wo, wi))
    rel = np.abs(p2[ok] - np.asarray(pdf)[ok]) / np.maximum(
        np.asarray(pdf)[ok], 1e-9)
    assert rel.max() < 5e-3


def test_f_matches_analytic_ggx(brdf):
    """The synthesized tables encode f = D*G2/(4 cos_o cos_i); evaluating
    through the full invert->spectra->ndf/sigma chain must reproduce it
    (validates the MeasuredBxDF::f math end to end)."""
    rng = np.random.default_rng(2)
    n = 512
    wo = _wo(30.0, n)
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lam = jnp.broadcast_to(jnp.asarray([450., 550., 650., 600.], jnp.float32),
                           (n, 4))
    wi, _, _, valid = ms.measured_sample(brdf, wo, u2, lam)
    sel = np.asarray(valid) & (np.asarray(wi)[:, 2] > 0.05)
    wiv = np.asarray(wi)[sel]
    wov = np.asarray(wo)[sel]

    def lam_g(ct):
        ct = np.clip(ct, 1e-6, 1)
        t2 = (1 - ct ** 2) / ct ** 2
        return (np.sqrt(1 + ALPHA ** 2 * t2) - 1) / 2

    h = wiv + wov
    h /= np.linalg.norm(h, axis=1, keepdims=True)
    ct2 = np.clip(h[:, 2], 0, 1) ** 2
    D = ALPHA ** 2 / np.maximum(np.pi * (ct2 * (ALPHA ** 2 - 1) + 1) ** 2,
                                1e-12)
    G2 = 1 / (1 + lam_g(wov[:, 2]) + lam_g(wiv[:, 2]))
    fa = D * G2 / (4 * wov[:, 2] * wiv[:, 2])
    fm = np.asarray(ms.measured_f(brdf, jnp.asarray(wov), jnp.asarray(wiv),
                                  lam[: wov.shape[0]]))[:, 1]
    ratio = fm / np.maximum(fa, 1e-9)
    assert abs(np.mean(ratio) - 1.0) < 0.02
    assert np.percentile(np.abs(ratio - 1.0), 90) < 0.05


def test_energy_conservation(brdf):
    """E[f cos/pdf] = directional albedo of the white synthetic BRDF:
    below 1 (single-scattering GGX loses energy) and above 0.8."""
    rng = np.random.default_rng(3)
    n = 8192
    wo = _wo(45.0, n)
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lam = jnp.broadcast_to(jnp.asarray([450., 550., 650., 600.], jnp.float32),
                           (n, 4))
    wi, fr, pdf, valid = ms.measured_sample(brdf, wo, u2, lam)
    ok = np.asarray(valid)
    est = (np.asarray(fr)[ok][:, 0] * np.asarray(wi)[ok][:, 2]
           / np.asarray(pdf)[ok]).mean()
    assert 0.75 < est <= 1.02


def test_path_render_with_measured(tmp_path):
    """End-to-end: a measured-material quad lit by a distant light renders
    non-black through the path integrator's measured dispatch."""
    from acceleratedvolrenderer_tpu.models import lights as lm
    from acceleratedvolrenderer_tpu.models import materials as mats
    from acceleratedvolrenderer_tpu.models import shapes as shp
    from acceleratedvolrenderer_tpu.models.integrators.path import li_path
    from acceleratedvolrenderer_tpu.utils import spectrum as sp

    brdf = ms.synthesize_ggx(alpha=0.4, res=32, n_theta=8)
    mat = mats.MeasuredMaterial(brdf=brdf)
    quad = shp.Quad(origin=np.array([-2, -2, 0.0], np.float32),
                    e1=np.array([4, 0, 0.0], np.float32),
                    e2=np.array([0, 4, 0.0], np.float32), material=mat)
    light = lm.DistantLight(direction=np.array([0, 0, -1.0], np.float32),
                            spectrum=sp.constant_spectrum(3.0))
    n = 256
    o = jnp.broadcast_to(jnp.asarray([0, 0, 3.0], jnp.float32), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0, 0, -1.0], jnp.float32), (n, 3))
    lam = jnp.broadcast_to(jnp.asarray([450., 550., 650., 600.], jnp.float32),
                           (n, 4))
    rng = jnp.arange(n, dtype=jnp.uint32)
    L, _ = li_path((quad,), [light], o, d, lam, rng, max_depth=2)
    Lm = float(jnp.mean(L))
    assert np.isfinite(Lm) and Lm > 0.01
