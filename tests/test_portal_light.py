"""PortalImageInfiniteLight tests.

Reference: src/pbrt/lights.{h,cpp} PortalImageInfiniteLight (lights.h:639,
lights.cpp:1109-1337) — rectified portal parameterization, windowed
piecewise-constant sampling, pdf = mapPDF / duv_dw.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from acceleratedvolrenderer_tpu.models import lights as lm

PORTAL = np.array([[-1, -1, 5], [-1, 1, 5], [1, 1, 5], [1, -1, 5]], np.float32)


@pytest.fixture(scope="module")
def light():
    rng = np.random.default_rng(7)
    img = rng.random((64, 64, 3), np.float32) + 0.05
    return lm.PortalImageInfiniteLight(img, PORTAL, scale=1.0)


def test_sample_pdf_consistency(light):
    """pdf_li(sampled wi) must equal the sample's own pdf (piecewise-constant
    density: bisection on the bilinear SAT is exact inversion)."""
    rng = np.random.default_rng(3)
    n = 2048
    p = jnp.zeros((n, 3))
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lam = jnp.full((n, 4), 550.0)
    s = light.sample_li(p, u2, lam)
    assert float(jnp.mean(s.valid.astype(jnp.float32))) > 0.99
    pl = np.asarray(light.pdf_li(p, s.wi))
    ok = np.asarray(s.valid)
    rel = np.abs(pl[ok] - np.asarray(s.pdf)[ok]) / np.asarray(s.pdf)[ok]
    assert rel.max() < 1e-4


def test_pdf_integrates_to_one(light):
    """∫ pdf_li dω over the sphere ≈ 1 (change of variables through the
    dw/duv Jacobian, lights.cpp:1252-1266)."""
    rng = np.random.default_rng(5)
    d = rng.standard_normal((100000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pli = np.asarray(light.pdf_li(jnp.zeros((d.shape[0], 3)),
                                  jnp.asarray(d, jnp.float32)))
    assert abs(pli.mean() * 4 * np.pi - 1.0) < 0.06


def test_energy_unbiased(light):
    """E[L/pdf] from sampling matches the directly integrated portal
    radiance (the estimator the NEE path uses)."""
    rng = np.random.default_rng(11)
    n = 8192
    p = jnp.zeros((n, 3))
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lam = jnp.full((n, 4), 550.0)
    s = light.sample_li(p, u2, lam)
    ok = np.asarray(s.valid)
    est = (np.asarray(s.L)[ok, 0] / np.asarray(s.pdf)[ok]).mean()
    d = rng.standard_normal((200000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    le = np.asarray(light.le_escaped(jnp.asarray(d, jnp.float32),
                                     jnp.full((d.shape[0], 4), 550.0)))[:, 0]
    ref = le.mean() * 4 * np.pi
    assert abs(est - ref) / ref < 0.1


def test_back_side_invalid(light):
    """Points behind the portal plane (frame z <= 0) get no samples —
    ImageFromRender returns nullopt for w.z <= 0 (lights.h:688)."""
    p = jnp.asarray(np.array([[0.0, 0.0, 20.0]] * 4, np.float32))
    u2 = jnp.asarray(np.random.default_rng(0).random((4, 2)), jnp.float32)
    lam = jnp.full((4, 4), 550.0)
    s = light.sample_li(p, u2, lam)
    assert not bool(jnp.any(s.valid))
    # pdf of arbitrary directions from behind is 0
    d = jnp.asarray(np.array([[0, 0, 1.0]] * 4, np.float32))
    assert float(jnp.max(light.pdf_li(p, d))) == 0.0


def test_le_escaped_windowed(light):
    """Directions outside the portal window (seen from the scene center)
    return zero radiance (lights.cpp:1208 Le bounds check)."""
    lam = jnp.full((2, 4), 550.0)
    d = jnp.asarray(np.array([[0, 0, 1.0], [0, 0, -1.0]], np.float32))
    le = np.asarray(light.le_escaped(d, lam))
    assert le[0].sum() > 0          # toward the portal
    assert le[1].sum() == 0         # away from it
