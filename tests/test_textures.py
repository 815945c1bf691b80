"""Noise/procedural texture tests (textures.h family)."""
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.models import textures as tx


def _uv(n=512, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((n, 2)), jnp.float32)


def test_perlin_range_and_smoothness():
    uv = _uv()
    p = jnp.concatenate([uv * 10, jnp.zeros((uv.shape[0], 1))], -1)
    n = np.asarray(tx.perlin_noise(p))
    assert np.abs(n).max() <= 1.5
    assert n.std() > 0.05            # not constant
    # lattice points have zero gradient-noise value
    lat = tx.perlin_noise(jnp.asarray([[1.0, 2.0, 3.0]]))
    assert abs(float(lat[0])) < 1e-5


def test_fbm_turbulence():
    uv = _uv()
    f = np.asarray(tx.FBmTexture().eval(uv))
    w = np.asarray(tx.WrinkledTexture().eval(uv))
    assert np.isfinite(f).all() and np.isfinite(w).all()
    assert (w >= 0).all()            # turbulence sums |noise|
    assert f.std() > 0.05


def test_marble_windy_dots_bilerp():
    uv = _uv()
    m = np.asarray(tx.MarbleTexture().eval(uv))
    assert m.shape[-1] == 3 and (m >= 0).all() and (m <= 1).all()
    wd = np.asarray(tx.WindyTexture().eval(uv))
    assert (wd >= 0).all()
    d = np.asarray(tx.DotsTexture().eval(uv))
    assert set(np.unique(d)).issubset({0.0, 1.0})
    b = np.asarray(tx.BilerpTexture(0, 1, 0, 1).eval(
        jnp.asarray([[0.0, 0.0], [0.0, 1.0], [0.5, 0.5]])))
    assert abs(b[0]) < 1e-6 and abs(b[1] - 1) < 1e-6 and abs(b[2] - 0.5) < 1e-6
