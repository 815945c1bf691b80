"""Statistical tests of sampling warps (pattern: reference sampling_test.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.ops import warps


def _u(key, shape):
    return jax.random.uniform(key, shape)


def test_sample_exponential_mean():
    key = jax.random.PRNGKey(0)
    u = _u(key, (200_000,))
    a = 2.5
    x = warps.sample_exponential(u, a)
    assert abs(float(jnp.mean(x)) - 1.0 / a) < 5e-3
    assert float(x.min()) >= 0.0


def test_sample_discrete3():
    key = jax.random.PRNGKey(1)
    u = _u(key, (200_000,))
    idx, pdf, u2 = warps.sample_discrete3(u, 1.0, 2.0, 5.0)
    counts = np.bincount(np.asarray(idx), minlength=3) / idx.shape[0]
    np.testing.assert_allclose(counts, [1 / 8, 2 / 8, 5 / 8], atol=5e-3)
    # pdf matches selection probability
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(jnp.take(jnp.array([1 / 8, 2 / 8, 5 / 8]), idx)), rtol=1e-5
    )
    # remapped u stays uniform
    assert abs(float(jnp.mean(u2)) - 0.5) < 5e-3
    assert float(u2.max()) < 1.0


def test_uniform_sphere():
    key = jax.random.PRNGKey(2)
    u = _u(key, (100_000, 2))
    v = warps.sample_uniform_sphere(u)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(v, axis=-1)), 1.0, atol=1e-5)
    # each octant gets 1/8
    frac = float(jnp.mean((v[:, 0] > 0) & (v[:, 1] > 0) & (v[:, 2] > 0)))
    assert abs(frac - 0.125) < 5e-3
    # mean direction ~ 0
    np.testing.assert_allclose(np.asarray(jnp.mean(v, axis=0)), 0.0, atol=1e-2)


def test_cosine_hemisphere():
    key = jax.random.PRNGKey(3)
    u = _u(key, (100_000, 2))
    v = warps.sample_cosine_hemisphere(u)
    assert float(v[:, 2].min()) >= 0.0
    # E[cos theta] for cosine-weighted = 2/3
    assert abs(float(jnp.mean(v[:, 2])) - 2.0 / 3.0) < 5e-3


def test_concentric_disk():
    key = jax.random.PRNGKey(4)
    u = _u(key, (100_000, 2))
    d = warps.sample_uniform_disk_concentric(u)
    r2 = d[:, 0] ** 2 + d[:, 1] ** 2
    assert float(r2.max()) <= 1.0 + 1e-6
    # uniform on disk: E[r^2] = 1/2
    assert abs(float(jnp.mean(r2)) - 0.5) < 5e-3


def test_uniform_cone():
    key = jax.random.PRNGKey(5)
    ctm = 0.8
    u = _u(key, (100_000, 2))
    v = warps.sample_uniform_cone(u, ctm)
    assert float(v[:, 2].min()) >= ctm - 1e-6
    # E[cos theta] = (1 + ctm)/2 for uniform in cos
    assert abs(float(jnp.mean(v[:, 2])) - (1 + ctm) / 2) < 5e-3


def test_power_heuristic():
    # matches analytic values
    assert abs(float(warps.power_heuristic(1, 1.0, 1, 1.0)) - 0.5) < 1e-6
    assert float(warps.power_heuristic(1, 10.0, 1, 0.1)) > 0.99
    assert float(warps.power_heuristic(1, 0.0, 1, 0.0)) == 0.0


def test_uniform_triangle():
    key = jax.random.PRNGKey(6)
    u = _u(key, (50_000, 2))
    b = warps.sample_uniform_triangle(u)
    bn = np.asarray(b)
    assert np.all(bn >= -1e-6)
    np.testing.assert_allclose(bn.sum(-1), 1.0, atol=1e-5)
