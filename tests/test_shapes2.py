"""BilinearPatch + Curve shape tests (shapes.h BilinearPatch, Curve)."""
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.models.shapes import BilinearPatch, Curve


def _ray(o, d):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    return o, d / jnp.linalg.norm(d)


def test_bilinear_planar_matches_quad():
    """A planar patch behaves like the parallelogram."""
    bp = BilinearPatch(p00=np.array([0., 0., 2.]), p10=np.array([1., 0., 2.]),
                       p01=np.array([0., 1., 2.]), p11=np.array([1., 1., 2.]))
    o, d = _ray([0.25, 0.25, 0.0], [0.0, 0.0, 1.0])
    t, n, uv = bp.intersect(o, d, jnp.inf)
    assert abs(float(t[0]) - 2.0) < 1e-4
    assert abs(abs(float(n[0, 2])) - 1.0) < 1e-4
    assert np.allclose(np.asarray(uv[0]), [0.25, 0.25], atol=1e-3)
    # miss outside
    o, d = _ray([1.5, 0.5, 0.0], [0.0, 0.0, 1.0])
    t, _, _ = bp.intersect(o, d, jnp.inf)
    assert not np.isfinite(float(t[0]))


def test_bilinear_nonplanar_hit():
    """Saddle patch: ray through the center hits at the bilinear point."""
    bp = BilinearPatch(p00=np.array([0., 0., 2.]), p10=np.array([1., 0., 3.]),
                       p01=np.array([0., 1., 3.]), p11=np.array([1., 1., 2.]))
    # center (u=v=0.5): z = 2.5
    o, d = _ray([0.5, 0.5, 0.0], [0.0, 0.0, 1.0])
    t, _, uv = bp.intersect(o, d, jnp.inf)
    assert abs(float(t[0]) - 2.5) < 1e-3
    assert np.allclose(np.asarray(uv[0]), [0.5, 0.5], atol=1e-3)


def test_bilinear_sample_on_surface():
    bp = BilinearPatch(p00=np.array([0., 0., 2.]), p10=np.array([1., 0., 3.]),
                       p01=np.array([0., 1., 3.]), p11=np.array([1., 1., 2.]))
    u2 = jnp.asarray([[0.3, 0.7]])
    p, n, pdf = bp.sample(u2)
    # verify the sampled point re-intersects at ~zero distance
    o = p - 0.5 * n
    t, _, _ = bp.intersect(o, n, jnp.inf)
    assert abs(float(t[0]) - 0.5) < 1e-3


def test_curve_hit_and_miss():
    cp = np.array([[0., 0., 2.], [0.33, 0., 2.], [0.66, 0., 2.], [1., 0., 2.]])
    cv = Curve(cp=cp, width0=0.2, width1=0.2)
    o, d = _ray([0.5, 0.0, 0.0], [0.0, 0.0, 1.0])
    t, n, uv = cv.intersect(o, d, jnp.inf)
    # straight curve, width (diameter) 0.2 -> radius 0.1: hit near z = 1.9
    assert abs(float(t[0]) - 1.9) < 0.02
    assert 0.4 < float(uv[0, 0]) < 0.6
    o, d = _ray([0.5, 0.5, 0.0], [0.0, 0.0, 1.0])   # offset: miss
    t, _, _ = cv.intersect(o, d, jnp.inf)
    assert not np.isfinite(float(t[0]))


def test_curve_bent():
    cp = np.array([[0., 0., 2.], [0.4, 0.5, 2.], [0.6, 0.5, 2.], [1., 0., 2.]])
    cv = Curve(cp=cp, width0=0.1, width1=0.1)
    # middle of the curve bulges to y ~ 0.375
    o, d = _ray([0.5, 0.375, 0.0], [0.0, 0.0, 1.0])
    t, _, _ = cv.intersect(o, d, jnp.inf)
    assert np.isfinite(float(t[0]))
