"""Vector/transform/bounds math tests (pattern: reference vecmath_test.cpp)."""
import jax.numpy as jnp
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.utils import vecmath as vm


def test_normalize_dot_cross():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(vm.length(n), [1.0, 1.0], atol=1e-6)
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(vm.cross(a, b), [0.0, 0.0, 1.0], atol=1e-7)
    assert float(vm.dot(a, b)) == 0.0


def test_coordinate_system_orthonormal():
    rng = np.random.default_rng(1)
    v = vm.normalize(jnp.asarray(rng.normal(size=(128, 3)), jnp.float32))
    t, b = vm.coordinate_system(v)
    np.testing.assert_allclose(vm.dot(t, v), 0.0, atol=1e-6)
    np.testing.assert_allclose(vm.dot(b, v), 0.0, atol=1e-6)
    np.testing.assert_allclose(vm.dot(t, b), 0.0, atol=1e-6)
    np.testing.assert_allclose(vm.length(t), 1.0, atol=1e-5)
    np.testing.assert_allclose(vm.length(b), 1.0, atol=1e-5)


def test_local_frame_roundtrip():
    rng = np.random.default_rng(2)
    z = vm.normalize(jnp.asarray(rng.normal(size=(16, 3)), jnp.float32))
    x, y, zz = vm.frame_from_z(z)
    w = vm.normalize(jnp.asarray(rng.normal(size=(16, 3)), jnp.float32))
    wl = vm.to_local(x, y, zz, w)
    w2 = vm.from_local(x, y, zz, wl)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-5)


def test_transform_compose_inverse():
    t = vm.translate([1.0, 2.0, 3.0]) @ vm.rotate(37.0, [0.0, 1.0, 0.0]) @ vm.scale(2.0)
    p = jnp.array([0.5, -1.0, 2.0])
    q = t.apply_point(p)
    back = t.inverse().apply_point(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.m @ t.m_inv), np.eye(4), atol=1e-5)


def test_look_at():
    t = vm.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0])
    # camera-space +z maps to world direction toward the look point
    d = t.apply_vector(jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(d), [0, 0, 1], atol=1e-6)
    o = t.apply_point(jnp.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(o), [0, 0, -5], atol=1e-6)


def test_intersect_aabb():
    o = jnp.array([[-2.0, 0.5, 0.5], [0.5, 0.5, 0.5], [-2.0, 5.0, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    hit, t0, t1 = vm.intersect_aabb(o, d, jnp.inf, lo, hi)
    assert bool(hit[0]) and bool(hit[1]) and not bool(hit[2])
    np.testing.assert_allclose(float(t0[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(t1[0]), 3.0, rtol=1e-5)
    # ray starting inside: t0 clamps to 0
    np.testing.assert_allclose(float(t0[1]), 0.0, atol=1e-6)


def test_equal_area_square_to_sphere():
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.random((256, 2)), jnp.float32)
    v = vm.equal_area_square_to_sphere(p)
    np.testing.assert_allclose(np.asarray(vm.length(v)), 1.0, atol=1e-4)
