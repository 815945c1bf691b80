"""Uniform-grid triangle accelerator tests (ops/trigrid — the
BVHAggregate/KdTreeAggregate role, cpu/aggregates.h, reshaped as DDA over
a CSR cell->triangle grid)."""
import numpy as np
import jax.numpy as jnp
import dataclasses

from acceleratedvolrenderer_tpu.models import shapes as shp
from acceleratedvolrenderer_tpu.ops import trigrid


def _random_mesh(n_tri, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    c = rng.random((n_tri, 3)) * 2 - 1
    a = c + rng.normal(0, 0.08, (n_tri, 3))
    b = c + rng.normal(0, 0.08, (n_tri, 3))
    v = np.concatenate([c, a, b]).astype(np.float32) * scale
    idx = np.stack([np.arange(n_tri), np.arange(n_tri) + n_tri,
                    np.arange(n_tri) + 2 * n_tri], -1).astype(np.int32)
    return v, idx


def test_grid_matches_bruteforce():
    """Grid traversal returns the same closest hit as the O(T) scan."""
    v, idx = _random_mesh(800, seed=3)
    brute = shp.TriangleMesh(vertices=v, indices=idx,
                             grid_threshold=10**9)
    grid = shp.TriangleMesh(vertices=v, indices=idx, grid_threshold=1)
    rng = np.random.default_rng(1)
    n = 512
    o = jnp.asarray(rng.random((n, 3)) * 4 - 2, jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                    jnp.float32)
    tb, nb, uvb = brute.intersect(o, d, jnp.inf)
    tg, ng, uvg = grid.intersect(o, d, jnp.inf)
    tb, tg = np.asarray(tb), np.asarray(tg)
    hit = np.isfinite(tb)
    assert np.array_equal(hit, np.isfinite(tg))
    assert np.allclose(tb[hit], tg[hit], rtol=1e-5, atol=1e-5)
    # same triangle -> same normal (up to fp)
    assert np.allclose(np.asarray(nb)[hit], np.asarray(ng)[hit],
                       rtol=1e-4, atol=1e-4)


def test_grid_misses_and_tmax():
    """Rays missing the bbox return inf; t_max clips hits."""
    v, idx = _random_mesh(600, seed=5)
    mesh = shp.TriangleMesh(vertices=v, indices=idx, grid_threshold=1)
    n = 64
    o = jnp.broadcast_to(jnp.asarray([5.0, 5.0, 5.0]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    t, _, _ = mesh.intersect(o, d, jnp.inf)
    assert not np.isfinite(np.asarray(t)).any()
    # a ray that hits, clipped by t_max before the surface
    o2 = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    d2 = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t_hit, _, _ = mesh.intersect(o2, d2, jnp.inf)
    if np.isfinite(float(t_hit[0])):
        t_clip, _, _ = mesh.intersect(o2, d2, float(t_hit[0]) * 0.5)
        assert not np.isfinite(float(t_clip[0]))


def test_grid_build_csr_consistent():
    """Every triangle id appears in every cell its AABB overlaps."""
    v, idx = _random_mesh(100, seed=7)
    g = trigrid.build_tri_grid(v, idx)
    rx, ry, rz = g.res
    cs = np.asarray(g.cell_start)
    ids = np.asarray(g.tri_ids)
    assert cs[0] == 0 and cs[-1] == ids.shape[0] or ids.shape[0] == 1
    assert (np.diff(cs) >= 0).all()
    # spot check: centroid cell of each triangle contains it
    p0 = np.asarray(g.p0)
    cen = p0 + (np.asarray(g.e1) + np.asarray(g.e2)) / 3
    lo, hi = np.asarray(g.bbox_lo), np.asarray(g.bbox_hi)
    cc = np.clip(((cen - lo) / (hi - lo) * [rx, ry, rz]).astype(int),
                 0, np.array([rx, ry, rz]) - 1)
    flat = (cc[:, 2] * ry + cc[:, 1]) * rx + cc[:, 0]
    for t in range(0, 100, 7):
        cell_ids = ids[cs[flat[t]]: cs[flat[t] + 1]]
        assert t in cell_ids
