"""Uniform-grid triangle acceleration — the aggregate layer for meshes.

Reference: BVHAggregate / KdTreeAggregate (cpu/aggregates.h:28/:78) — the
reference's closest-hit structures over primitive soups.

TPU reshape: pointer-chasing BVH descent is hostile to lockstep SIMD; the
volumetric core already proves the idiomatic alternative — a uniform grid
walked with Amanatides–Woo DDA (the exact machinery of the majorant march,
ops/dda.py).  Host-side numpy builds a CSR cell->triangle table; the device
traversal is one `lax.while_loop` where every lane either consumes its
current cell's triangle list in fixed-size K chunks (one gather + one
batched Möller–Trumbore per iteration) or DDA-steps to the next cell.  A
hit terminates the lane once it is confirmed inside the current cell
(best_t <= cell exit t), the standard grid closest-hit rule.

Build cost is O(triangle-cell pairs) fully vectorized; traversal is
O(cells along ray + local triangles) instead of O(T) per ray.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-4


class TriGridData(NamedTuple):
    p0: jnp.ndarray          # (T, 3)
    e1: jnp.ndarray          # (T, 3)
    e2: jnp.ndarray          # (T, 3)
    cell_start: jnp.ndarray  # (ncells + 1,) int32 CSR offsets
    tri_ids: jnp.ndarray     # (P,) int32
    bbox_lo: jnp.ndarray     # (3,)
    bbox_hi: jnp.ndarray     # (3,)
    res: tuple               # (rx, ry, rz) static


def build_tri_grid(vertices: np.ndarray, indices: np.ndarray,
                   res=None) -> TriGridData:
    """Host-side CSR grid build (vectorized over triangle-cell pairs)."""
    v = np.asarray(vertices, np.float64)
    idx = np.asarray(indices, np.int64)
    T = idx.shape[0]
    p0 = v[idx[:, 0]]
    p1 = v[idx[:, 1]]
    p2 = v[idx[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    blo = lo.min(0)
    bhi = hi.max(0)
    ext = np.maximum(bhi - blo, 1e-6)
    blo = blo - 1e-4 * ext
    bhi = bhi + 1e-4 * ext
    ext = bhi - blo
    if res is None:
        # pbrt's grid heuristic: ~cbrt(T) cells per axis, extent-weighted
        r = max(int(np.ceil((3.0 * T) ** (1.0 / 3.0))), 1)
        res = tuple(int(np.clip(np.ceil(r * e / ext.max()), 1, 128))
                    for e in ext)
    rx, ry, rz = res
    rv = np.array([rx, ry, rz], np.float64)

    rv_hi = np.array([rx - 1, ry - 1, rz - 1], np.int64)
    c0 = np.clip(((lo - blo) / ext * rv).astype(np.int64), 0, rv_hi)
    c1 = np.clip(((hi - blo) / ext * rv).astype(np.int64), 0, rv_hi)
    spans = (c1 - c0 + 1)
    counts = spans.prod(1)
    P = int(counts.sum())
    pair_tri = np.repeat(np.arange(T), counts)
    first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    r = np.arange(P) - np.repeat(first, counts)
    sx = spans[pair_tri, 0]
    sy = spans[pair_tri, 1]
    dx = r % sx
    dy = (r // sx) % sy
    dz = r // (sx * sy)
    cx = c0[pair_tri, 0] + dx
    cy = c0[pair_tri, 1] + dy
    cz = c0[pair_tri, 2] + dz
    cell = (cz * ry + cy) * rx + cx
    order = np.argsort(cell, kind="stable")
    tri_ids = pair_tri[order].astype(np.int32)
    cell_sorted = cell[order]
    ncells = rx * ry * rz
    cell_start = np.searchsorted(cell_sorted,
                                 np.arange(ncells + 1)).astype(np.int32)
    e1 = (p1 - p0).astype(np.float32)
    e2 = (p2 - p0).astype(np.float32)
    return TriGridData(
        p0=jnp.asarray(p0.astype(np.float32)), e1=jnp.asarray(e1),
        e2=jnp.asarray(e2),
        cell_start=jnp.asarray(cell_start),
        tri_ids=jnp.asarray(tri_ids if P else np.zeros(1, np.int32)),
        bbox_lo=jnp.asarray(blo.astype(np.float32)),
        bbox_hi=jnp.asarray(bhi.astype(np.float32)),
        res=(int(rx), int(ry), int(rz)),
    )


def intersect_grid(g: TriGridData, o, d, t_max, k_tris: int = 8):
    """Closest-hit grid traversal.

    Returns (t (N,), tri_id (N,) int32 [-1 = miss], u, v)."""
    N = o.shape[0]
    rx, ry, rz = g.res
    res_f = jnp.asarray([rx, ry, rz], jnp.float32)
    res_i = jnp.asarray([rx, ry, rz], jnp.int32)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    inv_ext = 1.0 / (g.bbox_hi - g.bbox_lo)

    # ---- bbox entry (slab test) ----
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                            jnp.where(d >= 0, 1e-12, -1e-12))
    t0s = (g.bbox_lo - o) * inv_d
    t1s = (g.bbox_hi - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0s, t1s), -1)
    t_far = jnp.min(jnp.maximum(t0s, t1s), -1)
    t_enter = jnp.maximum(t_near, 0.0)
    inside = (t_enter <= t_far) & (t_enter < t_max)

    # ---- DDA setup at the entry point (grid space) ----
    p_ent = o + (t_enter + 1e-5)[:, None] * d
    gp = (p_ent - g.bbox_lo) * inv_ext * res_f
    voxel = jnp.clip(gp.astype(jnp.int32), 0, res_i - 1)
    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
    cell_w = (g.bbox_hi - g.bbox_lo) / res_f
    nxt_bound = g.bbox_lo + (voxel + (step > 0)).astype(jnp.float32) * cell_w
    next_t = (nxt_bound - o) * inv_d
    next_t = jnp.where(jnp.abs(d) > 1e-12, next_t, jnp.inf)
    dt = jnp.abs(cell_w * inv_d)
    dt = jnp.where(jnp.abs(d) > 1e-12, dt, jnp.inf)

    flat0 = (voxel[:, 2] * ry + voxel[:, 1]) * rx + voxel[:, 0]
    cur0 = g.cell_start[flat0]
    end0 = g.cell_start[flat0 + 1]

    class S(NamedTuple):
        active: jnp.ndarray
        voxel: jnp.ndarray
        next_t: jnp.ndarray
        cell_exit: jnp.ndarray
        cur: jnp.ndarray
        end: jnp.ndarray
        best_t: jnp.ndarray
        best_id: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray

    s0 = S(
        active=inside,
        voxel=voxel, next_t=next_t,
        cell_exit=jnp.minimum(jnp.min(next_t, -1), t_far),
        cur=jnp.where(inside, cur0, 0),
        end=jnp.where(inside, end0, 0),
        best_t=jnp.full((N,), jnp.inf),
        best_id=jnp.full((N,), -1, jnp.int32),
        best_u=jnp.zeros((N,)),
        best_v=jnp.zeros((N,)),
    )

    n_ids = g.tri_ids.shape[0]

    def body(s: S) -> S:
        # --- lanes with triangles pending: test the next K ---
        testing = s.active & (s.cur < s.end)
        offs = s.cur[:, None] + jnp.arange(k_tris, dtype=jnp.int32)
        valid = testing[:, None] & (offs < s.end[:, None])
        ids = jnp.take(g.tri_ids, jnp.clip(offs, 0, n_ids - 1), axis=0)
        tp0 = jnp.take(g.p0, ids, axis=0)          # (N, K, 3)
        te1 = jnp.take(g.e1, ids, axis=0)
        te2 = jnp.take(g.e2, ids, axis=0)
        h = jnp.cross(d[:, None, :], te2)
        a = jnp.sum(te1 * h, -1)
        inv_a = 1.0 / jnp.where(jnp.abs(a) > 1e-12, a, 1e-12)
        sv = o[:, None, :] - tp0
        u = jnp.sum(sv * h, -1) * inv_a
        q = jnp.cross(sv, te1)
        v = jnp.sum(d[:, None, :] * q, -1) * inv_a
        t = jnp.sum(te2 * q, -1) * inv_a
        ok = (valid & (jnp.abs(a) > 1e-12) & (u >= 0) & (v >= 0)
              & (u + v <= 1) & (t > _EPS) & (t < t_max[:, None])
              & (t < s.best_t[:, None]))
        t = jnp.where(ok, t, jnp.inf)
        ci = jnp.argmin(t, axis=1)
        ct = jnp.take_along_axis(t, ci[:, None], 1)[:, 0]
        closer = ct < s.best_t
        best_t = jnp.where(closer, ct, s.best_t)
        best_id = jnp.where(
            closer, jnp.take_along_axis(ids, ci[:, None], 1)[:, 0],
            s.best_id)
        best_u = jnp.where(
            closer, jnp.take_along_axis(u, ci[:, None], 1)[:, 0], s.best_u)
        best_v = jnp.where(
            closer, jnp.take_along_axis(v, ci[:, None], 1)[:, 0], s.best_v)
        cur = jnp.where(testing, s.cur + k_tris, s.cur)

        # --- lanes whose cell is exhausted: confirm hit or DDA-step ---
        stepping = s.active & ~testing
        hit_here = stepping & (best_t <= s.cell_exit + 1e-5)
        axis = jnp.argmin(s.next_t, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        vox2 = s.voxel + onehot * step
        out = jnp.any((vox2 < 0) | (vox2 >= res_i), axis=-1)
        nt2 = jnp.where(onehot != 0, s.next_t + dt, s.next_t)
        past = jnp.min(s.next_t, -1) > jnp.minimum(t_max, t_far)
        die = stepping & (hit_here | out | past)
        move = stepping & ~die
        voxel_n = jnp.where(move[:, None], vox2, s.voxel)
        next_tn = jnp.where(move[:, None], nt2, s.next_t)
        cell_exit = jnp.where(
            move, jnp.minimum(jnp.min(next_tn, -1), t_far), s.cell_exit)
        flat = ((voxel_n[:, 2] * ry + voxel_n[:, 1]) * rx + voxel_n[:, 0])
        flat = jnp.clip(flat, 0, rx * ry * rz - 1)
        cur = jnp.where(move, g.cell_start[flat], cur)
        end = jnp.where(move, g.cell_start[flat + 1], s.end)
        return S(
            active=s.active & ~die,
            voxel=voxel_n, next_t=next_tn, cell_exit=cell_exit,
            cur=cur, end=end,
            best_t=best_t, best_id=best_id, best_u=best_u, best_v=best_v,
        )

    def cond(s: S):
        return jnp.any(s.active)

    s_end = jax.lax.while_loop(cond, body, s0)
    return s_end.best_t, s_end.best_id, s_end.best_u, s_end.best_v
