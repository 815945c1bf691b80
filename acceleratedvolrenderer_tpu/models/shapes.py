"""Shapes & primitives — vectorized intersections + area sampling.

Reference: src/pbrt/shapes.{h,cpp} (Sphere shapes.h:107, Disk :426,
Cylinder :596, Triangle :855) and cpu/aggregates BVH.  The TPU-native
aggregate is a static python list of primitives intersected branch-free over
the ray batch with a min-reduce — no BVH walk, no pointer chasing (SURVEY.md
§2.3 Aggregates note).  Triangle meshes intersect all-triangles-per-ray in
fixed-size chunks under `lax.scan` (bounded memory; the wavefront
"IntersectClosest over a queue" collapsed to a dense batch op).

Every shape provides:
  intersect(o, d, t_max) -> (t, n, uv)   batched closest-hit
  area() -> float                        total surface area
  sample(u2) -> (p, n, pdf_area)         uniform-area point sampling
                                         (area lights; graph builder)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm
from ..utils.math import safe_sqrt

_EPS = 1e-4


class Hit(NamedTuple):
    t: jnp.ndarray        # (N,) inf where no hit
    n: jnp.ndarray        # (N, 3) geometric normal
    prim_id: jnp.ndarray  # (N,) int32, -1 where none
    uv: jnp.ndarray       # (N, 2) surface parameterization


@dataclass(frozen=True)
class Sphere:
    center: np.ndarray
    radius: float
    material: Optional[object] = None    # None => medium interface (invisible)

    def intersect(self, o, d, t_max):
        c = jnp.asarray(self.center, jnp.float32)
        oc = o - c
        b = vm.dot(oc, d)
        cq = vm.length_squared(oc) - self.radius ** 2
        disc = b * b - cq
        sq = safe_sqrt(disc)
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where(t0 > _EPS, t0, jnp.where(t1 > _EPS, t1, jnp.inf))
        t = jnp.where((disc >= 0) & (t < t_max), t, jnp.inf)
        p = o + t[..., None] * d
        n = vm.normalize(p - c)
        # spherical uv (pbrt: phi/2pi, theta/pi)
        phi = jnp.arctan2(n[..., 1], n[..., 0])
        u = (phi / (2 * jnp.pi)) % 1.0
        v = jnp.arccos(jnp.clip(n[..., 2], -1, 1)) / jnp.pi
        return t, n, jnp.stack([u, v], -1)

    def area(self) -> float:
        return float(4.0 * np.pi * self.radius ** 2)

    def sample(self, u2):
        z = 1.0 - 2.0 * u2[..., 0]
        r = safe_sqrt(1.0 - z * z)
        phi = 2.0 * jnp.pi * u2[..., 1]
        n = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
        p = jnp.asarray(self.center, jnp.float32) + self.radius * n
        pdf = jnp.full(u2.shape[:-1], 1.0 / self.area())
        return p, n, pdf


@dataclass(frozen=True)
class Quad:
    """Parallelogram: origin + edges e1, e2 (pbrt BilinearPatch, planar)."""
    origin: np.ndarray
    e1: np.ndarray
    e2: np.ndarray
    material: Optional[object] = None

    def intersect(self, o, d, t_max):
        p0 = jnp.asarray(self.origin, jnp.float32)
        e1 = jnp.asarray(self.e1, jnp.float32)
        e2 = jnp.asarray(self.e2, jnp.float32)
        n = jnp.cross(e1, e2)
        nn = n / jnp.maximum(jnp.linalg.norm(n), 1e-24)
        denom = vm.dot(d, nn)
        t = vm.dot(p0 - o, nn) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        p = o + t[..., None] * d
        rel = p - p0
        a11 = vm.dot(e1, e1)
        a12 = vm.dot(e1, e2)
        a22 = vm.dot(e2, e2)
        det = a11 * a22 - a12 * a12
        b1 = vm.dot(rel, e1)
        b2 = vm.dot(rel, e2)
        u = (a22 * b1 - a12 * b2) / det
        v = (a11 * b2 - a12 * b1) / det
        ok = (
            (jnp.abs(denom) > 1e-9) & (t > _EPS) & (t < t_max)
            & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        )
        t = jnp.where(ok, t, jnp.inf)
        nrm = jnp.broadcast_to(nn, o.shape)
        return t, nrm, jnp.stack([u, v], -1)

    def area(self) -> float:
        return float(np.linalg.norm(np.cross(self.e1, self.e2)))

    def sample(self, u2):
        p0 = jnp.asarray(self.origin, jnp.float32)
        e1 = jnp.asarray(self.e1, jnp.float32)
        e2 = jnp.asarray(self.e2, jnp.float32)
        p = p0 + u2[..., 0:1] * e1 + u2[..., 1:2] * e2
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-24)
        n = jnp.broadcast_to(n, p.shape)
        pdf = jnp.full(u2.shape[:-1], 1.0 / self.area())
        return p, n, pdf


@dataclass(frozen=True)
class Disk:
    """Disk at `center` with unit `normal`, radius (pbrt shapes.h:426)."""
    center: np.ndarray
    normal: np.ndarray
    radius: float
    inner_radius: float = 0.0
    material: Optional[object] = None

    def _frame(self):
        n = np.asarray(self.normal, np.float64)
        n = n / np.linalg.norm(n)
        up = np.array([0.0, 0.0, 1.0]) if abs(n[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
        t1 = np.cross(up, n)
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        return (jnp.asarray(t1, jnp.float32), jnp.asarray(t2, jnp.float32),
                jnp.asarray(n, jnp.float32))

    def intersect(self, o, d, t_max):
        t1, t2, nn = self._frame()
        c = jnp.asarray(self.center, jnp.float32)
        denom = vm.dot(d, nn)
        t = vm.dot(c - o, nn) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        p = o + t[..., None] * d
        rel = p - c
        r2 = vm.length_squared(rel)
        ok = ((jnp.abs(denom) > 1e-9) & (t > _EPS) & (t < t_max)
              & (r2 <= self.radius ** 2) & (r2 >= self.inner_radius ** 2))
        t = jnp.where(ok, t, jnp.inf)
        u = vm.dot(rel, t1) / self.radius * 0.5 + 0.5
        v = vm.dot(rel, t2) / self.radius * 0.5 + 0.5
        return t, jnp.broadcast_to(nn, o.shape), jnp.stack([u, v], -1)

    def area(self) -> float:
        return float(np.pi * (self.radius ** 2 - self.inner_radius ** 2))

    def sample(self, u2):
        t1, t2, nn = self._frame()
        r = jnp.sqrt(self.inner_radius ** 2
                     + u2[..., 0] * (self.radius ** 2 - self.inner_radius ** 2))
        phi = 2.0 * jnp.pi * u2[..., 1]
        p = (jnp.asarray(self.center, jnp.float32)
             + r[..., None] * (jnp.cos(phi)[..., None] * t1
                               + jnp.sin(phi)[..., None] * t2))
        n = jnp.broadcast_to(nn, p.shape)
        pdf = jnp.full(u2.shape[:-1], 1.0 / self.area())
        return p, n, pdf


@dataclass(frozen=True)
class Cylinder:
    """Open cylinder from p0 to p1 with radius (pbrt shapes.h:596)."""
    p0: np.ndarray
    p1: np.ndarray
    radius: float
    material: Optional[object] = None

    def _axis(self):
        a = np.asarray(self.p1, np.float64) - np.asarray(self.p0, np.float64)
        h = np.linalg.norm(a)
        return jnp.asarray(a / h, jnp.float32), float(h)

    def intersect(self, o, d, t_max):
        axis, h = self._axis()
        pa = jnp.asarray(self.p0, jnp.float32)
        oc = o - pa
        d_par = vm.dot(d, axis)
        oc_par = vm.dot(oc, axis)
        d_perp = d - d_par[..., None] * axis
        oc_perp = oc - oc_par[..., None] * axis
        a = vm.length_squared(d_perp)
        b = vm.dot(d_perp, oc_perp)
        c = vm.length_squared(oc_perp) - self.radius ** 2
        disc = b * b - a * c
        sq = safe_sqrt(disc)
        inv_a = 1.0 / jnp.maximum(a, 1e-12)
        t0 = (-b - sq) * inv_a
        t1 = (-b + sq) * inv_a
        z0 = oc_par + t0 * d_par
        z1 = oc_par + t1 * d_par
        ok0 = (t0 > _EPS) & (z0 >= 0) & (z0 <= h)
        ok1 = (t1 > _EPS) & (z1 >= 0) & (z1 <= h)
        t = jnp.where(ok0, t0, jnp.where(ok1, t1, jnp.inf))
        t = jnp.where((disc >= 0) & (a > 1e-12) & (t < t_max), t, jnp.inf)
        p = o + t[..., None] * d
        z = vm.dot(p - pa, axis)
        n = p - pa - z[..., None] * axis
        n = vm.normalize(n)
        rel = p - pa - z[..., None] * axis
        phi = jnp.arctan2(vm.dot(rel, _perp2(axis)), vm.dot(rel, _perp1(axis)))
        uv = jnp.stack([(phi / (2 * jnp.pi)) % 1.0, z / h], -1)
        return t, n, uv

    def area(self) -> float:
        _, h = self._axis()
        return float(2.0 * np.pi * self.radius * h)

    def sample(self, u2):
        axis, h = self._axis()
        pa = jnp.asarray(self.p0, jnp.float32)
        phi = 2.0 * jnp.pi * u2[..., 0]
        z = u2[..., 1] * h
        t1 = _perp1(axis)
        t2 = _perp2(axis)
        n = jnp.cos(phi)[..., None] * t1 + jnp.sin(phi)[..., None] * t2
        p = pa + z[..., None] * axis + self.radius * n
        pdf = jnp.full(u2.shape[:-1], 1.0 / self.area())
        return p, n, pdf


def _perp1(axis):
    up = jnp.where(jnp.abs(axis[2]) < 0.9,
                   jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0]))
    t = jnp.cross(up, axis)
    return t / jnp.maximum(jnp.linalg.norm(t), 1e-12)


def _perp2(axis):
    return jnp.cross(axis, _perp1(axis))


@dataclass(frozen=True)
class Box:
    lo: np.ndarray
    hi: np.ndarray
    material: Optional[object] = None

    def intersect(self, o, d, t_max):
        lo = jnp.asarray(self.lo, jnp.float32)
        hi = jnp.asarray(self.hi, jnp.float32)
        hit, t0, t1 = vm.intersect_aabb(o, d, t_max, lo, hi)
        t = jnp.where(hit & (t0 > _EPS), t0, jnp.where(hit & (t1 > _EPS), t1, jnp.inf))
        p = o + t[..., None] * d
        # face normal: axis of max |offset from center| scaled to half-extents
        c = (lo + hi) * 0.5
        h = (hi - lo) * 0.5
        rel = (p - c) / jnp.maximum(h, 1e-24)
        ax = jnp.argmax(jnp.abs(rel), axis=-1)
        n = jnp.sign(
            jnp.take_along_axis(rel, ax[..., None], axis=-1)
        ) * jnp.eye(3, dtype=jnp.float32)[ax]
        uv = jnp.clip((rel[..., :2] + 1.0) * 0.5, 0.0, 1.0)
        return t, n, uv

    def area(self) -> float:
        e = np.asarray(self.hi, np.float64) - np.asarray(self.lo, np.float64)
        return float(2.0 * (e[0] * e[1] + e[1] * e[2] + e[0] * e[2]))

    def sample(self, u2):
        # uniform over the 6 faces, weighted by face area
        lo = np.asarray(self.lo, np.float64)
        hi = np.asarray(self.hi, np.float64)
        e = hi - lo
        areas = np.array([e[1] * e[2], e[1] * e[2], e[0] * e[2],
                          e[0] * e[2], e[0] * e[1], e[0] * e[1]])
        cdf = np.cumsum(areas / areas.sum())
        u0 = u2[..., 0]
        face = jnp.searchsorted(jnp.asarray(cdf, jnp.float32), u0)
        face = jnp.clip(face, 0, 5)
        # remap u0 within the face
        lo_j = jnp.asarray(lo, jnp.float32)
        hi_j = jnp.asarray(hi, jnp.float32)
        cdf_j = jnp.concatenate([jnp.zeros((1,)), jnp.asarray(cdf, jnp.float32)])
        u0r = (u0 - cdf_j[face]) / jnp.maximum(cdf_j[face + 1] - cdf_j[face], 1e-12)
        u1 = u2[..., 1]
        normals = jnp.asarray([[-1, 0, 0], [1, 0, 0], [0, -1, 0],
                               [0, 1, 0], [0, 0, -1], [0, 0, 1]], jnp.float32)
        n = normals[face]
        axis = face // 2
        hi_side = (face % 2) == 1
        # build p: fixed coordinate on the face, two free coords from (u0r, u1)
        free = jnp.stack([u0r, u1], -1)
        p = jnp.zeros(u2.shape[:-1] + (3,), jnp.float32)
        for ax in range(3):
            others = [a for a in range(3) if a != ax]
            sel = axis == ax
            fixed = jnp.where(hi_side, hi_j[ax], lo_j[ax])
            val_ax = jnp.where(sel, fixed, p[..., ax])
            p = p.at[..., ax].set(val_ax)
            for k, oax in enumerate(others):
                v = lo_j[oax] + free[..., k] * (hi_j[oax] - lo_j[oax])
                p = p.at[..., oax].set(jnp.where(sel, v, p[..., oax]))
        pdf = jnp.full(u2.shape[:-1], 1.0 / self.area())
        return p, n, pdf


@dataclass(frozen=True)
class TriangleMesh:
    """Indexed triangle mesh; batched Möller–Trumbore in triangle chunks.

    Reference Triangle shapes.h:855 + plytool loader (cmd/plytool.cpp).
    Intersection materializes (N_rays, CHUNK) intermediates only.
    """
    vertices: np.ndarray           # (V, 3) float32
    indices: np.ndarray            # (T, 3) int32
    material: Optional[object] = None
    uvs: Optional[np.ndarray] = None   # (V, 2) optional vertex uvs
    chunk: int = 256
    # meshes at/above this triangle count intersect through the uniform-grid
    # DDA accelerator (ops/trigrid — the BVHAggregate role, cpu/aggregates.h,
    # reshaped for lockstep SIMD); below it the O(T) chunked scan wins
    grid_threshold: int = 512

    def _grid(self):
        g = self.__dict__.get("_grid_cache")
        if g is None:
            from ..ops import trigrid

            g = trigrid.build_tri_grid(self.vertices, self.indices)
            object.__setattr__(self, "_grid_cache", g)
        return g

    def _shade(self, best_t, tri, bu, bv):
        """Normal + uv from a hit triangle id (shared by both paths)."""
        v = np.asarray(self.vertices, np.float32)
        idx = np.asarray(self.indices, np.int32)
        p0 = jnp.asarray(v[idx[:, 0]])
        e1 = jnp.asarray(v[idx[:, 1]]) - p0
        e2 = jnp.asarray(v[idx[:, 2]]) - p0
        n = vm.normalize(jnp.cross(e1[tri], e2[tri]))
        if self.uvs is not None:
            uvv = jnp.asarray(self.uvs, jnp.float32)
            jidx = jnp.asarray(idx)
            uv0 = uvv[jidx[tri, 0]]
            uv1 = uvv[jidx[tri, 1]]
            uv2 = uvv[jidx[tri, 2]]
            uv = ((1 - bu - bv)[:, None] * uv0 + bu[:, None] * uv1
                  + bv[:, None] * uv2)
        else:
            uv = jnp.stack([bu, bv], -1)
        return best_t, n, uv

    def _tri_arrays(self):
        v = np.asarray(self.vertices, np.float32)
        idx = np.asarray(self.indices, np.int32)
        p0 = v[idx[:, 0]]
        e1 = v[idx[:, 1]] - p0
        e2 = v[idx[:, 2]] - p0
        return (jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2))

    def intersect(self, o, d, t_max):
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                 o.shape[:-1])
        if np.asarray(self.indices).shape[0] >= self.grid_threshold:
            from ..ops import trigrid

            bt, tri_id, bu, bv = trigrid.intersect_grid(
                self._grid(), o, d, t_max)
            return self._shade(bt, jnp.clip(tri_id, 0, None), bu, bv)
        p0, e1, e2 = self._tri_arrays()
        T = p0.shape[0]
        C = min(self.chunk, T)
        n_chunks = -(-T // C)
        pad = n_chunks * C - T
        if pad:
            p0 = jnp.concatenate([p0, jnp.zeros((pad, 3))], 0)
            e1 = jnp.concatenate([e1, jnp.zeros((pad, 3))], 0)
            e2 = jnp.concatenate([e2, jnp.zeros((pad, 3))], 0)
        p0c = p0.reshape(n_chunks, C, 3)
        e1c = e1.reshape(n_chunks, C, 3)
        e2c = e2.reshape(n_chunks, C, 3)
        N = o.shape[0]

        def step(carry, tris):
            best_t, best_tri, best_u, best_v, base = carry
            tp0, te1, te2 = tris
            # Möller–Trumbore: rays (N,1,3) x tris (1,C,3)
            h = jnp.cross(d[:, None, :], te2[None, :, :])
            a = jnp.sum(te1[None] * h, -1)
            inv_a = 1.0 / jnp.where(jnp.abs(a) > 1e-12, a, 1e-12)
            s = o[:, None, :] - tp0[None]
            u = jnp.sum(s * h, -1) * inv_a
            q = jnp.cross(s, te1[None])
            v = jnp.sum(d[:, None, :] * q, -1) * inv_a
            t = jnp.sum(te2[None] * q, -1) * inv_a
            ok = ((jnp.abs(a) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
                  & (t > _EPS) & (t < t_max[:, None]))
            t = jnp.where(ok, t, jnp.inf)
            ci = jnp.argmin(t, axis=1)
            ct = jnp.take_along_axis(t, ci[:, None], 1)[:, 0]
            cu = jnp.take_along_axis(u, ci[:, None], 1)[:, 0]
            cv = jnp.take_along_axis(v, ci[:, None], 1)[:, 0]
            closer = ct < best_t
            best_t = jnp.where(closer, ct, best_t)
            best_tri = jnp.where(closer, base + ci.astype(jnp.int32), best_tri)
            best_u = jnp.where(closer, cu, best_u)
            best_v = jnp.where(closer, cv, best_v)
            return (best_t, best_tri, best_u, best_v, base + C), None

        init = (jnp.full((N,), jnp.inf), jnp.full((N,), -1, jnp.int32),
                jnp.zeros((N,)), jnp.zeros((N,)), jnp.int32(0))
        (best_t, best_tri, bu, bv, _), _ = jax.lax.scan(
            step, init, (p0c, e1c, e2c))
        tri = jnp.clip(best_tri, 0, T - 1)
        n = jnp.cross(jnp.take(e1[: T], tri, axis=0) if pad else e1[tri],
                      jnp.take(e2[: T], tri, axis=0) if pad else e2[tri])
        n = vm.normalize(n)
        if self.uvs is not None:
            uvv = jnp.asarray(self.uvs, jnp.float32)
            idx = jnp.asarray(self.indices, jnp.int32)
            uv0 = uvv[idx[tri, 0]]
            uv1 = uvv[idx[tri, 1]]
            uv2 = uvv[idx[tri, 2]]
            uv = (1 - bu - bv)[:, None] * uv0 + bu[:, None] * uv1 + bv[:, None] * uv2
        else:
            uv = jnp.stack([bu, bv], -1)
        return best_t, n, uv

    def _areas(self):
        v = np.asarray(self.vertices, np.float64)
        idx = np.asarray(self.indices, np.int64)
        e1 = v[idx[:, 1]] - v[idx[:, 0]]
        e2 = v[idx[:, 2]] - v[idx[:, 0]]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)

    def area(self) -> float:
        return float(self._areas().sum())

    def sample(self, u2):
        areas = self._areas()
        cdf = np.cumsum(areas / areas.sum()).astype(np.float32)
        tri = jnp.clip(jnp.searchsorted(jnp.asarray(cdf), u2[..., 0]),
                       0, len(areas) - 1)
        cdf_j = jnp.concatenate([jnp.zeros((1,)), jnp.asarray(cdf)])
        u0r = (u2[..., 0] - cdf_j[tri]) / jnp.maximum(
            cdf_j[tri + 1] - cdf_j[tri], 1e-12)
        # uniform barycentrics (sqrt warp)
        su = safe_sqrt(u0r)
        b0 = 1.0 - su
        b1 = u2[..., 1] * su
        v = jnp.asarray(self.vertices, jnp.float32)
        idx = jnp.asarray(self.indices, jnp.int32)
        p0 = v[idx[tri, 0]]
        p1 = v[idx[tri, 1]]
        p2 = v[idx[tri, 2]]
        p = b0[..., None] * p0 + b1[..., None] * p1 + (1 - b0 - b1)[..., None] * p2
        n = jnp.cross(p1 - p0, p2 - p0)
        n = vm.normalize(n)
        pdf = jnp.full(u2.shape[:-1], 1.0 / self.area())
        return p, n, pdf


def intersect_all(prims: List, o, d, t_max):
    """Closest-hit over the static primitive list (branch-free min-reduce)."""
    n_rays = o.shape[0]
    best_t = jnp.full((n_rays,), jnp.inf)
    best_n = jnp.zeros((n_rays, 3))
    best_id = jnp.full((n_rays,), -1, jnp.int32)
    best_uv = jnp.zeros((n_rays, 2))
    for i, prim in enumerate(prims):
        t, nrm, uv = prim.intersect(o, d, t_max)
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_n = jnp.where(closer[:, None], nrm, best_n)
        best_id = jnp.where(closer, i, best_id)
        best_uv = jnp.where(closer[:, None], uv, best_uv)
    return Hit(best_t, best_n, best_id, best_uv)


def occluded(prims: List, o, d, dist):
    """Any-hit for shadow rays against *opaque* primitives."""
    n_rays = o.shape[0]
    blocked = jnp.zeros((n_rays,), bool)
    for prim in prims:
        if prim.material is None:
            continue  # medium interface: doesn't block light
        t, _, _ = prim.intersect(o, d, dist)
        blocked = blocked | jnp.isfinite(t)
    return blocked


@dataclass(frozen=True)
class BilinearPatch:
    """Non-planar bilinear patch over four corners p00, p10, p01, p11
    (shapes.h BilinearPatch): point(u,v) = lerp(v, lerp(u, p00, p10),
    lerp(u, p01, p11)).  Intersection solves the quadratic in u from the
    ray-patch equation (GARP / Reshetov), then v and t from the line
    through the u-isoline — branch-free over the ray batch."""
    p00: np.ndarray
    p10: np.ndarray
    p01: np.ndarray
    p11: np.ndarray
    material: Optional[object] = None

    def _corners(self):
        return (jnp.asarray(self.p00, jnp.float32),
                jnp.asarray(self.p10, jnp.float32),
                jnp.asarray(self.p01, jnp.float32),
                jnp.asarray(self.p11, jnp.float32))

    def intersect(self, o, d, t_max):
        p00, p10, p01, p11 = self._corners()
        # Solve for u: points on the patch satisfy
        #   p(u, v) = (1-v) [p00 + u (p10 - p00)] + v [p01 + u (p11 - p01)]
        # The ray o + t d hits the u-isoline segment; eliminating t and v
        # gives a quadratic a u^2 + b u + c = 0 with coefficients from
        # triple products (Reshetov's GARP formulation, used by pbrt).
        e10 = p10 - p00
        e01 = p01 - p00
        e11 = p11 - p10
        qn = jnp.cross(e10, p01 - p11)    # "curl" term
        a = jnp.sum(qn * d, -1)
        pd0 = p00 - o
        pd1 = p10 - o
        c = jnp.sum(jnp.cross(pd0, d) * e01, -1)
        b = jnp.sum(jnp.cross(pd1, d) * (p11 - p10), -1) - (a + c)
        # robust quadratic
        disc = b * b - 4 * a * c
        ok = disc >= 0
        sq = safe_sqrt(disc)
        qq = -0.5 * (b + jnp.where(b >= 0, sq, -sq))
        lin = jnp.abs(a) < 1e-12
        u1 = jnp.where(lin, -c / jnp.where(jnp.abs(b) > 1e-12, b, 1e-12),
                       qq / jnp.where(jnp.abs(a) > 1e-12, a, 1e-12))
        u2 = jnp.where(lin, jnp.inf,
                       c / jnp.where(jnp.abs(qq) > 1e-12, qq, 1e-12))

        def eval_u(u):
            # segment endpoints of the u-isoline
            pa = p00 + u[..., None] * e10
            pb = p01 + u[..., None] * (p11 - p01)
            eab = pb - pa
            # solve [eab, -d] [v, t]^T = o - pa  via cross products
            n2 = jnp.cross(eab, d)
            den = jnp.sum(n2 * n2, -1)
            rel = o - pa
            v = jnp.sum(jnp.cross(rel, d) * n2, -1) / jnp.where(
                den > 1e-20, den, 1e-20)
            t = jnp.sum(jnp.cross(rel, eab) * n2, -1) / jnp.where(
                den > 1e-20, den, 1e-20)
            valid = ((u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
                     & (t > _EPS) & (den > 1e-20))
            return jnp.where(valid, t, jnp.inf), v

        t_a, v_a = eval_u(jnp.clip(u1, -1e6, 1e6))
        t_b, v_b = eval_u(jnp.clip(u2, -1e6, 1e6))
        pick_a = t_a <= t_b
        t = jnp.where(pick_a, t_a, t_b)
        u = jnp.where(pick_a, u1, u2)
        v = jnp.where(pick_a, v_a, v_b)
        t = jnp.where(ok & (t < t_max), t, jnp.inf)
        # geometric normal from the surface partials at (u, v)
        dpdu = (1 - v)[..., None] * e10 + v[..., None] * (p11 - p01)
        dpdv = (1 - u)[..., None] * e01 + u[..., None] * (p11 - p10)
        n = vm.normalize(jnp.cross(dpdu, dpdv))
        return t, n, jnp.stack([jnp.clip(u, 0, 1), jnp.clip(v, 0, 1)], -1)

    def area(self) -> float:
        # MC-free estimate: mean of the two triangle splits
        p00, p10, p01, p11 = [np.asarray(x, np.float64)
                              for x in (self.p00, self.p10, self.p01, self.p11)]
        a1 = 0.5 * np.linalg.norm(np.cross(p10 - p00, p01 - p00))
        a2 = 0.5 * np.linalg.norm(np.cross(p11 - p10, p01 - p10))
        return float(a1 + a2)

    def sample(self, u2):
        p00, p10, p01, p11 = self._corners()
        u = u2[..., 0:1]
        v = u2[..., 1:2]
        p = ((1 - v) * ((1 - u) * p00 + u * p10)
             + v * ((1 - u) * p01 + u * p11))
        dpdu = (1 - v) * (p10 - p00) + v * (p11 - p01)
        dpdv = (1 - u) * (p01 - p00) + u * (p11 - p10)
        n = vm.normalize(jnp.cross(dpdu, dpdv))
        pdf = jnp.full(u2.shape[:-1], 1.0 / max(self.area(), 1e-12))
        return p, n, pdf


@dataclass(frozen=True)
class Curve:
    """Swept-sphere curve segment chain (shapes.h Curve, flat/cylinder
    variants): a cubic Bezier spine with linearly interpolated width,
    intersected as N_SEG capsules (segment + radius) in one vectorized
    min-reduce.  Faithful to the reference's recursive splitting in the
    limit of its leaf segments; N_SEG=16 matches its typical refinement."""
    cp: np.ndarray          # (4, 3) Bezier control points
    width0: float = 0.01
    width1: float = 0.01
    material: Optional[object] = None
    n_seg: int = 16

    def _polyline(self):
        ts = np.linspace(0.0, 1.0, self.n_seg + 1)
        cp = np.asarray(self.cp, np.float64)
        pts = np.stack([
            ((1 - t) ** 3 * cp[0] + 3 * (1 - t) ** 2 * t * cp[1]
             + 3 * (1 - t) * t ** 2 * cp[2] + t ** 3 * cp[3]) for t in ts])
        ws = (1 - ts) * self.width0 + ts * self.width1
        return pts.astype(np.float32), ws.astype(np.float32)

    def intersect(self, o, d, t_max):
        pts, ws = self._polyline()
        t_best = jnp.full(o.shape[:-1], jnp.inf)
        n_best = jnp.zeros_like(o)
        u_best = jnp.zeros(o.shape[:-1])
        for i in range(self.n_seg):
            a = jnp.asarray(pts[i])
            b = jnp.asarray(pts[i + 1])
            r = float(0.5 * (ws[i] + ws[i + 1])) * 0.5
            # capsule: distance from ray to segment == r
            ab = b - a
            ab2 = float(np.dot(pts[i + 1] - pts[i], pts[i + 1] - pts[i]))
            ao = o - a
            # project out the axis component: solve quadratic for the
            # infinite cylinder, then clamp the axis parameter (sphere
            # caps approximated by the segment midpoint test)
            dn = d - (jnp.sum(d * ab, -1) / max(ab2, 1e-12))[..., None] * ab
            on = ao - (jnp.sum(ao * ab, -1) / max(ab2, 1e-12))[..., None] * ab
            A = jnp.sum(dn * dn, -1)
            B = 2.0 * jnp.sum(dn * on, -1)
            C = jnp.sum(on * on, -1) - r * r
            disc = B * B - 4 * A * C
            sq = safe_sqrt(disc)
            t0 = (-B - sq) / jnp.where(jnp.abs(A) > 1e-12, 2 * A, 1e-12)
            hit_p = o + t0[..., None] * d
            s = jnp.sum((hit_p - a) * ab, -1) / max(ab2, 1e-12)
            valid = ((disc >= 0) & (t0 > _EPS) & (s >= 0.0) & (s <= 1.0)
                     & (t0 < t_max))
            t0 = jnp.where(valid, t0, jnp.inf)
            closer = t0 < t_best
            axis_p = a + jnp.clip(s, 0, 1)[..., None] * ab
            nrm = vm.normalize(hit_p - axis_p)
            t_best = jnp.where(closer, t0, t_best)
            n_best = jnp.where(closer[..., None], nrm, n_best)
            u_best = jnp.where(closer, (i + jnp.clip(s, 0, 1)) / self.n_seg,
                               u_best)
        v = jnp.zeros_like(u_best)
        return t_best, n_best, jnp.stack([u_best, v], -1)

    def area(self) -> float:
        pts, ws = self._polyline()
        seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        return float((seg * 0.5 * (ws[:-1] + ws[1:]) * np.pi).sum())

    def sample(self, u2):
        # uniform along the spine (curves are rarely emitters)
        pts, ws = self._polyline()
        s = u2[..., 0] * self.n_seg
        i = jnp.clip(s.astype(jnp.int32), 0, self.n_seg - 1)
        frac = s - i
        a = jnp.asarray(pts)[i]
        b = jnp.asarray(pts)[i + 1]
        p = a + frac[..., None] * (b - a)
        n = jnp.stack([jnp.zeros_like(frac), jnp.zeros_like(frac),
                       jnp.ones_like(frac)], -1)
        pdf = jnp.full(u2.shape[:-1], 1.0 / max(self.area(), 1e-12))
        return p, n, pdf
