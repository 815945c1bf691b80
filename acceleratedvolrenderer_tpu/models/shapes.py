"""Shapes & primitives — vectorized intersections.

Reference: src/pbrt/shapes.{h,cpp} (Sphere shapes.h:107, Disk :426,
Triangle :855) and cpu/aggregates BVH.  The target volumetric scenes carry a
handful of bounding primitives, so the TPU-native aggregate is a static
python list of primitives intersected branch-free over the ray batch with a
min-reduce — no BVH walk, no pointer chasing (SURVEY.md §2.3 Aggregates
note).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm
from ..utils.math import safe_sqrt


class Hit(NamedTuple):
    t: jnp.ndarray        # (N,) inf where no hit
    n: jnp.ndarray        # (N, 3) geometric normal
    prim_id: jnp.ndarray  # (N,) int32, -1 where none


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
        t = jnp.where(t0 > 1e-4, t0, jnp.where(t1 > 1e-4, t1, jnp.inf))
        t = jnp.where((disc >= 0) & (t < t_max), t, jnp.inf)
        p = o + t[..., None] * d
        n = vm.normalize(p - c)
        return t, n


@dataclass(frozen=True)
class Quad:
    """Parallelogram: origin + edges e1, e2."""
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
            (jnp.abs(denom) > 1e-9) & (t > 1e-4) & (t < t_max)
            & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        )
        t = jnp.where(ok, t, jnp.inf)
        nrm = jnp.broadcast_to(nn, o.shape)
        return t, nrm


@dataclass(frozen=True)
class Box:
    lo: np.ndarray
    hi: np.ndarray
    material: Optional[object] = None

    def intersect(self, o, d, t_max):
        lo = jnp.asarray(self.lo, jnp.float32)
        hi = jnp.asarray(self.hi, jnp.float32)
        hit, t0, t1 = vm.intersect_aabb(o, d, t_max, lo, hi)
        t = jnp.where(hit & (t0 > 1e-4), t0, jnp.where(hit & (t1 > 1e-4), t1, jnp.inf))
        p = o + t[..., None] * d
        # face normal: axis of max |offset from center| scaled to half-extents
        c = (lo + hi) * 0.5
        h = (hi - lo) * 0.5
        rel = (p - c) / jnp.maximum(h, 1e-24)
        ax = jnp.argmax(jnp.abs(rel), axis=-1)
        n = jnp.sign(
            jnp.take_along_axis(rel, ax[..., None], axis=-1)
        ) * jnp.eye(3, dtype=jnp.float32)[ax]
        return t, n


def intersect_all(prims: List, o, d, t_max):
    """Closest-hit over the static primitive list (branch-free min-reduce)."""
    n_rays = o.shape[0]
    best_t = jnp.full((n_rays,), jnp.inf)
    best_n = jnp.zeros((n_rays, 3))
    best_id = jnp.full((n_rays,), -1, jnp.int32)
    for i, prim in enumerate(prims):
        t, nrm = prim.intersect(o, d, t_max)
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_n = jnp.where(closer[:, None], nrm, best_n)
        best_id = jnp.where(closer, i, best_id)
    return Hit(best_t, best_n, best_id)


def occluded(prims: List, o, d, dist):
    """Any-hit for shadow rays against *opaque* primitives."""
    n_rays = o.shape[0]
    blocked = jnp.zeros((n_rays,), bool)
    for prim in prims:
        if prim.material is None:
            continue  # medium interface: doesn't block light
        t, _ = prim.intersect(o, d, dist)
        blocked = blocked | jnp.isfinite(t)
    return blocked
