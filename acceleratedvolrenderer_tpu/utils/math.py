"""Scalar math helpers (reference: src/pbrt/util/math.h).

All functions are shape-polymorphic jnp ops usable inside jit / pallas.
"""
from __future__ import annotations

import jax.numpy as jnp

INV_PI = 0.31830988618379067154
INV_2PI = 0.15915494309189533577
INV_4PI = 0.07957747154594766788
PI_OVER_2 = 1.57079632679489661923
PI_OVER_4 = 0.78539816339744830961
SQRT_2 = 1.41421356237309504880

ONE_MINUS_EPSILON = jnp.float32(1.0 - 2.0 ** -24)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def sqr(x):
    return x * x


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_div(a, b, eps=0.0):
    """a/b with 0 where b == eps (matches pbrt's convention of guarding
    divisions by sampled pdfs)."""
    return jnp.where(b != eps, a / jnp.where(b != eps, b, 1.0), 0.0)


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def smoothstep(x, a, b):
    t = jnp.clip((x - a) / (b - a), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def difference_of_products(a, b, c, d):
    """a*b - c*d. The reference uses FMA error compensation
    (util/math.h DifferenceOfProducts); in f32 JAX we accept the rounding —
    callers needing precision promote to f64 on host."""
    return a * b - c * d
