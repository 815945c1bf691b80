"""Sampling warps (reference: src/pbrt/util/sampling.h).

Pure jnp; everything is shape-polymorphic so one code path serves host
utilities, the jit render loop, and Pallas kernel bodies.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.math import ONE_MINUS_EPSILON, safe_sqrt


def sample_exponential(u, a):
    """Sample t ~ a*exp(-a t); reference sampling.h:222.  Guards u==1."""
    u = jnp.minimum(u, ONE_MINUS_EPSILON)
    return -jnp.log1p(-u) / a


def exponential_pdf(x, a):
    return a * jnp.exp(-a * x)


def sample_discrete3(u, w0, w1, w2):
    """Pick one of three outcomes with probabilities ∝ (w0, w1, w2).

    Vectorized replacement for pbrt's SampleDiscrete (sampling.h:31) for the
    absorb/scatter/null event choice.  Returns (index, pdf, u_remapped) —
    u_remapped reuses the leftover uniform exactly as the reference does to
    save a random number."""
    total = w0 + w1 + w2
    p0 = w0 / total
    p1 = w1 / total
    p2 = w2 / total
    c1 = p0
    c2 = p0 + p1
    idx = jnp.where(u < c1, 0, jnp.where(u < c2, 1, 2))
    pdf = jnp.where(idx == 0, p0, jnp.where(idx == 1, p1, p2))
    lo = jnp.where(idx == 0, 0.0, jnp.where(idx == 1, c1, c2))
    u_new = jnp.minimum((u - lo) / jnp.maximum(pdf, 1e-24), ONE_MINUS_EPSILON)
    return idx, pdf, u_new


def sample_uniform_sphere(u):
    """u: (..., 2) -> unit directions (..., 3). Reference sampling.h."""
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * np.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_SPHERE_PDF = 1.0 / (4.0 * np.pi)


def sample_uniform_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * np.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_HEMISPHERE_PDF = 1.0 / (2.0 * np.pi)


def sample_uniform_disk_concentric(u):
    """Concentric (Shirley) disk mapping; u: (..., 2) -> (..., 2)."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (np.pi / 4.0) * (oy / jnp.where(ox == 0.0, 1.0, ox)),
        (np.pi / 2.0) - (np.pi / 4.0) * (ox / jnp.where(oy == 0.0, 1.0, oy)),
    )
    degenerate = (ox == 0.0) & (oy == 0.0)
    x = jnp.where(degenerate, 0.0, r * jnp.cos(theta))
    y = jnp.where(degenerate, 0.0, r * jnp.sin(theta))
    return jnp.stack([x, y], axis=-1)


def sample_cosine_hemisphere(u):
    d = sample_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta / np.pi


def sample_uniform_triangle(u):
    """Barycentric warp (sampling.h SampleUniformTriangle): low-distortion
    fold of the square onto b0+b1 <= 1."""
    b0 = u[..., 0] / 2.0
    b1 = u[..., 1] - b0
    flip = b0 > b1
    b0f = jnp.where(flip, u[..., 0] - u[..., 1] / 2.0, b0)
    b1f = jnp.where(flip, u[..., 1] / 2.0, b1)
    return jnp.stack([b0f, b1f, 1.0 - b0f - b1f], axis=-1)


def sample_uniform_cone(u, cos_theta_max):
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * np.pi * u[..., 1]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * np.pi * (1.0 - cos_theta_max))


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """Beta=2 power heuristic for MIS (sampling.h PowerHeuristic)."""
    f = nf * f_pdf
    g = ng * g_pdf
    f2 = f * f
    return jnp.where(f2 + g * g > 0.0, f2 / jnp.maximum(f2 + g * g, 1e-24), 0.0)


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    return jnp.where(f + g > 0.0, f / jnp.maximum(f + g, 1e-24), 0.0)
