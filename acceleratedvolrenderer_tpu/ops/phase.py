"""Henyey–Greenstein phase function.

Reference: HGPhaseFunction (src/pbrt/media.h:43-70), closed form
util/scattering.h:49, exact inversion sampling sampling.h:54.
A phase function here is three pure functions over direction arrays, not an
object — the integrator calls them with the per-ray g (possibly a constant,
possibly a texture lookup later).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm
from ..utils.math import INV_4PI


def hg_p(cos_theta, g):
    """HG phase value for the angle between incoming and outgoing directions.

    pbrt convention (scattering.h HenyeyGreenstein): uses +g with
    cos(theta) measured between wo and wi as passed by the integrator."""
    g = jnp.clip(g, -0.99, 0.99)
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    denom = jnp.maximum(denom, 1e-7)
    return INV_4PI * (1.0 - g * g) / (denom * jnp.sqrt(denom))


def hg_phase(wo, wi, g):
    """p(wo, wi) — both pointing away from the scatter point, pbrt
    convention: evaluated at Dot(wo, wi)."""
    return hg_p(vm.dot(wo, wi), g)


def hg_pdf(wo, wi, g):
    return hg_phase(wo, wi, g)


def sample_hg(wo, u, g):
    """Sample wi from the HG distribution around wo.

    Exact inversion (sampling.h:54 SampleHenyeyGreenstein). Returns
    (wi, pdf). wo points away from the scatter point (toward the previous
    vertex); the sampled frame is built around wo as pbrt does, so pdf == p.
    """
    g = jnp.clip(g, -0.99, 0.99)
    gnz = jnp.abs(g) > 1e-3
    sqr_term = (1.0 - g * g) / (1.0 + g - 2.0 * g * u[..., 0])
    cos_theta_aniso = -(1.0 + g * g - sqr_term * sqr_term) / (2.0 * g + jnp.where(gnz, 0.0, 1.0))
    cos_theta_iso = 1.0 - 2.0 * u[..., 0]
    cos_theta = jnp.where(gnz, cos_theta_aniso, cos_theta_iso)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * np.pi * u[..., 1]
    wl = vm.spherical_direction(sin_theta, cos_theta, phi)
    x, y, z = vm.frame_from_z(wo)
    wi = vm.from_local(x, y, z, wl)
    pdf = hg_p(cos_theta, g)
    return wi, pdf


def hg_phase_scalar_np(cos_theta, g):
    """Numpy HG phase value by cos(theta) — table-bake helper
    (util/scattering.h HenyeyGreenstein)."""
    import numpy as np

    denom = 1 + g * g + 2 * g * np.asarray(cos_theta)
    return (1 - g * g) / (4 * np.pi * np.maximum(denom, 1e-9)
                          * np.sqrt(np.maximum(denom, 1e-9)))
