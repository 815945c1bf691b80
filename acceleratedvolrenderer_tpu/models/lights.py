"""Light sources + uniform light sampling.

Reference: src/pbrt/lights.{h,cpp} — LightBase lights.h:156, PointLight :191,
DistantLight :244, SpotLight :742, UniformInfiniteLight :508 and the
uniform/power light samplers (lightsamplers.h).

TPU-native: the scene's light list is *static* python structure; every light
exposes batched pure functions.  NEE evaluates the K candidate samples
un-branched and selects by sampled index (K is small in all target scenes),
which beats `lax.switch` on a vector machine.  Spectra are stored as
callables lam -> value evaluated at the ray batch's sampled wavelengths.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import warps
from ..utils import vecmath as vm


class LightLiSample(NamedTuple):
    L: jnp.ndarray        # (N, LANES)
    wi: jnp.ndarray       # (N, 3)
    dist: jnp.ndarray     # (N,) distance to the light sample (for shadow ray)
    pdf: jnp.ndarray      # (N,) solid-angle pdf
    valid: jnp.ndarray    # (N,) bool


@dataclass(frozen=True)
class DistantLight:
    """Directional light (lights.h:244).  direction = propagation direction
    of the emitted radiance (from -> to in .pbrt)."""
    direction: np.ndarray               # (3,) unit, world
    spectrum: Callable                  # lam -> emitted radiance
    scale: float = 1.0
    scene_radius: float = 1e4
    is_delta = True
    is_infinite = False

    def sample_li(self, p, u2, lam):
        n = p.shape[0]
        d = jnp.asarray(self.direction, jnp.float32)
        wi = jnp.broadcast_to(-d, (n, 3))
        L = jnp.broadcast_to(self.spectrum(lam) * self.scale, lam.shape)
        dist = jnp.full((n,), 2.0 * self.scene_radius)
        return LightLiSample(L, wi, dist, jnp.ones((n,)), jnp.ones((n,), bool))

    def pdf_li(self, p, wi):
        return jnp.zeros(p.shape[0])

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)


@dataclass(frozen=True)
class PointLight:
    position: np.ndarray
    spectrum: Callable                  # lam -> radiant intensity
    scale: float = 1.0
    is_delta = True
    is_infinite = False

    def sample_li(self, p, u2, lam):
        pl = jnp.asarray(self.position, jnp.float32)
        to = pl - p
        d2 = jnp.maximum(vm.length_squared(to), 1e-12)
        dist = jnp.sqrt(d2)
        wi = to / dist[..., None]
        L = self.spectrum(lam) * self.scale / d2[..., None]
        return LightLiSample(L, wi, dist, jnp.ones_like(dist), jnp.ones(dist.shape, bool))

    def pdf_li(self, p, wi):
        return jnp.zeros(p.shape[0])

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)


@dataclass(frozen=True)
class SpotLight:
    """Spot light (lights.h:742): smooth falloff between cosFalloffStart and
    cosFalloffEnd of the total cone angle."""
    position: np.ndarray
    direction: np.ndarray               # unit cone axis
    spectrum: Callable
    scale: float = 1.0
    cone_angle_deg: float = 30.0
    cone_delta_deg: float = 5.0
    is_delta = True
    is_infinite = False

    def sample_li(self, p, u2, lam):
        pl = jnp.asarray(self.position, jnp.float32)
        axis = jnp.asarray(self.direction, jnp.float32)
        to = pl - p
        d2 = jnp.maximum(vm.length_squared(to), 1e-12)
        dist = jnp.sqrt(d2)
        wi = to / dist[..., None]
        cos_t = vm.dot(-wi, axis)
        cos_end = np.cos(np.deg2rad(self.cone_angle_deg))
        cos_start = np.cos(np.deg2rad(self.cone_angle_deg - self.cone_delta_deg))
        from ..utils.math import smoothstep

        falloff = smoothstep(cos_t, cos_end, cos_start)
        L = self.spectrum(lam) * self.scale * falloff[..., None] / d2[..., None]
        return LightLiSample(L, wi, dist, jnp.ones_like(dist), falloff > 0)

    def pdf_li(self, p, wi):
        return jnp.zeros(p.shape[0])

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)


@dataclass(frozen=True)
class UniformInfiniteLight:
    """Constant environment (lights.h:508)."""
    spectrum: Callable
    scale: float = 1.0
    scene_radius: float = 1e4
    is_delta = False
    is_infinite = True

    def sample_li(self, p, u2, lam):
        n = p.shape[0]
        wi = warps.sample_uniform_sphere(u2)
        L = jnp.broadcast_to(self.spectrum(lam) * self.scale, lam.shape)
        dist = jnp.full((n,), 2.0 * self.scene_radius)
        pdf = jnp.full((n,), warps.UNIFORM_SPHERE_PDF)
        return LightLiSample(L, wi, dist, pdf, jnp.ones((n,), bool))

    def pdf_li(self, p, wi):
        return jnp.full(p.shape[0], warps.UNIFORM_SPHERE_PDF)

    def le_escaped(self, d, lam):
        return self.spectrum(lam) * self.scale


def sample_one_light(lights: List, p, u1, u2, lam):
    """Uniform light sampler (lightsamplers.h UniformLightSampler): pick a
    light with pmf 1/K, return its sample with pdf already including pmf and
    per-light delta flag resolved via masked select."""
    k = len(lights)
    if k == 0:
        n = p.shape[0]
        z = jnp.zeros((n,))
        return (
            LightLiSample(jnp.zeros(lam.shape), jnp.zeros((n, 3)), z, z,
                          jnp.zeros((n,), bool)),
            jnp.zeros((n,), bool),
        )
    idx = jnp.minimum((u1 * k).astype(jnp.int32), k - 1)
    samples = [lt.sample_li(p, u2, lam) for lt in lights]
    out = samples[0]
    is_delta = jnp.full(p.shape[0], bool(lights[0].is_delta))
    for i in range(1, k):
        sel = idx == i
        out = LightLiSample(
            jnp.where(sel[:, None], samples[i].L, out.L),
            jnp.where(sel[:, None], samples[i].wi, out.wi),
            jnp.where(sel, samples[i].dist, out.dist),
            jnp.where(sel, samples[i].pdf, out.pdf),
            jnp.where(sel, samples[i].valid, out.valid),
        )
        is_delta = jnp.where(sel, bool(lights[i].is_delta), is_delta)
    pmf = 1.0 / k
    return LightLiSample(out.L, out.wi, out.dist, out.pdf * pmf, out.valid), is_delta


def escaped_radiance(lights: List, d, lam):
    """Sum of Le over infinite lights for escaped rays, plus per-light MIS
    pdf (uniform sampler pmf * PDF_Li) for the non-delta ones."""
    L = jnp.zeros(lam.shape)
    pdf = jnp.zeros(d.shape[0])
    k = max(len(lights), 1)
    for lt in lights:
        if lt.is_infinite:
            L = L + lt.le_escaped(d, lam)
            pdf = pdf + lt.pdf_li(d, d) / k
    return L, pdf
