"""Materials — surface scattering models.

Reference: src/pbrt/materials.{h,cpp} (14 material types) and bxdfs.h.
Material families implemented (the pbrt names in parens):

  DiffuseMaterial            ("diffuse"; + emission => DiffuseAreaLight-like)
  ConductorMaterial          ("conductor", smooth & rough GGX)
  DielectricMaterial         ("dielectric", smooth & rough GGX)
  ThinDielectricMaterial     ("thindielectric")
  DiffuseTransmissionMaterial("diffusetransmission")

material = None on a primitive means a transparent medium interface
("interface" in pbrt).  There is no per-ray virtual dispatch: integrators
gather per-ray material parameters from stacked per-primitive arrays by
mat-kind masks (models.integrators.path).  Reflectance/roughness accept
either a python float/callable-of-lam or a textures.* object evaluated at
the hit uv.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Union

import jax.numpy as jnp
import numpy as np

# material kind ids (static dispatch masks)
KIND_DIFFUSE = 0
KIND_CONDUCTOR = 1
KIND_DIELECTRIC = 2
KIND_THIN_DIELECTRIC = 3
KIND_DIFFUSE_TRANSMISSION = 4
KIND_COATED_DIFFUSE = 5
KIND_SUBSURFACE = 6


def _eval_spectral(value, lam, uv=None, p=None, n=None):
    """reflectance-like parameter -> (N, LANES) spectrum.

    value may be: float; callable lam->spectrum; rgb texture (eval(uv)->
    (N,3), Smits-converted); float texture ((N,) broadcast over lanes).
    p/n (hit position/shading normal, (N,3)) feed context-dependent
    textures (DirectionMix, spherical/cylindrical/planar mappings)."""
    N, L = lam.shape
    if value is None:
        return jnp.zeros((N, L), jnp.float32)
    if isinstance(value, (int, float)):
        return jnp.full((N, L), jnp.float32(value))
    if hasattr(value, "eval"):
        from . import textures as tex_mod

        if uv is None:
            # no hit parameterization at this call site (e.g. the fused
            # integrator's constant-parameter table): evaluate the texture
            # at uv = 0.5 as its representative value
            uv = jnp.full((N, 2), 0.5, jnp.float32)
        out = tex_mod.eval_texture(value, uv, p=p, n=n)
        if out.ndim == lam.ndim and out.shape[-1] == 3:
            from ..utils import spectrum as sp

            return sp.rgb_to_spectrum_smits_batched(out, lam)
        return jnp.broadcast_to(out[..., None], (N, L))
    # callable of lam
    return jnp.broadcast_to(jnp.asarray(value(lam), jnp.float32), (N, L))


def _eval_float(value, uv=None, shape=None, p=None, n=None):
    if isinstance(value, (int, float)):
        return jnp.full(shape, jnp.float32(value))
    from . import textures as tex_mod

    out = jnp.asarray(tex_mod.eval_texture(value, uv, p=p, n=n), jnp.float32)
    # an rgb texture bound to a float parameter (the parser's flt() permits
    # it): reduce the trailing channel dim to its mean, matching pbrt's
    # scalar conversion, instead of failing the (N,) broadcast
    if shape is not None and out.ndim == len(shape) + 1:
        out = out.mean(axis=-1)
    return jnp.broadcast_to(out, shape)


@dataclass(frozen=True)
class DiffuseMaterial:
    """Lambertian: f = reflectance / pi; cosine-importance-sampled."""
    reflectance: Union[Callable, float, object]  # lam->albedo | texture
    emission: Optional[Callable] = None   # lam -> emitted radiance (area light)
    emission_scale: float = 1.0

    kind = KIND_DIFFUSE

    @property
    def emissive(self) -> bool:
        return self.emission is not None

    def albedo_spectrum(self, lam, uv=None):
        return _eval_spectral(self.reflectance, lam, uv)


@dataclass(frozen=True)
class ConductorMaterial:
    """Metal with complex IOR (bxdfs.h ConductorBxDF); roughness=0 = mirror."""
    eta: Union[Callable, float] = 0.2         # lam -> real part
    k: Union[Callable, float] = 3.0           # lam -> extinction
    roughness: Union[float, object] = 0.0     # GGX alpha (or texture)
    emission: Optional[Callable] = None
    emission_scale: float = 1.0

    kind = KIND_CONDUCTOR

    @property
    def emissive(self) -> bool:
        return self.emission is not None

    def eta_spectrum(self, lam, uv=None):
        return _eval_spectral(self.eta, lam, uv)

    def k_spectrum(self, lam, uv=None):
        return _eval_spectral(self.k, lam, uv)


@dataclass(frozen=True)
class DielectricMaterial:
    """Glass (bxdfs.h DielectricBxDF); real scalar eta, GGX roughness."""
    eta: float = 1.5
    roughness: Union[float, object] = 0.0
    emission: Optional[Callable] = None
    emission_scale: float = 1.0

    kind = KIND_DIELECTRIC

    @property
    def emissive(self) -> bool:
        return self.emission is not None


@dataclass(frozen=True)
class ThinDielectricMaterial:
    eta: float = 1.5
    emission: Optional[Callable] = None
    emission_scale: float = 1.0

    kind = KIND_THIN_DIELECTRIC

    @property
    def emissive(self) -> bool:
        return self.emission is not None


@dataclass(frozen=True)
class DiffuseTransmissionMaterial:
    reflectance: Union[Callable, float, object] = 0.25
    transmittance: Union[Callable, float, object] = 0.25
    emission: Optional[Callable] = None
    emission_scale: float = 1.0

    kind = KIND_DIFFUSE_TRANSMISSION

    @property
    def emissive(self) -> bool:
        return self.emission is not None


@dataclass(frozen=True)
class CoatedDiffuseMaterial:
    """Dielectric coat over a Lambertian base — the CoatedDiffuseBxDF /
    LayeredBxDF capability (materials.h coateddiffuse, bxdfs.h:432).

    Two evaluation modes: the deterministic Fresnel-coupled model
    (bxdfs.coated_diffuse_*, default) and, with stochastic=True, the
    reference's random interface walk (bxdfs.layered_sample) with the
    full slab parameters: thickness, interior medium single-scattering
    albedo `albedo_med`, and HG asymmetry `g` (bxdfs.h LayeredBxDF
    thickness/albedo/g)."""
    reflectance: Union[Callable, float, object] = 0.5
    eta: float = 1.5
    roughness: Union[Callable, float] = 0.0
    thickness: float = 0.01
    g: float = 0.0
    albedo_med: Union[Callable, float, object, None] = None
    stochastic: bool = False
    emission: Optional[Callable] = None
    emission_scale: float = 1.0

    kind = KIND_COATED_DIFFUSE

    @property
    def emissive(self) -> bool:
        return self.emission is not None


@dataclass(frozen=True)
class MixMaterial:
    """Stochastic blend of two materials (materials.h MixMaterial): each
    shading point deterministically resolves to one of the two via a hash
    of its hit parameterization against `amount` (pbrt's ChooseMaterial
    with HashFloat), so the masked-dispatch path sees a concrete material
    per lane."""
    m1: object
    m2: object
    amount: float = 0.5   # probability of m1

    emission = None
    emission_scale = 1.0

    @property
    def emissive(self) -> bool:
        return bool(getattr(self.m1, "emissive", False)
                    or getattr(self.m2, "emissive", False))

    @property
    def kind(self):
        return getattr(self.m1, "kind", KIND_DIFFUSE)


@dataclass(frozen=True)
class SubsurfaceMaterial:
    """Subsurface scattering material (materials.h subsurface +
    bssrdf.{h,cpp}): normalized-diffusion BSSRDF parameterized directly by
    diffuse reflectance + mean free path per RGB channel (pbrt's
    "reflectance"/"mfp" parameterization).  Exit sampling + weighting in
    models/bssrdf.py; wired through the path integrator as a
    teleport-to-exit Lambertian vertex."""
    reflectance_rgb: tuple = (0.5, 0.5, 0.5)
    mfp_rgb: tuple = (0.01, 0.01, 0.01)
    eta: float = 1.33
    #: "burley" = normalized diffusion; "tabulated" = the reference's
    #: photon-beam-diffusion table (bssrdf.compute_beam_diffusion_table)
    profile: str = "burley"
    g: float = 0.0
    emission: Optional[Callable] = None
    emission_scale: float = 1.0

    kind = KIND_SUBSURFACE

    @property
    def reflectance(self):
        """Generic-albedo view for integrators without a BSSRDF random
        walk (e.g. the fused volumetric surface branch): the diffusion
        profile's total diffuse reflectance, i.e. mean(reflectance_rgb)."""
        return float(np.mean(self.reflectance_rgb))

    @property
    def emissive(self) -> bool:
        return self.emission is not None


KIND_MEASURED = 7


@dataclass(frozen=True)
class MeasuredMaterial:
    """Data-driven measured BRDF (materials.h MeasuredMaterial +
    bxdfs.h:1021 MeasuredBxDF): RGL .bsdf tables loaded via
    models/measured.py; dispatched per lane through the integrator's
    measured-table registry."""
    brdf: object                        # models.measured.MeasuredBRDF
    filename: str = ""
    emission: Optional[Callable] = None
    emission_scale: float = 1.0

    kind = KIND_MEASURED
    roughness = 1.0                     # never treated as specular
    eta = 1.5

    @property
    def emissive(self) -> bool:
        return self.emission is not None
