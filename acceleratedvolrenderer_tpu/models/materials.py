"""Materials — surface scattering models.

Reference: src/pbrt/materials.{h,cpp} (14 material types) and bxdfs.h
(DiffuseBxDF bxdfs.h:30).  Round-1 subset: Lambertian diffuse + emissive
surfaces (DiffuseAreaLight behavior when hit) — the set the volumetric
evaluation scenes and furnace tests use; material = None on a primitive
means a transparent medium interface ("interface" material in pbrt).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np


@dataclass(frozen=True)
class DiffuseMaterial:
    """Lambertian: f = reflectance / pi; cosine-importance-sampled."""
    reflectance: Callable          # lam -> albedo in [0, 1]
    emission: Optional[Callable] = None   # lam -> emitted radiance (area light)
    emission_scale: float = 1.0

    @property
    def emissive(self) -> bool:
        return self.emission is not None
