"""Scene description — the BasicScene equivalent.

Reference: src/pbrt/scene.{h,cpp} (BasicScene scene.h:260 holding entity
lists; CreateMedia scene.cpp:838, CreateIntegrator scene.cpp:857).  Here a
scene is a frozen host-side dataclass the render driver closes over; all
device data is resolved per-wave inside jit.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..models.cameras import PerspectiveCamera
from ..models.film import GaussianFilter
from ..models.media import MediumSpec


@dataclass
class Scene:
    camera: object                       # PerspectiveCamera / Orthographic / Spherical
    medium: Optional[MediumSpec] = None
    lights: List = field(default_factory=list)
    max_depth: int = 5
    filter: object = field(default_factory=GaussianFilter)
    scene_radius: float = 1e4
    # sampling
    spp: int = 16
    seed: int = 0
    sampler: str = "independent"   # independent | stratified | sobol |
    #   paddedsobol | zsobol | pmj02bn | halton  (samplers.h:33-735 family)
    max_march_steps: int = 100000
    # surfaces (round-1: optional simple primitive list, models.shapes)
    primitives: List = field(default_factory=list)
    # integrator selection (reference factory cpu/integrators.cpp:3657):
    # volpath (default; fused) | simplevolpath | path | simplepath |
    # randomwalk | ao | lightpath | bdpt | graph | mlt | sppm
    integrator: str = "volpath"
    # light sampler: uniform | power (lightsamplers.h)
    light_sampler: str = "uniform"
    # pbrt --regularize flag (widen near-specular lobes after first bounce)
    regularize: bool = False
    # global debug toggles (reference PBRTOptions, options.h:47-74):
    # --disable-pixel-jitter / --disable-wavelength-jitter force camera
    # samples to the pixel center / hero wavelengths to fixed strata
    disable_pixel_jitter: bool = False
    disable_wavelength_jitter: bool = False
    # --pixelbounds / --pixel / --cropwindow: only pixels inside
    # [x0, x1) x [y0, y1) are rendered (film stays full-resolution, like
    # the reference's Film::PixelBounds restriction)
    pixel_bounds: Optional[tuple] = None

    @property
    def width(self):
        return self.camera.width

    @property
    def height(self):
        return self.camera.height
