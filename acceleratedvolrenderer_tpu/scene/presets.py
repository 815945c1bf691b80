"""Preset benchmark scenes mirroring the reference's evaluation configs
(BASELINE.json): fog box, disney-cloud-720p analog, emissive volume, and the
graph-precompute sphere scene.

The reference repo does not ship the Disney cloud VDB (the .pbrt scene at
`C:/Users/tsvdh/.../disney-cloud.pbrt` references external data), but the
committed EXR headers carry the exact camera matrices
(disney-cloud-720p.exr: worldToCamera / worldToNDC), and the public
disney-cloud pbrt scene parameters are mirrored here: camera fov ~31.07 deg,
medium box roughly [-1, -1, -1]..[1, 1, 1] scaled, sigma_a 0, sigma_s 1,
scale 4, g 0.877, distant sun + env light.  Density is a procedural cloud
baked at load (models.media.bake_cloud_density) standing in for the VDB.
"""
from __future__ import annotations

import numpy as np

from ..models import lights as lm
from ..models.cameras import PerspectiveCamera
from ..models.film import GaussianFilter
from ..models.media import MediumSpec, bake_cloud_density, homogeneous_box
from ..utils import spectrum as sp
from ..utils import vecmath as vm
from .types import Scene


def flat(c):
    return sp.constant_spectrum(c)


def fog_box(res=256, spp=64, max_depth=5):
    """Config 1: homogeneous fog box, single+multiple scattering, distant
    light."""
    med = homogeneous_box(
        flat(0.5), flat(2.0), lo=(0, 0, 0), hi=(1, 1, 1), g=0.0
    )
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.5, -2.6), (0.5, 0.5, 0.5), (0, 1, 0)),
        fov_deg=35.0, width=res, height=res,
    )
    return Scene(
        camera=cam, medium=med,
        lights=[
            lm.DistantLight(direction=np.array([0.3, -1.0, 0.4]) / np.linalg.norm([0.3, -1.0, 0.4]),
                            spectrum=flat(3.0), scene_radius=10.0),
            lm.UniformInfiniteLight(spectrum=flat(0.1), scene_radius=10.0),
        ],
        max_depth=max_depth, spp=spp, scene_radius=10.0,
    )


def cloud(width=1280, height=720, spp=16, max_depth=40, grid_res=256,
          g=0.877, sigma_scale=2.0):
    """Config 2 analog: disney-cloud-720p — GridMedium with majorant grid,
    strong forward scattering, sun + sky.

    Camera reproduces the committed EXR's worldToCamera (fov from
    worldToNDC); density is a baked procedural cloud since the VDB asset is
    not in the reference repo."""
    density = bake_cloud_density(res=(grid_res, grid_res, grid_res),
                                 density=1.0, extent=0.48, frequency=6.0)
    # world box sized like the wdas cloud (~ 200m extent); centered at origin
    half = 100.0
    med = MediumSpec(
        sigma_a_spec=flat(0.0), sigma_s_spec=flat(1.0), g=g, scale=sigma_scale / (2 * half) * 20.0,
        density=density,
        bounds_lo=np.array([-half, -half, -half], np.float32),
        bounds_hi=np.array([half, half, half], np.float32),
        # majorant resolution is a perf knob, not semantics (the estimator
        # is unbiased for any majorant >= density).  16^3 matches the
        # reference's GridMedium build (media.cpp:229) AND is fastest here:
        # the Pallas march kernel's row-select majorant gather scales with
        # table rows (16^3 = 32 rows of 128 lanes).
        majorant_res=(16, 16, 16),
    )
    # camera from disney-cloud-720p.exr worldToCamera metadata
    w2c = np.array([
        [-3.1525575e-02, -4.0441036e-04, -9.9950278e-01, -4.3427013e+01],
        [2.7316687e-01, 9.6192437e-01, -9.0052327e-03, -9.8271866e+01],
        [-9.6144992e-01, 2.7331498e-01, 3.0214753e-02, 6.4755157e+02],
        [0.0, 0.0, 0.0, 1.0],
    ])
    c2w_m = np.linalg.inv(w2c)
    c2w = vm.Transform(
        m=np.asarray(c2w_m, np.float32), m_inv=np.asarray(w2c, np.float32)
    )
    import jax.numpy as jnp

    c2w = vm.Transform(jnp.asarray(c2w.m), jnp.asarray(c2w.m_inv))
    cam = PerspectiveCamera(c2w=c2w, fov_deg=31.07, width=width, height=height)
    sun_dir = np.array([-0.5826, -0.7660, -0.2717])
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    return Scene(
        camera=cam, medium=med,
        lights=[
            lm.DistantLight(direction=sun_dir, spectrum=flat(2.6), scene_radius=1500.0),
            lm.UniformInfiniteLight(spectrum=flat(0.03), scene_radius=1500.0),
        ],
        max_depth=max_depth, spp=spp, scene_radius=1500.0,
        filter=GaussianFilter(),
    )


def emissive_volume(res=256, spp=64):
    """Config 3: emissive RGB volume (explosion-style): blackbody-ish
    emission + absorption over a baked plume density."""
    density = bake_cloud_density(res=(96, 96, 96), density=2.0, extent=0.45,
                                 frequency=4.0, seed=3)
    med = MediumSpec(
        sigma_a_spec=flat(4.0), sigma_s_spec=flat(1.0), g=0.0, scale=1.0,
        density=density,
        bounds_lo=np.zeros(3, np.float32), bounds_hi=np.ones(3, np.float32),
        Le_spec=sp.blackbody_normalized(3000.0), Le_scale=2.0,
        majorant_res=(16, 16, 16),
    )
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.6, -2.2), (0.5, 0.45, 0.5), (0, 1, 0)),
        fov_deg=32.0, width=res, height=res,
    )
    return Scene(
        camera=cam, medium=med,
        lights=[lm.UniformInfiniteLight(spectrum=flat(0.02), scene_radius=10.0)],
        max_depth=8, spp=spp, scene_radius=10.0,
    )


def sphere_medium(res=640, height=480, spp=16, max_depth=8):
    """The graph-precompute evaluation scene family (results/graph*.exr):
    spherical medium lit by a distant light."""
    # density: radial falloff sphere
    n = 96
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    r = np.linalg.norm(np.stack([xs, ys, zs], -1) - 0.5, axis=-1)
    density = np.clip(1.0 - r / 0.48, 0.0, 1.0).astype(np.float32)
    density = (density > 0).astype(np.float32)  # hard sphere like the config
    med = MediumSpec(
        sigma_a_spec=flat(0.05), sigma_s_spec=flat(0.95), g=0.0, scale=3.0,
        density=density,
        bounds_lo=np.zeros(3, np.float32), bounds_hi=np.ones(3, np.float32),
        majorant_res=(16, 16, 16),
    )
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.5, -2.5), (0.5, 0.5, 0.5), (0, 1, 0)),
        fov_deg=30.0, width=res, height=height,
    )
    return Scene(
        camera=cam, medium=med,
        lights=[lm.DistantLight(direction=np.array([0.0, -1.0, 0.0]),
                                spectrum=flat(3.0), scene_radius=10.0)],
        max_depth=max_depth, spp=spp, scene_radius=10.0,
    )


def explosion(res=256, spp=32):
    """Config 3 (full form): RGBGridMedium — per-voxel RGB sigma_a/sigma_s +
    RGB emission, fireball-style (media.h:355 RGBGridMedium capability)."""
    n = 80
    dens = bake_cloud_density(res=(n, n, n), density=1.0, extent=0.42,
                              frequency=4.5, seed=7)
    # temperature-like radial profile drives color: hot core -> orange shell
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    r = np.linalg.norm(np.stack([xs, ys, zs], -1) - 0.5, axis=-1) / 0.42
    heat = np.clip(1.0 - r, 0.0, 1.0) ** 1.5 * dens
    sigma_a_rgb = np.stack([dens * 3.0, dens * 3.6, dens * 4.2], -1)
    sigma_s_rgb = np.stack([dens * 0.8, dens * 0.7, dens * 0.6], -1)
    Le_rgb = np.stack([heat * 8.0, heat * 3.0, heat * 0.8], -1)
    med = MediumSpec(
        sigma_a_spec=flat(1.0), sigma_s_spec=flat(1.0), g=0.0, scale=1.0,
        bounds_lo=np.zeros(3, np.float32), bounds_hi=np.ones(3, np.float32),
        sigma_a_rgb=sigma_a_rgb.astype(np.float32),
        sigma_s_rgb=sigma_s_rgb.astype(np.float32),
        Le_rgb=Le_rgb.astype(np.float32),
        majorant_res=(16, 16, 16),
    )
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.55, -2.3), (0.5, 0.48, 0.5), (0, 1, 0)),
        fov_deg=32.0, width=res, height=res,
    )
    return Scene(
        camera=cam, medium=med,
        lights=[lm.UniformInfiniteLight(spectrum=flat(0.01), scene_radius=10.0)],
        max_depth=6, spp=spp, scene_radius=10.0,
    )
