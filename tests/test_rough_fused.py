"""Rough microfacet surfaces in the PRODUCTION fused integrator.

VERDICT r2 #3: the fused/regen path must handle rough conductor and
dielectric lobes (bxdfs.h Trowbridge-Reitz Sample_f/f/PDF with NEE MIS)
instead of the Lambertian-albedo fallback, and smooth specular must no
longer be barred from the regen renderer.

Validation strategy:
  * furnace-style energy check: a rough mirror-like conductor with high
    reflectance under a uniform environment must return ~environment
    radiance (energy preservation of the VNDF estimator + MIS);
  * regen-vs-wave: the path-regeneration driver renders the glass sphere
    + rough metal + fog scene and must agree statistically with the
    chunked wave driver (same estimator, different scheduling; RNG
    streams keyed by (pixel, sample) on both);
  * fused vs staged li_path on a fogless rough-conductor scene (the
    independently tested surface integrator, chi^2-gated lobes).
"""
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.film import BoxFilter
from acceleratedvolrenderer_tpu.models.materials import (
    ConductorMaterial, DielectricMaterial, DiffuseMaterial)
from acceleratedvolrenderer_tpu.models.media import homogeneous_box
from acceleratedvolrenderer_tpu.models.shapes import Sphere
from acceleratedvolrenderer_tpu.parallel import render as render_mod
from acceleratedvolrenderer_tpu.scene import Scene
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm


def flat(c):
    return sp.constant_spectrum(c)


def lum(img):
    return np.asarray(img) @ np.array([0.2126, 0.7152, 0.0722])


def cam(res, eye=(0.0, 0.0, -3.0), look=(0.0, 0.0, 0.0), fov=40.0):
    return PerspectiveCamera(
        c2w=vm.look_at(eye, look, (0, 1, 0)), fov_deg=fov,
        width=res, height=res)


def glass_metal_fog(res=16, spp=24, rough=0.25):
    """Glass sphere + rough metal sphere inside a thin fog box."""
    med = homogeneous_box(flat(0.02), flat(0.10), lo=(-2, -2, -2),
                          hi=(2, 2, 2), g=0.0)
    glass = Sphere(center=np.array([-0.7, 0.0, 0.0]), radius=0.55,
                   material=DielectricMaterial(eta=1.5, roughness=0.0))
    metal = Sphere(center=np.array([0.7, 0.0, 0.0]), radius=0.55,
                   material=ConductorMaterial(eta=0.2, k=3.0,
                                              roughness=rough))
    floor = Sphere(center=np.array([0.0, -101.0, 0.0]), radius=100.0,
                   material=DiffuseMaterial(reflectance=flat(0.4)))
    return Scene(
        camera=cam(res), medium=med,
        lights=[lm.DistantLight(direction=np.array([-0.3, -1.0, 0.4]),
                                spectrum=flat(3.0), scene_radius=30.0),
                lm.UniformInfiniteLight(spectrum=flat(0.35),
                                        scene_radius=30.0)],
        primitives=[glass, metal, floor],
        max_depth=8, filter=BoxFilter(), spp=spp, scene_radius=30.0)


def test_rough_conductor_furnace_fused():
    """High-reflectance rough conductor under a uniform environment: the
    fused integrator's VNDF bounce + NEE MIS must conserve energy (the
    image of the sphere stays close to the environment radiance)."""
    # eta ~ 0 / k large: near-perfect reflector at every angle
    metal = Sphere(center=np.zeros(3), radius=1.0,
                   material=ConductorMaterial(eta=0.01, k=100.0,
                                              roughness=0.3))
    scene = Scene(
        camera=cam(12), medium=None,
        lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                        scene_radius=50.0)],
        primitives=[metal], max_depth=12, filter=BoxFilter(), spp=64,
        scene_radius=50.0)
    img, _ = render_mod.render(scene)
    avg = float(lum(img).mean())
    # every pixel (sphere or background) sees ~1.0 up to lobe energy loss
    # (single-scatter white furnace; multiple-scattering TR loses a few %)
    assert 0.85 < avg < 1.05, avg


def test_regen_matches_wave_glass_metal_fog():
    """The regen driver renders the glass + rough metal + fog scene
    (the r2 assert barred this) and agrees with the wave driver."""
    scene = glass_metal_fog(res=12, spp=48)
    img_w, _ = render_mod.render(scene)
    img_r, _ = render_mod.render_regen(scene, n_lanes=1024)
    a, b = lum(img_w), lum(img_r)
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-9)
    assert rel < 0.05, (a.mean(), b.mean())
    # per-pixel agreement within MC noise at 48 spp
    rel_mse = float(((a - b) ** 2).mean()) / max(float((a ** 2).mean()),
                                                 1e-12)
    assert rel_mse < 0.15, rel_mse


def test_fused_rough_vs_path_integrator():
    """Fogless rough-metal scene: fused surface branch vs the staged
    li_path surface integrator (chi^2-tested lobes) at matched spp."""
    metal = Sphere(center=np.zeros(3), radius=1.0,
                   material=ConductorMaterial(eta=0.2, k=3.0,
                                              roughness=0.35))
    floor = Sphere(center=np.array([0.0, -101.2, 0.0]), radius=100.0,
                   material=DiffuseMaterial(reflectance=flat(0.5)))
    scene = Scene(
        camera=cam(12, eye=(0, 0.6, -3.2), look=(0, 0, 0)), medium=None,
        lights=[lm.DistantLight(direction=np.array([-0.4, -1.0, 0.3]),
                                spectrum=flat(2.5), scene_radius=40.0),
                lm.UniformInfiniteLight(spectrum=flat(0.3),
                                        scene_radius=40.0)],
        primitives=[metal, floor], max_depth=6, filter=BoxFilter(),
        spp=96, scene_radius=40.0)
    img_f, _ = render_mod.render(scene)                     # fused driver
    scene.integrator = "path"
    img_p, _ = render_mod.render(scene)                     # li_path
    a, b = lum(img_f), lum(img_p)
    rel = abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)
    assert rel < 0.05, (a.mean(), b.mean())


def test_fused_diffuse_transmission_vs_path_integrator():
    """Translucent slab (DiffuseTransmission) with the sun BEHIND it: the
    fused integrator's two-sided DT lobes (transmitted NEE lane + far-side
    bounce continuation) must match the staged li_path surface integrator.
    Regression guard: the Lambert-albedo fallback rendered this scene
    BLACK through the fused driver (any scene with a medium routes there,
    so a translucent leaf in fog silently lost all its transmitted light).
    Also checks the sun-in-front (reflectance-lobe) side."""
    from acceleratedvolrenderer_tpu.models.materials import (
        DiffuseTransmissionMaterial)
    from acceleratedvolrenderer_tpu.models.shapes import Quad

    for sunx in (-1.0, 1.0):
        slab = Quad(origin=np.array([0.0, -4.0, -4.0]),
                    e1=np.array([0.0, 8.0, 0.0]),
                    e2=np.array([0.0, 0.0, 8.0]),
                    material=DiffuseTransmissionMaterial(
                        reflectance=flat(0.2), transmittance=flat(0.5)))
        sun = np.array([sunx, -0.25, 0.15])
        sun /= np.linalg.norm(sun)
        scene = Scene(
            camera=cam(10, eye=(-1.5, 0.3, 0.0), look=(0.0, 0.3, 0.0)),
            medium=None,
            lights=[lm.DistantLight(direction=sun, spectrum=flat(3.0),
                                    scene_radius=20.0)],
            primitives=[slab], max_depth=4, filter=BoxFilter(), spp=96,
            scene_radius=20.0)
        img_f, _ = render_mod.render(scene)                 # fused driver
        scene.integrator = "path"
        img_p, _ = render_mod.render(scene)                 # li_path
        a, b = lum(img_f), lum(img_p)
        assert b.mean() > 0
        rel = abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)
        assert rel < 0.06, (sunx, a.mean(), b.mean())
