"""LightPathIntegrator tests: particle-traced splat image agrees with the
forward path tracer in expectation (integrators.cpp LightPathIntegrator)."""
import numpy as np

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.film import BoxFilter
from acceleratedvolrenderer_tpu.models.materials import DiffuseMaterial
from acceleratedvolrenderer_tpu.models.shapes import Quad
from acceleratedvolrenderer_tpu.parallel import render as render_mod
from acceleratedvolrenderer_tpu.scene import Scene
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm


def flat(c):
    return sp.constant_spectrum(c)


def lum(img):
    return img @ np.array([0.2126, 0.7152, 0.0722])


def _scene(integrator, spp):
    floor = Quad(origin=np.array([-4.0, 0.0, -4.0]),
                 e1=np.array([8.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 8.0]),
                 material=DiffuseMaterial(reflectance=flat(0.6)))
    # winding: e1 x e2 = -y so the emissive side faces the floor
    lamp = Quad(origin=np.array([-1.0, 3.0, 1.0]),
                e1=np.array([2.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 2.0]),
                material=DiffuseMaterial(reflectance=flat(0.0),
                                         emission=flat(6.0)))
    cam = PerspectiveCamera(c2w=vm.look_at((0, 2.0, -5), (0, 0.5, 1), (0, 1, 0)),
                            fov_deg=55.0, width=12, height=12)
    return Scene(camera=cam, medium=None, lights=[], primitives=[floor, lamp],
                 max_depth=4, filter=BoxFilter(), spp=spp,
                 scene_radius=50.0, integrator=integrator)


def test_lightpath_matches_path_mean():
    img_f, _ = render_mod.render(_scene("path", 256))
    img_l, _ = render_mod.render_lightpath(_scene("lightpath", 40))
    a = lum(img_f).mean()
    b = lum(img_l).mean()
    assert np.isfinite(img_l).all()
    assert a > 0.01
    # splat estimator is noisy; compare means within 15%
    assert abs(a - b) / a < 0.15, (a, b)


def test_lightpath_point_light():
    floor = Quad(origin=np.array([-4.0, 0.0, -4.0]),
                 e1=np.array([8.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 8.0]),
                 material=DiffuseMaterial(reflectance=flat(0.6)))
    light = lm.PointLight(position=np.array([0.0, 3.0, 0.0]),
                          spectrum=flat(8.0))
    cam = PerspectiveCamera(c2w=vm.look_at((0, 2.0, -5), (0, 0.0, 1), (0, 1, 0)),
                            fov_deg=55.0, width=10, height=10)
    base = Scene(camera=cam, medium=None, lights=[light], primitives=[floor],
                 max_depth=3, filter=BoxFilter(), spp=128,
                 scene_radius=50.0, integrator="path")
    img_f, _ = render_mod.render(base)
    import dataclasses

    img_l, _ = render_mod.render_lightpath(
        dataclasses.replace(base, integrator="lightpath", spp=40))
    a, b = lum(img_f).mean(), lum(img_l).mean()
    assert abs(a - b) / max(a, 1e-9) < 0.15, (a, b)
