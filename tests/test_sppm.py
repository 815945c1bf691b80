"""SPPM integrator tests — the reference's analytic furnace pattern
(cpu/integrators_test.cpp CheckSceneAverage) applied to the photon-mapping
estimator, plus a cross-check against the path integrator on an open scene."""
import pytest
import numpy as np

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.film import BoxFilter
from acceleratedvolrenderer_tpu.models.integrators.sppm import render_sppm
from acceleratedvolrenderer_tpu.models.materials import DiffuseMaterial
from acceleratedvolrenderer_tpu.models.shapes import Quad, Sphere
from acceleratedvolrenderer_tpu.parallel import render as render_mod
from acceleratedvolrenderer_tpu.scene import Scene
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 #9 test tiering)


def flat(c):
    return sp.constant_spectrum(c)


def lum(img):
    return img @ np.array([0.2126, 0.7152, 0.0722])


def cam(res=8, eye=(0, 0, 0), look=(0, 0, 1), fov=50.0):
    return PerspectiveCamera(
        c2w=vm.look_at(eye, look, (0, 1, 0)), fov_deg=fov, width=res,
        height=res)


def test_sppm_point_light_furnace():
    """Kd=0.5 closed sphere + central point light of I = pi R^2 => L == 1
    (integrators_test.cpp:72-97).  Direct light comes from the camera-pass
    NEE; all multiple scattering from photons."""
    R = 10.0
    sphere = Sphere(center=np.zeros(3), radius=R,
                    material=DiffuseMaterial(reflectance=flat(0.5)))
    light = lm.PointLight(position=np.zeros(3), spectrum=flat(np.pi * R * R))
    scene = Scene(camera=cam(8), medium=None, lights=[light],
                  primitives=[sphere], max_depth=14, filter=BoxFilter(),
                  spp=12, scene_radius=30.0, integrator="sppm")
    img, stats = render_sppm(scene, n_iterations=12, photons_per_iter=4096,
                             initial_radius=1.0)
    avg = lum(img).mean()
    assert np.all(np.isfinite(img))
    assert abs(avg - 1.0) < 0.08, (avg, stats)


def test_sppm_matches_path_open_scene():
    """Diffuse floor + area light: SPPM mean image within noise of the
    path-traced render (the manual golden-image workflow of the fork,
    here automated)."""
    floor = Quad(origin=np.array([-2.0, -1.0, 2.0]),
                 e1=np.array([4.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 4.0]),
                 material=DiffuseMaterial(reflectance=flat(0.6)))
    light = lm.PointLight(position=np.array([0.0, 2.0, 4.0]),
                          spectrum=flat(40.0))
    sc = dict(camera=cam(8, eye=(0, 1.0, 0), look=(0, 0.2, 4), fov=60),
              medium=None, lights=[light], primitives=[floor],
              max_depth=6, filter=BoxFilter(), scene_radius=20.0)
    scene_p = Scene(spp=256, integrator="path", **sc)
    ref, _ = render_mod.render(scene_p)
    scene_s = Scene(spp=8, integrator="sppm", **sc)
    img, stats = render_sppm(scene_s, n_iterations=8, photons_per_iter=4096)
    # single bounce off one diffuse floor: photon part is tiny; mostly checks
    # Ld path equivalence + no double counting
    m_ref, m_img = lum(ref).mean(), lum(img).mean()
    assert np.all(np.isfinite(img))
    assert abs(m_img - m_ref) < 0.05 * max(m_ref, 1e-3) + 0.01, (m_img, m_ref)
