"""Surface path-integrator family tests — the reference's analytic furnace
scenes (cpu/integrators_test.cpp:50-97 CheckSceneAverage +-0.025 pattern)
across PathIntegrator / SimplePath / RandomWalk / AO and the BxDF zoo."""
import dataclasses

import numpy as np
import pytest

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.film import BoxFilter
from acceleratedvolrenderer_tpu.models.materials import (
    ConductorMaterial,
    DielectricMaterial,
    DiffuseMaterial,
    DiffuseTransmissionMaterial,
    ThinDielectricMaterial,
)
from acceleratedvolrenderer_tpu.models.shapes import (
    Cylinder,
    Disk,
    Quad,
    Sphere,
    TriangleMesh,
)
from acceleratedvolrenderer_tpu.parallel import render as render_mod
from acceleratedvolrenderer_tpu.scene import Scene
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm

pytestmark = pytest.mark.slow  # 420s+ on the 2-core host (furnace gates at high spp)


def flat(c):
    return sp.constant_spectrum(c)


def lum(img):
    return img @ np.array([0.2126, 0.7152, 0.0722])


def cam(res=8, eye=(0, 0, 0), look=(0, 0, 1), fov=50.0):
    return PerspectiveCamera(
        c2w=vm.look_at(eye, look, (0, 1, 0)), fov_deg=fov, width=res, height=res
    )


def closed_furnace_scene(integrator, spp=128, max_depth=40):
    """Kd=0.5 sphere, central point light with I = pi R^2 => L == 1
    everywhere (integrators_test.cpp:72-97)."""
    R = 10.0
    sphere = Sphere(center=np.zeros(3), radius=R,
                    material=DiffuseMaterial(reflectance=flat(0.5)))
    light = lm.PointLight(position=np.zeros(3), spectrum=flat(np.pi * R * R))
    return Scene(camera=cam(8), medium=None, lights=[light],
                 primitives=[sphere], max_depth=max_depth, filter=BoxFilter(),
                 spp=spp, scene_radius=30.0, integrator=integrator)


@pytest.mark.parametrize("integrator", ["path", "simplepath"])
def test_point_light_furnace(integrator):
    scene = closed_furnace_scene(integrator)
    img, _ = render_mod.render(scene)
    avg = lum(img).mean()
    assert abs(avg - 1.0) < 0.04, (integrator, avg)


def test_path_env_furnace_diffuse_sphere():
    """Convex diffuse sphere under uniform env of 1: camera sees exactly
    albedo on the sphere and 1 on the env."""
    sphere = Sphere(center=np.array([0, 0, 4.0]), radius=1.0,
                    material=DiffuseMaterial(reflectance=flat(0.6)))
    scene = Scene(camera=cam(10, fov=40), medium=None,
                  lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                                  scene_radius=100.0)],
                  primitives=[sphere], max_depth=8, filter=BoxFilter(),
                  spp=196, scene_radius=100.0, integrator="path")
    img, _ = render_mod.render(scene)
    Y = lum(img)
    center = Y[4:6, 4:6].mean()   # sphere
    corner = Y[0, 0]              # env
    assert abs(center - 0.6) < 0.03, center
    assert abs(corner - 1.0) < 0.02, corner


def test_path_mirror_sphere_reflects_env():
    """Smooth conductor with huge k ~ perfect mirror: sees ~env * F."""
    sphere = Sphere(center=np.array([0, 0, 4.0]), radius=1.0,
                    material=ConductorMaterial(eta=flat(0.01), k=flat(1000.0),
                                               roughness=0.0))
    scene = Scene(camera=cam(10, fov=40), medium=None,
                  lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                                  scene_radius=100.0)],
                  primitives=[sphere], max_depth=4, filter=BoxFilter(),
                  spp=64, scene_radius=100.0, integrator="path")
    img, _ = render_mod.render(scene)
    center = lum(img)[4:6, 4:6].mean()
    assert abs(center - 1.0) < 0.02, center


def test_path_rough_conductor_furnace_bounded():
    sphere = Sphere(center=np.array([0, 0, 4.0]), radius=1.0,
                    material=ConductorMaterial(eta=flat(0.01), k=flat(1000.0),
                                               roughness=0.25))
    scene = Scene(camera=cam(10, fov=40), medium=None,
                  lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                                  scene_radius=100.0)],
                  primitives=[sphere], max_depth=6, filter=BoxFilter(),
                  spp=128, scene_radius=100.0, integrator="path")
    img, _ = render_mod.render(scene)
    center = lum(img)[4:6, 4:6].mean()
    # single-scattering GGX furnace: slightly below 1, never above
    assert 0.85 < center < 1.03, center


def test_path_glass_sphere_furnace():
    """Smooth dielectric in a furnace: everything refracts/reflects to the
    env eventually => ~1."""
    sphere = Sphere(center=np.array([0, 0, 4.0]), radius=1.0,
                    material=DielectricMaterial(eta=1.5, roughness=0.0))
    scene = Scene(camera=cam(10, fov=40), medium=None,
                  lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                                  scene_radius=100.0)],
                  primitives=[sphere], max_depth=32, filter=BoxFilter(),
                  spp=128, scene_radius=100.0, integrator="path")
    img, _ = render_mod.render(scene)
    center = lum(img)[4:6, 4:6].mean()
    assert abs(center - 1.0) < 0.05, center


def test_path_thin_dielectric_transparent():
    quad = Quad(origin=np.array([-3.0, -3.0, 2.0]),
                e1=np.array([6.0, 0.0, 0.0]), e2=np.array([0.0, 6.0, 0.0]),
                material=ThinDielectricMaterial(eta=1.5))
    scene = Scene(camera=cam(8, fov=40), medium=None,
                  lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                                  scene_radius=100.0)],
                  primitives=[quad], max_depth=8, filter=BoxFilter(),
                  spp=64, scene_radius=100.0, integrator="path")
    img, _ = render_mod.render(scene)
    # R + T = 1 through the slab in a furnace
    assert abs(lum(img).mean() - 1.0) < 0.02


def test_path_diffuse_transmission_furnace():
    sphere = Sphere(center=np.array([0, 0, 4.0]), radius=1.0,
                    material=DiffuseTransmissionMaterial(
                        reflectance=flat(0.5), transmittance=flat(0.5)))
    scene = Scene(camera=cam(8, fov=40), medium=None,
                  lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                                  scene_radius=100.0)],
                  primitives=[sphere], max_depth=32, filter=BoxFilter(),
                  spp=128, scene_radius=100.0, integrator="path")
    img, _ = render_mod.render(scene)
    center = lum(img)[3:5, 3:5].mean()
    assert abs(center - 1.0) < 0.05, center


def test_path_area_light_nee_matches_bsdf_only():
    """Emissive quad lighting a floor: full MIS path == simplepath
    (BSDF-only) in expectation."""
    floor = Quad(origin=np.array([-5.0, 0.0, -5.0]),
                 e1=np.array([10.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 10.0]),
                 material=DiffuseMaterial(reflectance=flat(0.5)))
    # emitter facing down at the floor (e1 x e2 = -y)
    lamp = Quad(origin=np.array([-1.0, 3.0, 1.0]),
                e1=np.array([2.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 2.0]),
                material=DiffuseMaterial(reflectance=flat(0.0),
                                         emission=flat(5.0)))
    base = Scene(camera=cam(8, eye=(0, 1.5, -4), look=(0, 0.5, 2)),
                 medium=None, lights=[], primitives=[floor, lamp],
                 max_depth=5, filter=BoxFilter(), spp=384,
                 scene_radius=50.0, integrator="path")
    img_mis, _ = render_mod.render(base)
    simple = dataclasses.replace(base, integrator="simplepath", spp=2048)
    img_b, _ = render_mod.render(simple)
    a, b = lum(img_mis).mean(), lum(img_b).mean()
    assert a > 0.01, a
    assert abs(a - b) / max(a, 1e-9) < 0.08, (a, b)
    # and the MIS estimate is far lower variance at equal-ish work: spot check
    assert np.isfinite(img_mis).all()


def test_path_power_sampler_matches_uniform():
    floor = Quad(origin=np.array([-5.0, 0.0, -5.0]),
                 e1=np.array([10.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 10.0]),
                 material=DiffuseMaterial(reflectance=flat(0.5)))
    l1 = lm.PointLight(position=np.array([0, 3.0, 0]), spectrum=flat(20.0))
    l2 = lm.PointLight(position=np.array([2, 3.0, 2]), spectrum=flat(0.5))
    base = Scene(camera=cam(8, eye=(0, 1.5, -4), look=(0, 0.0, 2)),
                 medium=None, lights=[l1, l2], primitives=[floor],
                 max_depth=3, filter=BoxFilter(), spp=256,
                 scene_radius=50.0, integrator="path")
    img_u, _ = render_mod.render(base)
    img_p, _ = render_mod.render(
        dataclasses.replace(base, light_sampler="power"))
    a, b = lum(img_u).mean(), lum(img_p).mean()
    assert abs(a - b) / max(a, 1e-9) < 0.05, (a, b)


def test_randomwalk_env_furnace():
    """RandomWalk only finds emitted light by chance — a convex diffuse
    sphere under a uniform env of 1 shades to exactly its albedo
    (cpu/integrators.cpp:114 RandomWalkIntegrator semantics)."""
    sphere = Sphere(center=np.array([0, 0, 4.0]), radius=1.0,
                    material=DiffuseMaterial(reflectance=flat(0.6)))
    scene = Scene(camera=cam(10, fov=40), medium=None,
                  lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                                  scene_radius=100.0)],
                  primitives=[sphere], max_depth=12, filter=BoxFilter(),
                  spp=1024, scene_radius=100.0, integrator="randomwalk")
    img, _ = render_mod.render(scene)
    Y = lum(img)
    assert abs(Y[4:6, 4:6].mean() - 0.6) < 0.05, Y[4:6, 4:6].mean()
    assert abs(Y[0, 0] - 1.0) < 0.02, Y[0, 0]


def test_ao_unoccluded_floor():
    floor = Quad(origin=np.array([-50.0, 0.0, -50.0]),
                 e1=np.array([100.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 100.0]),
                 material=DiffuseMaterial(reflectance=flat(1.0)))
    scene = Scene(camera=cam(8, eye=(0, 2.0, -3), look=(0, 0, 2)),
                  medium=None, lights=[], primitives=[floor],
                  max_depth=2, filter=BoxFilter(), spp=64,
                  scene_radius=100.0, integrator="ao")
    img, _ = render_mod.render(scene)
    Y = lum(img)
    assert abs(Y[4:7].mean() - 1.0) < 0.03, Y[4:7].mean()


def test_triangle_mesh_and_new_shapes_render():
    """Disk/cylinder/triangle-mesh intersections drive the path integrator
    without NaNs and hit where expected."""
    tris = TriangleMesh(
        vertices=np.array([[-1, -1, 4], [1, -1, 4], [0, 1, 4.0]], np.float32),
        indices=np.array([[0, 1, 2]], np.int32),
        material=DiffuseMaterial(reflectance=flat(0.8)))
    disk = Disk(center=np.array([2.5, 0, 4.0]), normal=np.array([0, 0, -1.0]),
                radius=0.8, material=DiffuseMaterial(reflectance=flat(0.4)))
    cyl = Cylinder(p0=np.array([-2.5, -1, 4.0]), p1=np.array([-2.5, 1, 4.0]),
                   radius=0.5, material=DiffuseMaterial(reflectance=flat(0.4)))
    scene = Scene(camera=cam(12, fov=70), medium=None,
                  lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                                  scene_radius=100.0)],
                  primitives=[tris, disk, cyl], max_depth=5,
                  filter=BoxFilter(), spp=64, scene_radius=100.0,
                  integrator="path")
    img, _ = render_mod.render(scene)
    assert np.isfinite(img).all()
    Y = lum(img)
    assert Y[5:7, 5:7].mean() < 0.95   # triangle shades the center
    assert Y.max() <= 1.3


def test_mesh_area_sampling_and_arealight():
    """Emissive triangle-mesh panel as an NEE light source."""
    panel = TriangleMesh(
        vertices=np.array([[-1, 3, -1], [1, 3, -1], [1, 3, 1], [-1, 3, 1.0]],
                          np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),  # normals -y
        material=DiffuseMaterial(reflectance=flat(0.0), emission=flat(4.0)))
    floor = Quad(origin=np.array([-5.0, 0.0, -5.0]),
                 e1=np.array([10.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 10.0]),
                 material=DiffuseMaterial(reflectance=flat(0.5)))
    scene = Scene(camera=cam(8, eye=(0, 1.5, -4), look=(0, 0.5, 2)),
                  medium=None, lights=[], primitives=[floor, panel],
                  max_depth=4, filter=BoxFilter(), spp=128,
                  scene_radius=50.0, integrator="path")
    img, _ = render_mod.render(scene)
    assert np.isfinite(img).all()
    assert lum(img).mean() > 0.05
