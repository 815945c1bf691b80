"""Surface rendering tests — the reference's analytic furnace scene family
(cpu/integrators_test.cpp:72-97): closed diffuse sphere + point light with
known equilibrium radiance."""
import jax.numpy as jnp
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.film import BoxFilter
from acceleratedvolrenderer_tpu.models.materials import DiffuseMaterial
from acceleratedvolrenderer_tpu.models.shapes import Quad, Sphere
from acceleratedvolrenderer_tpu.parallel import render as render_mod
from acceleratedvolrenderer_tpu.scene import Scene
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm


def flat(c):
    return sp.constant_spectrum(c)


def lum(img):
    return img @ np.array([0.2126, 0.7152, 0.0722])


def cam(res=8, eye=(0, 0, 0), look=(0, 0, 1)):
    return PerspectiveCamera(
        c2w=vm.look_at(eye, look, (0, 1, 0)), fov_deg=50.0, width=res, height=res
    )


def test_point_light_furnace():
    """Kd=0.5 sphere of radius R with a central point light of intensity
    I = pi R^2: equilibrium radiance L = (rho/pi) (I/R^2) / (1-rho) = 1
    (reference integrators_test.cpp:72-97 'pi point light => L==1')."""
    R = 10.0
    sphere = Sphere(center=np.zeros(3), radius=R,
                    material=DiffuseMaterial(reflectance=flat(0.5)))
    light = lm.PointLight(position=np.zeros(3), spectrum=flat(np.pi * R * R))
    scene = Scene(
        camera=cam(8), medium=None, lights=[light],
        primitives=[sphere], max_depth=40, filter=BoxFilter(), spp=128,
        scene_radius=30.0,
    )
    img, _ = render_mod.render(scene)
    avg = lum(img).mean()
    assert abs(avg - 1.0) < 0.04, avg


def test_diffuse_albedo_under_env():
    """A diffuse floor under a uniform environment of radiance 1: looking at
    the floor sees L = albedo (perfect importance cancellation + furnace)."""
    albedo = 0.6
    floor = Quad(origin=np.array([-50.0, -1.0, -50.0]),
                 e1=np.array([100.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 100.0]),
                 material=DiffuseMaterial(reflectance=flat(albedo)))
    scene = Scene(
        camera=cam(8, eye=(0, 1.5, -3), look=(0, -1, 2)), medium=None,
        lights=[lm.UniformInfiniteLight(spectrum=flat(1.0), scene_radius=200.0)],
        primitives=[floor], max_depth=16, filter=BoxFilter(), spp=256,
        scene_radius=200.0,
    )
    img, _ = render_mod.render(scene)
    # center pixels view the floor; with one bounce dominating, L ~ albedo
    center = lum(img)[3:5, 3:5].mean()
    assert abs(center - albedo) < 0.05, center


def test_emissive_quad_seen_directly():
    le = 2.5
    # winding: e1 x e2 = -z so the emissive side faces the camera
    # (one-sided emission like DiffuseAreaLight's default)
    quad = Quad(origin=np.array([-1.0, -1.0, 3.0]),
                e1=np.array([0.0, 2.0, 0.0]), e2=np.array([2.0, 0.0, 0.0]),
                material=DiffuseMaterial(reflectance=flat(0.0),
                                         emission=flat(le)))
    scene = Scene(
        camera=cam(8), medium=None, lights=[], primitives=[quad],
        max_depth=3, filter=BoxFilter(), spp=32, scene_radius=50.0,
    )
    img, _ = render_mod.render(scene)
    center = lum(img)[3:5, 3:5].mean()
    assert abs(center - le) / le < 0.02, center


def test_fog_over_diffuse_floor():
    """Medium + surface interplay: foggy box over a lit floor renders
    finite and brighter than without the light."""
    from acceleratedvolrenderer_tpu.models.media import homogeneous_box

    floor = Quad(origin=np.array([-10.0, 0.0, -10.0]),
                 e1=np.array([20.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 20.0]),
                 material=DiffuseMaterial(reflectance=flat(0.4)))
    med = homogeneous_box(flat(0.1), flat(0.4), lo=(-2, 0, -2), hi=(2, 2, 2))
    scene = Scene(
        camera=cam(8, eye=(0, 1.0, -4), look=(0, 0.8, 0)), medium=med,
        lights=[lm.DistantLight(direction=np.array([0.2, -1.0, 0.1]),
                                spectrum=flat(3.0), scene_radius=50.0)],
        primitives=[floor], max_depth=8, filter=BoxFilter(), spp=64,
        scene_radius=50.0,
    )
    img, _ = render_mod.render(scene)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_bvh_light_sampler_unbiased():
    """Adaptive ('bvh') light sampling must give the same furnace result as
    uniform — only variance differs (lightsamplers.h:260 capability)."""
    import numpy as np

    from acceleratedvolrenderer_tpu.models import lights as lm
    from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
    from acceleratedvolrenderer_tpu.models.film import BoxFilter
    from acceleratedvolrenderer_tpu.models.materials import DiffuseMaterial
    from acceleratedvolrenderer_tpu.models.shapes import Sphere
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import Scene
    from acceleratedvolrenderer_tpu.utils import spectrum as sp
    from acceleratedvolrenderer_tpu.utils import vecmath as vm

    flat = sp.constant_spectrum
    R = 10.0
    sphere = Sphere(center=np.zeros(3), radius=R,
                    material=DiffuseMaterial(reflectance=flat(0.5)))
    # two point lights of different power: adaptive pmfs differ per point
    lights = [lm.PointLight(position=np.array([0.0, 3.0, 0.0]),
                            spectrum=flat(0.5 * np.pi * R * R)),
              lm.PointLight(position=np.array([0.0, -3.0, 0.0]),
                            spectrum=flat(0.5 * np.pi * R * R))]
    cam = PerspectiveCamera(c2w=vm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)),
                            fov_deg=50.0, width=8, height=8)

    def run(strategy):
        sc = Scene(camera=cam, medium=None, lights=lights,
                   primitives=[sphere], max_depth=8, filter=BoxFilter(),
                   spp=48, scene_radius=30.0, integrator="path",
                   light_sampler=strategy)
        img, _ = render_mod.render(sc)
        return (img @ np.array([0.2126, 0.7152, 0.0722])).mean()

    lum_u = run("uniform")
    lum_b = run("bvh")
    assert abs(lum_u - 1.0) < 0.08, lum_u
    assert abs(lum_b - 1.0) < 0.08, lum_b


def test_dielectric_sphere_furnace_in_medium():
    """Smooth dielectric sphere inside a scattering medium under a uniform
    environment: reflection and refraction preserve energy exactly
    (probability-proportional lobe choice, f/pdf = 1 up to the eta^2
    radiance scale that cancels on exit), so L == 1 everywhere
    (VERDICT r1 #10: specular surfaces in the fused path, furnace-tested
    inside a medium)."""
    from acceleratedvolrenderer_tpu.models.materials import DielectricMaterial
    from acceleratedvolrenderer_tpu.models.media import homogeneous_box

    med = homogeneous_box(flat(0.0), flat(0.4), lo=(-2, -2, -2),
                          hi=(2, 2, 2), g=0.0)
    sphere = Sphere(center=np.array([0.0, 0.0, 1.0]), radius=0.6,
                    material=DielectricMaterial(eta=1.5))
    scene = Scene(
        camera=cam(8, eye=(0, 0, -2.0), look=(0, 0, 1)), medium=med,
        lights=[lm.UniformInfiniteLight(spectrum=flat(1.0))],
        primitives=[sphere], max_depth=48, filter=BoxFilter(), spp=192,
        scene_radius=20.0,
    )
    img, _ = render_mod.render(scene)
    avg = lum(img).mean()
    assert abs(avg - 1.0) < 0.035, avg
    assert np.abs(lum(img) - 1.0).max() < 0.15


def test_mirror_conductor_in_medium_reflects_sun():
    """Near-perfect smooth conductor in a thin medium: the mirror image of
    the bright distant light must appear in the reflection direction, and
    a high-k conductor reflects ~everything (mean close to the no-sphere
    render since the env is uniform apart from the sun)."""
    from acceleratedvolrenderer_tpu.models.materials import ConductorMaterial
    from acceleratedvolrenderer_tpu.models.media import homogeneous_box

    med = homogeneous_box(flat(0.0), flat(0.02), lo=(-4, -4, -4),
                          hi=(4, 4, 4), g=0.0)
    mirror = ConductorMaterial(eta=0.01, k=1000.0)   # R ~ 1
    sphere = Sphere(center=np.array([0.0, 0.0, 2.0]), radius=1.0,
                    material=mirror)
    scene = Scene(
        camera=cam(12, eye=(0, 0, -2.0), look=(0, 0, 1)), medium=med,
        lights=[lm.UniformInfiniteLight(spectrum=flat(0.5))],
        primitives=[sphere], max_depth=8, filter=BoxFilter(), spp=96,
        scene_radius=20.0,
    )
    img, _ = render_mod.render(scene)
    assert np.isfinite(img).all()
    # a ~R=1 mirror under a uniform env returns the env radiance: the
    # sphere region should read ~0.5 like the background
    center = lum(img)[5:7, 5:7].mean()
    assert abs(center - 0.5) < 0.06, center


def test_conductor_fresnel_partial_reflection():
    """A realistic conductor (finite k) absorbs 1 - F: the reflected
    radiance must be measurably below the environment level and close to
    the analytic normal-incidence Fresnel value at the sphere center."""
    from acceleratedvolrenderer_tpu.models import bxdfs as bxdfs_mod
    from acceleratedvolrenderer_tpu.models.materials import ConductorMaterial
    from acceleratedvolrenderer_tpu.models.media import homogeneous_box

    eta_v, k_v = 1.0, 3.0
    med = homogeneous_box(flat(0.0), flat(1e-4), lo=(-4, -4, -4),
                          hi=(4, 4, 4), g=0.0)
    sphere = Sphere(center=np.array([0.0, 0.0, 2.0]), radius=1.0,
                    material=ConductorMaterial(eta=eta_v, k=k_v))
    scene = Scene(
        camera=cam(12, eye=(0, 0, -2.0), look=(0, 0, 1)), medium=med,
        lights=[lm.UniformInfiniteLight(spectrum=flat(1.0))],
        primitives=[sphere], max_depth=6, filter=BoxFilter(), spp=96,
        scene_radius=20.0,
    )
    img, _ = render_mod.render(scene)
    F0 = float(bxdfs_mod.fresnel_conductor(
        jnp.ones(()), jnp.full((), eta_v), jnp.full((), k_v)))
    center = lum(img)[5:7, 5:7].mean()
    assert abs(center - F0) < 0.08, (center, F0)
    assert center < 0.92      # clearly below the env level
