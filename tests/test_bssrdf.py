"""BSSRDF tests: profile math + integrator-level energy behavior
(bssrdf.{h,cpp} capability via normalized diffusion)."""
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.models import bssrdf
from acceleratedvolrenderer_tpu.utils import spectrum as sp


def flat(c):
    return sp.constant_spectrum(c)


def test_profile_integrates_to_albedo():
    """Planar integral of Sp over r in 2D = A (normalized diffusion)."""
    rs = np.linspace(1e-4, 0.5, 20000)
    dr = rs[1] - rs[0]
    A, ell = 0.7, 0.01
    sp = np.asarray(bssrdf.profile(
        jnp.asarray(rs, jnp.float32),
        jnp.full((len(rs), 1), A), jnp.full((len(rs), 1), ell)))[:, 0]
    integral = (sp * 2 * np.pi * rs * dr).sum()
    assert abs(integral - A) < 0.02 * A, integral


def test_sample_r_matches_cdf():
    """Sampled radii reproduce the analytic CDF."""
    rng = np.random.default_rng(0)
    n = 20000
    A, ell = 0.5, 0.02
    u = jnp.asarray(rng.random(n), jnp.float32)
    r = np.asarray(bssrdf.sample_r(u, jnp.full((n,), A), jnp.full((n,), ell)))
    s = float(np.asarray(bssrdf.scaling_factor(A)))
    x = s * np.median(r) / ell
    cdf_med = 1 - np.exp(-x) / 4 - 3 * np.exp(-x / 3) / 4
    assert abs(cdf_med - 0.5) < 0.02


def test_subsurface_furnace_bounded():
    """White subsurface sphere under a point furnace light: energy is
    conserved within MC noise and below the perfect-diffuse bound."""
    from acceleratedvolrenderer_tpu.models import lights as lm
    from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
    from acceleratedvolrenderer_tpu.models.film import BoxFilter
    from acceleratedvolrenderer_tpu.models.materials import (
        DiffuseMaterial, SubsurfaceMaterial)
    from acceleratedvolrenderer_tpu.models.shapes import Sphere
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import Scene
    from acceleratedvolrenderer_tpu.utils import spectrum as sp
    from acceleratedvolrenderer_tpu.utils import vecmath as vm

    def run(mat):
        sphere = Sphere(center=np.array([0.0, 0.0, 3.0]), radius=1.0,
                        material=mat)
        light = lm.PointLight(position=np.array([0.0, 3.0, 3.0]),
                              spectrum=sp.constant_spectrum(30.0))
        cam = PerspectiveCamera(
            c2w=vm.look_at((0, 0, 0), (0, 0, 3), (0, 1, 0)),
            fov_deg=40.0, width=12, height=12)
        sc = Scene(camera=cam, medium=None, lights=[light],
                   primitives=[sphere], max_depth=5, filter=BoxFilter(),
                   spp=32, scene_radius=10.0, integrator="path")
        img, _ = render_mod.render(sc)
        return img

    img_ss = run(SubsurfaceMaterial(reflectance_rgb=(0.8, 0.8, 0.8),
                                    mfp_rgb=(0.05, 0.05, 0.05)))
    img_d = run(DiffuseMaterial(reflectance=sp.constant_spectrum(0.8)))
    assert np.isfinite(img_ss).all()
    assert img_ss.max() > 0
    # same order of magnitude as the diffuse sphere; not brighter than
    # physically possible (factor covers Fresnel + MC noise)
    assert img_ss.mean() < img_d.mean() * 1.5
    assert img_ss.mean() > img_d.mean() * 0.2


def test_subsurface_translucency_tint():
    """Channel-dependent mfp tints multiple-scattered light (red bleeds
    farther when mfp_r >> mfp_gb)."""
    from acceleratedvolrenderer_tpu.models import lights as lm
    from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
    from acceleratedvolrenderer_tpu.models.film import BoxFilter
    from acceleratedvolrenderer_tpu.models.materials import SubsurfaceMaterial
    from acceleratedvolrenderer_tpu.models.shapes import Sphere
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import Scene
    from acceleratedvolrenderer_tpu.utils import spectrum as sp
    from acceleratedvolrenderer_tpu.utils import vecmath as vm

    sphere = Sphere(center=np.array([0.0, 0.0, 3.0]), radius=1.0,
                    material=SubsurfaceMaterial(
                        reflectance_rgb=(0.9, 0.9, 0.9),
                        mfp_rgb=(0.2, 0.01, 0.01)))
    # light from behind-left: the shadowed limb picks up red-shifted bleed
    light = lm.PointLight(position=np.array([2.5, 0.0, 4.5]),
                          spectrum=sp.constant_spectrum(40.0))
    cam = PerspectiveCamera(c2w=vm.look_at((0, 0, 0), (0, 0, 3), (0, 1, 0)),
                            fov_deg=40.0, width=16, height=16)
    sc = Scene(camera=cam, medium=None, lights=[light], primitives=[sphere],
               max_depth=5, filter=BoxFilter(), spp=48, scene_radius=10.0,
               integrator="path")
    img, _ = render_mod.render(sc)
    # shadow-side half of the sphere
    left = img[:, :6][img[:, :6].sum(-1) > 1e-5]
    assert len(left) > 0
    assert left[:, 0].mean() > left[:, 2].mean()


def test_beam_diffusion_table_properties():
    """Tabulated photon-beam-diffusion profile (bssrdf.cpp
    ComputeBeamDiffusionBSSRDF): effective albedo is monotone in the
    single-scattering albedo, spans ~[0, 1], and each channel's planar
    pdf integrates to 1."""
    import jax.numpy as jnp

    from acceleratedvolrenderer_tpu.models import bssrdf
from acceleratedvolrenderer_tpu.utils import spectrum as sp


def flat(c):
    return sp.constant_spectrum(c)

    t = bssrdf.compute_beam_diffusion_table(g=0.0, eta=1.33)
    assert np.all(np.diff(t["rho_eff"]) >= -1e-9)
    assert t["rho_eff"][0] == 0.0 and t["rho_eff"][-1] > 0.9
    tab = bssrdf.tabulated_channel_arrays(
        t, np.array([0.5, 0.7, 0.2]), np.array([0.01, 0.01, 0.02]))
    r = np.linspace(1e-5, 0.3, 30000)
    pdf = np.asarray(bssrdf.tabulated_pdf_r(tab, jnp.asarray(r, jnp.float32)))
    integ = np.trapezoid(pdf * 2 * np.pi * r[:, None], r, axis=0)
    np.testing.assert_allclose(integ, 1.0, atol=0.03)
    # inverse-CDF sampling reproduces the pdf's mean radius (channel 0)
    u = jnp.asarray(np.linspace(1e-4, 1 - 1e-4, 4096), jnp.float32)
    rs = np.asarray(bssrdf.tabulated_sample_r(
        tab, jnp.zeros((4096,), jnp.int32), u))
    mean_pdf = np.trapezoid(pdf[:, 0] * 2 * np.pi * r * r, r)
    assert abs(rs.mean() - mean_pdf) / mean_pdf < 0.08, (rs.mean(), mean_pdf)


def test_tabulated_profile_render_matches_burley():
    """Both profiles target the same diffuse reflectance, so the rendered
    subsurface sphere must agree in mean brightness to ~12% (model
    difference + MC)."""
    import dataclasses

    from acceleratedvolrenderer_tpu.models.materials import SubsurfaceMaterial
    from acceleratedvolrenderer_tpu.models.shapes import Sphere
    from acceleratedvolrenderer_tpu.models import lights as lm
    from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
    from acceleratedvolrenderer_tpu.models.film import BoxFilter
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import Scene
    from acceleratedvolrenderer_tpu.utils import vecmath as vm

    def build(profile):
        mat = SubsurfaceMaterial(reflectance_rgb=(0.6, 0.5, 0.4),
                                 mfp_rgb=(0.05, 0.05, 0.05),
                                 profile=profile)
        ball = Sphere(center=np.zeros(3), radius=1.0, material=mat)
        scene = Scene(
            camera=PerspectiveCamera(
                c2w=vm.look_at((0, 0.4, -3.2), (0, 0, 0), (0, 1, 0)),
                fov_deg=36.0, width=10, height=10),
            medium=None,
            lights=[lm.UniformInfiniteLight(spectrum=flat(1.0),
                                            scene_radius=30.0)],
            primitives=[ball], max_depth=5, filter=BoxFilter(), spp=64,
            scene_radius=30.0)
        scene.integrator = "path"
        img, _ = render_mod.render(scene)
        return float(np.asarray(img).mean())

    m_b = build("burley")
    m_t = build("tabulated")
    assert abs(m_t - m_b) / max(m_b, 1e-9) < 0.12, (m_b, m_t)
