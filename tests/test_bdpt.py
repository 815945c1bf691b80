"""BDPT tests: strategy decomposition structure + statistical agreement with
the forward VolPath estimator on a thin medium (where s=1,t=2 dominates and
equals single-scatter NEE)."""
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.film import BoxFilter
from acceleratedvolrenderer_tpu.models.integrators import bdpt
from acceleratedvolrenderer_tpu.models.media import homogeneous_box
from acceleratedvolrenderer_tpu.scene import Scene
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 #9 test tiering)


def flat(c):
    return sp.constant_spectrum(c)


def lum(img):
    return img @ np.array([0.2126, 0.7152, 0.0722])


def make_scene(ss=0.3, depth=3, spp=8):
    med = homogeneous_box(flat(0.0), flat(ss), lo=(0, 0, 0), hi=(1, 1, 1))
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.5, -3.0), (0.5, 0.5, 0.5), (0, 1, 0)),
        fov_deg=30.0, width=8, height=8,
    )
    return Scene(
        camera=cam, medium=med,
        lights=[lm.DistantLight(direction=np.array([0.0, -1.0, 0.0]),
                                spectrum=flat(5.0), scene_radius=10.0)],
        max_depth=depth, filter=BoxFilter(), spp=spp, scene_radius=10.0,
    )


def test_bdpt_runs_and_decomposes():
    scene = make_scene()
    img, stats, strat = bdpt.render_bdpt(scene, max_depth=3, spp=4)
    assert np.isfinite(img).all()
    # strategies present: unweighted + weighted pairs for (s>=1, t>=2)
    keys = [k for k in strat if k[0] != "w"]
    assert (1, 2) in keys
    assert all(("w",) + k in strat for k in keys)
    # weighted never exceeds unweighted (MIS weight <= 1)
    for k in keys:
        w = strat[("w",) + k]
        u = strat[k]
        assert np.all(w <= u + 1e-5)


def test_bdpt_matches_forward_thin_medium():
    """Optically thin: the (1,2) strategy carries nearly all energy and the
    total must match the forward VolPath estimate."""
    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    scene = make_scene(ss=0.05, depth=2, spp=64)
    img_b, _, _ = bdpt.render_bdpt(scene, max_depth=2, spp=64)
    img_f, _ = render_mod.render(scene)
    # scatter events are rare in a thin medium: compare full-image means
    cb = lum(img_b).mean()
    cf = lum(img_f).mean()
    assert cb > 0 and cf > 0
    assert abs(cb - cf) / cf < 0.25, (cb, cf)


def test_write_strategy_films(tmp_path):
    scene = make_scene()
    _, _, strat = bdpt.render_bdpt(scene, max_depth=2, spp=2)
    bdpt.write_strategy_films(strat, str(tmp_path), depth=2)
    import os

    w = os.listdir(tmp_path / "weights")
    u = os.listdir(tmp_path / "no_weights_L")
    assert any(f.startswith("bdpt_d02_s01_t02") for f in w)
    assert len(w) == len(u) and len(w) > 0


def test_bdpt_t1_splats_present_and_bounded():
    """t = 1 light-tracing strategy: splat images exist, are finite and
    nonzero, and the weighted splat never exceeds the unweighted
    (MIS weight <= 1)."""
    scene = make_scene(ss=0.8, depth=3, spp=8)
    img, _, strat = bdpt.render_bdpt(scene, max_depth=3, spp=8)
    t1_keys = [k for k in strat if k[0] != "w" and k[1] == 1]
    assert (2, 1) in t1_keys, sorted(strat.keys())
    for k in t1_keys:
        u, w = strat[k], strat[("w",) + k]
        assert np.isfinite(u).all() and np.isfinite(w).all()
        assert np.all(w <= u + 1e-5)
    assert strat[(2, 1)].max() > 0.0
    assert np.isfinite(img).all()


def test_bdpt_weighted_total_matches_volpath_dense():
    """With t=1 in the MIS competition, the weighted-strategy total must
    still agree with the forward VolPath render on a denser medium (the
    strategies overlap heavily there, so double counting or wrong weights
    shows up as a mean shift)."""
    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    scene = make_scene(ss=1.2, depth=3, spp=96)
    img_b, _, _ = bdpt.render_bdpt(scene, max_depth=3, spp=96,
                                   keep_strategies=False)
    img_f, _ = render_mod.render(scene)
    cb, cf = lum(img_b).mean(), lum(img_f).mean()
    assert cb > 0 and cf > 0
    assert abs(cb - cf) / cf < 0.12, (cb, cf)


def test_bdpt_surface_vertices_vs_path():
    """General-BDPT surface vertices (cpu/integrators.cpp:1562-2433):
    a diffuse floor in a THIN medium lit by a distant light — BDPT's
    weighted total must statistically match the li_path surface
    integrator (medium nearly transparent, so the image is dominated by
    surface transport: camera->floor->light and the t=1/connection
    strategies must MIS-combine to the same answer)."""
    from acceleratedvolrenderer_tpu.models.materials import DiffuseMaterial
    from acceleratedvolrenderer_tpu.models.shapes import Quad
    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    floor = Quad(origin=np.array([-4.0, 0.05, -4.0]),
                 e1=np.array([8.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 8.0]),
                 material=DiffuseMaterial(reflectance=flat(0.6)))
    med = homogeneous_box(flat(0.0), flat(0.01), lo=(-2, 0, -2),
                          hi=(2, 2, 2))
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.0, 1.2, -2.6), (0.0, 0.3, 0.0), (0, 1, 0)),
        fov_deg=40.0, width=10, height=10)
    scene = Scene(
        camera=cam, medium=med,
        lights=[lm.DistantLight(direction=np.array([0.2, -1.0, 0.1]),
                                spectrum=flat(3.0), scene_radius=20.0)],
        primitives=[floor], max_depth=4, filter=BoxFilter(), spp=64,
        scene_radius=20.0)

    img_b, _, strat = bdpt.render_bdpt(scene, max_depth=4, spp=96,
                                       keep_strategies=True)
    scene.integrator = "path"
    img_p, _ = render_mod.render(scene)
    a, b = lum(np.asarray(img_b)), lum(np.asarray(img_p))
    rel = abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)
    assert rel < 0.08, (a.mean(), b.mean())
    # surface transport must actually flow through light-subpath surface
    # vertices: at least one s>=2 or t=1 strategy is nonzero
    multi = [k for k in strat
             if not isinstance(k[0], str) and k[0] >= 2
             and np.asarray(strat[k]).sum() > 0]
    assert multi, "no light-subpath strategies contributed"


def test_bdpt_rough_conductor_vertices_vs_path():
    """BDPT vertex BSDFs beyond Lambert (VERDICT r3 #5, Vertex::f
    cpu/integrators.cpp:1562-1800): a ROUGH-METAL floor in a thin medium
    — connections evaluate the real Torrance-Sparrow conductor f/pdf at
    the surface vertices, so the weighted total must match the li_path
    forward render.  The r3 Lambert-only approximation rendered this
    scene with a cosine lobe instead of the glossy lobe (wrong image)."""
    from acceleratedvolrenderer_tpu.models.materials import ConductorMaterial
    from acceleratedvolrenderer_tpu.models.shapes import Quad
    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    floor = Quad(origin=np.array([-4.0, 0.05, -4.0]),
                 e1=np.array([8.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 8.0]),
                 material=ConductorMaterial(eta=0.2, k=3.0, roughness=0.35))
    med = homogeneous_box(flat(0.0), flat(0.01), lo=(-2, 0, -2),
                          hi=(2, 2, 2))
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.0, 1.2, -2.6), (0.0, 0.3, 0.0), (0, 1, 0)),
        fov_deg=40.0, width=10, height=10)
    scene = Scene(
        camera=cam, medium=med,
        lights=[lm.DistantLight(direction=np.array([0.2, -1.0, 0.1]),
                                spectrum=flat(3.0), scene_radius=20.0)],
        primitives=[floor], max_depth=4, filter=BoxFilter(), spp=64,
        scene_radius=20.0)

    img_b, _, _ = bdpt.render_bdpt(scene, max_depth=4, spp=128,
                                   keep_strategies=False)
    scene.integrator = "path"
    img_p, _ = render_mod.render(scene)
    a, b = lum(np.asarray(img_b)), lum(np.asarray(img_p))
    assert b.mean() > 0
    rel = abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)
    assert rel < 0.10, (a.mean(), b.mean())
    # the glossy highlight's spatial structure must agree, not just the
    # mean: per-pixel correlation between the two renders
    ar, br = a.reshape(-1), b.reshape(-1)
    corr = np.corrcoef(ar, br)[0, 1]
    assert corr > 0.95, corr


def test_bdpt_rough_glass_slab_adjoint_vs_path():
    """TransportMode-correct connection f (VERDICT r4 #5, pbrt Vertex::f
    with TransportMode::Importance): a vertical ROUGH dielectric slab
    with the sun behind it and the camera in front — the dominant family
    is single-transmission through the slab, sampled by BOTH integrators:
    the forward path via NEE at the slab vertex (radiance-convention f,
    with the side-aware occlusion origin) and BDPT additionally via the
    t=1 light-tracing splat whose slab vertex evaluates IMPORTANCE-
    transport f (etap^2 on transmitted lanes, cancelling the radiance
    1/etap^2).  Checks:
      * weighted BDPT total == forward path render;
      * unweighted (1,2) == unweighted (2,1) — the two strategies
        estimate the SAME integral, and without the adjoint factor the
        splat strategy is off by exactly etap^2 ~ 2.25 (measured ratio
        0.97 with the fix, ~2.4 without);
    also regression-guards the true-normal BSDF frame (a face-forwarded
    frame makes the two subpaths disagree about which side the glass
    is on)."""
    from acceleratedvolrenderer_tpu.models.materials import DielectricMaterial
    from acceleratedvolrenderer_tpu.models.shapes import Quad
    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    slab = Quad(origin=np.array([0.0, -4.0, -4.0]),
                e1=np.array([0.0, 8.0, 0.0]), e2=np.array([0.0, 0.0, 8.0]),
                material=DielectricMaterial(eta=1.5, roughness=0.4))
    med = homogeneous_box(flat(0.0), flat(0.002), lo=(-2, -2, -2),
                          hi=(2, 2, 2))
    cam = PerspectiveCamera(
        c2w=vm.look_at((-1.5, 0.3, 0.0), (0.0, 0.3, 0.0), (0, 1, 0)),
        fov_deg=40.0, width=10, height=10)
    sun_dir = np.array([-1.0, -0.25, 0.15])
    sun_dir /= np.linalg.norm(sun_dir)
    scene = Scene(
        camera=cam, medium=med,
        lights=[lm.DistantLight(direction=sun_dir, spectrum=flat(3.0),
                                scene_radius=20.0)],
        primitives=[slab], max_depth=4, filter=BoxFilter(), spp=64,
        scene_radius=20.0)

    img_b, _, strat = bdpt.render_bdpt(scene, max_depth=4, spp=128,
                                       keep_strategies=True)
    img_p, _ = render_mod.render(scene)
    a, b = lum(np.asarray(img_b)), lum(np.asarray(img_p))
    assert b.mean() > 0
    rel = abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)
    assert rel < 0.08, (a.mean(), b.mean())
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.97, corr
    u12 = lum(np.asarray(strat[(1, 2)])).mean()
    u21 = lum(np.asarray(strat[(2, 1)])).mean()
    assert u12 > 0 and u21 > 0
    ratio = u21 / u12
    assert 0.75 < ratio < 1.35, (
        f"adjoint identity violated: (2,1)/(1,2) = {ratio} "
        "(~2.25 when the importance-transport etap^2 is missing)")


def test_bdpt_diffuse_transmission_no_spurious_adjoint():
    """The importance-transport etap^2 cancellation applies ONLY to
    dielectric vertices: DiffuseTransmissionBxDF::f carries no
    radiance-convention 1/etap^2 (pbrt bxdfs.h — the mode factor lives in
    DielectricBxDF alone), so a translucent-leaf slab's light-subpath
    connections must use f unmodified.  With the adjoint gated on the
    generic eta_d key (always present in the param stack) instead of the
    material kind, transmissive lanes got a spurious x2.25 and the
    unweighted (2,1) light-tracing strategy over-weighted by the same
    factor.  Same geometry as the rough-glass adjoint test."""
    from acceleratedvolrenderer_tpu.models.materials import (
        DiffuseTransmissionMaterial)
    from acceleratedvolrenderer_tpu.models.shapes import Quad
    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    slab = Quad(origin=np.array([0.0, -4.0, -4.0]),
                e1=np.array([0.0, 8.0, 0.0]), e2=np.array([0.0, 0.0, 8.0]),
                material=DiffuseTransmissionMaterial(
                    reflectance=flat(0.2), transmittance=flat(0.5)))
    med = homogeneous_box(flat(0.0), flat(0.002), lo=(-2, -2, -2),
                          hi=(2, 2, 2))
    cam = PerspectiveCamera(
        c2w=vm.look_at((-1.5, 0.3, 0.0), (0.0, 0.3, 0.0), (0, 1, 0)),
        fov_deg=40.0, width=10, height=10)
    sun_dir = np.array([-1.0, -0.25, 0.15])
    sun_dir /= np.linalg.norm(sun_dir)
    scene = Scene(
        camera=cam, medium=med,
        lights=[lm.DistantLight(direction=sun_dir, spectrum=flat(3.0),
                                scene_radius=20.0)],
        primitives=[slab], max_depth=4, filter=BoxFilter(), spp=64,
        scene_radius=20.0)

    img_b, _, strat = bdpt.render_bdpt(scene, max_depth=4, spp=128,
                                       keep_strategies=True)
    # INDEPENDENT forward reference: li_path with the (near-vacuum,
    # tau ~ 1.6%) medium removed — a medium-bearing scene would route
    # render() to the fused volpath whose DT lobes share this commit's
    # code, so a correlated convention error could cancel out
    scene.medium = None
    scene.integrator = "path"
    img_p, _ = render_mod.render(scene)
    a, b = lum(np.asarray(img_b)), lum(np.asarray(img_p))
    assert b.mean() > 0
    rel = abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)
    assert rel < 0.10, (a.mean(), b.mean())
    u12 = lum(np.asarray(strat[(1, 2)])).mean()
    u21 = lum(np.asarray(strat[(2, 1)])).mean()
    assert u12 > 0 and u21 > 0
    ratio = u21 / u12
    assert 0.7 < ratio < 1.4, (
        f"spurious adjoint factor: (2,1)/(1,2) = {ratio} "
        "(~2.25 if etap^2 is applied to non-dielectric transmission)")
