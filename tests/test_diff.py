"""Gradient correctness: autodiff vs finite differences.

The north-star gate (BASELINE.json): d(pixel)/d(sigma voxels) allclose to
finite differences.  With counter-based RNG + frozen majorant, perturbing
the density re-runs the *identical* sample paths, so FD of the estimator
must match reverse-mode AD to float precision — a deterministic check, no
MC tolerance needed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.film import BoxFilter
from acceleratedvolrenderer_tpu.models.media import MediumSpec
from acceleratedvolrenderer_tpu.parallel import diff as diff_mod
from acceleratedvolrenderer_tpu.scene import Scene
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm


def flat(c):
    return sp.constant_spectrum(c)


def small_scene(sigma_a=0.5, sigma_s=1.0, with_light=True, le=None, depth=3):
    rng = np.random.default_rng(0)
    dens = (0.5 + 0.5 * rng.random((4, 4, 4))).astype(np.float32)
    med = MediumSpec(
        sigma_a_spec=flat(sigma_a), sigma_s_spec=flat(sigma_s), g=0.0,
        scale=1.0, density=dens,
        bounds_lo=np.zeros(3, np.float32), bounds_hi=np.ones(3, np.float32),
        Le_spec=flat(le) if le else None,
        majorant_res=(2, 2, 2),
    )
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.5, -2.5), (0.5, 0.5, 0.5), (0, 1, 0)),
        fov_deg=30.0, width=6, height=6,
    )
    lights = []
    if with_light:
        lights = [
            lm.DistantLight(direction=np.array([0.0, -1.0, 0.0]),
                            spectrum=flat(5.0), scene_radius=10.0),
            lm.UniformInfiniteLight(spectrum=flat(0.3), scene_radius=10.0),
        ]
    return Scene(camera=cam, medium=med, lights=lights, max_depth=depth,
                 filter=BoxFilter(), spp=2, scene_radius=10.0)


def test_density_grad_matches_fd():
    scene = small_scene()
    loss_fn, grad_fn = diff_mod.make_diff_renderer(scene, fixed_steps=96, spp=2)
    dens = jnp.asarray(scene.medium.density)
    g = np.asarray(grad_fn(dens))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0, "gradient identically zero"

    eps = 2e-3
    # check several voxels incl. the largest-gradient one
    flat_idx = np.argsort(np.abs(g).reshape(-1))[::-1]
    checked = 0
    for fi in flat_idx[[0, 3, 9, 30]]:
        iz, iy, ix = np.unravel_index(fi, g.shape)
        e = np.zeros_like(np.asarray(dens))
        e[iz, iy, ix] = eps
        lp = float(loss_fn(dens + jnp.asarray(e)))
        lmn = float(loss_fn(dens - jnp.asarray(e)))
        fd = (lp - lmn) / (2 * eps)
        ad = g[iz, iy, ix]
        assert abs(fd - ad) <= 2e-3 * max(abs(fd), abs(ad), 1e-3), (
            f"voxel {(iz, iy, ix)}: fd={fd} ad={ad}"
        )
        checked += 1
    assert checked == 4


def test_density_grad_emissive():
    """Emission + absorption: gradient sign at lit voxels is meaningful and
    FD-matching."""
    scene = small_scene(sigma_a=1.0, sigma_s=0.2, with_light=False, le=2.0)
    loss_fn, grad_fn = diff_mod.make_diff_renderer(scene, fixed_steps=96, spp=2)
    dens = jnp.asarray(scene.medium.density)
    g = np.asarray(grad_fn(dens))
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    eps = 2e-3
    fi = int(np.argmax(np.abs(g)))
    iz, iy, ix = np.unravel_index(fi, g.shape)
    e = np.zeros_like(np.asarray(dens))
    e[iz, iy, ix] = eps
    fd = (float(loss_fn(dens + jnp.asarray(e))) -
          float(loss_fn(dens - jnp.asarray(e)))) / (2 * eps)
    assert abs(fd - g[fi // 16 if False else iz, iy, ix]) <= 2e-3 * max(abs(fd), 1e-3)


def test_fixed_steps_matches_while_loop_forward():
    """The scan-mode forward must equal the while-loop forward when the step
    budget covers every path."""
    from acceleratedvolrenderer_tpu.models.integrators import volpath_fused
    from acceleratedvolrenderer_tpu.ops import dda as dda_mod
    from acceleratedvolrenderer_tpu.ops import grid as gridops

    scene = small_scene()
    spec = scene.medium
    dens = jnp.asarray(spec.density)
    maj = jnp.asarray(gridops.build_majorant_grid(np.asarray(spec.density), (2, 2, 2)))
    N = 256
    o = jnp.tile(jnp.array([[0.5, 0.5, -2.0]]), (N, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    lam = jnp.tile(jnp.linspace(400.0, 700.0, 4)[None], (N, 1))
    rng = dda_mod.seed_stream(jnp.arange(N), jnp.zeros(N, jnp.int32))
    med = dda_mod.MediumArrays(
        density=dens, majorant=maj,
        w2m=jnp.asarray(spec.world_to_unit(), jnp.float32),
        g=jnp.float32(0.0),
        sigma_a=jnp.full((1, 4), 0.5), sigma_s=jnp.full((1, 4), 1.0),
        Le=jnp.zeros((1, 4)),
    )
    kw = dict(maj_res=(2, 2, 2), homogeneous=False, max_depth=3,
              scene_radius=10.0)
    r_while = volpath_fused.li(med, scene.lights, o, d, lam, rng, **kw)
    r_scan = volpath_fused.li(med, scene.lights, o, d, lam, rng,
                              fixed_steps=96, **kw)
    np.testing.assert_allclose(np.asarray(r_scan.L), np.asarray(r_while.L),
                               rtol=1e-5, atol=1e-6)


def test_g_gradient_nonzero():
    """Anisotropy gradient flows through the added p/pdf phase factor."""
    from acceleratedvolrenderer_tpu.models.integrators import volpath_fused
    from acceleratedvolrenderer_tpu.ops import dda as dda_mod

    N = 512
    o = jnp.tile(jnp.array([[0.5, 0.5, -2.0]]), (N, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    lam = jnp.tile(jnp.linspace(400.0, 700.0, 4)[None], (N, 1))
    rng = dda_mod.seed_stream(jnp.arange(N), jnp.zeros(N, jnp.int32))
    lights = [lm.DistantLight(direction=np.array([0.0, -1.0, 0.0]),
                              spectrum=flat(5.0), scene_radius=10.0)]

    def loss(gval):
        med = dda_mod.MediumArrays(
            density=jnp.ones((1, 1, 1)), majorant=jnp.ones((1, 1, 1)),
            w2m=jnp.eye(4), g=gval,
            sigma_a=jnp.full((1, 4), 0.1), sigma_s=jnp.full((1, 4), 1.5),
            Le=jnp.zeros((1, 4)),
            g_s=jnp.float32(0.3),   # sampling-side g frozen at the base value
        )
        res = volpath_fused.li(med, lights, o, d, lam, rng, maj_res=(1, 1, 1),
                               homogeneous=True, max_depth=4,
                               scene_radius=10.0, fixed_steps=128)
        return jnp.mean(res.L)

    g0 = jnp.float32(0.3)
    ad = float(jax.grad(loss)(g0))
    eps = 1e-3
    fd = (float(loss(g0 + eps)) - float(loss(g0 - eps))) / (2 * eps)
    assert abs(ad) > 1e-5
    assert abs(fd - ad) <= 5e-2 * max(abs(fd), abs(ad)), (fd, ad)


def test_multi_param_grads_match_fd():
    """BASELINE contract: d(pixel)/d(sigma_a), d/d(sigma_s) spectrum
    coefficients and d/d(Le_grid) emission voxels all FD-match (VERDICT r1
    #4 gradient completeness)."""
    scene = small_scene(sigma_a=0.6, sigma_s=0.9, le=1.5)
    loss_fn, grad_fn = diff_mod.make_diff_renderer_multi(
        scene, fixed_steps=96, spp=2)
    le_grid = jnp.asarray(
        0.5 + np.random.default_rng(1).random((4, 4, 4)), jnp.float32)
    params = {
        "density": jnp.asarray(scene.medium.density),
        "sigma_a": jnp.float32(1.0),
        "sigma_s": jnp.float32(1.0),
        "Le_grid": le_grid,
    }
    g = grad_fn(params)
    # every family produces a live, finite gradient
    for k in ("density", "sigma_a", "sigma_s", "Le_grid"):
        arr = np.asarray(g[k])
        assert np.isfinite(arr).all(), k
        assert np.abs(arr).max() > 0, f"{k} gradient identically zero"

    def fd_scalar(key, eps):
        p1 = dict(params); p1[key] = params[key] + eps
        p2 = dict(params); p2[key] = params[key] - eps
        return (float(loss_fn(p1)) - float(loss_fn(p2))) / (2 * eps)

    for key, eps in (("sigma_a", 1e-3), ("sigma_s", 1e-3)):
        fd = fd_scalar(key, eps)
        ad = float(g[key])
        assert abs(fd - ad) <= 5e-3 * max(abs(fd), abs(ad), 1e-3), (
            key, fd, ad)

    # Le_grid voxel FD at the largest-gradient voxel
    gl = np.asarray(g["Le_grid"])
    iz, iy, ix = np.unravel_index(int(np.argmax(np.abs(gl))), gl.shape)
    eps = 2e-3
    e = np.zeros(gl.shape, np.float32); e[iz, iy, ix] = eps
    p1 = dict(params); p1["Le_grid"] = le_grid + jnp.asarray(e)
    p2 = dict(params); p2["Le_grid"] = le_grid - jnp.asarray(e)
    fd = (float(loss_fn(p1)) - float(loss_fn(p2))) / (2 * eps)
    ad = gl[iz, iy, ix]
    # emission is linear in Le_grid => FD is exact up to float noise
    assert abs(fd - ad) <= 5e-3 * max(abs(fd), abs(ad), 1e-4), (fd, ad)


def test_sharded_grad_matches_single_device():
    """Replicated-parameter gradient psums over the virtual CPU mesh and
    equals the single-device gradient (VERDICT r1 #4 sharded case)."""
    import jax as _jax
    from jax.sharding import Mesh

    scene = small_scene()
    # 8x8 film divides evenly over the 8-device mesh
    scene.camera = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.5, -2.5), (0.5, 0.5, 0.5), (0, 1, 0)),
        fov_deg=30.0, width=8, height=8)
    params = {
        "density": jnp.asarray(scene.medium.density),
        "sigma_a": jnp.float32(1.0),
    }
    loss1, grad1 = diff_mod.make_diff_renderer_multi(
        scene, fixed_steps=96, spp=2)
    mesh = Mesh(np.array(_jax.devices()[:8]), ("rays",))
    loss8, grad8 = diff_mod.make_sharded_loss(
        scene, mesh, fixed_steps=96, spp=2)
    np.testing.assert_allclose(float(loss8(params)), float(loss1(params)),
                               rtol=1e-5)
    g1, g8 = grad1(params), grad8(params)
    np.testing.assert_allclose(np.asarray(g8["density"]),
                               np.asarray(g1["density"]),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(float(g8["sigma_a"]), float(g1["sigma_a"]),
                               rtol=1e-4)


def test_regen_film_grad_matches_fd():
    """Gradients flow through the PRODUCTION regen renderer's film
    (spawn -> fused loop -> film scatter -> respawn), not only the
    chunked wave path; FD on shared streams == AD."""
    scene = small_scene()
    loss_fn, grad_fn = diff_mod.make_diff_regen_renderer(
        scene, fixed_steps=160, n_lanes=24, spp=2)
    dens = jnp.asarray(scene.medium.density)
    g = np.asarray(grad_fn(dens))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0, "gradient identically zero"

    eps = 2e-3
    flat_idx = np.argsort(np.abs(g).reshape(-1))[::-1]
    for fi in flat_idx[[0, 5, 17]]:
        iz, iy, ix = np.unravel_index(fi, g.shape)
        e = np.zeros_like(np.asarray(dens))
        e[iz, iy, ix] = eps
        lp = float(loss_fn(dens + jnp.asarray(e)))
        lm_ = float(loss_fn(dens - jnp.asarray(e)))
        fd = (lp - lm_) / (2 * eps)
        ad = g[iz, iy, ix]
        # 1% relative: the film loss runs through a 160-step scan, so
        # float32 central differences carry more roundoff than the
        # per-ray wave losses (which gate at 0.2%)
        assert abs(fd - ad) <= 1e-2 * max(abs(fd), abs(ad), 1e-3), (
            f"voxel {(iz, iy, ix)}: fd={fd} ad={ad}")


def test_regen_accum_spp_grad_matches_fd():
    """VERDICT r4 #1c: FD-gate a gradient through the PRODUCTION
    accum_spp mode (in-lane spp accumulation + grouped retirement) with
    the two-level windowed rematerialization enabled."""
    scene = small_scene()
    loss_fn, grad_fn = diff_mod.make_diff_regen_renderer(
        scene, fixed_steps=192, n_lanes=24, spp=2, accum_spp=True,
        retire_groups=2, remat_window=32)
    dens = jnp.asarray(scene.medium.density)
    g = np.asarray(grad_fn(dens))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0, "gradient identically zero"

    eps = 2e-3
    flat_idx = np.argsort(np.abs(g).reshape(-1))[::-1]
    for fi in flat_idx[[0, 7]]:
        iz, iy, ix = np.unravel_index(fi, g.shape)
        e = np.zeros_like(np.asarray(dens))
        e[iz, iy, ix] = eps
        fd = (float(loss_fn(dens + jnp.asarray(e)))
              - float(loss_fn(dens - jnp.asarray(e)))) / (2 * eps)
        ad = g[iz, iy, ix]
        assert abs(fd - ad) <= 1e-2 * max(abs(fd), abs(ad), 1e-3), (
            f"voxel {(iz, iy, ix)}: fd={fd} ad={ad}")


def test_regen_slim_loss_matches_film_scatter():
    """The slim loss-cotangent retire mode (film never enters the loop
    carry) must produce the identical loss and gradient as the in-loop
    film scatter-add it replaces."""
    scene = small_scene()
    dens = jnp.asarray(scene.medium.density)
    vals, grads = [], []
    for slim in (True, False):
        loss_fn, grad_fn = diff_mod.make_diff_regen_renderer(
            scene, fixed_steps=160, n_lanes=24, spp=2, slim=slim)
        vals.append(float(loss_fn(dens)))
        grads.append(np.asarray(grad_fn(dens)))
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-5, atol=1e-9)


def test_regen_film_vjp_matches_mean_grad():
    """make_regen_film_vjp with the uniform mean-loss cotangent equals
    the mean-loss gradient; a one-hot pixel cotangent isolates that
    pixel's voxel gradients (pixel-gradient contract at the film level)."""
    scene = small_scene()
    dens = jnp.asarray(scene.medium.density)
    H = W = 6
    vjp_fn = diff_mod.make_regen_film_vjp(
        scene, fixed_steps=160, n_lanes=24, spp=2)
    _, grad_fn = diff_mod.make_diff_regen_renderer(
        scene, fixed_steps=160, n_lanes=24, spp=2)
    cot_mean = jnp.full((H, W, 3), 1.0 / (3 * H * W * 2))
    np.testing.assert_allclose(np.asarray(vjp_fn(dens, cot_mean)),
                               np.asarray(grad_fn(dens)),
                               rtol=1e-5, atol=1e-10)
    # one-hot pixel cotangent: nonzero, finite, and differs from the mean
    cot_px = jnp.zeros((H, W, 3)).at[2, 3, :].set(1.0)
    g_px = np.asarray(vjp_fn(dens, cot_px))
    assert np.isfinite(g_px).all() and np.abs(g_px).max() > 0


def test_sharded_regen_grad_overlap_matches_single():
    """VERDICT r4 #1d: the microbatched reduce-scatter gradient (the
    collective issued per microbatch, mid-backward-sweep) equals the
    terminal-psum gradient and the single-device gradient."""
    import jax as _jax
    from jax.sharding import Mesh

    scene = small_scene()
    scene.camera = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.5, -2.5), (0.5, 0.5, 0.5), (0, 1, 0)),
        fov_deg=30.0, width=8, height=8)
    dens = jnp.asarray(scene.medium.density)
    kw = dict(fixed_steps=192, n_lanes=16, spp=2, accum_spp=True,
              microbatches=2, remat_window=48)
    # single device runs 64 pixels through 16 lanes (4 refills) — needs a
    # larger step budget than the sharded slices (8 work items/device)
    loss1, grad1 = diff_mod.make_diff_regen_renderer(
        scene, fixed_steps=448, n_lanes=16, spp=2, accum_spp=True,
        remat_window=48)
    g1 = np.asarray(grad1(dens))
    l1 = float(loss1(dens))

    mesh = Mesh(np.array(_jax.devices()[:8]), ("rays",))
    lg_overlap = diff_mod.make_sharded_regen_grad(
        scene, mesh, overlap=True, **kw)
    lg_terminal = diff_mod.make_sharded_regen_grad(
        scene, mesh, overlap=False, **kw)
    lo, go = lg_overlap(dens)
    lt, gt = lg_terminal(dens)
    go = np.asarray(go).reshape(-1)[:g1.size].reshape(g1.shape)
    np.testing.assert_allclose(float(lo), l1, rtol=1e-5)
    np.testing.assert_allclose(float(lt), l1, rtol=1e-5)
    np.testing.assert_allclose(go, g1, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gt), g1, rtol=1e-4, atol=1e-8)
