"""Differentiable rendering driver.

North-star requirement (BASELINE.json): pixel gradients w.r.t. per-voxel
sigma_t/sigma_s/emission matching finite differences.  The estimator is the
detached-sampling form (see volpath_fused docstring): with the majorant held
fixed, sample paths are parameter-independent, so reverse-mode AD through
the weight products is an unbiased gradient — and because the RNG is
counter-based, finite differences of the *estimator itself* (same seeds,
same majorant) agree with AD to float precision, which is the testable
contract.

Parameter families (DIFF_PARAMS, all FD-gated in tests/test_diff.py):
  density  — extinction-density voxel grid (scatter-add over trilerp taps)
  sigma_a  — absorption-spectrum coefficient
  sigma_s  — scattering-spectrum coefficient
  Le_grid  — per-voxel emission scale (GridMedium LeScale/temperature
             analogue, media.h:300-316)

Under the sharded renderer the replicated-parameter gradients psum over
the mesh (`make_sharded_loss`) exactly like any data-parallel model —
tested against the single-device gradient on the virtual CPU mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.integrators import volpath_fused
from ..ops import dda
from ..utils import spectrum as sp

#: differentiable parameter families (BASELINE contract: d(pixel)/d each)
DIFF_PARAMS = ("density", "sigma_a", "sigma_s", "Le_grid")


def _diff_setup(scene, majorant_inflation):
    med_spec = scene.medium
    assert med_spec is not None and not med_spec.homogeneous, (
        "differentiable path optimizes a density grid"
    )
    from ..ops import grid as gridops

    maj_res = med_spec.maj_res()
    majorant_const = jnp.asarray(
        gridops.build_majorant_grid(np.asarray(med_spec.density), maj_res)
        * majorant_inflation
    )
    # frozen sampling-side density: decisions/pdfs stay at the build-time
    # field, making the sample distribution parameter-independent
    density_s_const = jnp.asarray(med_spec.density, jnp.float32)
    return med_spec, maj_res, majorant_const, density_s_const


def _make_render_L(scene, fixed_steps, majorant_inflation):
    """Shared differentiable per-ray radiance body.

    Returns render_L(params, sample_idx, pix, pixidx) -> (L, swl) plus the
    frozen density (the default when params omits 'density')."""
    cam = scene.camera
    med_spec, maj_res, majorant_const, density_s_const = _diff_setup(
        scene, majorant_inflation)

    def render_L(params, sample_idx, pix, pixidx):
        N = pix.shape[0]
        rng = dda.seed_stream(pixidx, jnp.full((N,), sample_idx, jnp.uint32),
                              salt=scene.seed)
        rng, ua = dda.pcg_uniform(rng)
        rng, ub = dda.pcg_uniform(rng)
        off = scene.filter.sample_offset(jnp.stack([ua, ub], -1)) + 0.5
        rng, ul = dda.pcg_uniform(rng)
        swl = sp.sample_wavelengths_visible(ul)
        o, d = cam.generate_rays(pix, off, None)
        ca = params.get("sigma_a", jnp.float32(1.0))
        cs = params.get("sigma_s", jnp.float32(1.0))
        sa0 = med_spec.sigma_a_spec(swl.lam) * med_spec.scale
        ss0 = med_spec.sigma_s_spec(swl.lam) * med_spec.scale
        Le = (med_spec.Le_spec(swl.lam) * med_spec.Le_scale
              if med_spec.Le_spec is not None else jnp.zeros_like(swl.lam))
        density = params.get("density", density_s_const)
        med = dda.MediumArrays(
            density=density, majorant=majorant_const,
            w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
            g=jnp.float32(med_spec.g), sigma_a=sa0 * ca, sigma_s=ss0 * cs,
            Le=Le,
            density_s=density_s_const,
            Le_grid=params.get("Le_grid", None),
            # sampling side frozen at the base spectra: sample paths are
            # coefficient-independent, so FD of the estimator == AD
            sigma_a_s=jax.lax.stop_gradient(sa0),
            sigma_s_s=jax.lax.stop_gradient(ss0),
        )
        res = volpath_fused.li(
            med, scene.lights, o, d, swl.lam, rng,
            maj_res=maj_res, homogeneous=False,
            max_depth=scene.max_depth, scene_radius=scene.scene_radius,
            fixed_steps=fixed_steps,
        )
        return res.L, swl

    return render_L, density_s_const


def make_diff_renderer_multi(scene, *, fixed_steps: int = 256, spp: int = 4,
                             majorant_inflation: float = 1.5):
    """Multi-parameter differentiable renderer.

    Returns (loss_fn, grad_fn) over a params dict with keys from
    DIFF_PARAMS (any subset; missing entries use scene values and get no
    gradient).  Loss = mean pixel luminance over `spp` deterministic
    samples.  The majorant is frozen at `majorant_inflation` x the
    build-time density max so it stays an upper bound under optimization
    perturbations (the reference's majorant is conservative-by-
    construction, media.cpp:240-246); sigma coefficients must stay within
    the same headroom.
    """
    H, W = scene.camera.height, scene.camera.width
    render_L, _ = _make_render_L(scene, fixed_steps, majorant_inflation)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1),
                      jnp.int32)
    pixidx = jnp.arange(H * W, dtype=jnp.uint32)

    @jax.jit
    def loss_fn(params):
        total = 0.0
        for s in range(spp):
            L, swl = render_L(params, jnp.uint32(s), pix, pixidx)
            y = sp.y_luminance(L, swl)
            total = total + jnp.sum(y)
        return total / (spp * H * W)

    return loss_fn, jax.jit(jax.grad(loss_fn))


def make_sharded_loss(scene, mesh, *, fixed_steps: int = 256, spp: int = 2,
                      majorant_inflation: float = 1.5,
                      axis_name: str = "rays"):
    """Data-parallel version of the multi-param loss: pixels shard over the
    mesh, parameters are replicated, and the scalar loss psums over ICI —
    so jax.grad of it all-reduces the parameter gradients exactly like a
    replicated-model training step.  Must be bit-compatible with
    make_diff_renderer_multi's loss (RNG streams key on the global pixel
    index, which sharding does not change)."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:          # older jax
        from jax.experimental.shard_map import shard_map

    H, W = scene.camera.height, scene.camera.width
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert (H * W) % n_dev == 0, (
        f"film {W}x{H} must divide evenly over {n_dev} devices")
    render_L, _ = _make_render_L(scene, fixed_steps, majorant_inflation)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1),
                      jnp.int32)
    pixidx = jnp.arange(H * W, dtype=jnp.uint32)

    def local_loss(params, pix_l, pixidx_l):
        total = 0.0
        for s in range(spp):
            L, swl = render_L(params, jnp.uint32(s), pix_l, pixidx_l)
            y = sp.y_luminance(L, swl)
            total = total + jnp.sum(y)
        return jax.lax.psum(total, axis_name) / (spp * H * W)

    try:
        sharded = shard_map(
            local_loss, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name)),
            out_specs=P(), check_vma=False)
    except TypeError:            # older jax spells it check_rep
        sharded = shard_map(
            local_loss, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name)),
            out_specs=P(), check_rep=False)

    @jax.jit
    def loss_fn(params):
        return sharded(params, pix, pixidx)

    return loss_fn, jax.jit(jax.grad(loss_fn))


def make_diff_renderer(scene, *, fixed_steps: int = 256, spp: int = 4,
                       majorant_inflation: float = 1.5):
    """Density-only convenience wrapper (round-1 API): returns
    (loss_fn(density), grad_fn(density))."""
    loss_multi, grad_multi = make_diff_renderer_multi(
        scene, fixed_steps=fixed_steps, spp=spp,
        majorant_inflation=majorant_inflation)

    def loss_fn(density):
        return loss_multi({"density": density})

    def grad_fn(density):
        return grad_multi({"density": density})["density"]

    return loss_fn, grad_fn


def image_and_density_grad(scene, density=None, **kw):
    """Convenience: mean-luminance loss value + d loss / d density grid."""
    loss_fn, grad_fn = make_diff_renderer(scene, **kw)
    dens = jnp.asarray(scene.medium.density if density is None else density,
                       jnp.float32)
    return float(loss_fn(dens)), np.asarray(grad_fn(dens))


def _regen_loss_builder(scene, *, fixed_steps=192, n_lanes=None, spp=2,
                        majorant_inflation=1.5, accum_spp=False,
                        k_substeps=8, retire_groups=1,
                        stochastic_filter=False, remat_window=None,
                        work_stride=1, slim=True):
    """Shared core of the differentiable regen path.

    Returns loss_core(density, cot_flat) = sum(cot . film_render(density))
    — the exact VJP contract of the production film (the film is a pure
    scatter-add of retired samples, so the dot with a cotangent image
    commutes with accumulation).  With slim=True the film never enters
    the loop carry (loss-cotangent mode, see volpath_fused retire stages)
    which is what makes windowed remat at 720p/256^3 feasible; slim=False
    keeps the film scatter in-loop (the r2-r4 path, kept as the contract
    check that both programs produce identical gradients).
    """
    med_spec, maj_res, majorant_const, density_s_const = _diff_setup(
        scene, majorant_inflation)
    cam = scene.camera
    H, W = cam.height, cam.width
    LANES = sp.N_SPECTRUM_SAMPLES
    total_work = H * W * spp
    N = int(n_lanes or min(4096, total_work))
    from .render import work_stride_for

    def sigma_a_fn(lam):
        return med_spec.sigma_a_spec(lam) * med_spec.scale

    def sigma_s_fn(lam):
        return med_spec.sigma_s_spec(lam) * med_spec.scale

    def Le_fn(lam):
        return (med_spec.Le_spec(lam) * med_spec.Le_scale
                if med_spec.Le_spec is not None else jnp.zeros_like(lam))

    def loss_core(density, cot_flat, work_base=None, local_total=None):
        med = dda.MediumArrays(
            density=density, majorant=majorant_const,
            w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
            g=jnp.float32(med_spec.g),
            sigma_a=jnp.zeros((LANES,)), sigma_s=jnp.zeros((LANES,)),
            Le=jnp.zeros((LANES,)),
            density_s=density_s_const,
        )
        lt = total_work if local_total is None else local_total
        n_here = int(min(N, lt))
        regen = dict(
            camera=cam, filter=scene.filter, sampler=scene.sampler,
            spp=spp, H=H, W=W, total_work=lt, seed=scene.seed,
            sigma_a_fn=sigma_a_fn, sigma_s_fn=sigma_s_fn, Le_fn=Le_fn,
            film_rgb=(jnp.zeros((1,)) if slim
                      else jnp.zeros((3 * (H * W + 1),))),
            work_stride=(work_stride_for(H * W) if work_stride == "auto"
                         else int(work_stride)),
        )
        if slim:
            regen["loss_cotangent"] = cot_flat
        if work_base is not None:
            regen["work_base"] = work_base
            regen["global_total"] = total_work
        res = volpath_fused.li(
            med, scene.lights,
            jnp.zeros((n_here, 3)), jnp.zeros((n_here, 3)),
            jnp.zeros((n_here, LANES)), jnp.zeros((n_here,), jnp.uint32),
            maj_res=maj_res, homogeneous=False,
            max_depth=scene.max_depth, scene_radius=scene.scene_radius,
            fixed_steps=fixed_steps, remat_window=remat_window,
            k_substeps=k_substeps, stochastic_filter=stochastic_filter,
            retire_groups=retire_groups, accum_spp=accum_spp,
            regen=regen)
        if slim:
            return res.film_rgb[0]
        return jnp.sum(res.film_rgb * cot_flat)

    return loss_core, (H, W)


def mean_loss_cotangent(H, W, spp):
    """Flat channel-major cotangent for loss = mean(film / spp): every
    real film element weighs 1/(3*H*W*spp); the per-channel discard slot
    (out-of-frame / out-of-queue splats) weighs 0."""
    cot = np.full((3, H * W + 1), 1.0 / (3 * H * W * spp), np.float32)
    cot[:, H * W] = 0.0
    return jnp.asarray(cot.reshape(-1))


def make_diff_regen_renderer(scene, *, fixed_steps: int = 192,
                             n_lanes: Optional[int] = None, spp: int = 2,
                             majorant_inflation: float = 1.5,
                             accum_spp: bool = False,
                             k_substeps: int = 8, retire_groups: int = 1,
                             stochastic_filter: bool = False,
                             remat_window: Optional[int] = None,
                             work_stride=1, slim: bool = True):
    """Differentiable PRODUCTION path: gradients through the film the
    path-regeneration renderer produces (VERDICT r2 weak #7 — the regen
    forward program and the differentiable program must not be disjoint).

    Same program as render.make_regen_renderer (spawn -> fused loop ->
    film retire -> respawn, including the accum_spp in-lane spp
    accumulation production mode) with the while_loop swapped for the
    bounded rematerialized scan (fixed_steps; remat_window enables the
    two-level checkpointing that makes 720p/256^3-scale backward passes
    fit in HBM); density is the differentiable parameter, sampling side
    frozen at the build-time field (density_s + frozen majorant), so FD
    of the loss on shared RNG streams equals AD to float precision.

    Returns (loss_fn(density), grad_fn(density)); loss = mean film rgb.
    """
    loss_core, (H, W) = _regen_loss_builder(
        scene, fixed_steps=fixed_steps, n_lanes=n_lanes, spp=spp,
        majorant_inflation=majorant_inflation, accum_spp=accum_spp,
        k_substeps=k_substeps, retire_groups=retire_groups,
        stochastic_filter=stochastic_filter, remat_window=remat_window,
        work_stride=work_stride, slim=slim)
    cot = mean_loss_cotangent(H, W, spp)

    @jax.jit
    def loss_fn(density):
        return loss_core(density, cot)

    return loss_fn, jax.jit(jax.grad(loss_fn))


def make_regen_film_vjp(scene, **kw):
    """Pixel-gradient VJP of the production regen film: returns
    vjp_fn(density, image_cot) -> d(sum(image_cot . film)) / d(density)
    for an arbitrary (H, W, 3) cotangent image — the BASELINE 'pixel
    gradients w.r.t. density voxels' contract at the film level (any
    single-pixel one-hot cotangent gives that pixel's voxel gradients).
    """
    loss_core, (H, W) = _regen_loss_builder(scene, slim=True, **kw)

    @jax.jit
    def vjp_fn(density, image_cot):
        cot = jnp.concatenate(
            [image_cot.reshape(H * W, 3).T,
             jnp.zeros((3, 1), image_cot.dtype)], axis=1).reshape(-1)
        return jax.grad(loss_core)(density, cot)

    return vjp_fn


def make_sharded_regen_grad(scene, mesh, *, fixed_steps: int,
                            n_lanes: int = 4096, spp: int = 2,
                            microbatches: int = 2,
                            majorant_inflation: float = 1.5,
                            accum_spp: bool = True,
                            k_substeps: int = 8, retire_groups: int = 1,
                            stochastic_filter: bool = False,
                            remat_window: Optional[int] = None,
                            overlap: bool = True,
                            axis_name: str = "rays"):
    """Multi-chip gradient of the PRODUCTION regen loss with the grad
    all-reduce overlapped with the backward sweep (BASELINE north star:
    'replicated density-grid parameter gradients all-reduce over ICI
    overlapped with the backward sweep').

    Each device renders its contiguous slice of the global pixel queue;
    the slice is split into `microbatches` independent regen programs.
    As soon as microbatch m's backward sweep produces its density
    cotangent, that full-grid partial gradient REDUCE-SCATTERS over the
    mesh (lax.psum_scatter) while microbatch m+1's forward+backward is
    still computing — XLA's async collectives let the scatter ride ICI
    concurrently, hiding the 67 MB/microbatch reduction behind compute.
    Each device accumulates only its 1/n_dev gradient shard (ZeRO-style),
    which is also the natural layout for a sharded optimizer step.

    overlap=False keeps one terminal psum of the fully-accumulated local
    gradient instead (the r4 pattern) — the A/B for the collective-
    placement measurement and the equality test.

    Returns loss_and_grad(density) -> (loss, grad):
      overlap=True  -> grad is this device's flat shard, shape
                       (ceil(n_vox/n_dev),) per device (global view:
                       (n_dev*shard,) — np.asarray and reshape to compare)
      overlap=False -> grad is the replicated full grid.
    RNG streams key on global (pixel, sample): the summed loss and
    gradient are device-count- and microbatch-count-invariant (up to
    float add order).
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:          # older jax
        from jax.experimental.shard_map import shard_map

    H, W = scene.camera.height, scene.camera.width
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_items = H * W          # accum_spp: a work item is a pixel
    if not accum_spp:
        n_items = H * W * spp
    assert n_items % (n_dev * microbatches) == 0, (
        f"work items {n_items} must divide over {n_dev} devices x "
        f"{microbatches} microbatches")
    per_dev = n_items // n_dev
    per_mb = per_dev // microbatches
    unit = spp if accum_spp else 1   # work_base is in (pixel, sample) units

    loss_core, _ = _regen_loss_builder(
        scene, fixed_steps=fixed_steps, n_lanes=n_lanes, spp=spp,
        majorant_inflation=majorant_inflation, accum_spp=accum_spp,
        k_substeps=k_substeps, retire_groups=retire_groups,
        stochastic_filter=stochastic_filter, remat_window=remat_window,
        slim=True)
    cot = mean_loss_cotangent(H, W, spp)
    med_spec = scene.medium
    n_vox = int(np.prod(med_spec.density.shape))
    shard_len = -(-n_vox // n_dev)
    pad = n_dev * shard_len - n_vox

    def local_loss_grad(density):
        dev = jax.lax.axis_index(axis_name)
        loss_acc = jnp.float32(0.0)
        g_acc = (jnp.zeros((shard_len,), jnp.float32) if overlap
                 else jnp.zeros(density.shape, jnp.float32))
        for m in range(microbatches):
            base = ((dev * per_dev + m * per_mb) * unit).astype(jnp.int32)

            def mb_loss(d, base=base):
                return loss_core(d, cot, work_base=base,
                                 local_total=per_mb * unit)

            lm, vjp_fn = jax.vjp(mb_loss, density)
            (gm,) = vjp_fn(jnp.float32(1.0))
            loss_acc = loss_acc + lm
            if overlap:
                gm_flat = gm.reshape(-1)
                if pad:
                    gm_flat = jnp.concatenate(
                        [gm_flat, jnp.zeros((pad,), gm_flat.dtype)])
                # reduce-scatter THIS microbatch's partial gradient now:
                # issued mid-sweep, XLA schedules it async so it overlaps
                # microbatch m+1's compute
                g_acc = g_acc + jax.lax.psum_scatter(
                    gm_flat.reshape(n_dev, shard_len), axis_name,
                    scatter_dimension=0)
            else:
                g_acc = g_acc + gm
        loss = jax.lax.psum(loss_acc, axis_name)
        if not overlap:
            g_acc = jax.lax.psum(g_acc, axis_name)
        return loss, g_acc

    out_grad_spec = P(axis_name) if overlap else P()
    try:
        smapped = shard_map(local_loss_grad, mesh=mesh, in_specs=(P(),),
                            out_specs=(P(), out_grad_spec), check_vma=False)
    except TypeError:            # older jax spells it check_rep
        smapped = shard_map(local_loss_grad, mesh=mesh, in_specs=(P(),),
                            out_specs=(P(), out_grad_spec), check_rep=False)

    return jax.jit(smapped)
