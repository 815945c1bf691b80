"""Device mesh + sharded rendering.

Reference parallelism inventory (SURVEY.md §2.4): the C++ renderer has only
intra-host threads (ParallelFor2D tile pool) and CUDA offload.  The
TPU-native scale-out replaces all of it with SPMD over a `jax.sharding.Mesh`:

  * rays/pixels shard over the mesh's 'rays' axis (pure data parallel —
    paths are independent, the one cross-device reduction is film
    accumulation);
  * the density/majorant grids and light list replicate;
  * film partials `psum` over ICI at wave end (gradients of the grids
    all-reduce the same way in the differentiable path);
  * multi-host: same program — jax.distributed handles DCN process groups,
    the mesh spans all devices, per-host batches are the host's addressable
    shards.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_rays(mesh: Mesh, *arrays, axis_name: str = "rays"):
    """Place ray-batch arrays with their leading dim sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis_name))
    return tuple(jax.device_put(a, sh) for a in arrays)


def make_sharded_wave_renderer(scene, mesh: Mesh, axis_name: str = "rays"):
    """Sharded single-wave renderer via shard_map.

    Each device traces its slice of the pixel batch and accumulates a local
    film; films `psum` over the mesh so every device holds the full frame
    (replicated film out — cheap at typical film sizes, and it keeps the
    wave loop free of host gathers).
    """
    from jax import shard_map

    from ..models.film import Film
    from ..models.integrators import volpath_fused as volpath
    from ..ops import dda
    from ..utils import spectrum as sp

    cam = scene.camera
    H, W = cam.height, cam.width
    n_dev = int(np.prod(mesh.devices.shape))
    total = H * W
    pad = (-total) % n_dev
    n_padded = total + pad

    med_spec = scene.medium
    homogeneous = med_spec.homogeneous if med_spec is not None else True
    maj_res = med_spec.maj_res() if med_spec is not None else (1, 1, 1)

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix_all = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    if pad:
        pix_all = np.concatenate([pix_all, np.full((pad, 2), -1, np.int32)], 0)
    pix_const = jnp.asarray(pix_all)
    pixidx_const = jnp.arange(n_padded, dtype=jnp.uint32)

    if med_spec is not None and not homogeneous:
        from ..ops import grid as gridops

        density_const = jnp.asarray(med_spec.density, jnp.float32)
        majorant_const = jnp.asarray(
            gridops.build_majorant_grid(np.asarray(med_spec.density), maj_res)
        )
    else:
        density_const = jnp.ones((1, 1, 1), jnp.float32)
        majorant_const = jnp.ones((1, 1, 1), jnp.float32)

    def wave_local(film: Film, density, majorant, sample_idx, pix, pixidx):
        n = pix.shape[0]
        from ..models import samplers as samplers_mod

        sidx = jnp.full((n,), sample_idx, jnp.uint32)
        ua, ub, rng = samplers_mod.film_sample(
            scene.sampler, pixidx, sidx, scene.spp, seed=scene.seed)
        off = scene.filter.sample_offset(jnp.stack([ua, ub], -1)) + 0.5
        rng, ul = dda.pcg_uniform(rng)
        swl = sp.sample_wavelengths_visible(ul)
        o, d = cam.generate_rays(pix, off, None)

        if med_spec is not None:
            sa = med_spec.sigma_a_spec(swl.lam) * med_spec.scale
            ss = med_spec.sigma_s_spec(swl.lam) * med_spec.scale
            Le = (med_spec.Le_spec(swl.lam) * med_spec.Le_scale
                  if med_spec.Le_spec is not None else jnp.zeros_like(swl.lam))
            rgb_kw = {}
            if med_spec.rgb:
                rgb_kw = dict(
                    sigma_a_rgb=jnp.asarray(med_spec.sigma_a_rgb, jnp.float32) * med_spec.scale,
                    sigma_s_rgb=jnp.asarray(med_spec.sigma_s_rgb, jnp.float32) * med_spec.scale,
                    Le_rgb=(jnp.asarray(med_spec.Le_rgb, jnp.float32) * med_spec.Le_scale
                            if med_spec.Le_rgb is not None else None),
                )
            med = dda.MediumArrays(
                density=density, majorant=majorant,
                w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
                g=jnp.float32(med_spec.g), sigma_a=sa, sigma_s=ss, Le=Le,
                **rgb_kw,
            )
            res = volpath.li(
                med, scene.lights, o, d, swl.lam, rng,
                maj_res=maj_res, homogeneous=homogeneous,
                max_depth=scene.max_depth, scene_radius=scene.scene_radius,
                max_march_steps=scene.max_march_steps,
                rgb_mode=med_spec.rgb,
                prims=tuple(scene.primitives),
            )
            L = res.L
        elif scene.primitives:
            # surfaces only: march through an empty medium (zero majorant)
            med = dda.MediumArrays(
                density=jnp.ones((1, 1, 1)), majorant=jnp.zeros((1, 1, 1)),
                w2m=jnp.eye(4), g=jnp.float32(0.0),
                sigma_a=jnp.zeros_like(swl.lam), sigma_s=jnp.zeros_like(swl.lam),
                Le=jnp.zeros_like(swl.lam),
            )
            res = volpath.li(
                med, scene.lights, o, d,
                swl.lam, rng, maj_res=(1, 1, 1), homogeneous=True,
                max_depth=scene.max_depth, scene_radius=scene.scene_radius,
                max_march_steps=scene.max_march_steps,
                prims=tuple(scene.primitives),
            )
            L = res.L
        else:
            from ..models import lights as lights_mod

            Le_inf, _ = lights_mod.escaped_radiance(scene.lights, d, swl.lam)
            L = Le_inf

        local = Film.create(H, W).add_samples(pix, L, swl)
        # cross-device film reduction over ICI
        rgb = jax.lax.psum(local.rgb_sum, axis_name)
        wsum = jax.lax.psum(local.weight_sum, axis_name)
        return Film(film.rgb_sum + rgb, film.weight_sum + wsum)

    smapped = shard_map(
        wave_local,
        mesh=mesh,
        in_specs=(
            Film(P(), P()),              # film (replicated pytree leaves)
            P(), P(), P(),               # density, majorant, sample_idx
            P(axis_name), P(axis_name),  # pix, pixidx
        ),
        out_specs=Film(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,))
    def render_wave(film: Film, density, majorant, sample_idx):
        return smapped(
            film, density, majorant,
            jnp.asarray(sample_idx, jnp.uint32), pix_const, pixidx_const,
        )

    return render_wave, density_const, majorant_const


def render_sharded(scene, mesh: Optional[Mesh] = None, spp: Optional[int] = None):
    import time

    from ..models.film import Film

    mesh = mesh or make_mesh()
    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    render_wave, density, majorant = make_sharded_wave_renderer(scene, mesh)
    film = Film.create(H, W)
    # on the virtual CPU mesh, bound the cross-device dispatch skew: XLA:CPU
    # in-process collectives hard-abort when a rendezvous participant lags
    # 40s behind the first arrival (rendezvous.cc), and a deep async queue
    # of per-wave psum programs on an oversubscribed host accumulates
    # exactly that skew (r3 root cause of the flaky rc=134 suite crashes).
    # Real TPU meshes pipeline fine; sync every wave only on CPU.
    sync_each = jax.default_backend() == "cpu"
    t0 = time.time()
    for s in range(spp):
        film = render_wave(film, density, majorant, s)
        if sync_each:
            jax.block_until_ready(film)
    jax.block_until_ready(film)
    dt = time.time() - t0
    img = np.asarray(film.to_image())
    return img, {"render_time": dt, "spp": spp,
                 "rays_per_sec": H * W * spp / dt,
                 "n_devices": int(np.prod(mesh.devices.shape))}


def make_sharded_regen_renderer(scene, mesh: Mesh, *, n_lanes: int = 4096,
                                spp: Optional[int] = None,
                                k_substeps: int = 16,
                                stochastic_filter: bool = False,
                                retire_groups: int = 1,
                                accum_spp: bool = False,
                                axis_name: str = "rays"):
    """Sharded path-regeneration renderer: each device runs the fused regen
    kernel over its contiguous slice of the global (pixel, sample) work
    queue; per-device films psum over ICI at the end.

    RNG streams are keyed by global (pixel, sample), so the estimate is
    bitwise independent of the device count — only film-add ordering
    (float ulps) differs.  This is the production multi-chip path; the
    chunked make_sharded_wave_renderer remains for film variants.
    """
    from jax import shard_map

    from ..models.integrators import volpath_fused as volpath
    from ..ops import dda
    from ..utils import spectrum as sp

    cam = scene.camera
    H, W = cam.height, cam.width
    spp = spp if spp is not None else scene.spp
    med_spec = scene.medium
    assert med_spec is not None, "regen renderer requires a medium"
    homogeneous = med_spec.homogeneous
    maj_res = med_spec.maj_res()
    LANES = sp.N_SPECTRUM_SAMPLES
    n_dev = int(np.prod(mesh.devices.shape))

    global_total = H * W * spp
    if accum_spp:
        # in-lane spp accumulation (the r4 production mode): a work item
        # is a PIXEL, so device slices must be pixel-aligned (the
        # integrator divides work_base/global_total by spp)
        per_dev = ((H * W + n_dev - 1) // n_dev) * spp
    else:
        per_dev = (global_total + n_dev - 1) // n_dev
    N = int(min(n_lanes, per_dev))

    if not homogeneous:
        density_const = jnp.asarray(med_spec.density, jnp.float32)
        majorant_const = jnp.asarray(med_spec.build_majorant())
    else:
        density_const = jnp.ones((1, 1, 1), jnp.float32)
        majorant_const = jnp.ones((1, 1, 1), jnp.float32)

    def sigma_a_fn(lam):
        return med_spec.sigma_a_spec(lam) * med_spec.scale

    def sigma_s_fn(lam):
        return med_spec.sigma_s_spec(lam) * med_spec.scale

    def Le_fn(lam):
        return (med_spec.Le_spec(lam) * med_spec.Le_scale
                if med_spec.Le_spec is not None else jnp.zeros_like(lam))

    rgb_kw = {}
    if med_spec.rgb:
        rgb_kw = dict(
            sigma_a_rgb=jnp.asarray(med_spec.sigma_a_rgb, jnp.float32) * med_spec.scale,
            sigma_s_rgb=jnp.asarray(med_spec.sigma_s_rgb, jnp.float32) * med_spec.scale,
            Le_rgb=(jnp.asarray(med_spec.Le_rgb, jnp.float32) * med_spec.Le_scale
                    if med_spec.Le_rgb is not None else None),
        )

    refills = (per_dev + N - 1) // N
    iter_cap = int(scene.max_march_steps) * (refills + 1)

    def device_render(density, majorant):
        dev = jax.lax.axis_index(axis_name)
        med = dda.MediumArrays(
            density=density, majorant=majorant,
            w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
            g=jnp.float32(med_spec.g),
            sigma_a=jnp.zeros((LANES,)), sigma_s=jnp.zeros((LANES,)),
            Le=jnp.zeros((LANES,)), **rgb_kw)
        regen = dict(
            camera=cam, filter=scene.filter, sampler=scene.sampler,
            spp=spp, H=H, W=W, total_work=per_dev, seed=scene.seed,
            work_base=(dev * per_dev).astype(jnp.int32),
            global_total=int(global_total),
            sigma_a_fn=sigma_a_fn, sigma_s_fn=sigma_s_fn, Le_fn=Le_fn,
            film_rgb=jnp.zeros((3 * (H * W + 1),)),
            max_component=getattr(scene, "max_component", jnp.inf),
            work_stride=1,   # opt-in (see render.make_regen_renderer)
        )
        res = volpath.li(
            med, scene.lights,
            jnp.zeros((N, 3)), jnp.zeros((N, 3)),
            jnp.zeros((N, LANES)), jnp.zeros((N,), jnp.uint32),
            maj_res=maj_res, homogeneous=homogeneous,
            max_depth=scene.max_depth, scene_radius=scene.scene_radius,
            max_march_steps=iter_cap, rgb_mode=med_spec.rgb,
            k_substeps=k_substeps, stochastic_filter=stochastic_filter,
            retire_groups=retire_groups, accum_spp=accum_spp,
            prims=tuple(scene.primitives), regen=regen,
            light_strategy=getattr(scene, "light_sampler", "uniform"))
        # the one cross-device reduction: film partials over ICI
        return jax.lax.psum(res.film_rgb, axis_name)

    smapped = shard_map(
        device_render, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def run(density, majorant):
        return smapped(density, majorant)

    return run, density_const, majorant_const


def render_sharded_regen(scene, mesh: Optional[Mesh] = None,
                         spp: Optional[int] = None, n_lanes: int = 4096,
                         **knobs):
    import time

    mesh = mesh or make_mesh()
    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    run, density, majorant = make_sharded_regen_renderer(
        scene, mesh, n_lanes=n_lanes, spp=spp, **knobs)
    t0 = time.time()
    film = run(density, majorant)
    jax.block_until_ready(film)
    dt = time.time() - t0
    img = (np.asarray(film).reshape(3, H * W + 1)[:, :H * W].T
           / float(spp)).reshape(H, W, 3).astype(np.float32)
    return img, {"render_time": dt, "spp": spp,
                 "rays_per_sec": H * W * spp / dt,
                 "n_devices": int(np.prod(mesh.devices.shape))}
