"""Render driver: spp-wave batching, jit, film accumulation.

Reference: ImageTileIntegrator::Render (cpu/integrators.cpp:72) — wave loop
with exponentially growing spp waves, tile ParallelFor2D, partial-image
writes, MSE logging.  TPU-native: a "tile" is the whole frame (one SoA ray
batch per wave); multi-chip sharding shards the ray batch over the mesh
(parallel/mesh.py) — no tiles, no thread pool; `jax.jit` + donation keeps
film accumulation on-device across waves.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.film import Film
from ..models.integrators import volpath_fused as volpath
from ..ops import dda
from ..utils import spectrum as sp


def work_stride_for(hw: int) -> int:
    """Coprime stride for the regen work->pixel permutation (occupancy:
    each refill batch must mix sky and in-medium pixels — see
    volpath_fused.work_pixel).  Kept below 2^31/hw so the uint32 modular
    product cannot overflow; ~golden-ratio fraction of the cap for good
    spread; gcd(stride, hw) == 1 keeps it a bijection."""
    if hw <= 4:
        return 1
    cap = max((1 << 31) // hw - 1, 1)
    s = max(int(cap * 0.618), 1) | 1
    while np.gcd(s, hw) != 1:
        s += 2
    # hw-1 is always coprime with hw — safe fallback for tiny frames
    return int(s) if s < hw else hw - 1


def make_wave_renderer(scene, *, rays_per_wave: Optional[int] = None):
    """Build a jitted single-wave render fn: (film, density, sample_idx) ->
    film.

    One wave traces one camera sample for every pixel, processed in
    fixed-size ray *chunks* (the wavefront scanline-chunk trick,
    wavefront/integrator.cpp:231-234): the jitted chunk program is
    independent of film resolution, so it compiles once and is reused
    across chunks, waves, and even scenes sharing the medium config.

    The density grid is an explicit argument so the same compiled renderer
    serves the differentiable path (gradients w.r.t. density flow through
    trilerp taps; the delta-tracking decisions use the majorant built
    outside, i.e. the detached-sampling estimator).
    """
    cam = scene.camera
    H, W = cam.height, cam.width
    med_spec = scene.medium
    homogeneous = med_spec.homogeneous if med_spec is not None else True
    maj_res = med_spec.maj_res() if med_spec is not None else (1, 1, 1)
    lights = scene.lights
    filt = scene.filter

    if med_spec is not None and not homogeneous:
        density_const = (jnp.asarray(med_spec.density, jnp.float32)
                         if med_spec.density is not None
                         else jnp.ones((1, 1, 1), jnp.float32))
        majorant_const = jnp.asarray(med_spec.build_majorant())
    else:
        density_const = jnp.ones((1, 1, 1), jnp.float32)
        majorant_const = jnp.ones((1, 1, 1), jnp.float32)

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix_all = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.int32)
    pb = getattr(scene, "pixel_bounds", None)
    if pb is not None:
        # --pixelbounds/--pixel/--cropwindow: render only the sub-rect
        # (film stays full-res; untouched pixels keep zero weight).
        # Intersect with the film extent like the reference (film.cpp:114-118)
        # — warn if clipped, error if the intersection is empty.
        x0, x1, y0, y1 = pb
        cx0, cx1 = max(0, int(x0)), min(W, int(x1))
        cy0, cy1 = max(0, int(y0)), min(H, int(y1))
        if cx0 >= cx1 or cy0 >= cy1:
            raise ValueError(
                f"pixel bounds ({x0},{x1},{y0},{y1}) do not intersect the "
                f"{W}x{H} film")
        if (cx0, cx1, cy0, cy1) != (int(x0), int(x1), int(y0), int(y1)):
            import warnings
            warnings.warn(
                f"pixel bounds clipped to film extent: "
                f"({cx0},{cx1},{cy0},{cy1})")
        keep = ((pix_all[:, 0] >= cx0) & (pix_all[:, 0] < cx1)
                & (pix_all[:, 1] >= cy0) & (pix_all[:, 1] < cy1))
        pix_all = pix_all[keep]
    total = len(pix_all)
    chunk = min(rays_per_wave or 262144, total)
    n_chunks = (total + chunk - 1) // chunk
    pad = n_chunks * chunk - total
    if pad:
        pix_all = np.concatenate([pix_all, np.full((pad, 2), -1, np.int32)])
    pix_chunks = jnp.asarray(pix_all.reshape(n_chunks, chunk, 2))
    # RNG streams are keyed by the FLAT PIXEL INDEX (y*W + x), not the work
    # index, so a bounds-restricted render reproduces the exact same pixel
    # values as the full frame (--pixel debugging relies on this)
    idx_all = (pix_all[:, 1].astype(np.int64) * W
               + pix_all[:, 0]).astype(np.uint32)
    idx_chunks = jnp.asarray(idx_all.reshape(n_chunks, chunk))

    @partial(jax.jit, donate_argnums=(0,))
    def render_chunk(film: Film, density, majorant, sample_idx, pix, pixidx):
        N = pix.shape[0]
        from ..models import samplers as samplers_mod

        sidx = jnp.full((N,), sample_idx, jnp.uint32)
        ua, ub, rng = samplers_mod.film_sample(
            scene.sampler, pixidx, sidx, scene.spp, seed=scene.seed, pix=pix)
        # camera sample: filter-importance-sampled film offset
        off = filt.sample_offset(jnp.stack([ua, ub], -1)) + 0.5
        if getattr(scene, "disable_pixel_jitter", False):
            off = jnp.full_like(off, 0.5)    # --disable-pixel-jitter
        # wavelengths
        rng, ul = dda.pcg_uniform(rng)
        if getattr(scene, "disable_wavelength_jitter", False):
            ul = jnp.full_like(ul, 0.5)      # --disable-wavelength-jitter
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
                med, lights, o, d, swl.lam, rng,
                maj_res=maj_res, homogeneous=homogeneous,
                max_depth=scene.max_depth, scene_radius=scene.scene_radius,
                max_march_steps=scene.max_march_steps,
                rgb_mode=med_spec.rgb,
                prims=tuple(scene.primitives),
                light_strategy=getattr(scene, "light_sampler", "uniform"),
            )
            L = res.L
        elif scene.primitives:
            integ = getattr(scene, "integrator", "volpath")
            if integ in ("path", "simplepath", "randomwalk", "ao"):
                from ..models.integrators import path as path_mod

                if integ == "path":
                    # low-discrepancy samplers cover the path-interior
                    # dims too (samplers.h Get1D advancing `dimension`;
                    # VERDICT r1 #30): dims 0.. of the per-(pixel,sample)
                    # point feed BSDF/light draws via the source seam
                    usrc = None
                    if scene.sampler not in ("independent",):
                        # no rng= here: PathSampler's post-max_dims fallback
                        # must live on its own salted stream, not share the
                        # caller's state (which li_path also returns)
                        usrc = samplers_mod.PathSampler(
                            scene.sampler, pixidx, sidx, scene.spp,
                            seed=scene.seed + 0x9A7)
                    L, rng = path_mod.li_path(
                        tuple(scene.primitives), scene.lights, o, d, swl.lam,
                        rng, max_depth=scene.max_depth,
                        light_strategy=getattr(scene, "light_sampler", "uniform"),
                        regularize=getattr(scene, "regularize", False),
                        uniform_source=usrc)
                elif integ == "simplepath":
                    # SimplePathIntegrator defaults: samplelights without MIS
                    L, rng = path_mod.li_path(
                        tuple(scene.primitives), scene.lights, o, d, swl.lam,
                        rng, max_depth=scene.max_depth, nee=True, mis=False)
                elif integ == "randomwalk":
                    L, rng = path_mod.li_random_walk(
                        tuple(scene.primitives), scene.lights, o, d, swl.lam,
                        rng, max_depth=scene.max_depth)
                else:
                    L, rng = path_mod.li_ao(
                        tuple(scene.primitives), scene.lights, o, d, swl.lam,
                        rng)
            else:
                # volpath over an empty medium (zero majorant)
                med = dda.MediumArrays(
                    density=jnp.ones((1, 1, 1)), majorant=jnp.zeros((1, 1, 1)),
                    w2m=jnp.eye(4), g=jnp.float32(0.0),
                    sigma_a=jnp.zeros_like(swl.lam),
                    sigma_s=jnp.zeros_like(swl.lam),
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

            Le_inf, _ = lights_mod.escaped_radiance(lights, d, swl.lam)
            L = Le_inf

        return film.add_samples(pix, L, swl)

    def render_wave(film: Film, density, majorant, sample_idx):
        for ci in range(n_chunks):
            film = render_chunk(film, density, majorant, sample_idx,
                                pix_chunks[ci], idx_chunks[ci])
        return film

    return render_wave, density_const, majorant_const


def make_regen_renderer(scene, *, n_lanes: int = 4096,
                        spp: Optional[int] = None, k_substeps: int = 16,
                        stochastic_filter: bool = False,
                        retire_every: int = 1,
                        retire_groups: int = 1,
                        sub_rounds: int = 1,
                        accum_spp: bool = False,
                        event_groups: int = 1,
                        unroll: int = 0,
                        work_stride=1,
                        record_alive: bool = False,
                        count_events: bool = False,
                        residual_shadow: bool = False):
    """Path-regeneration renderer: ONE fused kernel renders the whole
    frame x spp workload at ~full SIMD occupancy.

    The chunked wave driver (make_wave_renderer) runs every lane until the
    LAST ray of the chunk finishes — measured occupancy on the cloud scene
    is ~4%.  Here a retiring lane immediately pulls the next (pixel, sample)
    work item (wavefront path regeneration: the reference's per-sample
    GenerateCameraRays stage, wavefront/integrator.cpp:290-435, moved inside
    the loop), so only the final tail of the whole frame runs partially
    occupied.  RNG streams are keyed by (pixel, sample) exactly as in the
    chunked driver — the estimate per sample is bitwise identical; only the
    film accumulation order differs (float-associativity ulps).
    """
    cam = scene.camera
    H, W = cam.height, cam.width
    spp = spp if spp is not None else scene.spp
    med_spec = scene.medium
    assert med_spec is not None, "regen renderer requires a medium"
    homogeneous = med_spec.homogeneous
    maj_res = med_spec.maj_res()
    lights = scene.lights
    LANES = sp.N_SPECTRUM_SAMPLES

    if not homogeneous:
        density_const = (jnp.asarray(med_spec.density, jnp.float32)
                         if med_spec.density is not None
                         else jnp.ones((1, 1, 1), jnp.float32))
        majorant_const = jnp.asarray(med_spec.build_majorant())
    else:
        density_const = jnp.ones((1, 1, 1), jnp.float32)
        majorant_const = jnp.ones((1, 1, 1), jnp.float32)
    minorant_const = None
    if residual_shadow and not homogeneous and med_spec.density is not None \
            and not med_spec.rgb:
        from ..ops import grid as gridops

        minorant_const = jnp.asarray(gridops.build_minorant_grid(
            np.asarray(med_spec.density), med_spec.maj_res()))

    total_work = H * W * spp
    N = int(min(n_lanes, total_work))

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

    # loop bound: per-ray cap scaled by the number of refills
    refills = (total_work + N - 1) // N
    iter_cap = int(scene.max_march_steps) * (refills + 1)

    def _li(density, majorant, film_rgb, external_loop):
        med = dda.MediumArrays(
            density=density, majorant=majorant,
            w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
            g=jnp.float32(med_spec.g),
            sigma_a=jnp.zeros((LANES,)), sigma_s=jnp.zeros((LANES,)),
            Le=jnp.zeros((LANES,)), minorant=minorant_const, **rgb_kw)
        regen = dict(
            camera=cam, filter=scene.filter, sampler=scene.sampler,
            spp=spp, H=H, W=W, total_work=total_work, seed=scene.seed,
            sigma_a_fn=sigma_a_fn, sigma_s_fn=sigma_s_fn, Le_fn=Le_fn,
            film_rgb=film_rgb,
            max_component=getattr(scene, "max_component", jnp.inf),
            # measured neutral on the 720p bench (retire throughput is not
            # the binding constraint — docs/PROFILE_r03.md); opt-in knob
            work_stride=(work_stride_for(H * W) if work_stride == "auto"
                         else int(work_stride)),
        )
        return volpath.li(
            med, lights,
            jnp.zeros((N, 3)), jnp.zeros((N, 3)),
            jnp.zeros((N, LANES)), jnp.zeros((N,), jnp.uint32),
            maj_res=maj_res, homogeneous=homogeneous,
            max_depth=scene.max_depth, scene_radius=scene.scene_radius,
            max_march_steps=iter_cap, rgb_mode=med_spec.rgb,
            k_substeps=k_substeps, stochastic_filter=stochastic_filter,
            retire_every=retire_every, retire_groups=retire_groups,
            sub_rounds=sub_rounds, accum_spp=accum_spp,
            event_groups=event_groups,
            prims=tuple(scene.primitives), regen=regen,
            light_strategy=getattr(scene, "light_sampler", "uniform"),
            record_alive=record_alive, count_events=count_events,
            residual_shadow=residual_shadow,
            external_loop=external_loop)

    if unroll > 0 and not record_alive:
        # ---- host-driven unrolled chunks.  MEASURED DEAD END for perf
        # (docs/PROFILE_r03.md): straight-line placement does NOT change
        # the ~7ns/element scatter/gather lowering in the real program,
        # and host readbacks over the axon tunnel cost ~29ms each —
        # end-to-end 1.0-1.9 Mrays/s vs 7.4 for the on-device while_loop.
        # Kept as an inspection/debugging seam: the loop body runs
        # `unroll` times per jitted call with the loop on the host.
        # Estimates agree with the while-loop driver to fusion-
        # reassociation ulps (~5e-7 observed); extra post-completion
        # iterations are exact no-ops (all lanes PC_DONE, work=-1, masked
        # draws don't advance streams).
        @partial(jax.jit, donate_argnums=(2,))
        def start_fn(density, majorant, film_rgb):
            regs, _, _ = _li(density, majorant, film_rgb, True)
            return regs

        @partial(jax.jit, donate_argnums=(2,))
        def chunk_fn(density, majorant, regs):
            _, body, cond_ = _li(density, majorant, regs.film_rgb, True)
            c = regs
            for _ in range(unroll):
                c = body(c)
            return c, cond_(c)

        max_chunks = iter_cap // unroll + 2
        lookahead = 4

        def run(density, majorant, film_rgb):
            regs = start_fn(density, majorant, film_rgb)
            pending = []
            for _ in range(max_chunks):
                regs, busy = chunk_fn(density, majorant, regs)
                pending.append(busy)
                if len(pending) > lookahead:
                    if not bool(pending.pop(0)):
                        break
            return regs.film_rgb

        return run, density_const, majorant_const

    @partial(jax.jit, donate_argnums=(2,))
    def run(density, majorant, film_rgb):
        res = _li(density, majorant, film_rgb, False)
        if record_alive:
            return res.film_rgb, res.alive_hist
        if count_events:
            return res.film_rgb, res.ev_counts
        return res.film_rgb

    return run, density_const, majorant_const


def render_regen(scene, spp: Optional[int] = None, n_lanes: int = 4096,
                 k_substeps: int = 16, stochastic_filter: bool = False,
                 **knobs):
    """Full render via path regeneration: ((H, W, 3) image, stats).

    stochastic_filter=True swaps the per-collision 8-tap trilerp for the
    1-tap stochastic-filtering estimate (ops.grid.stochastic_corner) —
    same mean, ~2x faster on large grids; off by default so estimates stay
    bitwise-equal to the chunked wave driver.  Extra knobs (retire_groups,
    accum_spp, work_stride, ...) forward to make_regen_renderer."""
    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    run, density, majorant = make_regen_renderer(
        scene, n_lanes=n_lanes, spp=spp, k_substeps=k_substeps,
        stochastic_filter=stochastic_filter, **knobs)
    film_rgb = jnp.zeros((3 * (H * W + 1),))
    t0 = time.time()
    film_rgb = run(density, majorant, film_rgb)
    jax.block_until_ready(film_rgb)
    dt = time.time() - t0
    # channel-major flat film -> (H, W, 3); per-sample weight == 1 so the
    # normalizer is exactly spp
    img = (np.asarray(film_rgb).reshape(3, H * W + 1)[:, :H * W].T
           / float(spp))
    img = img.reshape(H, W, 3).astype(np.float32)
    return img, {"render_time": dt, "spp": spp,
                 "rays_per_sec": H * W * spp / dt}


def render(scene, spp: Optional[int] = None, progress: bool = False):
    """Full render: returns ((H, W, 3) numpy image, stats dict)."""
    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    render_wave, density, majorant = make_wave_renderer(scene)
    film = Film.create(H, W)
    t0 = time.time()
    for s in range(spp):
        film = render_wave(film, density, majorant, jnp.uint32(s))
        if progress and (s & (s + 1)) == 0:
            jax.block_until_ready(film)
            print(f"  wave {s + 1}/{spp}  {time.time() - t0:.1f}s", flush=True)
    jax.block_until_ready(film)
    dt = time.time() - t0
    img = np.asarray(film.to_image())
    return img, {"render_time": dt, "spp": spp, "rays_per_sec": H * W * spp / dt}


def render_lightpath(scene, spp: Optional[int] = None, n_paths_per_wave=None):
    """LightPathIntegrator driver (cpu/integrators.cpp:322): traces
    H*W light paths per wave and splats through the camera; the image is
    the splat sum over the total path count (see light_path.py's
    measurement derivation)."""
    from ..models import samplers as samplers_mod
    from ..models.integrators import light_path as lp_mod

    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    n_paths = n_paths_per_wave or (H * W)

    @partial(jax.jit, donate_argnums=(0,))
    def wave(splat_sum, sample_idx):
        pidx = jnp.arange(n_paths, dtype=jnp.uint32)
        sidx = jnp.full((n_paths,), sample_idx, jnp.uint32)
        rng = dda.seed_stream(pidx, sidx, salt=scene.seed + 17)
        rng, ul = dda.pcg_uniform(rng)
        swl = sp.sample_wavelengths_visible(ul)
        pix, val, rng = lp_mod.trace_light_paths(
            tuple(scene.primitives), scene.lights, scene.camera,
            n_paths, swl.lam, rng, max_depth=scene.max_depth,
            light_strategy=getattr(scene, "light_sampler", "uniform"))
        # spectral -> xyz -> rgb accumulation (same sensor path as Film)
        from ..utils import colorspace as cspace
        from ..utils import spectrum as spu

        n_splat = pix.shape[0]
        reps = n_splat // n_paths
        swl_r = spu.SampledWavelengths(jnp.tile(swl.lam, (reps, 1)),
                                       jnp.tile(swl.pdf, (reps, 1)))
        rgb = cspace.xyz_to_rgb(spu.to_xyz(val, swl_r))
        rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)
        flat_idx = jnp.where(pix[:, 0] >= 0,
                             pix[:, 1] * W + pix[:, 0], H * W)
        acc = jnp.zeros((H * W + 1, 3)).at[flat_idx].add(rgb)
        return splat_sum + acc[:H * W].reshape(H, W, 3)

    splat = jnp.zeros((H, W, 3))
    t0 = time.time()
    for s in range(spp):
        splat = wave(splat, jnp.uint32(s))
    jax.block_until_ready(splat)
    dt = time.time() - t0
    img = np.asarray(splat) / (spp * n_paths)
    return img, {"render_time": dt, "spp": spp, "n_paths": spp * n_paths}


def make_graph_wave_renderer(scene, graph):
    """Wave renderer using the graph-cache integrator ("graph" in the
    reference integrator factory, cpu/integrators.cpp:3697).

    `graph` is a graph.model.Graph with light_scalar populated; the light
    spectrum comes from the scene's first delta light (the reference samples
    the distant light's spectrum, graph_integrator.cpp:243).
    """
    from ..models.integrators import graph as graph_integrator

    cam = scene.camera
    H, W = cam.height, cam.width
    med_spec = scene.medium
    homogeneous = med_spec.homogeneous
    maj_res = med_spec.maj_res()
    filt = scene.filter
    # UniformGraph renders with voxel lookups; FreeGraph with the radius-
    # escalated weighted search (graph_integrator.cpp:138-177 vs :249-280)
    uniform = getattr(graph, "kind", "free") == "uniform"
    index = (graph_integrator.build_uniform_index(graph) if uniform
             else graph_integrator.build_connect_index(graph))
    light = next(lt for lt in scene.lights if lt.is_delta)

    if not homogeneous:
        density_const = jnp.asarray(med_spec.density, jnp.float32)
        from ..ops import grid as gridops

        majorant_const = jnp.asarray(
            gridops.build_majorant_grid(np.asarray(med_spec.density), maj_res)
        )
    else:
        density_const = jnp.ones((1, 1, 1), jnp.float32)
        majorant_const = jnp.ones((1, 1, 1), jnp.float32)

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pixel_xy_const = jnp.asarray(
        np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1), jnp.int32
    )
    pixel_index_const = jnp.arange(H * W, dtype=jnp.uint32)

    @partial(jax.jit, donate_argnums=(0,))
    def render_wave(film: Film, density, majorant, sample_idx):
        N = H * W
        pix = pixel_xy_const
        rng = dda.seed_stream(pixel_index_const,
                              jnp.full((N,), sample_idx, jnp.uint32),
                              salt=scene.seed)
        rng, ua = dda.pcg_uniform(rng)
        rng, ub = dda.pcg_uniform(rng)
        off = filt.sample_offset(jnp.stack([ua, ub], -1)) + 0.5
        rng, ul = dda.pcg_uniform(rng)
        swl = sp.sample_wavelengths_visible(ul)
        o, d = cam.generate_rays(pix, off, None)
        sa = med_spec.sigma_a_spec(swl.lam) * med_spec.scale
        ss = med_spec.sigma_s_spec(swl.lam) * med_spec.scale
        med = dda.MediumArrays(
            density=density, majorant=majorant,
            w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
            g=jnp.float32(med_spec.g), sigma_a=sa, sigma_s=ss,
            Le=jnp.zeros_like(swl.lam),
        )
        light_spec = light.spectrum(swl.lam) * light.scale
        li_fn = (graph_integrator.li_uniform if uniform
                 else graph_integrator.li)
        L = li_fn(
            med, index, light_spec, o, d, swl.lam, rng,
            maj_res=maj_res, homogeneous=homogeneous,
            max_march_steps=scene.max_march_steps,
        )
        return film.add_samples(pix, L, swl)

    return render_wave, density_const, majorant_const


def render_graph(scene, graph, spp=None):
    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    render_wave, density, majorant = make_graph_wave_renderer(scene, graph)
    film = Film.create(H, W)
    t0 = time.time()
    for s in range(spp):
        film = render_wave(film, density, majorant, jnp.uint32(s))
    jax.block_until_ready(film)
    dt = time.time() - t0
    img = np.asarray(film.to_image())
    return img, {"render_time": dt, "spp": spp, "rays_per_sec": H * W * spp / dt}


def render_with_aovs(scene, spp=None):
    """Render + auxiliary outputs (GBufferFilm capability, film.h:319):
    per-pixel sample variance (the reference's GBuffer variance channels)
    estimated Welford-style over per-wave images, and the mean image.

    Returns (img, {"variance": (H, W, 3), "relative_variance": ...}, stats).
    """
    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    render_wave, density, majorant = make_wave_renderer(scene)
    mean = np.zeros((H, W, 3), np.float64)
    m2 = np.zeros((H, W, 3), np.float64)
    t0 = time.time()
    prev = np.zeros((H, W, 3), np.float32)
    film = Film.create(H, W)
    prev_w = np.zeros((H, W), np.float32)
    for s in range(spp):
        film = render_wave(film, density, majorant, jnp.uint32(s))
        cur_sum = np.asarray(film.rgb_sum)
        cur_w = np.asarray(film.weight_sum)
        dw = np.maximum(cur_w - prev_w, 1e-12)[..., None]
        wave_img = (cur_sum - prev) / dw
        prev = cur_sum
        prev_w = cur_w
        delta = wave_img - mean
        mean += delta / (s + 1)
        m2 += delta * (wave_img - mean)
    dt = time.time() - t0
    img = np.asarray(film.to_image())
    var = (m2 / max(spp - 1, 1) / spp).astype(np.float32)  # variance of the mean
    aovs = {
        "variance": var,
        "relative_variance": var / (img.astype(np.float64) ** 2 + 1e-4),
    }
    return img, aovs, {"render_time": dt, "spp": spp}


def render_gbuffer(scene, spp: Optional[int] = None):
    """Geometric AOVs from the first camera-ray surface interaction
    (GBufferFilm channels, film.h:319: P, N/Ns, uv, albedo, plus depth).

    Purely geometric — one batched intersect over the opaque primitive
    list; volumetric scenes with no surfaces return inf depth / zeros.
    Combine with render_with_aovs for the variance channels.
    """
    from ..models import materials as materials_mod
    from ..models import shapes as shapes_mod
    from ..models.integrators.path import _gather_mat_params, _take

    H, W = scene.height, scene.width
    cam = scene.camera
    opaque = tuple(p for p in scene.primitives if p.material is not None)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1),
                      jnp.int32)
    N = H * W
    t0 = time.time()
    o, d = cam.generate_rays(pix, jnp.full((N, 2), 0.5), None)
    if opaque:
        hit = shapes_mod.intersect_all(opaque, o, d, jnp.inf)
        lam = jnp.full((N, sp.N_SPECTRUM_SAMPLES), 550.0)
        p_ctx = jnp.where(jnp.isfinite(hit.t)[:, None],
                          o + jnp.nan_to_num(hit.t, posinf=0.0)[:, None] * d,
                          o)
        prm = _gather_mat_params(opaque, lam, hit.uv, N, p=p_ctx, n=hit.n)
        mid = jnp.clip(hit.prim_id, 0, len(opaque) - 1)
        alb_spec = _take(jnp.asarray(prm["albedo"]), mid)
        from ..utils import colorspace as cspace

        swl = sp.SampledWavelengths(lam, jnp.ones_like(lam))
        found = jnp.isfinite(hit.t)
        p_hit = jnp.where(found[:, None], o + hit.t[:, None] * d, 0.0)
        n_hit = jnp.where(found[:, None], hit.n, 0.0)
        # mean albedo over the hero wavelengths as displayable RGB
        alb = jnp.where(found[:, None], alb_spec, 0.0)
        alb_rgb = cspace.xyz_to_rgb(sp.to_xyz(alb * sp.CIE_Y_INTEGRAL, swl))
        uv = jnp.where(found[:, None], hit.uv, 0.0)
        depth = hit.t
    else:
        p_hit = jnp.zeros((N, 3))
        n_hit = jnp.zeros((N, 3))
        alb_rgb = jnp.zeros((N, 3))
        uv = jnp.zeros((N, 2))
        depth = jnp.full((N,), jnp.inf)
    aovs = {
        "P": np.asarray(p_hit).reshape(H, W, 3),
        "N": np.asarray(n_hit).reshape(H, W, 3),
        "albedo": np.asarray(jnp.clip(alb_rgb, 0, None)).reshape(H, W, 3),
        "uv": np.asarray(uv).reshape(H, W, 2),
        "depth": np.asarray(depth).reshape(H, W),
    }
    return aovs, {"render_time": time.time() - t0}


def render_spectral(scene, spp: Optional[int] = None, n_buckets: int = 16):
    """Render into a SpectralFilm (film.h:401): RGB + per-wavelength-bucket
    channel images.  Uses the chunked wave driver with the bucketing film.
    """
    from ..models.film import SpectralFilm

    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    render_wave, density, majorant = make_wave_renderer(scene)
    film = SpectralFilm.create(H, W, n_buckets=n_buckets)
    t0 = time.time()
    for s in range(spp):
        film = render_wave(film, density, majorant, jnp.uint32(s))
    jax.block_until_ready(film.rgb_sum)
    dt = time.time() - t0
    return film, {"render_time": dt, "spp": spp,
                  "rays_per_sec": H * W * spp / dt}
