"""VolPath, fused megakernel form — the production TPU integrator.

Same estimator as models.integrators.volpath (see its docstring for the
reference mapping: volpath_custom.cpp:280-609 / cpu/integrators.cpp:962+),
restructured for lockstep SIMD throughput:

  ONE `lax.while_loop` carries every ray through its whole path.  Each ray
  owns a tiny program counter (MARCH / NEE / DONE); every iteration advances
  every unfinished ray by one DDA voxel step *regardless of which stage of
  its path it is in*.  There are no per-bounce or per-stage barriers — a ray
  on bounce 1 marches in the same iteration as a ray finishing its bounce
  7 shadow ray.  This is the wavefront renderer's pipeline
  (wavefront/integrator.cpp:290-435) collapsed into registers: the "queues"
  are mode bits, "queue push" is a masked register write, and stage kernels
  are masked blocks of the single loop body.

  Free flights use tau-target sampling (see ops.dda docstring): one RNG
  draw + one density trilerp per tentative collision rather than per voxel.
  Main-path and shadow-ray marching share the same DDA registers — a ray is
  only ever marching one segment at a time, so the shadow segment borrows
  the registers and the scatter context (throughput, light sample, saved
  direction) lives in its own lanes.

  RNG draws commit per-ray only when consumed, so radiance estimates are
  bitwise independent of batch composition and device sharding.

Surfaces: opaque primitives (diffuse + emissive, models.materials) bound
each main segment (t_max = closest hit); a segment that ends without a real
medium event either shades the surface (NEE + cosine-sampled bounce +
Russian roulette past depth 1, cpu/integrators.cpp surface branch) or picks
up infinite lights.  Scenes without opaque primitives compile the identical
volumetric-only program (python-level gating).

Differentiability (the hand-derived backward pass of SURVEY.md §7 step 5):
  with the majorant held fixed, delta-tracking sample positions and event
  choices are distributed independently of the medium parameters — ALL
  theta-dependence lives in the estimator weights.  The code therefore
  detaches (stop_gradient) every pdf denominator, pdf-ratio tracker
  (r_u/r_l/r_l_s/r_u_s), event probability, and sampled distance, while the
  sigma(x, theta) numerators stay differentiable.  stop_gradient is an
  identity in the forward pass, so the same code serves both paths; passing
  `fixed_steps=n` switches the while_loop to a rematerialized lax.scan so
  jax.grad works end-to-end, giving unbiased d(pixel)/d(density voxel,
  sigma coefficients, g, Le) — validated against finite differences with
  shared RNG (tests/test_diff.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.lax import stop_gradient as sg

from ...ops import phase as phase_ops
from ...ops.dda import (
    MediumArrays,
    dda_init,
    pcg_uniform_masked,
    world_to_medium,
)
from ...ops import grid as gridops
from ...ops import pallas_gather
from ...ops import pallas_march
from ...ops import warps
from ...utils import vecmath as vmu
from ...utils.math import ONE_MINUS_EPSILON
from .. import lights as lights_mod
from .. import shapes as shapes_mod

# program counter values
PC_MARCH = 0
PC_NEE = 1
PC_DONE = 2

_SURF_EPS = 1e-4


class LiResult(NamedTuple):
    L: jnp.ndarray
    rng: jnp.ndarray
    alive_hist: jnp.ndarray | None = None   # (max_iters,) alive count per
    #   loop iteration when record_alive=True (occupancy diagnostics — the
    #   TPU analogue of the reference's STAT_ counters)
    film_rgb: jnp.ndarray | None = None     # (3*(H*W+1),) in regen mode
    ev_counts: jnp.ndarray | None = None    # (2,) [main, shadow] collision
    #   totals when count_events=True (profile-driven design input: the
    #   event mix determines which sampler the residual-tracking lever
    #   can shorten)


class _Regs(NamedTuple):
    # control
    pc: jnp.ndarray          # (N,) int32 program counter
    depth: jnp.ndarray       # (N,) int32 real-scatter count
    rng: jnp.ndarray         # (N,) uint32
    # per-lane spectral context (loop state so lanes can respawn with fresh
    # wavelengths in regen mode; constants otherwise)
    lam: jnp.ndarray         # (N, L) sampled wavelengths
    lam_pdf: jnp.ndarray     # (N, L)
    s_t: jnp.ndarray         # (N, L) sigma_t spectrum (unit density)
    s_a: jnp.ndarray         # (N, L)
    s_s: jnp.ndarray         # (N, L)
    s_le: jnp.ndarray        # (N, L)
    # current segment ray (main path *or* shadow, per pc)
    so: jnp.ndarray          # (N, 3) segment origin
    sd: jnp.ndarray          # (N, 3) segment direction (unit)
    # main path context
    d_main: jnp.ndarray      # (N, 3) path direction (= sd while pc==MARCH)
    # surface hit bounding the current main segment
    t_surf: jnp.ndarray      # (N,) inf = no surface
    n_surf: jnp.ndarray      # (N, 3)
    mat_id: jnp.ndarray      # (N,) int32 index into the opaque prim list
    at_surface: jnp.ndarray  # (N,) bool — NEE/resume context is a surface
    spec_last: jnp.ndarray   # (N,) bool — last bounce was a specular lobe
    #   (pbrt's specularBounce flag: the next emitter/escape hit skips the
    #   light-sampling MIS term, cpu/integrators.cpp:417-448)
    # DDA registers for the active segment
    voxel: jnp.ndarray
    next_t: jnp.ndarray
    dt: jnp.ndarray
    step: jnp.ndarray
    t_exit: jnp.ndarray
    t_cur: jnp.ndarray
    dl_target: jnp.ndarray
    dl_since: jnp.ndarray
    reached: jnp.ndarray
    seg_escaped: jnp.ndarray  # segment ended without reaching the target
    maxd: jnp.ndarray        # (N,) majorant of the current voxel (set by
    #   substep; reused by the event block to avoid a second gather)
    # residual ratio tracking (residual_shadow=True; (N,) zeros otherwise):
    # shadow segments sample collisions against (majorant - minorant) and
    # the control part integral(minorant * dl) accumulates in closed form
    ctrld: jnp.ndarray       # (N,) minorant of the current event voxel
    ctrl_since: jnp.ndarray  # (N,) control depth since the last event
    # spectral state
    L: jnp.ndarray
    beta: jnp.ndarray
    r_u: jnp.ndarray
    r_l: jnp.ndarray
    # NEE context (valid while pc == NEE)
    T_ray: jnp.ndarray       # (N, LANES) shadow ratio-tracking accumulators
    r_l_s: jnp.ndarray
    r_u_s: jnp.ndarray
    ls_L: jnp.ndarray        # light sample radiance
    ls_pdf: jnp.ndarray      # (N,) light pdf (incl. sampler pmf)
    f_spec: jnp.ndarray      # (N, LANES) NEE numerator (phase value or f*cos)
    spdf_d: jnp.ndarray      # (N,) sampling-side scatter pdf at the NEE dir
    is_delta: jnp.ndarray    # (N,) bool
    n_steps: jnp.ndarray     # scalar
    ev_counts: jnp.ndarray   # (2,) int32 [main, shadow] collision totals
    #   (count_events=True; (2,) zeros otherwise — the adds compile away
    #   unused)
    # regeneration state (regen mode only; (1,)/scalar dummies otherwise)
    work: jnp.ndarray        # (N,) int32 current work item, -1 = none
    cursor: jnp.ndarray      # scalar int32 next unissued work item
    film_rgb: jnp.ndarray    # (3 * (H*W + 1),) channel-major flat film
    #   (+1 = discard slot per channel).  Flat so the retire splat is ONE
    #   scalar scatter-add — measured r1 AND re-measured r3: (3N,) scalar
    #   updates beat (N, 4) row-windowed updates by ~1.7x end-to-end.
    #   Per-sample weight is identically 1 (filter importance sampling),
    #   so weight_sum == spp and needs no scatter.
    # accum_spp mode only ((1,)/(1,3) dummies otherwise): a work item is a
    # PIXEL; all its spp samples run back-to-back in-lane, banking each
    # sample's rgb into registers, and the film splat fires once per pixel
    # instead of once per sample — the r4 fix for the film scatter-add
    # being 43% of loop time at ~7ns/element (docs/PROFILE_r03.md)
    samp: jnp.ndarray        # (N,) int32 current sample; spp = all banked
    rgb_acc: jnp.ndarray     # (N, 3) accumulated rgb of banked samples


def li(
    med: MediumArrays,
    lights: list,
    o, d,
    lam,
    rng,
    *,
    maj_res,
    homogeneous: bool,
    max_depth: int = 5,
    scene_radius: float = 1e4,
    max_march_steps: int = 100000,
    k_substeps: int = 8,
    fixed_steps=None,
    remat_window=None,
    rgb_mode: bool = False,
    prims: tuple = (),
    record_alive: bool = False,
    regen=None,
    stochastic_filter: bool = False,
    retire_every: int = 1,
    retire_groups: int = 1,
    sub_rounds: int = 1,
    accum_spp: bool = False,
    event_groups: int = 1,
    external_loop: bool = False,
    light_strategy: str = "uniform",
    count_events: bool = False,
    residual_shadow: bool = False,
) -> LiResult:
    N = o.shape[0]
    LANES = lam.shape[-1]
    f32 = jnp.float32

    # residual ratio tracking on NEE shadow segments (Novák et al. 2014
    # residual ratio tracking / Kutz et al. 2017 decomposition tracking,
    # reference sampler semantics media.h:730-806): the per-cell MINORANT
    # is a control medium handled in closed form, and shadow collisions
    # sample only the residual at rate (majorant - minorant) — measured
    # 58% of all collision events are shadow-segment events and the
    # rate-weighted minorant/majorant is 0.42 on the cloud, so this cuts
    # total events ~24% with zero estimator bias (the per-collision null
    # weight s_t*(maj - dens) is unchanged; only the sampling rate and
    # its pdf shrink together).
    residual_on = bool(residual_shadow and not homogeneous and not rgb_mode
                       and getattr(med, "minorant", None) is not None)

    opaque = tuple(p for p in prims if p.material is not None)
    has_surf = len(opaque) > 0
    if has_surf:
        from .. import materials as materials_mod

        def eval_materials(lam_cur):
            nw = lam_cur.shape[0]
            albedos = jnp.stack(
                [materials_mod._eval_spectral(
                    getattr(p.material, "reflectance", 0.5), lam_cur)
                 for p in opaque]
            )  # (M, N, L)
            emissions = jnp.stack(
                [
                    (p.material.emission(lam_cur) * p.material.emission_scale
                     if p.material.emissive else jnp.zeros((nw, LANES)))
                    * jnp.ones((nw, LANES))
                    for p in opaque
                ]
            )
            return albedos, emissions

        emissive_mask = jnp.asarray([p.material.emissive for p in opaque])
        if regen is None:
            _mat_const = eval_materials(lam)

        # ---- specular + rough-microfacet surface support (reference
        # surface branch cpu/integrators.cpp:417-592 via BSDF Sample_f:
        # smooth conductor/dielectric/thin = delta cases; rough conductor/
        # dielectric = Trowbridge-Reitz VNDF lobes with NEE MIS).  Other
        # material kinds keep the Lambertian-albedo fallback.
        def _rough_of(m):
            r = getattr(m, "roughness", 0.0)
            return float(r) if isinstance(r, (int, float)) else 0.3

        _k_cond = materials_mod.KIND_CONDUCTOR
        _k_diel = materials_mod.KIND_DIELECTRIC
        _k_thin = materials_mod.KIND_THIN_DIELECTRIC
        spec_list = [p.material.kind in (_k_cond, _k_diel, _k_thin)
                     and _rough_of(p.material) == 0.0 for p in opaque]
        rough_list = [p.material.kind in (_k_cond, _k_diel)
                      and _rough_of(p.material) > 0.0 for p in opaque]
        has_spec = any(spec_list)
        has_rough = any(rough_list)
        _cond_py = [p.material.kind == _k_cond and (s or r) for s, r, p
                    in zip(spec_list, rough_list, opaque)]
        if has_spec or has_rough:
            _thin_py = [s and p.material.kind == _k_thin
                        for s, p in zip(spec_list, opaque)]
            spec_mask_arr = jnp.asarray(spec_list)
            rough_mask_arr = jnp.asarray(rough_list)
            cond_mask_arr = jnp.asarray(_cond_py)
            thin_mask_arr = jnp.asarray(_thin_py)
            alpha_arr = jnp.asarray([_rough_of(p.material) for p in opaque],
                                    jnp.float32)
            diel_eta_arr = jnp.asarray(
                [float(getattr(p.material, "eta", 1.5))
                 if p.material.kind in (_k_diel, _k_thin)
                 and isinstance(getattr(p.material, "eta", 1.5), (int, float))
                 else 1.5 for p in opaque], jnp.float32)

            # conductor complex IOR spectra: constant outside regen;
            # per-iteration under regen (lanes respawn with new lam)
            def cond_spectra(lam_cur):
                nw = lam_cur.shape[0]
                eta_s = jnp.stack(
                    [p.material.eta_spectrum(lam_cur) * jnp.ones((nw, LANES))
                     if c else jnp.ones((nw, LANES))
                     for c, p in zip(_cond_py, opaque)])
                k_s = jnp.stack(
                    [p.material.k_spectrum(lam_cur) * jnp.ones((nw, LANES))
                     if c else jnp.zeros((nw, LANES))
                     for c, p in zip(_cond_py, opaque)])
                return eta_s, k_s

            if regen is None:
                _cond_const = cond_spectra(lam)

        # ---- diffuse-transmission surfaces (DiffuseTransmissionBxDF,
        # bxdfs.h hemisphere-flipped Lambert pair): two-sided cosine
        # lobes so a light BEHIND the surface contributes through the
        # transmitted NEE lane and the bounce can cross to the far side.
        # Gated on the scene actually containing one so the production
        # cloud configs compile the identical program.
        dt_list = [p.material.kind
                   == materials_mod.KIND_DIFFUSE_TRANSMISSION
                   for p in opaque]
        has_dt = any(dt_list)

        # Scenes with a medium always render through this integrator, so
        # a surface kind outside its lobe set (diffuse / conductor /
        # dielectric / thin / diffuse-transmission) silently falls back
        # to a Lambert albedo — warn instead of rendering wrong quietly
        # (coated loses its coat; measured/subsurface lose the BRDF
        # entirely).  li_path renders these kinds fully in medium-free
        # scenes (path.py _bsdf_f_pdf).
        _supported = (materials_mod.KIND_DIFFUSE, _k_cond, _k_diel,
                      _k_thin, materials_mod.KIND_DIFFUSE_TRANSMISSION)
        _unsupported = sorted({type(p.material).__name__ for p in opaque
                               if p.material.kind not in _supported})
        if _unsupported:
            import warnings

            warnings.warn(
                "fused volpath: material kind(s) "
                f"{', '.join(_unsupported)} approximate to a Lambert "
                "albedo lobe in medium-bearing scenes",
                stacklevel=2)
        if has_dt:
            dt_mask_arr = jnp.asarray(dt_list)

            def dt_spectra(lam_cur):
                nw = lam_cur.shape[0]
                return jnp.stack(
                    [materials_mod._eval_spectral(
                        getattr(p.material, "transmittance", None), lam_cur)
                     * jnp.ones((nw, LANES)) if d else jnp.zeros((nw, LANES))
                     for d, p in zip(dt_list, opaque)])

            if regen is None:
                _dt_const = dt_spectra(lam)
    else:
        has_spec = False
        has_rough = False
        has_dt = False

    def spectra_for(lam_cur):
        """Per-lane medium spectra — evaluated at spawn time."""
        if rgb_mode:
            # RGBGridMedium: the majorant grid already holds spectral-max
            # sigma_t per cell (media.cpp:364-376), so the per-ray sigma_t
            # spectrum is 1 and coefficients come from the grids per collision
            s_t = jnp.ones((N, LANES), jnp.float32)
        elif regen is not None:
            s_t = None  # filled below from s_a + s_s
        else:
            s_t = jnp.broadcast_to(med.sigma_a + med.sigma_s, (N, LANES))
        if regen is not None:
            s_a = regen["sigma_a_fn"](lam_cur)
            s_s = regen["sigma_s_fn"](lam_cur)
            s_le = regen["Le_fn"](lam_cur)
            if s_t is None:
                s_t = s_a + s_s
        else:
            s_a = jnp.broadcast_to(med.sigma_a, (N, LANES))
            s_s = jnp.broadcast_to(med.sigma_s, (N, LANES))
            s_le = jnp.broadcast_to(med.Le, (N, LANES))
        return s_t, s_a, s_s, s_le

    g = med.g
    g_samp = sg(med.g if med.g_s is None else med.g_s)
    maj_res_i = jnp.asarray(maj_res, jnp.int32)
    rz, ry, rx = med.majorant.shape

    # sampling-side sigma spectra: optional FROZEN overrides (like
    # density_s) so the sample distribution stays parameter-independent
    # when the evaluation-side sigma_a/sigma_s are perturbed — required for
    # the detached-estimator FD==AD contract on spectrum coefficients.
    # Without overrides this reduces to sg() of the live spectra (identical
    # values, gradients blocked).
    has_samp_sigma = getattr(med, "sigma_a_s", None) is not None
    if has_samp_sigma:
        assert not rgb_mode and regen is None, (
            "sampling-side sigma overrides support only the plain spectral "
            "path")
        _sa_smp = jnp.broadcast_to(
            jnp.asarray(med.sigma_a_s, jnp.float32), (N, LANES))
        _ss_smp = jnp.broadcast_to(
            jnp.asarray(med.sigma_s_s, jnp.float32), (N, LANES))
        _st_smp = _sa_smp + _ss_smp

        def samp_sigma(c):
            return _sa_smp, _ss_smp, _st_smp
    else:
        def samp_sigma(c):
            return sg(c.s_a), sg(c.s_s), sg(c.s_t)

    def init_segment(so, sd, t_max, rng, need, old, need_main=None):
        """(Re)initialize DDA registers for rays in `need`; draws the first
        tau target.  Rays in `need_main` also re-intersect the opaque
        primitive list to bound the segment (t_surf)."""
        t_surf = old.t_surf
        n_surf = old.n_surf
        mat_id = old.mat_id
        if has_surf and need_main is not None:
            hit = shapes_mod.intersect_all(opaque, so, sd, jnp.inf)
            t_surf = jnp.where(need_main, hit.t, old.t_surf)
            n_surf = jnp.where(need_main[:, None], hit.n, old.n_surf)
            mat_id = jnp.where(need_main, hit.prim_id, old.mat_id)
            t_max = jnp.where(need_main, jnp.minimum(t_max, t_surf), t_max)
        dda, t0 = dda_init(so, sd, t_max, med.w2m, maj_res)
        rng, u0 = pcg_uniform_masked(rng, need & dda.in_medium)
        u0 = jnp.minimum(u0, ONE_MINUS_EPSILON)
        st0 = samp_sigma(old)[2][:, 0]   # sampling stays detached/frozen
        dl0 = jnp.where(st0 > 0, -jnp.log1p(-u0) / jnp.maximum(st0, 1e-30), jnp.inf)
        sel = need
        sel3 = need[:, None]
        return old._replace(
            so=jnp.where(sel3, so, old.so),
            sd=jnp.where(sel3, sd, old.sd),
            t_surf=t_surf, n_surf=n_surf, mat_id=mat_id,
            voxel=jnp.where(sel3, dda.voxel, old.voxel),
            next_t=jnp.where(sel3, dda.next_t, old.next_t),
            dt=jnp.where(sel3, dda.dt, old.dt),
            step=jnp.where(sel3, dda.step, old.step),
            t_exit=jnp.where(sel, dda.t_exit, old.t_exit),
            t_cur=jnp.where(sel, t0, old.t_cur),
            dl_target=jnp.where(sel, dl0, old.dl_target),
            dl_since=jnp.where(sel, 0.0, old.dl_since),
            reached=jnp.where(sel, False, old.reached),
            # a segment that misses the medium is immediately "escaped"
            seg_escaped=jnp.where(sel, ~dda.in_medium, old.seg_escaped),
            rng=rng,
            **(dict(ctrld=jnp.where(sel, 0.0, old.ctrld),
                    ctrl_since=jnp.where(sel, 0.0, old.ctrl_since))
               if residual_on else {}),
        ), dda.in_medium

    # ---- regeneration: work-item spawning (wavefront path regeneration —
    # wavefront/integrator.cpp's per-sample GenerateCameraRays reshaped so a
    # retiring lane immediately pulls the next (pixel, sample) work item,
    # keeping SIMD occupancy ~100% across the whole frame x spp batch) ----
    if regen is not None:
        from ...utils import colorspace as _cspace
        from ...utils import spectrum as _spu
        from .. import samplers as _samplers

        R_H, R_W, R_spp = regen["H"], regen["W"], regen["spp"]
        R_HW = R_H * R_W
        R_total = int(regen["total_work"])
        R_cam, R_filt = regen["camera"], regen["filter"]
        R_kind, R_seed = regen["sampler"], regen["seed"]
        R_maxc = regen.get("max_component", jnp.inf)
        # loss-cotangent mode (differentiable production path at scale):
        # instead of scatter-adding retired samples into a film, accumulate
        # sum(cot[pixel] . rgb) into a (1,) scalar.  The film never enters
        # the loop carry, so windowed rematerialization checkpoints are
        # ~(H*W)x smaller — the enabler for 720p/256^3 backward passes.
        # cot is the flat channel-major cotangent (3*(H*W+1),) with zeros
        # in the discard slots; the mode computes exactly
        # vjp(film_render, cot) because the film is a pure scatter-add.
        R_cot = regen.get("loss_cotangent", None)
        # sharded operation: local work ids offset into the global queue
        # (per-device slice under shard_map); items past the global end
        # splat to the discard slot
        R_base = regen.get("work_base", jnp.int32(0))
        R_gtotal = regen.get("global_total", R_total)
        # work->pixel stride permutation (occupancy): consecutive work ids
        # land on pixels a coprime stride apart, so every refill batch
        # mixes short sky paths with long in-medium paths instead of
        # streaming whole sky regions through the retire stage (which is
        # capped at one group per iteration).  A fixed bijection: streams
        # stay keyed by (pixel, sample), so images are stride-invariant
        # up to film-add order.
        R_stride = int(regen.get("work_stride", 1))
        if accum_spp:
            # a work item is one PIXEL (all spp samples run in-lane);
            # work ids / cursor / sharding offsets live in pixel units
            assert retire_every == 1, "accum_spp requires retire_every == 1"
            assert R_total % R_spp == 0, "accum_spp: total_work % spp != 0"
            R_items = R_total // R_spp
            R_gitems = int(R_gtotal) // R_spp
            if isinstance(R_base, int):
                assert R_base % R_spp == 0
                R_ibase = R_base // R_spp
            else:
                R_ibase = (R_base // jnp.int32(R_spp)).astype(jnp.int32)
        else:
            R_items = R_total
            R_gitems = R_gtotal
            R_ibase = R_base

        def work_pixel(gw):
            p_raw = (gw % R_HW).astype(jnp.uint32)
            if R_stride == 1:
                return p_raw
            return (p_raw * jnp.uint32(R_stride)) % jnp.uint32(R_HW)

        def spawn(work, samp=None):
            """Camera ray + wavelengths + rng stream for work items.

            Streams match the chunked driver exactly: film_sample keyed by
            (pixel, sample), wavelength draw from the advanced stream — in
            accum_spp mode the sample index comes from the per-lane samp
            register instead of the work id, so every (pixel, sample)
            estimate stays bitwise identical across modes."""
            gw = work + R_ibase
            if accum_spp:
                s_idx = jnp.asarray(samp, jnp.uint32)
            else:
                s_idx = (gw // R_HW).astype(jnp.uint32)
            p_idx = work_pixel(gw)
            x = (p_idx % R_W).astype(jnp.int32)
            y = (p_idx // R_W).astype(jnp.int32)
            pixxy = jnp.stack([x, y], -1)
            ua, ub, rng_s = _samplers.film_sample(
                R_kind, p_idx, s_idx, R_spp, seed=R_seed, pix=pixxy)
            off = R_filt.sample_offset(jnp.stack([ua, ub], -1)) + 0.5
            from ...ops.dda import pcg_uniform as _pcg_u
            rng_s, ul = _pcg_u(rng_s)
            swl = _spu.sample_wavelengths_visible(ul)
            o_s, d_s = R_cam.generate_rays(pixxy, off, None)
            return o_s, d_s, swl.lam, swl.pdf, rng_s, p_idx

        work0 = jnp.arange(N, dtype=jnp.int32)
        valid0 = work0 < R_items
        o, d, lam, lam_pdf0, rng, _ = spawn(
            jnp.minimum(work0, R_items - 1), jnp.zeros((N,), jnp.int32))
        work_init = jnp.where(valid0, work0, -1)
        cursor_init = jnp.int32(min(N, R_items))
        film_rgb0 = regen["film_rgb"]
    else:
        lam_pdf0 = jnp.ones((N, LANES), f32)
        work_init = jnp.zeros((1,), jnp.int32)
        cursor_init = jnp.int32(0)
        film_rgb0 = jnp.zeros((1,), f32)
    samp_init = (jnp.zeros((N,), jnp.int32) if (regen is not None and accum_spp)
                 else jnp.zeros((1,), jnp.int32))
    rgb_acc_init = (jnp.zeros((N, 3), f32) if (regen is not None and accum_spp)
                    else jnp.zeros((1, 3), f32))

    s_t0, s_a0, s_s0, s_le0 = spectra_for(lam)

    # ---- initial segment: camera rays --------------------------------------
    zero_s = jnp.zeros((N, LANES), f32)
    regs = _Regs(
        pc=jnp.full((N,), PC_MARCH, jnp.int32) if regen is None else
        jnp.where(valid0, PC_MARCH, PC_DONE).astype(jnp.int32),
        depth=jnp.zeros((N,), jnp.int32),
        rng=rng,
        lam=lam * jnp.ones((N, LANES), f32),
        lam_pdf=lam_pdf0 * jnp.ones((N, LANES), f32),
        s_t=s_t0, s_a=s_a0, s_s=s_s0, s_le=s_le0,
        so=o, sd=d, d_main=d,
        t_surf=jnp.full((N,), jnp.inf, f32),
        n_surf=jnp.zeros((N, 3), f32),
        mat_id=jnp.full((N,), -1, jnp.int32),
        at_surface=jnp.zeros((N,), bool),
        spec_last=jnp.zeros((N,), bool),
        voxel=jnp.zeros((N, 3), jnp.int32),
        next_t=jnp.zeros((N, 3), f32),
        dt=jnp.zeros((N, 3), f32),
        step=jnp.zeros((N, 3), jnp.int32),
        t_exit=jnp.zeros((N,), f32),
        t_cur=jnp.zeros((N,), f32),
        dl_target=jnp.zeros((N,), f32),
        dl_since=jnp.zeros((N,), f32),
        reached=jnp.zeros((N,), bool),
        seg_escaped=jnp.zeros((N,), bool),
        maxd=jnp.zeros((N,), f32),
        # (1,) dummies when residual tracking is off: no dead registers
        # in the production while_loop carry
        ctrld=jnp.zeros((N if residual_on else 1,), f32),
        ctrl_since=jnp.zeros((N if residual_on else 1,), f32),
        L=zero_s,
        beta=jnp.ones((N, LANES), f32),
        r_u=jnp.ones((N, LANES), f32),
        r_l=jnp.ones((N, LANES), f32),
        T_ray=jnp.ones((N, LANES), f32),
        r_l_s=jnp.ones((N, LANES), f32),
        r_u_s=jnp.ones((N, LANES), f32),
        ls_L=zero_s,
        ls_pdf=jnp.zeros((N,), f32),
        f_spec=zero_s,
        spdf_d=jnp.zeros((N,), f32),
        is_delta=jnp.zeros((N,), bool),
        n_steps=jnp.int32(0),
        ev_counts=jnp.zeros((2,), jnp.int32),
        work=work_init, cursor=cursor_init,
        film_rgb=film_rgb0,
        samp=samp_init, rgb_acc=rgb_acc_init,
    )
    regs, _ = init_segment(o, d, jnp.full((N,), jnp.inf, f32), rng,
                           jnp.ones((N,), bool) if regen is None else valid0,
                           regs,
                           need_main=(jnp.ones((N,), bool)
                                      if regen is None else valid0))

    maj_flat = med.majorant.reshape(-1)
    ctrl_flat = med.minorant.reshape(-1) if residual_on else None
    dens_flat = med.density.reshape(-1)
    dens_dims = tuple(int(x) for x in med.density.shape)
    dens_s_flat = (med.density_s.reshape(-1)
                   if med.density_s is not None else None)
    le_grid_flat = (med.Le_grid.reshape(-1)
                    if getattr(med, "Le_grid", None) is not None else None)
    le_grid_dims = (tuple(int(x) for x in med.Le_grid.shape)
                    if le_grid_flat is not None else None)
    _maj_size = 1
    for _d in med.majorant.shape:
        _maj_size *= int(_d)

    def block_substep(c: _Regs, K: int) -> _Regs:
        if pallas_march.available(_maj_size, N):
            # ONE Pallas dispatch for the whole K-voxel window: DDA
            # geometry, majorant gather, and free-flight resolution all in
            # VMEM (the north-star fused march kernel).  Outputs are
            # sampling-side quantities -> stop_gradient (the detached
            # estimator holds sample positions fixed; gradients flow only
            # through the sigma(x) evaluations in handle_events).
            hunting = (c.pc != PC_DONE) & ~c.reached & ~c.seg_escaped
            ctrl_kw = {}
            if residual_on:
                ctrl_kw = dict(control=sg(ctrl_flat),
                               resid=(c.pc == PC_NEE).astype(jnp.int32),
                               ctrld_in=c.ctrld, csince_in=c.ctrl_since)
            r = pallas_march.march_block(
                sg(maj_flat), c.voxel, c.next_t, c.dt, c.step, c.t_exit,
                c.t_cur, c.dl_target, c.dl_since, c.maxd, hunting,
                K, (rx, ry, rz), **ctrl_kw)
            r = {k: sg(v) for k, v in r.items()}
            return c._replace(
                voxel=r["voxel"], next_t=r["next_t"], t_cur=r["t_cur"],
                dl_target=r["dl_target"], dl_since=r["dl_since"],
                maxd=r["maxd"],
                ctrld=r.get("ctrld", c.ctrld),
                ctrl_since=r.get("ctrl_since", c.ctrl_since),
                reached=c.reached | r["landed"],
                seg_escaped=c.seg_escaped | r["escaped"],
            )
        return _block_substep_xla(c, K)

    def _block_substep_xla(c: _Regs, K: int) -> _Regs:
        """Blocked DDA: advance up to K majorant voxels in ONE pass.

        XLA:TPU charges a large fixed dispatch cost per kernel; a
        step-at-a-time DDA pays it per voxel.  Here the next K crossing
        segments are computed purely geometrically (VPU arithmetic, no
        memory), their K majorants fetched with ONE (N, K) gather, and the
        free-flight target resolved in closed form over the window
        (cumulative optical depth + first-crossing select).  Semantics are
        identical to K sequential substeps up to float associativity
        (running subtraction -> cumulative sum).
        """
        hunting = (c.pc != PC_DONE) & ~c.reached & ~c.seg_escaped

        # ---- K-step geometric walk (no memory traffic) ----
        vox = c.voxel
        nt = c.next_t
        s_k = c.t_cur
        live = hunting
        v_list, s_list, len_list, live_list = [], [], [], []
        nt_list, exit_list, vox_after = [], [], []
        for _ in range(K):
            end_raw = jnp.min(nt, axis=-1)
            end_k = jnp.minimum(end_raw, c.t_exit)
            len_k = jnp.maximum(end_k - s_k, 0.0)
            hit_exit = end_raw >= c.t_exit
            v_list.append(vox)
            nt_list.append(nt)
            s_list.append(s_k)
            len_list.append(len_k)
            live_list.append(live)
            exit_list.append(hit_exit)
            axis = jnp.argmin(nt, axis=-1)
            onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
            vox = vox + onehot * c.step
            # where (not +onehot*dt): dt is inf on degenerate axes, 0*inf=NaN
            nt = jnp.where(onehot != 0, nt + c.dt, nt)
            out = jnp.any((vox < 0) | (vox >= maj_res_i), axis=-1)
            live = live & ~hit_exit & ~out
            s_k = end_k
        v_stack = jnp.stack(v_list, 1)          # (N, K, 3)
        nt_stack = jnp.stack(nt_list, 1)        # (N, K, 3)
        s_stack = jnp.stack(s_list + [s_k], 1)  # (N, K+1) segment starts
        len_stack = jnp.stack(len_list, 1)      # (N, K)
        live_stack = jnp.stack(live_list, 1)    # (N, K)

        # ---- ONE majorant gather over the window ----
        vc = jnp.clip(v_stack, 0, maj_res_i - 1)
        flat = (vc[..., 2] * ry + vc[..., 1]) * rx + vc[..., 0]
        maj = sg(pallas_gather.table_gather(maj_flat, flat))  # (N, K)
        if residual_on:
            resid_l = (c.pc == PC_NEE)
            ctrl = sg(pallas_gather.table_gather(ctrl_flat, flat))
            ctrl = jnp.where(resid_l[:, None], ctrl, 0.0)     # (N, K)
            rate = jnp.maximum(maj - ctrl, 0.0)
        else:
            rate = maj

        # ---- closed-form free-flight resolution ----
        # rate > 0 gate avoids 0*inf = NaN on unbounded final segments;
        # prev_cum by shift (not cum - dl) avoids inf - inf
        dl = jnp.where(live_stack & (rate > 0), rate * len_stack, 0.0)
        cum = jnp.cumsum(dl, axis=1)
        prev_cum = jnp.concatenate(
            [jnp.zeros((N, 1), f32), cum[:, :-1]], axis=1)
        ok = live_stack & (dl > 0) & (cum >= c.dl_target[:, None])
        landed = hunting & jnp.any(ok, axis=1)
        k_star = jnp.argmax(ok, axis=1)                     # first True
        take = lambda a: jnp.take_along_axis(
            a, k_star[:, None], axis=1)[:, 0]
        take3 = lambda a: jnp.take_along_axis(
            a, k_star[:, None, None], axis=1)[:, 0]
        maj_star = take(maj)
        rate_star = take(rate)
        t_col = (take(s_stack[:, :K])
                 + (c.dl_target - take(prev_cum))
                 / jnp.maximum(rate_star, 1e-30))
        if residual_on:
            # control-depth accumulation (closed form): full segments up
            # to the collision + the partial landing segment.  len clamp
            # mirrors the Pallas kernel's len_c: unbounded final segments
            # have len = inf and ctrl may be 0 there (0*inf = NaN, and
            # where() would still store the NaN into live carry state)
            dc = jnp.where(live_stack,
                           ctrl * jnp.minimum(len_stack,
                                              pallas_march._F_INF), 0.0)
            cumc = jnp.cumsum(dc, axis=1)
            prev_cumc = jnp.concatenate(
                [jnp.zeros((N, 1), f32), cumc[:, :-1]], axis=1)
            c_land = take(prev_cumc) + take(ctrl) * (
                t_col - take(s_stack[:, :K]))

        # non-landing lanes: advance to the end of the live prefix
        n_live = jnp.sum(live_stack, axis=1)
        dl_tot = jnp.where(hunting, cum[:, -1], 0.0)
        t_end = jnp.take_along_axis(s_stack, n_live[:, None], axis=1)[:, 0]
        escaped = hunting & ~landed & (n_live < K)

        sel = landed
        sel3 = landed[:, None]
        adv = hunting & ~landed
        voxel = jnp.where(sel3, take3(v_stack), jnp.where(adv[:, None], vox, c.voxel))
        next_t = jnp.where(sel3, take3(nt_stack), jnp.where(adv[:, None], nt, c.next_t))
        maxd_last = jnp.take_along_axis(
            maj, jnp.maximum(n_live - 1, 0)[:, None], axis=1)[:, 0]
        ctrl_kw = {}
        if residual_on:
            ctrl_last = jnp.take_along_axis(
                ctrl, jnp.maximum(n_live - 1, 0)[:, None], axis=1)[:, 0]
            ctrl_tot = jnp.where(hunting, cumc[:, -1], 0.0)
            ctrl_kw = dict(
                ctrld=jnp.where(sel, take(ctrl),
                                jnp.where(adv, ctrl_last, c.ctrld)),
                ctrl_since=c.ctrl_since + jnp.where(
                    sel, c_land, jnp.where(adv, ctrl_tot, 0.0)),
            )
        return c._replace(
            voxel=voxel, next_t=next_t,
            maxd=jnp.where(sel, maj_star,
                           jnp.where(adv, maxd_last, c.maxd)),
            dl_target=jnp.where(adv, c.dl_target - dl_tot, c.dl_target),
            dl_since=c.dl_since + jnp.where(sel, c.dl_target,
                                            jnp.where(adv, dl_tot, 0.0)),
            t_cur=jnp.where(sel, t_col, jnp.where(adv, t_end, c.t_cur)),
            reached=c.reached | landed,
            seg_escaped=c.seg_escaped | escaped,
            **ctrl_kw,
        )

    def handle_events(c: _Regs) -> _Regs:
        """Collision classification + segment-end transitions for all modes."""
        n = c.pc.shape[0]   # event-group slice width (== N unless sliced)
        # ------ shared per-collision quantities ------
        col_any = c.reached & (c.pc != PC_DONE)
        rng = c.rng
        u3f = None
        if stochastic_filter and not homogeneous:
            # one corner draw per collision (ops.grid.stochastic_corner):
            # E[1-tap] == trilerp, every collision factor is linear in the
            # sample, draws are independent across collisions -> unbiased.
            # Profiled: the 8-tap trilerp gather is ~50% of the fused-loop
            # runtime on the 256^3 cloud; this halves it.
            rng, uf1 = pcg_uniform_masked(rng, col_any)
            rng, uf2 = pcg_uniform_masked(rng, col_any)
            rng, uf3 = pcg_uniform_masked(rng, col_any)
            u3f = jnp.stack([uf1, uf2, uf3], -1)
        if homogeneous:
            dens = jnp.ones((n,), f32)
            dens_d = dens
        elif rgb_mode:
            dens = jnp.ones((n,), f32)   # coefficients resolved below
            dens_d = dens
        else:
            p_w = c.so + c.t_cur[:, None] * c.sd
            p_m = world_to_medium(med.w2m, p_w)
            if stochastic_filter:
                dens = gridops.trilerp_stochastic_flat(
                    dens_flat, dens_dims, p_m, u3f)
                dens_d = sg(dens if dens_s_flat is None
                            else gridops.trilerp_stochastic_flat(
                                dens_s_flat, dens_dims, p_m, u3f))
            else:
                dens = gridops.trilerp_flat(dens_flat, dens_dims, p_m)
                # decision/pdf-side density: frozen copy when provided (the
                # detached estimator's sampling distribution), else sg(same)
                dens_d = sg(dens if dens_s_flat is None
                            else gridops.trilerp_flat(dens_s_flat, dens_dims,
                                                      p_m))
        maxd = c.maxd   # majorant of the collision voxel, cached by substep
        if rgb_mode:
            from ...utils import spectrum as _sp

            p_w = c.so + c.t_cur[:, None] * c.sd
            p_m = world_to_medium(med.w2m, p_w)
            if stochastic_filter:
                rgb_a = gridops.trilerp_vec_stochastic(med.sigma_a_rgb, p_m,
                                                       u3f)
                rgb_s = gridops.trilerp_vec_stochastic(med.sigma_s_rgb, p_m,
                                                       u3f)
            else:
                rgb_a = gridops.trilerp_vec(med.sigma_a_rgb, p_m)
                rgb_s = gridops.trilerp_vec(med.sigma_s_rgb, p_m)
            sa = _sp.rgb_to_spectrum_smits_batched(rgb_a, c.lam)
            ss = _sp.rgb_to_spectrum_smits_batched(rgb_s, c.lam)
            sa_d = sg(sa)
            ss_d = sg(ss)
        if rgb_mode:
            st_smp = sg(c.s_t)
        else:
            sa_smp, ss_smp, st_smp = samp_sigma(c)
            sa = c.s_a * dens[:, None]                 # evaluation side (diff)
            ss = c.s_s * dens[:, None]
            sa_d = sa_smp * dens_d[:, None]            # sampling side (frozen)
            ss_d = ss_smp * dens_d[:, None]
        sig_maj = c.s_t * maxd[:, None]
        # sampling-side majorant / free-flight transmittance: frozen values
        # when sigma overrides are set, else sg() of the live quantities
        sig_maj_d = sg(st_smp * maxd[:, None])
        sig_maj0 = sig_maj_d[:, 0]
        if residual_on:
            # residual-sampler quantities for shadow lanes: the collision
            # rate (and its pdf) shrink to (majorant - minorant) while the
            # null weight keeps the full (majorant - density) numerator;
            # the control part is the deterministic exp(-sigma_t * ctrl
            # depth).  ctrld/ctrl_since are 0 on main-path lanes, so these
            # reduce to the plain forms there.
            sig_majr_d = sg(st_smp * (maxd - c.ctrld)[:, None])
            sig_majr0 = sig_majr_d[:, 0]
            ctrlT = jnp.exp(-c.s_t * c.ctrl_since[:, None])
            ctrlT_d = sg(jnp.exp(-st_smp * c.ctrl_since[:, None]))
        else:
            sig_majr_d, sig_majr0 = sig_maj_d, sig_maj0
            ctrlT = ctrlT_d = jnp.float32(1.0)
        T_maj = jnp.exp(-c.s_t * c.dl_since[:, None])
        T_maj_d = sg(jnp.exp(-st_smp * c.dl_since[:, None]))
        sig_n = jnp.clip(sig_maj - sa - ss, 0.0, None)
        sig_n_d = sg(jnp.clip(sig_maj_d - sa_d - ss_d, 0.0, None))

        # =========== MAIN-PATH COLLISIONS (pc == MARCH) ===========
        col_m = col_any & (c.pc == PC_MARCH)
        p_absorb = jnp.where(sig_maj0 > 0, sa_d[:, 0] / jnp.maximum(sig_maj0, 1e-30), 0.0)
        p_scatter = jnp.where(sig_maj0 > 0, ss_d[:, 0] / jnp.maximum(sig_maj0, 1e-30), 0.0)
        rng, u_ev = pcg_uniform_masked(rng, col_m)
        is_absorb = col_m & (u_ev < p_absorb)
        is_scatter = col_m & ~is_absorb & (u_ev < p_absorb + p_scatter)
        is_null = col_m & ~is_absorb & ~is_scatter

        # emission at every main collision while depth < max_depth
        # (pdf + ratio trackers detached: sampling-side quantities)
        pdf_e = sg(sig_maj0 * T_maj_d[:, 0])
        betap = c.beta * T_maj / jnp.maximum(pdf_e, 1e-30)[:, None]
        r_e = sg(c.r_u * sig_maj_d * T_maj_d) / jnp.maximum(pdf_e, 1e-30)[:, None]
        r_e_avg = sg(jnp.mean(r_e, axis=-1))
        if rgb_mode and med.Le_rgb is not None:
            rgb_e = (gridops.trilerp_vec_stochastic(med.Le_rgb, p_m, u3f)
                     if stochastic_filter
                     else gridops.trilerp_vec(med.Le_rgb, p_m))
            Le_here = _sp.rgb_to_spectrum_smits_batched(rgb_e, c.lam)
        elif le_grid_flat is not None and not homogeneous:
            # per-voxel emission scale grid (GridMedium's LeScale /
            # temperature-grid analogue, media.h:300-316) — differentiable
            # emission voxels for the adjoint contract
            le_s = (gridops.trilerp_stochastic_flat(le_grid_flat,
                                                    le_grid_dims, p_m, u3f)
                    if stochastic_filter
                    else gridops.trilerp_flat(le_grid_flat, le_grid_dims,
                                              p_m))
            Le_here = c.s_le * le_s[:, None]
        else:
            Le_here = c.s_le
        contrib_e = betap * sa * Le_here / jnp.maximum(r_e_avg, 1e-30)[:, None]
        emit_ok = col_m & (pdf_e > 0) & (r_e_avg > 0) & (c.depth < max_depth)
        L_acc = c.L + jnp.where(emit_ok[:, None], contrib_e, 0.0)

        # null updates (main): pdf denominators + ratio trackers live on the
        # sampling side (frozen density); only beta's sigma numerators are
        # differentiable
        pdf_null = sg(T_maj_d[:, 0] * sig_n_d[:, 0])
        null_ok = pdf_null > 0
        f_null = jnp.where(null_ok[:, None],
                           T_maj * sig_n / jnp.maximum(pdf_null, 1e-30)[:, None], 0.0)
        f_null_d = sg(jnp.where(null_ok[:, None],
                                T_maj_d * sig_n_d / jnp.maximum(pdf_null, 1e-30)[:, None], 0.0))
        f_null_l = sg(jnp.where(null_ok[:, None],
                                T_maj_d * sig_maj_d / jnp.maximum(pdf_null, 1e-30)[:, None], 0.0))
        pdf_sc = sg(T_maj_d[:, 0] * ss_d[:, 0])
        sc_ok = pdf_sc > 0
        f_sc = jnp.where(sc_ok[:, None],
                         T_maj * ss / jnp.maximum(pdf_sc, 1e-30)[:, None], 0.0)
        f_sc_d = sg(jnp.where(sc_ok[:, None],
                              T_maj_d * ss_d / jnp.maximum(pdf_sc, 1e-30)[:, None], 0.0))

        beta = jnp.where(is_null[:, None], c.beta * f_null,
                         jnp.where(is_scatter[:, None], c.beta * f_sc, c.beta))
        r_u = sg(jnp.where(is_null[:, None], c.r_u * f_null_d,
                           jnp.where(is_scatter[:, None], c.r_u * f_sc_d, c.r_u)))
        r_l = sg(jnp.where(is_null[:, None], c.r_l * f_null_l, c.r_l))
        dead_null = is_null & ~jnp.any(r_u != 0.0, axis=-1)

        # scatter at depth cap terminates (volpath_custom.cpp:352)
        over = is_scatter & (c.depth >= max_depth)
        do_scatter = is_scatter & ~over
        depth = c.depth + jnp.where(do_scatter, 1, 0)

        # =========== MAIN-PATH SEGMENT END (pc == MARCH) ===========
        esc_m = c.seg_escaped & (c.pc == PC_MARCH)
        # residual T_maj / T_maj[0] (eval numerator over sampling-side pdf;
        # the ratio trackers multiply by the all-sampling-side form)
        T_res = jnp.exp(-c.s_t * c.dl_since[:, None])
        T_res_d = sg(jnp.exp(-st_smp * c.dl_since[:, None]))
        f_res = T_res / jnp.maximum(T_res_d[:, 0:1], 1e-30)
        f_res_d = sg(T_res_d / jnp.maximum(T_res_d[:, 0:1], 1e-30))
        beta = jnp.where(esc_m[:, None], beta * f_res, beta)
        r_u = sg(jnp.where(esc_m[:, None], r_u * f_res_d, r_u))
        r_l = sg(jnp.where(esc_m[:, None], r_l * f_res_d, r_l))

        if has_surf:
            hit_surf = esc_m & jnp.isfinite(c.t_surf)
            to_sky = esc_m & ~jnp.isfinite(c.t_surf)
        else:
            hit_surf = jnp.zeros((n,), bool)
            to_sky = esc_m

        # sky: infinite lights with MIS (volpath escape branch); specular
        # bounces carry no light-sampling pdf => full weight (pbrt's
        # specularBounce case)
        Le_inf, pdf_inf = lights_mod.escaped_radiance(lights, c.d_main, c.lam)
        first = (c.depth == 0) | c.spec_last
        denom_first = jnp.mean(r_u, axis=-1)
        denom_mis = jnp.mean(r_u + r_l * pdf_inf[:, None], axis=-1)
        denom = sg(jnp.where(first, denom_first, denom_mis))
        contrib_inf = beta * Le_inf / jnp.maximum(denom, 1e-30)[:, None]
        L_acc = L_acc + jnp.where((to_sky & (denom > 0))[:, None], contrib_inf, 0.0)

        # surface shading setup
        if has_surf:
            albedos, emissions = (_mat_const if regen is None
                                  else eval_materials(c.lam))
            p_hit = c.so + c.t_surf[:, None] * c.sd
            wo_s = -c.d_main
            mid = jnp.clip(c.mat_id, 0, len(opaque) - 1)
            albedo = jnp.take_along_axis(
                albedos, mid[None, :, None], axis=0)[0]      # (n, L)
            Le_mat = jnp.take_along_axis(
                emissions, mid[None, :, None], axis=0)[0]
            if has_dt:
                _dt_tr = (_dt_const if regen is None else dt_spectra(c.lam))
                trans_hit = jnp.take_along_axis(
                    _dt_tr, mid[None, :, None], axis=0)[0]   # (n, L)
                dt_l = dt_mask_arr[mid]
            is_emissive = emissive_mask[mid]
            n_f = vmu.face_forward(c.n_surf, wo_s)
            front = vmu.dot(c.n_surf, wo_s) > 0
            # emitters: found by path sampling only (not NEE'd) => weight
            # 1/mean(r_u); one-sided emission
            hit_emit = hit_surf & is_emissive & front
            contrib_le = beta * Le_mat / jnp.maximum(denom_first, 1e-30)[:, None]
            L_acc = L_acc + jnp.where(hit_emit[:, None], contrib_le, 0.0)
            # bounce classification (depth-capped like scatters):
            # diffuse-like -> NEE + cosine bounce; rough microfacet ->
            # NEE (MIS vs the VNDF lobe) + VNDF bounce; smooth specular ->
            # immediate mirror/refract bounce, no NEE (delta lobes)
            if has_spec or has_rough:
                spec_hit = spec_mask_arr[mid]
                rough_hit = rough_mask_arr[mid]
                hit_diff = hit_surf & ~is_emissive & ~spec_hit & ~rough_hit
                hit_spec = hit_surf & ~is_emissive & spec_hit
                hit_rough = hit_surf & ~is_emissive & rough_hit
            else:
                hit_diff = hit_surf & ~is_emissive
                hit_spec = jnp.zeros((n,), bool)
                hit_rough = jnp.zeros((n,), bool)
            over_s = (hit_diff | hit_spec | hit_rough) \
                & (c.depth >= max_depth)
            do_surf = hit_diff & ~over_s
            do_spec = hit_spec & ~over_s
            do_rough = hit_rough & ~over_s
            depth = depth + jnp.where(do_surf | do_spec | do_rough, 1, 0)
        else:
            hit_emit = jnp.zeros((n,), bool)
            over_s = jnp.zeros((n,), bool)
            do_surf = jnp.zeros((n,), bool)
            do_spec = jnp.zeros((n,), bool)
            do_rough = jnp.zeros((n,), bool)

        # local shading frame on the TRUE geometric normal (path.py's
        # convention): the non-diffuse lobes are two-sided sign-aware,
        # and a dielectric's eta side-assignment (etap = cos_o > 0 ?
        # eta : 1/eta) requires the frame orientation to be a property
        # of the SURFACE, not of which side the ray came from
        if has_spec or has_rough or has_dt:
            from .. import bxdfs as bxdfs_mod

            sbx, sby, sbz = vmu.frame_from_z(c.n_surf)
            wo_sl = vmu.to_local(sbx, sby, sbz, wo_s)
        # per-hit microfacet parameters (shared by NEE and the bounce)
        if has_spec or has_rough:
            _ce, _ck = (_cond_const if regen is None
                        else cond_spectra(c.lam))
            eta_c_hit = jnp.take_along_axis(_ce, mid[None, :, None],
                                            axis=0)[0]
            k_c_hit = jnp.take_along_axis(_ck, mid[None, :, None],
                                          axis=0)[0]
            alpha_hit = alpha_arr[mid]
            eta_m = diel_eta_arr[mid]
            is_cond_l = cond_mask_arr[mid]

        # =========== NEE SETUP (volume scatter or surface bounce) ===========
        p_scat = c.so + c.t_cur[:, None] * c.sd
        wo = -c.d_main
        want_nee = do_scatter | do_surf | do_rough
        rng, u1 = pcg_uniform_masked(rng, want_nee)
        rng, u2a = pcg_uniform_masked(rng, want_nee)
        rng, u2b = pcg_uniform_masked(rng, want_nee)
        if has_surf:
            p_vertex = jnp.where((do_surf | do_rough)[:, None],
                                 p_hit + n_f * _SURF_EPS, p_scat)
        else:
            p_vertex = p_scat
        # light-sampler strategy plumbed from the scene (uniform / power /
        # bvh adaptive — lightsamplers.h; reference volpath defaults to
        # BVH sampling, cpu/integrators.h:266)
        ls, is_delta = lights_mod.sample_one_light(
            lights, p_vertex, u1, jnp.stack([u2a, u2b], -1), c.lam,
            strategy=light_strategy,
        )
        f_hat = phase_ops.hg_phase(wo, ls.wi, g)   # differentiable in g
        f_hat_d = sg(phase_ops.hg_phase(wo, ls.wi, g_samp))  # pdf role
        if has_surf:
            cos_l = vmu.dot(ls.wi, n_f)
            f_surf = albedo / jnp.pi * jnp.maximum(cos_l, 0.0)[:, None]
            spdf_surf = sg(jnp.maximum(cos_l, 0.0) / jnp.pi)
            f_spec = jnp.where(do_surf[:, None], f_surf, f_hat[:, None])
            spdf_d = jnp.where(do_surf, spdf_surf, f_hat_d)
            diff_nee_ok = cos_l > 0
            if has_dt:
                # DT lanes are two-sided: same hemisphere as wo keeps the
                # reflectance lobe, the far hemisphere (light behind the
                # surface) evaluates the transmittance lobe — the SHARED
                # bxdfs helpers so the fused path, li_path and BDPT stay
                # convention-locked (side-pick MIS pdf included)
                wi_dl = vmu.to_local(sbx, sby, sbz, ls.wi)
                f_dt = (bxdfs_mod.diffuse_transmission_f(
                    wo_sl, wi_dl, albedo, trans_hit)
                    * jnp.abs(cos_l)[:, None])
                spdf_dt = sg(bxdfs_mod.diffuse_transmission_pdf(
                    wo_sl, wi_dl, jnp.max(albedo, -1),
                    jnp.max(trans_hit, -1)))
                dt_nee = do_surf & dt_l
                f_spec = jnp.where(dt_nee[:, None], f_dt, f_spec)
                spdf_d = jnp.where(dt_nee, spdf_dt, spdf_d)
                diff_nee_ok = jnp.where(dt_l, jnp.any(f_dt > 0, -1),
                                        diff_nee_ok)
            rough_nee_ok = jnp.zeros((n,), bool)
            if has_rough:
                # microfacet f * |cos| and pdf toward the light (MIS
                # companion of the VNDF bounce — bxdfs.h Conductor/
                # DielectricBxDF f()/PDF() rough cases)
                wi_nl = vmu.to_local(sbx, sby, sbz, ls.wi)
                f_c_nee = bxdfs_mod.conductor_f(wo_sl, wi_nl, eta_c_hit,
                                                k_c_hit, alpha_hit)
                p_c_nee = bxdfs_mod.conductor_pdf(wo_sl, wi_nl, alpha_hit)
                f_d_nee = bxdfs_mod.dielectric_f(wo_sl, wi_nl, eta_m,
                                                 alpha_hit)
                p_d_nee = bxdfs_mod.dielectric_pdf(wo_sl, wi_nl, eta_m,
                                                   alpha_hit)
                f_r_nee = jnp.where(is_cond_l[:, None], f_c_nee, f_d_nee) \
                    * jnp.abs(wi_nl[..., 2])[:, None]
                p_r_nee = sg(jnp.where(is_cond_l, p_c_nee, p_d_nee))
                f_spec = jnp.where(do_rough[:, None], f_r_nee, f_spec)
                spdf_d = jnp.where(do_rough, p_r_nee, spdf_d)
                rough_nee_ok = (p_r_nee > 0) & jnp.any(f_r_nee > 0, -1)
            # occlusion origin is SIDE-AWARE (pbrt SpawnRayTo offsets along
            # sign(dot(n, wi))): a transmitted NEE direction (rough
            # dielectric / diffuse-transmission, light behind the surface)
            # must start on the light's side or the surface occludes
            # itself — path.py:489 had this right, the fused path did not
            side = jnp.where(vmu.dot(c.n_surf, ls.wi) > 0,
                             _SURF_EPS, -_SURF_EPS)
            p_occl = jnp.where((do_surf | do_rough)[:, None],
                               p_hit + c.n_surf * side[:, None], p_vertex)
            occl = shapes_mod.occluded(opaque, p_occl, ls.wi, ls.dist)
            extra_ok = jnp.where(
                do_surf, diff_nee_ok,
                jnp.where(do_rough, rough_nee_ok, f_hat_d > 0)) & ~occl
        else:
            f_spec = f_hat[:, None] * jnp.ones((n, LANES))
            spdf_d = f_hat_d
            extra_ok = f_hat_d > 0
        nee_valid = want_nee & ls.valid & (ls.pdf > 0) & extra_ok
        skip_nee = want_nee & ~nee_valid

        # =========== NEE COLLISIONS (pc == NEE) ===========
        col_s = col_any & (c.pc == PC_NEE)
        pdf_rt = sg(T_maj_d[:, 0] * sig_majr0)
        inv_rt = 1.0 / jnp.maximum(pdf_rt, 1e-30)
        ok_rt = (pdf_rt > 0)
        # T_ray numerator keeps the FULL null magnitude sig_n = s_t *
        # (majorant - density); under residual tracking the pdf uses the
        # residual rate (majorant - minorant) and the control factor
        # ctrlT = exp(-s_t * ctrl depth) applies deterministically
        T_ray = jnp.where((col_s & ok_rt)[:, None],
                          c.T_ray * T_maj * ctrlT * sig_n * inv_rt[:, None],
                          c.T_ray)
        # r_l_s is the lane-to-hero DISTANCE-SAMPLER pdf ratio (the light-
        # MIS tracker): the residual sampler's pdf uses the residual rate
        # and has NO control factor (the control term is deterministic)
        r_l_s = sg(jnp.where((col_s & ok_rt)[:, None],
                             c.r_l_s * T_maj_d * sig_majr_d * inv_rt[:, None], c.r_l_s))
        # r_u_s tracks the sampling-side null products (== T_ray at the
        # sampling point), so it doubles as the RR decision statistic
        r_u_s = sg(jnp.where((col_s & ok_rt)[:, None],
                             c.r_u_s * T_maj_d * ctrlT_d * sig_n_d * inv_rt[:, None], c.r_u_s))
        denom_rr = jnp.mean(r_l_s + r_u_s, axis=-1)
        Tr = r_u_s / jnp.maximum(denom_rr, 1e-30)[:, None]
        rr = col_s & (jnp.max(Tr, axis=-1) < 0.05)
        rng, u_rr = pcg_uniform_masked(rng, rr)
        killed = rr & (u_rr < 0.75)
        T_ray = jnp.where(killed[:, None], 0.0,
                          jnp.where(rr[:, None], T_ray / 0.25, T_ray))
        shadow_dead = col_s & (killed | ~jnp.any(r_u_s != 0.0, axis=-1))

        # =========== NEE SEGMENT COMPLETE (pc == NEE) ===========
        esc_s = (c.seg_escaped | shadow_dead) & (c.pc == PC_NEE)
        # segment end: residual gap factor f_res + the control factor for
        # the depth marched since the last event (shadow_dead lanes
        # already applied this iteration's ctrlT at their collision)
        T_ray_f = jnp.where((esc_s & ~shadow_dead)[:, None],
                            T_ray * f_res * ctrlT, T_ray)
        r_l_sf = jnp.where((esc_s & ~shadow_dead)[:, None], r_l_s * f_res_d, r_l_s)
        r_u_sf = jnp.where((esc_s & ~shadow_dead)[:, None],
                           r_u_s * f_res_d * ctrlT_d, r_u_s)
        # contribution (volpath_custom.cpp:723-727): r_p = path r_u
        r_l_nee = r_l_sf * c.r_u * c.ls_pdf[:, None]
        r_u_nee = r_u_sf * c.r_u * c.spdf_d[:, None]
        denom_nee = sg(jnp.where(c.is_delta, jnp.mean(r_l_nee, axis=-1),
                                 jnp.mean(r_l_nee + r_u_nee, axis=-1)))
        contrib_nee = (c.beta * c.f_spec * T_ray_f * c.ls_L
                       / jnp.maximum(denom_nee, 1e-30)[:, None])
        L_acc = L_acc + jnp.where((esc_s & (denom_nee > 0))[:, None], contrib_nee, 0.0)

        # =========== RESUME (NEE done, vertex that skipped NEE, or a
        # specular surface hit bouncing immediately) ===========
        resume = esc_s | skip_nee | do_spec
        res_surf = resume & c.at_surface if has_surf else jnp.zeros((n,), bool)
        if has_surf:
            # skip_nee surface rays haven't set at_surface yet
            res_surf = (esc_s & c.at_surface) | (skip_nee & (do_surf
                                                            | do_rough))
        rng, u3a = pcg_uniform_masked(rng, resume)
        rng, u3b = pcg_uniform_masked(rng, resume)
        wo2 = -c.d_main
        wi, ps_pdf = phase_ops.sample_hg(wo2, jnp.stack([u3a, u3b], -1), g_samp)
        ps_pdf = sg(ps_pdf)
        # beta *= p(theta)/pdf* — forward 1 for HG, carries d log p / d g
        p_theta = phase_ops.hg_phase(wo2, wi, g)
        trans_rough = jnp.zeros((n,), bool)
        if has_surf:
            # surfaces: cosine-sampled bounce around the stored normal
            # (mid / n_f / wo_sl / the microfacet params above all derive
            # from c.mat_id + c.n_surf, so they are equally valid for
            # NEE-returning lanes)
            n_rf = vmu.face_forward(c.n_surf, wo2)
            local = warps.sample_cosine_hemisphere(jnp.stack([u3a, u3b], -1))
            bx, by, bz = vmu.frame_from_z(n_rf)
            wi_surf = vmu.from_local(bx, by, bz, local)
            cos_s = jnp.maximum(vmu.dot(wi_surf, n_rf), 0.0)
            pdf_surf = sg(cos_s / jnp.pi)
            alb_res = jnp.take_along_axis(
                albedos, jnp.clip(c.mat_id, 0, len(opaque) - 1)[None, :, None],
                axis=0)[0]
            if has_rough:
                lane_rough = rough_mask_arr[mid]
                res_rough = res_surf & lane_rough
                res_diff = res_surf & ~lane_rough
            else:
                res_rough = jnp.zeros((n,), bool)
                res_diff = res_surf
            wi = jnp.where(res_diff[:, None], wi_surf, wi)
            ps_pdf = jnp.where(res_diff, pdf_surf, ps_pdf)
            # f*cos/pdf = albedo for cosine-sampled Lambertian
            f_over = jnp.where(res_diff[:, None], alb_res,
                               p_theta[:, None] / jnp.maximum(ps_pdf, 1e-30)[:, None])
            go_dt_t = jnp.zeros((n,), bool)
            if has_dt:
                # DT bounce via the SHARED diffuse_transmission_sample
                # (transmission lobe picked with prob pt/(pr+pt), cosine
                # sample landed in the far hemisphere; the returned pdf
                # carries the side-pick factor so MIS vs the NEE strategy
                # above stays consistent)
                dt_res = res_diff & dt_mask_arr[mid]
                rng, u_dt = pcg_uniform_masked(rng, dt_res)
                bs_dt = bxdfs_mod.diffuse_transmission_sample(
                    wo_sl, u_dt, jnp.stack([u3a, u3b], -1),
                    alb_res, trans_hit)
                wi_dtw = vmu.from_local(sbx, sby, sbz, bs_dt.wi)
                cos_dt = jnp.abs(bs_dt.wi[..., 2])
                wi = jnp.where(dt_res[:, None], wi_dtw, wi)
                ps_pdf = jnp.where(dt_res, sg(bs_dt.pdf), ps_pdf)
                f_over = jnp.where(
                    dt_res[:, None],
                    bs_dt.f * (cos_dt
                               / jnp.maximum(bs_dt.pdf, 1e-30))[:, None],
                    f_over)
                go_dt_t = dt_res & bs_dt.transmitted
            if has_rough:
                # ---- rough microfacet bounce: Trowbridge-Reitz VNDF
                # sample of the conductor/dielectric lobe (bxdfs.h
                # Sample_f rough cases) in the n_rf local frame
                u2p = jnp.stack([u3a, u3b], -1)
                rng, u_lb = pcg_uniform_masked(rng, res_rough & ~is_cond_l)
                bs_c = bxdfs_mod.conductor_sample(wo_sl, u2p, eta_c_hit,
                                                  k_c_hit, alpha_hit)
                bs_dl = bxdfs_mod.dielectric_sample(wo_sl, u_lb, u2p,
                                                    eta_m, alpha_hit)
                wi_rl = jnp.where(is_cond_l[:, None], bs_c.wi, bs_dl.wi)
                f_rs = jnp.where(is_cond_l[:, None], bs_c.f, bs_dl.f)
                pdf_rs = sg(jnp.where(is_cond_l, bs_c.pdf, bs_dl.pdf))
                ok_rs = jnp.where(is_cond_l, bs_c.pdf > 0,
                                  bs_dl.pdf > 0)
                wi_rw = vmu.from_local(sbx, sby, sbz, wi_rl)
                cos_rs = jnp.abs(wi_rl[..., 2])
                wi = jnp.where(res_rough[:, None], wi_rw, wi)
                ps_pdf = jnp.where(res_rough,
                                   jnp.where(ok_rs, pdf_rs, 0.0), ps_pdf)
                f_over = jnp.where(
                    res_rough[:, None],
                    f_rs * (cos_rs / jnp.maximum(pdf_rs, 1e-30))[:, None],
                    f_over)
                # transmitted lanes continue on the far side of the
                # surface (true-normal frame: transmission = the sampled
                # wi crossing to the opposite hemisphere from wo)
                trans_rough = res_rough & (wi_rl[..., 2]
                                           * wo_sl[..., 2] < 0)
        else:
            f_over = p_theta[:, None] / jnp.maximum(ps_pdf, 1e-30)[:, None]

        if has_spec:
            # ---- smooth specular lobes (BSDF Sample_f delta cases,
            # bxdfs.h ConductorBxDF / DielectricBxDF / ThinDielectricBxDF)
            # (is_cond_l / eta_m / eta_c_hit / k_c_hit shared with the
            # rough branch, computed at the surface-shading setup)
            is_thin_l = thin_mask_arr[mid]
            cos_o = jnp.maximum(vmu.dot(wo_s, n_f), 1e-6)
            wi_mirror = bxdfs_mod.reflect(wo_s, n_f)
            sgn_cos = vmu.dot(wo_s, c.n_surf)     # signed vs outward normal
            F_d = bxdfs_mod.fresnel_dielectric(sgn_cos, eta_m)
            # thin slab: total reflectance with internal bounces
            # (ThinDielectricBxDF: R' = 2F/(1+F))
            F_thin = jnp.where(F_d < 1.0, 2.0 * F_d / (1.0 + F_d), 1.0)
            F_prob = jnp.where(is_thin_l, F_thin, F_d)
            rng, u_lobe = pcg_uniform_masked(rng, do_spec & ~is_cond_l)
            ok_refr, wt, eta_p = bxdfs_mod.refract(wo_s, c.n_surf, eta_m)
            refl = is_cond_l | (u_lobe < F_prob) | (~is_thin_l & ~ok_refr)
            wt_dir = jnp.where(is_thin_l[:, None], -wo_s, wt)
            wi_sp = jnp.where(refl[:, None], wi_mirror, wt_dir)
            F_c = bxdfs_mod.fresnel_conductor(cos_o[:, None] *
                                              jnp.ones((n, LANES)),
                                              eta_c_hit, k_c_hit)
            # lobe chosen with probability F (or 1-F): weights cancel to 1
            # except the conductor Fresnel and the 1/eta^2 radiance scale
            # on refraction (bxdfs.h DielectricBxDF Sample_f)
            f_sp = jnp.where(
                is_cond_l[:, None], F_c,
                jnp.where((refl | is_thin_l)[:, None], 1.0,
                          (1.0 / jnp.maximum(eta_p * eta_p, 1e-12))[:, None]))
            p_spec_o = p_hit + c.n_surf * jnp.where(
                refl == (sgn_cos > 0), _SURF_EPS, -_SURF_EPS)[:, None]
            wi = jnp.where(do_spec[:, None], wi_sp, wi)
            ps_pdf = jnp.where(do_spec, 1.0, ps_pdf)
            f_over = jnp.where(do_spec[:, None], f_sp, f_over)
        ps_ok = ps_pdf > 0
        f_bounce = jnp.where((resume & ps_ok)[:, None], f_over, 1.0)
        beta = beta * f_bounce
        r_l_new = sg(jnp.where((resume & ps_ok)[:, None],
                               r_u / jnp.maximum(ps_pdf, 1e-30)[:, None], r_l))
        # Russian roulette after surface bounces past depth 1
        # (cpu/integrators.cpp surface branch)
        if has_surf:
            rr_beta = jnp.max(sg(beta) / jnp.maximum(
                jnp.mean(r_u, axis=-1), 1e-30)[:, None], axis=-1)
            rr_cand = res_surf & ps_ok & (c.depth > 1) & (rr_beta < 1.0)
            q = jnp.clip(1.0 - rr_beta, 0.0, 0.95)
            rng, u_rr2 = pcg_uniform_masked(rng, rr_cand)
            rr_kill = rr_cand & (u_rr2 < q)
            beta = jnp.where(rr_cand[:, None] & ~rr_kill[:, None],
                             beta / jnp.maximum(1.0 - q, 1e-6)[:, None], beta)
        else:
            rr_kill = jnp.zeros((n,), bool)

        # resume origin: NEE-returning rays resume from the stored shadow
        # origin (= the vertex); skip_nee rays from the fresh vertex;
        # specular rays from the side-offset hit point
        if has_surf:
            p_fresh = jnp.where((do_surf | do_rough)[:, None], p_vertex,
                                p_scat)
            if has_spec:
                p_fresh = jnp.where(do_spec[:, None], p_spec_o, p_fresh)
        else:
            p_fresh = p_scat
        p_resume = jnp.where(esc_s[:, None], c.so, p_fresh)
        if has_rough:
            # transmitted microfacet lanes: the stored/fresh vertex sits
            # _SURF_EPS on the wo side — move it to the far side
            p_resume = jnp.where(trans_rough[:, None],
                                 p_resume - n_rf * (2.0 * _SURF_EPS),
                                 p_resume)
        if has_surf and has_dt:
            # transmitted diffuse-transmission lanes continue on the far
            # side of the surface, same shift as the rough-transmitted case
            p_resume = jnp.where(go_dt_t[:, None],
                                 p_resume - n_rf * (2.0 * _SURF_EPS),
                                 p_resume)
        d_new = jnp.where((resume & ps_ok)[:, None], wi, c.d_main)

        # =========== program counter updates ===========
        pc = c.pc
        pc = jnp.where(is_absorb | dead_null | over | to_sky | hit_emit | over_s,
                       PC_DONE, pc)
        pc = jnp.where(nee_valid, PC_NEE, pc)
        pc = jnp.where(resume & ps_ok & ~rr_kill, PC_MARCH, pc)
        pc = jnp.where(resume & (~ps_ok | rr_kill), PC_DONE, pc)
        pc = pc.astype(jnp.int32)

        # =========== null continuation: fresh tau target in place ===========
        st0 = st_smp[:, 0]
        rng, u_n = pcg_uniform_masked(rng, is_null & ~dead_null)
        u_n = jnp.minimum(u_n, ONE_MINUS_EPSILON)
        dl_new = jnp.where(st0 > 0,
                           -jnp.log1p(-u_n) / jnp.maximum(st0, 1e-30), jnp.inf)
        rng, u_n2 = pcg_uniform_masked(rng, col_s & ~shadow_dead)
        u_n2 = jnp.minimum(u_n2, ONE_MINUS_EPSILON)
        dl_new2 = jnp.where(st0 > 0,
                            -jnp.log1p(-u_n2) / jnp.maximum(st0, 1e-30), jnp.inf)
        dl_target = jnp.where(is_null & ~dead_null, dl_new,
                              jnp.where(col_s & ~shadow_dead, dl_new2, c.dl_target))
        dl_since = jnp.where(col_any, 0.0, c.dl_since)

        ev_new = c.ev_counts
        if count_events:
            ev_new = c.ev_counts + jnp.stack(
                [jnp.sum(col_m, dtype=jnp.int32),
                 jnp.sum(col_s, dtype=jnp.int32)])
        c2 = c._replace(
            pc=pc, depth=depth, rng=rng,
            ev_counts=ev_new,
            d_main=d_new,
            at_surface=jnp.where(
                nee_valid, (do_surf | do_rough) if has_surf else False,
                jnp.where(resume, False, c.at_surface)),
            spec_last=jnp.where(
                do_spec, True,
                jnp.where(do_scatter | (resume & ~do_spec), False,
                          c.spec_last)),
            L=L_acc, beta=beta, r_u=r_u, r_l=r_l_new,
            T_ray=jnp.where(nee_valid[:, None], 1.0, T_ray_f),
            r_l_s=jnp.where(nee_valid[:, None], 1.0, r_l_sf),
            r_u_s=jnp.where(nee_valid[:, None], 1.0, r_u_sf),
            ls_L=jnp.where(nee_valid[:, None], ls.L, c.ls_L),
            ls_pdf=jnp.where(nee_valid, ls.pdf, c.ls_pdf),
            f_spec=jnp.where(nee_valid[:, None], f_spec, c.f_spec),
            spdf_d=jnp.where(nee_valid, spdf_d, c.spdf_d),
            is_delta=jnp.where(nee_valid, is_delta, c.is_delta),
            dl_target=dl_target, dl_since=dl_since,
            reached=c.reached & ~col_any,
            **(dict(ctrl_since=jnp.where(col_any, 0.0, c.ctrl_since))
               if residual_on else {}),
        )

        # =========== segment (re)initialization ===========
        need_shadow = nee_valid
        need_march = resume & ps_ok & ~rr_kill
        new_o = jnp.where(need_shadow[:, None],
                          p_vertex if has_surf else p_scat, p_resume)
        new_d = jnp.where(need_shadow[:, None], ls.wi, wi)
        new_tmax = jnp.where(need_shadow, ls.dist, jnp.inf)
        need = need_shadow | need_march
        c2, in_med = init_segment(new_o, new_d, new_tmax, c2.rng, need, c2,
                                  need_main=need_march)
        return c2

    def retire_respawn(c: _Regs) -> _Regs:
        """Regen mode: splat retiring lanes to the film and refill them with
        the next unissued work items (the wavefront queue-refill stage).

        Round-robin retire groups: XLA:TPU executes scatter-add ~serially
        (~7ns/element, profiled at 52% of the loop), so only a contiguous
        1/R slice of lanes may splat per iteration — the scatter shrinks to
        3N/R elements via a cheap dynamic_slice; a finished lane outside
        its group waits <= R-1 iterations (a few % of mean path length).
        """
        done = (c.pc == PC_DONE) & (c.work >= 0)
        if retire_groups > 1:
            grp_sz = N // retire_groups
            g = jnp.remainder(c.n_steps, retire_groups)
            active = (jnp.arange(N, dtype=jnp.int32) // grp_sz) == g
            done = done & active
        swl = _spu.SampledWavelengths(c.lam, c.lam_pdf)
        rgb = _cspace.xyz_to_rgb(_spu.to_xyz(c.L, swl))
        # python-level gate: with max_component = inf the clamp must not
        # trace at all — the masked-out inf/m branch poisons reverse-mode
        # AD with 0 * -inf = NaN cotangents (regen gradient path)
        try:
            _maxc_finite = np.isfinite(float(R_maxc))
        except TypeError:        # traced value: keep the clamp
            _maxc_finite = True
        if _maxc_finite:
            m = jnp.max(rgb, axis=-1)
            clamp = jnp.where(m > R_maxc,
                              R_maxc / jnp.maximum(m, 1e-24), 1.0)
            rgb = rgb * clamp[:, None]
        rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)
        gw = c.work + R_base
        p_idx = work_pixel(gw).astype(jnp.int32)
        tgt = jnp.where(done & (gw < R_gtotal), p_idx, R_HW)
        ch_off = jnp.arange(3, dtype=jnp.int32) * (R_HW + 1)   # channel-major
        rgb_m = jnp.where(done[:, None], rgb, 0.0)
        if retire_groups > 1:
            tgt_g = jax.lax.dynamic_slice(tgt, (g * grp_sz,), (grp_sz,))
            rgb_g = jax.lax.dynamic_slice(rgb_m, (g * grp_sz, 0), (grp_sz, 3))
            tgt3 = (tgt_g[:, None] + ch_off).reshape(-1)
            vals = rgb_g.reshape(-1)
        else:
            tgt3 = (tgt[:, None] + ch_off).reshape(-1)
            vals = rgb_m.reshape(-1)
        if R_cot is not None:
            film_rgb = c.film_rgb + jnp.sum(R_cot[tgt3] * vals)[None]
        else:
            film_rgb = c.film_rgb.at[tgt3].add(vals)

        # issue the next work items to retiring lanes (rank-ordered)
        rank = jnp.cumsum(done.astype(jnp.int32)) - 1
        new_work = c.cursor + rank
        can = done & (new_work < R_total)
        o2, d2, lam2, pdf2, rng2, _ = spawn(
            jnp.where(can, new_work, 0).astype(jnp.int32))
        s_t2, s_a2, s_s2, s_le2 = spectra_for(lam2)
        sel = can[:, None]
        one_s = jnp.ones((N, LANES), f32)
        c = c._replace(
            pc=jnp.where(can, PC_MARCH, c.pc).astype(jnp.int32),
            depth=jnp.where(can, 0, c.depth),
            rng=jnp.where(can, rng2, c.rng),
            lam=jnp.where(sel, lam2, c.lam),
            lam_pdf=jnp.where(sel, pdf2, c.lam_pdf),
            s_t=jnp.where(sel, s_t2, c.s_t),
            s_a=jnp.where(sel, s_a2, c.s_a),
            s_s=jnp.where(sel, s_s2, c.s_s),
            s_le=jnp.where(sel, s_le2, c.s_le),
            d_main=jnp.where(sel, d2, c.d_main),
            at_surface=jnp.where(can, False, c.at_surface),
            spec_last=jnp.where(can, False, c.spec_last),
            L=jnp.where(sel, 0.0, c.L),
            beta=jnp.where(sel, one_s, c.beta),
            r_u=jnp.where(sel, one_s, c.r_u),
            r_l=jnp.where(sel, one_s, c.r_l),
            T_ray=jnp.where(sel, one_s, c.T_ray),
            r_l_s=jnp.where(sel, one_s, c.r_l_s),
            r_u_s=jnp.where(sel, one_s, c.r_u_s),
            work=jnp.where(can, new_work,
                           jnp.where(done, -1, c.work)).astype(jnp.int32),
            cursor=jnp.minimum(
                c.cursor + jnp.sum(done, dtype=jnp.int32),
                jnp.int32(R_total)),
            film_rgb=film_rgb,
        )
        c, _ = init_segment(o2, d2, jnp.full((N,), jnp.inf, f32), c.rng,
                            can, c, need_main=can)
        return c

    def retire_respawn_accum(c: _Regs) -> _Regs:
        """accum_spp retire stage: bank each finished sample's rgb into
        registers (dense ops, no scatter), immediately run the next sample
        of the SAME pixel in-lane, and splat/refill only once all spp
        samples are banked.  The film scatter-add — 43% of loop time at
        ~7ns/element (docs/PROFILE_r03.md) — shrinks from one splat per
        sample to one per pixel, and retire_groups can rise spp-fold
        before retirement capacity binds.  Every (pixel, sample) estimate
        is bitwise identical to the per-sample mode (same film_sample
        streams); only film-add order/associativity differs."""
        # ---- bank the just-finished sample (exactly once: samp < spp) ----
        fresh = (c.pc == PC_DONE) & (c.work >= 0) & (c.samp < R_spp)
        swl = _spu.SampledWavelengths(c.lam, c.lam_pdf)
        rgb = _cspace.xyz_to_rgb(_spu.to_xyz(c.L, swl))
        try:
            _maxc_finite = np.isfinite(float(R_maxc))
        except TypeError:        # traced value: keep the clamp
            _maxc_finite = True
        if _maxc_finite:
            m = jnp.max(rgb, axis=-1)
            clamp = jnp.where(m > R_maxc,
                              R_maxc / jnp.maximum(m, 1e-24), 1.0)
            rgb = rgb * clamp[:, None]
        rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)
        rgb_acc = c.rgb_acc + jnp.where(fresh[:, None], rgb, 0.0)
        samp = c.samp + jnp.where(fresh, 1, 0)

        # ---- splat fully-banked pixels (group-gated) ----
        ready = (c.pc == PC_DONE) & (c.work >= 0) & (samp >= R_spp)
        retire = ready
        if retire_groups > 1:
            grp_sz = N // retire_groups
            g = jnp.remainder(c.n_steps, retire_groups)
            active = (jnp.arange(N, dtype=jnp.int32) // grp_sz) == g
            retire = ready & active
        gw = c.work + R_ibase
        p_idx = work_pixel(gw).astype(jnp.int32)
        tgt = jnp.where(retire & (gw < R_gitems), p_idx, R_HW)
        ch_off = jnp.arange(3, dtype=jnp.int32) * (R_HW + 1)
        acc_m = jnp.where(retire[:, None], rgb_acc, 0.0)
        if retire_groups > 1:
            tgt_g = jax.lax.dynamic_slice(tgt, (g * grp_sz,), (grp_sz,))
            acc_g = jax.lax.dynamic_slice(acc_m, (g * grp_sz, 0),
                                          (grp_sz, 3))
            tgt3 = (tgt_g[:, None] + ch_off).reshape(-1)
            vals = acc_g.reshape(-1)
        else:
            tgt3 = (tgt[:, None] + ch_off).reshape(-1)
            vals = acc_m.reshape(-1)
        if R_cot is not None:
            film_rgb = c.film_rgb + jnp.sum(R_cot[tgt3] * vals)[None]
        else:
            film_rgb = c.film_rgb.at[tgt3].add(vals)

        # ---- respawn: next sample of the same pixel, or fresh work ----
        nxt = fresh & (samp < R_spp)
        rank = jnp.cumsum(retire.astype(jnp.int32)) - 1
        new_work = c.cursor + rank
        can_new = retire & (new_work < R_items)
        can = nxt | can_new
        sp_work = jnp.where(nxt, c.work,
                            jnp.where(can_new, new_work, 0)).astype(jnp.int32)
        sp_samp = jnp.where(nxt, samp, 0).astype(jnp.int32)
        o2, d2, lam2, pdf2, rng2, _ = spawn(sp_work, sp_samp)
        s_t2, s_a2, s_s2, s_le2 = spectra_for(lam2)
        sel = can[:, None]
        one_s = jnp.ones((N, LANES), f32)
        c = c._replace(
            pc=jnp.where(can, PC_MARCH, c.pc).astype(jnp.int32),
            depth=jnp.where(can, 0, c.depth),
            rng=jnp.where(can, rng2, c.rng),
            lam=jnp.where(sel, lam2, c.lam),
            lam_pdf=jnp.where(sel, pdf2, c.lam_pdf),
            s_t=jnp.where(sel, s_t2, c.s_t),
            s_a=jnp.where(sel, s_a2, c.s_a),
            s_s=jnp.where(sel, s_s2, c.s_s),
            s_le=jnp.where(sel, s_le2, c.s_le),
            d_main=jnp.where(sel, d2, c.d_main),
            at_surface=jnp.where(can, False, c.at_surface),
            spec_last=jnp.where(can, False, c.spec_last),
            L=jnp.where(sel, 0.0, c.L),
            beta=jnp.where(sel, one_s, c.beta),
            r_u=jnp.where(sel, one_s, c.r_u),
            r_l=jnp.where(sel, one_s, c.r_l),
            T_ray=jnp.where(sel, one_s, c.T_ray),
            r_l_s=jnp.where(sel, one_s, c.r_l_s),
            r_u_s=jnp.where(sel, one_s, c.r_u_s),
            work=jnp.where(can_new, new_work,
                           jnp.where(retire, -1, c.work)).astype(jnp.int32),
            samp=jnp.where(can_new, 0, samp).astype(jnp.int32),
            rgb_acc=jnp.where(retire[:, None], 0.0, rgb_acc),
            cursor=jnp.minimum(
                c.cursor + jnp.sum(retire, dtype=jnp.int32),
                jnp.int32(R_items)),
            film_rgb=film_rgb,
        )
        c, _ = init_segment(o2, d2, jnp.full((N,), jnp.inf, f32), c.rng,
                            can, c, need_main=can)
        return c

    # ---- event-group round-robin: run handle_events on a contiguous 1/E
    # slice of the lanes per iteration, shrinking the density gather and
    # the event block E-fold per iteration.  Per-lane RNG streams advance
    # only at that lane's own events, so every (pixel, sample) estimate is
    # bitwise identical to event_groups=1 (tests/test_regen.py).
    # MEASURED WORSE on the cloud-720p bench (docs/PROFILE_r04.md): with
    # k_substeps ~ the collision interval a lane needs an event nearly
    # every iteration, so paths advance ~E-fold slower while march +
    # retire still run full-width — spp16/g16: 15.6 -> 10.3 (E=2) -> 6.4
    # (E=4) Mrays/s.  Kept as an opt-in for long-mean-free-path scenes
    # where marches per event >> 1.
    # pass-through (scalars/global state the lane-slice must not cut;
    # the (1,)-dummy ctrl registers join it when residual tracking is off)
    _EVENT_SLICED = ("n_steps", "cursor", "film_rgb", "ev_counts") + (
        () if residual_on else ("ctrld", "ctrl_since"))

    def sliced_events(c: _Regs) -> _Regs:
        assert N % event_groups == 0
        assert not has_samp_sigma, \
            "event_groups > 1: width-fixed sampling-sigma overrides"
        egrp = N // event_groups
        g = jnp.remainder(c.n_steps, event_groups)
        start = g * egrp
        sub = c._replace(**{
            f: jax.lax.dynamic_slice_in_dim(getattr(c, f), start, egrp, 0)
            for f in c._fields if f not in _EVENT_SLICED})
        sub = handle_events(sub)
        return c._replace(**{
            f: jax.lax.dynamic_update_slice_in_dim(
                getattr(c, f), getattr(sub, f), start, 0)
            for f in c._fields if f not in _EVENT_SLICED},
            **{f: getattr(sub, f) for f in _EVENT_SLICED})

    def cond(c: _Regs):
        busy = jnp.any(c.pc != PC_DONE)
        if regen is not None and (retire_every > 1 or retire_groups > 1):
            # batched/grouped retirement: a finished lane may still hold an
            # unsplatted result between its retire ticks
            busy = busy | jnp.any(c.work >= 0)
        return busy & (c.n_steps < max_march_steps)

    def body(c: _Regs):
        # K cheap DDA sub-steps amortize one expensive event block: rays that
        # hit their collision target early in the window idle (reached flag)
        # until the block processes them — pure scheduling, no estimator
        # change (events are per-ray independent).
        #
        # The event/retire blocks run UNCONDITIONALLY (masked): wrapping them
        # in lax.cond makes XLA stream every cond operand — including the
        # full density grid and film — through copy-start/copy-done pairs on
        # each invocation, which profiling showed dominated the loop; with
        # k_substeps ~ the mean collision interval, events are pending almost
        # every iteration anyway.
        #
        # sub_rounds > 1 unrolls several march+event rounds per retire tick
        # (NOT via lax.cond — plain unroll): the film scatter has a large
        # FIXED cost per invocation (r3 profile: groups=4 halved its element
        # count yet ran slower), so amortizing it over multiple event rounds
        # is the win lax.cond's carry copies denied retire_every.
        for _ in range(sub_rounds):
            c = block_substep(c, k_substeps)
            c = sliced_events(c) if event_groups > 1 else handle_events(c)
        if regen is not None:
            if retire_every > 1:
                # film splat + respawn every R iterations only.  Measured on
                # TPU (cloud-720p): R=2 is ~12% SLOWER than R=1 — lax.cond's
                # carry copies outweigh the skipped scatter — so the default
                # stays 1; kept because the mechanism is correct (R=2 mean
                # bitwise-matches R=1) and other shapes may differ.
                c = jax.lax.cond(
                    (c.n_steps % retire_every) == retire_every - 1,
                    retire_respawn, lambda x: x, c)
            elif accum_spp:
                c = retire_respawn_accum(c)
            else:
                c = retire_respawn(c)
        return c._replace(n_steps=c.n_steps + 1)

    if external_loop:
        # host-driven unrolled-chunk mode (see make_regen_renderer): hand
        # the initial carry + body/cond back to the caller, which runs
        # UNROLLED chunks of body() in straight-line jitted code.
        # MEASURED DEAD END on this stack (docs/PROFILE_r03.md): straight-
        # line placement does NOT change the ~7ns/element scatter/gather
        # lowering in the real program (the 0.6us microbench figure was a
        # harness artifact), and each bool(busy) readback over the axon
        # tunnel costs ~29ms — end-to-end 1.0-1.9 Mrays/s vs 7.4 for the
        # on-device while_loop.  Kept as a debugging/inspection seam only.
        return regs, body, cond

    if record_alive:
        hist0 = jnp.zeros((max_march_steps,), jnp.int32)

        def body_h(carry):
            c, hist = carry
            hist = hist.at[c.n_steps].set(jnp.sum(c.pc != PC_DONE, dtype=jnp.int32))
            return body(c), hist

        def cond_h(carry):
            return cond(carry[0])

        end, hist = jax.lax.while_loop(cond_h, body_h, (regs, hist0))
        return LiResult(L=end.L, rng=end.rng, alive_hist=hist,
                        film_rgb=end.film_rgb if regen is not None else None,
                        ev_counts=end.ev_counts if count_events else None)

    if fixed_steps is None:
        end = jax.lax.while_loop(cond, body, regs)
    else:
        # reverse-differentiable: bounded scan with per-step rematerialization
        @jax.checkpoint
        def scan_body(c, _):
            return body(c), None

        if remat_window is not None and int(fixed_steps) > int(remat_window):
            # two-level (windowed) rematerialization: the outer scan
            # checkpoints only window-boundary carries, and during the
            # backward sweep each window is recomputed forward (its inner
            # per-step checkpoints bounding residuals at carry size) then
            # reversed.  Memory ~ (S/w + w) * carry instead of S * carry —
            # minimized near w = sqrt(S), which is what turns the 15k-step
            # production loop from untraceable into a few-GB backward pass.
            w_sz = int(remat_window)
            n_win = -(-int(fixed_steps) // w_sz)

            @jax.checkpoint
            def window_body(c, _):
                c2, _ = jax.lax.scan(scan_body, c, None, length=w_sz)
                return c2, None

            end, _ = jax.lax.scan(window_body, regs, None, length=n_win)
        else:
            end, _ = jax.lax.scan(scan_body, regs, None, length=fixed_steps)
    if regen is not None:
        return LiResult(L=end.L, rng=end.rng, film_rgb=end.film_rgb,
                        ev_counts=end.ev_counts if count_events else None)
    return LiResult(L=end.L, rng=end.rng,
                    ev_counts=end.ev_counts if count_events else None)
