"""SPPM — stochastic progressive photon mapping.

Reference: src/pbrt/cpu/integrators.{h,cpp} SPPMIntegrator (integrators.h:436,
Render loop ~cpu/integrators.cpp:2700+): per iteration (1) a camera pass
stores one *visible point* per pixel at its first diffuse vertex while
accumulating direct lighting, (2) a photon pass traces light particles and
splats flux onto visible points within their search radius, (3) the
per-pixel radius/flux statistics contract (N' = N + gamma*M,
R' = R*sqrt(N'/(N+M)), tau' = (tau + beta*Phi) * (R'/R)^2).

TPU-native reshape (no linked lists, no per-cell mutexes):
  - Visible points are a dense SoA, one lane per pixel.
  - The reference's hashed-grid-of-VP-lists (SPPMPixelListNode) becomes a
    sort: each VP emits up to 27 (hash(cell), vp_index) pairs covering the
    cells its radius box overlaps (cell size = iteration max radius, so the
    box spans <= 3 cells/axis); pairs are sorted by hash, and a photon
    binary-searches its own cell hash and scans a bounded run.  Hash
    collisions only add candidates — the exact dist^2 <= r^2 test decides,
    as in the reference.
  - Photon deposition is a masked scatter-add over (photon, candidate)
    lanes instead of per-VP atomics.
  - Wavelengths are sampled once per iteration (shared by camera + photon
    passes, like the reference's radical-inverse iteration sampling) so
    spectral flux products stay in one basis; tau/Ld accumulate in RGB.

The candidate scan is capped at `max_candidates`; overflow is *counted*
(stats["truncated_candidates"]) rather than silently dropped.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import dda
from ...utils import colorspace as cspace
from ...utils import spectrum as sp
from ...utils import vecmath as vmu
from .. import lights as lights_mod
from .. import materials as materials_mod
from .. import shapes as shapes_mod
from .light_path import sample_le
from .path import (PCGSource, _bsdf_f_pdf, _bsdf_sample, _gather_mat_params,
                   _take, scene_lights_with_area)

_SURF_EPS = 1e-4
_GAMMA = 2.0 / 3.0  # pbrt SPPM radius-contraction exponent


def _hash_cell(cx, cy, cz, size):
    """3D cell hash (same spirit as the reference's SPPM grid hash)."""
    h = (cx.astype(jnp.uint32) * jnp.uint32(73856093)
         ^ cy.astype(jnp.uint32) * jnp.uint32(19349663)
         ^ cz.astype(jnp.uint32) * jnp.uint32(83492791))
    return h % jnp.uint32(size)


def _radical_inverse_base2(i: int) -> float:
    """Van der Corput sequence — the per-iteration wavelength stratum."""
    v, f, inv = i, 0.0, 0.5
    while v:
        f += (v & 1) * inv
        v >>= 1
        inv *= 0.5
    return f


def _camera_pass(prims, lights, cam, pix, pixidx, lam, rng, *, max_depth,
                 light_strategy):
    """Trace camera paths: returns per-pixel (Ld spectral, vp dict).

    Mirrors the reference camera pass: direct lighting (NEE, no MIS —
    emitted light counted only after specular chains) accumulates into Ld;
    the path stops and records a visible point at its first diffuse vertex.
    """
    N = pix.shape[0]
    L_LANES = lam.shape[-1]
    opaque = tuple(p for p in prims if p.material is not None)
    src = PCGSource(rng)
    lights_all = scene_lights_with_area(lights, opaque)

    off = jnp.full((N, 2), 0.5)
    o_cur, d_cur = cam.generate_rays(pix, off, None)

    Ld = jnp.zeros((N, L_LANES))
    beta = jnp.ones((N, L_LANES))
    alive = jnp.ones((N,), bool)
    spec_prev = jnp.ones((N,), bool)
    stored = jnp.zeros((N,), bool)
    vp_p = jnp.zeros((N, 3))
    vp_n = jnp.zeros((N, 3))
    vp_wo = jnp.zeros((N, 3))
    vp_beta = jnp.zeros((N, L_LANES))
    vp_albedo = jnp.zeros((N, L_LANES))

    for depth in range(max_depth + 1):
        hit = shapes_mod.intersect_all(opaque, o_cur, d_cur, jnp.inf)
        escaped = alive & ~jnp.isfinite(hit.t)
        Le_inf, _ = lights_mod.escaped_radiance(lights, d_cur, lam)
        w_esc = jnp.where(spec_prev, 1.0, 0.0)
        Ld = Ld + jnp.where(escaped[:, None], beta * Le_inf * w_esc[:, None], 0.0)

        surf = alive & jnp.isfinite(hit.t)
        mid = jnp.clip(hit.prim_id, 0, len(opaque) - 1)
        p_hit = o_cur + hit.t[:, None] * d_cur
        wo = -d_cur

        prm_stacks = _gather_mat_params(opaque, lam, hit.uv, N)
        kind_ids = _take(prm_stacks["kind"], mid)
        prm = {k: _take(v, mid) for k, v in prm_stacks.items()
               if k not in ("kind", "emissive") and not k.startswith("_")}
        emissive_mask = jnp.asarray(prm_stacks["emissive"])[mid]

        front = vmu.dot(hit.n, wo) > 0
        hit_emit = surf & emissive_mask & front
        w_emit = jnp.where(spec_prev, 1.0, 0.0)
        Ld = Ld + jnp.where(hit_emit[:, None],
                            beta * prm["emission"] * w_emit[:, None], 0.0)

        shade = surf & ~emissive_mask
        n_g = hit.n
        bx, by, bz = vmu.frame_from_z(n_g)
        wo_l = vmu.to_local(bx, by, bz, wo)

        # NEE at every vertex (reference SPPM camera pass SampleLd)
        u1 = src.next(shade)
        u2 = jnp.stack([src.next(shade), src.next(shade)], -1)
        ls, is_delta = lights_mod.sample_one_light(
            lights_all,
            p_hit + n_g * jnp.where(vmu.dot(n_g, wo) > 0, _SURF_EPS,
                                    -_SURF_EPS)[:, None],
            u1, u2, lam, strategy=light_strategy)
        wi_l_nee = vmu.to_local(bx, by, bz, ls.wi)
        f_nee, _ = _bsdf_f_pdf(kind_ids, prm, wo_l, wi_l_nee, lam,
                               prm_stacks["_measured_tables"])
        cos_nee = jnp.abs(wi_l_nee[..., 2])
        p_off = p_hit + n_g * jnp.where(
            vmu.dot(n_g, ls.wi) > 0, _SURF_EPS, -_SURF_EPS)[:, None]
        occl = shapes_mod.occluded(
            tuple(pp for pp in opaque if not pp.material.emissive),
            p_off, ls.wi, ls.dist)
        for pp in opaque:
            if pp.material.emissive:
                t_e, _, _ = pp.intersect(p_off, ls.wi, ls.dist)
                occl = occl | jnp.isfinite(t_e)
        ok_nee = shade & ls.valid & (ls.pdf > 0) & ~occl & jnp.any(f_nee > 0, -1)
        Ld = Ld + jnp.where(
            ok_nee[:, None],
            beta * f_nee * cos_nee[:, None] * ls.L
            / jnp.maximum(ls.pdf, 1e-20)[:, None], 0.0)

        # store VP at the first diffuse vertex, then stop this path
        is_diffuse = kind_ids == materials_mod.KIND_DIFFUSE
        store_now = shade & is_diffuse & ~stored
        vp_p = jnp.where(store_now[:, None], p_hit, vp_p)
        vp_n = jnp.where(store_now[:, None], n_g, vp_n)
        vp_wo = jnp.where(store_now[:, None], wo, vp_wo)
        vp_beta = jnp.where(store_now[:, None], beta, vp_beta)
        vp_albedo = jnp.where(store_now[:, None], prm["albedo"], vp_albedo)
        stored = stored | store_now

        if depth == max_depth:
            break

        # continue through non-diffuse lobes only (reference: break at
        # diffuse, keep sampling specular/glossy chains)
        cont = shade & ~store_now
        u_lobe = src.next(cont)
        u2b = jnp.stack([src.next(cont), src.next(cont)], -1)
        bs = _bsdf_sample(kind_ids, prm, wo_l, u_lobe, u2b, lam,
                          prm_stacks["_measured_tables"])
        cos_b = jnp.abs(bs.wi[..., 2])
        ok_b = cont & (bs.pdf > 0) & jnp.any(bs.f > 0, -1)
        beta = jnp.where(ok_b[:, None],
                         beta * bs.f * (cos_b / jnp.maximum(bs.pdf, 1e-20))[:, None],
                         beta)
        wi_w = vmu.from_local(bx, by, bz, bs.wi)
        side = jnp.where(vmu.dot(n_g, wi_w) > 0, _SURF_EPS, -_SURF_EPS)
        o_cur = jnp.where(ok_b[:, None], p_hit + n_g * side[:, None], o_cur)
        d_cur = jnp.where(ok_b[:, None], wi_w, d_cur)
        spec_prev = jnp.where(ok_b, bs.specular, spec_prev)
        alive = ok_b

    vp = dict(p=vp_p, n=vp_n, wo=vp_wo, beta=vp_beta, albedo=vp_albedo,
              valid=stored)
    return Ld, vp, src.rng


def _photon_pass(prims, lights, n_photons, lam, rng, vp, radius, *,
                 max_depth, light_strategy, max_candidates, hash_size):
    """Trace photons and splat flux onto visible points.

    Returns (Phi (Nvp, L), M (Nvp,), truncated_count).
    """
    Nvp = vp["p"].shape[0]
    L_LANES = lam.shape[-1]
    opaque = tuple(p for p in prims if p.material is not None)
    src = PCGSource(rng)
    lights_all = [lt for lt in scene_lights_with_area(lights, opaque)
                  if not lt.is_infinite]
    assert lights_all, "SPPM needs at least one finite light"
    if light_strategy == "power":
        pw = np.asarray([lights_mod.light_power(lt) for lt in lights_all])
        pmfs = pw / pw.sum()
    else:
        pmfs = np.full((len(lights_all),), 1.0 / len(lights_all))

    # ---- VP grid: (hash, vp_idx) pairs over the <=27 overlapped cells ----
    valid = vp["valid"] & jnp.any(vp["beta"] > 0, -1)
    r = jnp.where(valid, radius, 0.0)
    cell = jnp.maximum(jnp.max(r), 1e-6)       # cell size = max radius
    lo = jnp.floor((vp["p"] - r[:, None]) / cell).astype(jnp.int32)
    hi = jnp.floor((vp["p"] + r[:, None]) / cell).astype(jnp.int32)
    offs = np.stack(np.meshgrid(np.arange(3), np.arange(3), np.arange(3),
                                indexing="ij"), -1).reshape(27, 3)
    offs = jnp.asarray(offs, jnp.int32)                       # (27, 3)
    cells = lo[:, None, :] + offs[None, :, :]                  # (Nvp, 27, 3)
    in_box = jnp.all(cells <= hi[:, None, :], -1) & valid[:, None]
    h = _hash_cell(cells[..., 0], cells[..., 1], cells[..., 2], hash_size)
    h = jnp.where(in_box, h, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    vp_idx = jnp.broadcast_to(jnp.arange(Nvp, dtype=jnp.int32)[:, None],
                              (Nvp, 27)).reshape(-1)
    order = jnp.argsort(h)
    sorted_h = h[order]
    sorted_vp = vp_idx[order]
    n_pairs = sorted_h.shape[0]

    # run-length per hash for overflow accounting
    run_start = jnp.searchsorted(sorted_h, sorted_h, side="left")
    run_end = jnp.searchsorted(sorted_h, sorted_h, side="right")

    # ---- photon emission ----
    Np = n_photons
    u1 = src.next()
    u_pos = jnp.stack([src.next(), src.next()], -1)
    u_dir = jnp.stack([src.next(), src.next()], -1)
    lam_p = jnp.broadcast_to(lam[:1], (Np, L_LANES)) if lam.shape[0] != Np else lam
    p_cur, _, d_cur, beta, _, ok = sample_le(lights_all, pmfs, u1, u_pos,
                                             u_dir, lam_p)
    p_cur = p_cur + d_cur * _SURF_EPS
    alive = ok

    Phi = jnp.zeros((Nvp, L_LANES))
    M = jnp.zeros((Nvp,), jnp.int32)
    truncated = jnp.int32(0)

    for depth in range(max_depth):
        hit = shapes_mod.intersect_all(opaque, p_cur, d_cur, jnp.inf)
        surf = alive & jnp.isfinite(hit.t)
        p_hit = p_cur + hit.t[:, None] * d_cur
        wi = -d_cur  # direction the photon arrives FROM, at the VP

        # ---- deposit (only after the first bounce, reference depth>0) ----
        if depth > 0:
            pc = jnp.floor(p_hit / cell).astype(jnp.int32)
            hp = _hash_cell(pc[..., 0], pc[..., 1], pc[..., 2], hash_size)
            s = jnp.searchsorted(sorted_h, hp, side="left")
            e = jnp.searchsorted(sorted_h, hp, side="right")
            truncated = truncated + jnp.sum(
                jnp.where(surf, jnp.maximum(e - s - max_candidates, 0), 0))
            ks = jnp.arange(max_candidates, dtype=jnp.int32)           # (K,)
            j = jnp.minimum(s[:, None] + ks[None, :], n_pairs - 1)      # (Np, K)
            match = surf[:, None] & (s[:, None] + ks[None, :] < e[:, None])
            vj = sorted_vp[j]
            dp = p_hit[:, None, :] - vp["p"][vj]
            d2 = jnp.sum(dp * dp, -1)
            within = match & (d2 <= radius[vj] ** 2) & vp["valid"][vj]
            # diffuse BRDF at the VP: reflection side only
            nj = vp["n"][vj]
            same_side = (jnp.sum(wi[:, None, :] * nj, -1)
                         * jnp.sum(vp["wo"][vj] * nj, -1)) > 0
            within = within & same_side
            contrib = beta[:, None, :] * (vp["albedo"][vj] / np.pi)
            tgt = jnp.where(within, vj, Nvp).reshape(-1)  # Nvp = discard slot
            Phi = Phi + jnp.zeros((Nvp + 1, L_LANES)).at[tgt].add(
                jnp.where(within[..., None], contrib, 0.0).reshape(-1, L_LANES)
            )[:Nvp]
            M = M + jnp.zeros((Nvp + 1,), jnp.int32).at[tgt].add(
                jnp.where(within, 1, 0).reshape(-1))[:Nvp]

        if depth == max_depth - 1:
            break

        # ---- bounce: BSDF sample + beta-ratio Russian roulette ----
        N = Np
        mid = jnp.clip(hit.prim_id, 0, len(opaque) - 1)
        prm_stacks = _gather_mat_params(opaque, lam_p, hit.uv, N)
        kind_ids = _take(prm_stacks["kind"], mid)
        prm = {k: _take(v, mid) for k, v in prm_stacks.items()
               if k not in ("kind", "emissive") and not k.startswith("_")}
        emissive_mask = jnp.asarray(prm_stacks["emissive"])[mid]
        shade = surf & ~emissive_mask
        n_g = hit.n
        bx, by, bz = vmu.frame_from_z(n_g)
        wo_l = vmu.to_local(bx, by, bz, -d_cur)
        u_lobe = src.next(shade)
        u2b = jnp.stack([src.next(shade), src.next(shade)], -1)
        bs = _bsdf_sample(kind_ids, prm, wo_l, u_lobe, u2b, lam_p,
                          prm_stacks["_measured_tables"])
        cos_b = jnp.abs(bs.wi[..., 2])
        ok_b = shade & (bs.pdf > 0) & jnp.any(bs.f > 0, -1)
        beta_new = beta * bs.f * (cos_b / jnp.maximum(bs.pdf, 1e-20))[:, None]
        # reference photon RR: q = max(0, 1 - betaNew/beta)
        ratio = (jnp.mean(beta_new, -1)
                 / jnp.maximum(jnp.mean(beta, -1), 1e-20))
        q = jnp.maximum(0.0, 1.0 - ratio)
        u_rr = src.next(ok_b)
        killed = ok_b & (u_rr < q)
        beta = jnp.where((ok_b & ~killed)[:, None],
                         beta_new / jnp.maximum(1.0 - q, 1e-6)[:, None], beta)
        wi_w = vmu.from_local(bx, by, bz, bs.wi)
        side = jnp.where(vmu.dot(n_g, wi_w) > 0, _SURF_EPS, -_SURF_EPS)
        p_cur = jnp.where(ok_b[:, None], p_hit + n_g * side[:, None], p_cur)
        d_cur = jnp.where(ok_b[:, None], wi_w, d_cur)
        alive = ok_b & ~killed

    return Phi, M, truncated, src.rng


def render_sppm(scene, *, n_iterations=None, photons_per_iter=None,
                initial_radius=None, max_candidates=64, seed=None):
    """SPPM render driver (reference SPPMIntegrator::Render).

    Returns ((H, W, 3) image, stats)."""
    H, W = scene.height, scene.width
    n_iterations = n_iterations or scene.spp
    Np = photons_per_iter or (H * W)
    seed = scene.seed if seed is None else seed
    prims = tuple(scene.primitives)
    opaque = tuple(p for p in prims if p.material is not None)
    assert opaque, "SPPM requires opaque primitives"
    if initial_radius is None:
        # scene-extent heuristic: ~1/50 of the primitive cloud's spread
        cs = np.array([np.asarray(getattr(p, "center",
                                          getattr(p, "origin", (0, 0, 0))),
                                  np.float32) for p in opaque])
        ext = float(np.linalg.norm(cs.max(0) - cs.min(0))) if len(cs) > 1 else 1.0
        initial_radius = max(ext, 1.0) / 50.0

    Nvp = H * W
    hash_size = 1 << int(np.ceil(np.log2(max(2 * Nvp, 16))))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1), jnp.int32)
    pixidx = jnp.arange(Nvp, dtype=jnp.uint32)

    light_strategy = getattr(scene, "light_sampler", "uniform")

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def iteration(Ld_rgb, tau_rgb, Ncnt, radius, it, u_lam):
        # shared per-iteration wavelengths (reference radical-inverse draw)
        swl1 = sp.sample_wavelengths_visible(jnp.full((1,), u_lam))
        lam = jnp.broadcast_to(swl1.lam, (Nvp, swl1.lam.shape[-1]))
        swl = sp.SampledWavelengths(lam, jnp.broadcast_to(swl1.pdf, lam.shape))

        rng = dda.seed_stream(pixidx, jnp.full((Nvp,), it, jnp.uint32),
                              salt=seed)
        Ld, vp, rng = _camera_pass(
            prims, scene.lights, scene.camera, pix, pixidx, lam, rng,
            max_depth=scene.max_depth, light_strategy=light_strategy)

        rng_p = dda.seed_stream(jnp.arange(Np, dtype=jnp.uint32),
                                jnp.full((Np,), it, jnp.uint32),
                                salt=seed + 777)
        lam_p = jnp.broadcast_to(swl1.lam, (Np, swl1.lam.shape[-1]))
        Phi, M, truncated, _ = _photon_pass(
            prims, scene.lights, Np, lam_p, rng_p, vp, radius,
            max_depth=scene.max_depth, light_strategy=light_strategy,
            max_candidates=max_candidates, hash_size=hash_size)

        # ---- statistics update (reference end-of-iteration loop) ----
        Mf = M.astype(jnp.float32)
        has = Mf > 0
        Nnew = Ncnt + _GAMMA * Mf
        Rnew = jnp.where(has, radius * jnp.sqrt(Nnew / jnp.maximum(
            Ncnt + Mf, 1e-6)), radius)
        # tau' = (tau + beta*Phi) * (R'/R)^2, accumulated in RGB
        phi_rgb = cspace.xyz_to_rgb(sp.to_xyz(vp["beta"] * Phi, swl))
        phi_rgb = jnp.nan_to_num(phi_rgb, nan=0.0, posinf=0.0, neginf=0.0)
        ratio2 = jnp.where(has, (Rnew / jnp.maximum(radius, 1e-12)) ** 2, 1.0)
        tau_rgb = (tau_rgb + phi_rgb) * ratio2[:, None]
        Ncnt = jnp.where(has, Nnew, Ncnt)

        ld_rgb = cspace.xyz_to_rgb(sp.to_xyz(Ld, swl))
        ld_rgb = jnp.nan_to_num(ld_rgb, nan=0.0, posinf=0.0, neginf=0.0)
        Ld_rgb = Ld_rgb + ld_rgb
        return Ld_rgb, tau_rgb, Ncnt, Rnew, truncated

    Ld_rgb = jnp.zeros((Nvp, 3))
    tau_rgb = jnp.zeros((Nvp, 3))
    Ncnt = jnp.zeros((Nvp,))
    radius = jnp.full((Nvp,), initial_radius, jnp.float32)
    total_trunc = 0
    t0 = time.time()
    for it in range(n_iterations):
        Ld_rgb, tau_rgb, Ncnt, radius, trunc = iteration(
            Ld_rgb, tau_rgb, Ncnt, radius, jnp.uint32(it),
            jnp.float32(_radical_inverse_base2(it + 1)))
        total_trunc += int(trunc)
    jax.block_until_ready(tau_rgb)
    dt = time.time() - t0

    L = (np.asarray(Ld_rgb) / n_iterations
         + np.asarray(tau_rgb) / (n_iterations * Np * np.pi
                                  * np.asarray(radius)[:, None] ** 2))
    img = L.reshape(H, W, 3).astype(np.float32)
    stats = {"render_time": dt, "spp": n_iterations,
             "photons": n_iterations * Np,
             "truncated_candidates": total_trunc,
             "rays_per_sec": (H * W + Np) * n_iterations / dt}
    return img, stats
