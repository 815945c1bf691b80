"""Surface path integrators: Path (NEE + MIS), SimplePath, RandomWalk, AO.

Reference: src/pbrt/cpu/integrators.{h,cpp} — PathIntegrator (integrators.h:207,
Li + SampleLd with power-heuristic MIS), SimplePathIntegrator (:183,
samplelights/samplebsdf switches), RandomWalkIntegrator (:114), AOIntegrator
(:296).  TPU-native restructure: all rays bounce in lockstep under one
`lax.scan` over max_depth (surface paths have no per-ray divergence in trip
count worth compacting at these depths); material polymorphism is masked
evaluation over the 5 static BxDF families (models.bxdfs) gathered from
per-primitive parameter stacks — no virtual dispatch.

Randomness is threaded through a pluggable `UniformSource` so the identical
estimator runs from PCG streams (forward rendering) or from a primary-sample
vector (PSSMLT, models.integrators.mlt).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import dda
from ...utils import vecmath as vmu
from .. import bxdfs
from .. import lights as lights_mod
from .. import materials as materials_mod
from .. import shapes as shapes_mod

_SURF_EPS = 1e-4


class PCGSource:
    """Draws from the per-ray PCG streams (ops.dda counters)."""

    def __init__(self, rng):
        self.rng = rng

    def next(self, mask=None):
        if mask is None:
            self.rng, u = dda.pcg_uniform(self.rng)
        else:
            self.rng, u = dda.pcg_uniform_masked(self.rng, mask)
        return u


class VectorSource:
    """Draws sequentially from a fixed primary-sample vector (N, D) —
    the PSSMLT sample space (cpu/integrators.cpp MLTSampler)."""

    def __init__(self, u_vec):
        self.u = u_vec
        self.idx = 0

    def next(self, mask=None):
        d = self.u.shape[1]
        u = self.u[:, min(self.idx, d - 1)]
        self.idx += 1
        return u


def _mat_param_row(m, lam, uv, N, mreg=None, p=None, n=None):
    """Parameter dict for ONE material at the hit points (each value
    (N, ...) with a per-lane `kind`).  MixMaterial resolves per lane by
    hashing the hit parameterization against `amount` (materials.h
    MixMaterial::ChooseMaterial with HashFloat).  mreg maps id(measured
    brdf) -> registry slot for MeasuredMaterial dispatch."""
    L = lam.shape[-1]
    zeros_s = jnp.zeros((N, L))
    if isinstance(m, materials_mod.MixMaterial):
        a = _mat_param_row(m.m1, lam, uv, N, mreg, p, n)
        b = _mat_param_row(m.m2, lam, uv, N, mreg, p, n)
        if uv is not None:
            bits = (jnp.asarray(uv[..., 0] * 65535, jnp.uint32) * 73856093
                    ^ jnp.asarray(uv[..., 1] * 65535, jnp.uint32) * 19349663)
            h = (bits % jnp.uint32(65536)).astype(jnp.float32) / 65536.0
        else:
            h = jnp.zeros((N,))
        pick_a = h < m.amount
        out = {}
        for k in a:
            av, bv = a[k], b[k]
            sel = pick_a if av.ndim == 1 else pick_a[:, None]
            out[k] = jnp.where(sel, av, bv)
        return out
    kind = getattr(m, "kind", materials_mod.KIND_DIFFUSE)
    ed = getattr(m, "eta", 1.5)
    r = getattr(m, "roughness", 0.0)
    if kind == materials_mod.KIND_SUBSURFACE:
        ss_albedo = jnp.broadcast_to(
            jnp.asarray(m.reflectance_rgb, jnp.float32), (N, 3))
        ss_ell = jnp.broadcast_to(
            jnp.asarray(m.mfp_rgb, jnp.float32), (N, 3))
    else:
        ss_albedo = jnp.zeros((N, 3))
        ss_ell = jnp.full((N, 3), 1e-3)
    slot = -1
    if kind == materials_mod.KIND_MEASURED and mreg is not None:
        slot = mreg.get(id(m.brdf), -1)
    return dict(
        kind=jnp.full((N,), int(kind), jnp.int32),
        measured_slot=jnp.full((N,), slot, jnp.int32),
        ss_albedo=ss_albedo, ss_ell=ss_ell,
        albedo=materials_mod._eval_spectral(
            getattr(m, "reflectance", None), lam, uv, p, n),
        refl=materials_mod._eval_spectral(
            getattr(m, "reflectance", None), lam, uv, p, n),
        trans=materials_mod._eval_spectral(
            getattr(m, "transmittance", None), lam, uv, p, n),
        eta_c=(materials_mod._eval_spectral(
            getattr(m, "eta", None), lam, uv, p, n)
               if kind == materials_mod.KIND_CONDUCTOR else zeros_s),
        k_c=(materials_mod._eval_spectral(getattr(m, "k", None), lam, uv, p, n)
             if kind == materials_mod.KIND_CONDUCTOR else zeros_s),
        eta_d=(jnp.full((N,), float(ed))
               if isinstance(ed, (int, float)) else jnp.full((N,), 1.5)),
        alpha=materials_mod._eval_float(r, uv, (N,), p, n),
        ct_thick=jnp.full((N,), float(getattr(m, "thickness", 0.01))),
        ct_g=jnp.full((N,), float(getattr(m, "g", 0.0))),
        ct_stoch=jnp.full((N,), bool(getattr(m, "stochastic", False))),
        ct_alb=(materials_mod._eval_spectral(m.albedo_med, lam, uv, p, n)
                if getattr(m, "albedo_med", None) is not None else zeros_s),
        emission=(materials_mod._eval_spectral(m.emission, lam, uv, p, n)
                  * m.emission_scale if m.emissive else zeros_s),
    )


def _collect_measured(m, registry):
    if isinstance(m, materials_mod.MixMaterial):
        _collect_measured(m.m1, registry)
        _collect_measured(m.m2, registry)
    elif getattr(m, "kind", None) == materials_mod.KIND_MEASURED:
        if id(m.brdf) not in registry[0]:
            registry[0][id(m.brdf)] = len(registry[1])
            registry[1].append(m.brdf)


def _gather_mat_params(opaque, lam, uv, N, p=None, n=None):
    """Per-primitive material parameter stacks -> dict of (M, N, ...)
    arrays; `kind` is per-lane (M, N) so MixMaterial can resolve per hit.
    uv is the hit parameterization per ray; p/n (hit position/normal) feed
    context textures (DirectionMix, mapped).  Keys starting with "_" are
    static python objects (the measured-BRDF table registry), not arrays."""
    registry = ({}, [])
    for pr in opaque:
        _collect_measured(pr.material, registry)
    mreg = registry[0]
    rows = [_mat_param_row(pr.material, lam, uv, N, mreg, p, n)
            for pr in opaque]
    out = {k: jnp.stack([r[k] for r in rows]) for k in rows[0]}
    out["emissive"] = np.asarray([pr.material.emissive for pr in opaque],
                                 bool)
    out["_measured_tables"] = tuple(registry[1])

    def _any_stochastic(m):
        if isinstance(m, materials_mod.MixMaterial):
            return _any_stochastic(m.m1) or _any_stochastic(m.m2)
        return bool(getattr(m, "stochastic", False))

    out["_coated_stochastic"] = any(_any_stochastic(pr.material)
                                    for pr in opaque)
    return out


def _take(arr, idx):
    if arr.ndim == 2:
        return jnp.take_along_axis(arr, idx[None, :], 0)[0]
    return jnp.take_along_axis(arr, idx[None, :, None], 0)[0]


def _bsdf_sample(kind_ids, prm, wo_l, u_lobe, u2, lam=None, measured=(),
                 coated_stochastic=False):
    """Masked-select BSDF sampling over the static lobe families."""
    s_dif = bxdfs.diffuse_sample(wo_l, u2, prm["albedo"])
    s_con = bxdfs.conductor_sample(wo_l, u2, prm["eta_c"], prm["k_c"],
                                   prm["alpha"])
    s_die = bxdfs.dielectric_sample(wo_l, u_lobe, u2, prm["eta_d"],
                                    prm["alpha"])
    s_thn = bxdfs.thin_dielectric_sample(wo_l, u_lobe, prm["eta_d"])
    s_dft = bxdfs.diffuse_transmission_sample(wo_l, u_lobe, u2, prm["refl"],
                                              prm["trans"])
    if coated_stochastic:
        # the reference's LayeredBxDF interface walk (bxdfs.h:656): a
        # counter stream hashed from the primary draws keeps the walk
        # deterministic per (pixel, sample)
        rng_w = dda.seed_stream(
            (u_lobe * (1 << 24)).astype(jnp.uint32),
            (u2[..., 0] * (1 << 24)).astype(jnp.uint32),
            salt=0xC0A7)
        rng_w = rng_w ^ (u2[..., 1] * (1 << 24)).astype(jnp.uint32)
        s_walk, _ = bxdfs.layered_sample(
            wo_l, rng_w, prm["albedo"], prm["eta_d"], prm["alpha"],
            thickness=prm["ct_thick"], g=prm["ct_g"],
            med_albedo=prm["ct_alb"])
        # proportional-pdf conversion: the walk's (f, pdf) pair is the
        # unbiased weight; rescale so the reported pdf is the analytic
        # mixture used for MIS (any partition of unity is valid —
        # pbrt's pdfIsProportional + approximate LayeredBxDF::PDF)
        pdf_mis = bxdfs.coated_diffuse_pdf(wo_l, s_walk.wi, prm["eta_d"],
                                           prm["alpha"])
        conv = (~s_walk.specular & (s_walk.pdf > 0) & (pdf_mis > 0))
        f_adj = jnp.where(conv[:, None],
                          s_walk.f * (pdf_mis
                                      / jnp.maximum(s_walk.pdf, 1e-30)
                                      )[:, None],
                          s_walk.f)
        s_wsel = bxdfs.BSDFSample(
            s_walk.wi, f_adj,
            jnp.where(conv, pdf_mis, s_walk.pdf),
            s_walk.specular, s_walk.eta_scale, s_walk.transmitted)
        # per-lane opt-in: only materials with stochastic=True take the
        # walk; analytic coated lanes keep the deterministic approximation
        s_ana = bxdfs.coated_diffuse_sample(wo_l, u_lobe, u2, prm["albedo"],
                                            prm["eta_d"], prm["alpha"])
        stoch = prm["ct_stoch"]
        s_cod = bxdfs.BSDFSample(
            jnp.where(stoch[:, None], s_wsel.wi, s_ana.wi),
            jnp.where(stoch[:, None], s_wsel.f, s_ana.f),
            jnp.where(stoch, s_wsel.pdf, s_ana.pdf),
            jnp.where(stoch, s_wsel.specular, s_ana.specular),
            jnp.where(stoch, s_wsel.eta_scale, s_ana.eta_scale),
            jnp.where(stoch, s_wsel.transmitted, s_ana.transmitted))
    else:
        s_cod = bxdfs.coated_diffuse_sample(wo_l, u_lobe, u2, prm["albedo"],
                                            prm["eta_d"], prm["alpha"])
    outs = [s_dif, s_con, s_die, s_thn, s_dft, s_cod]
    kids = [materials_mod.KIND_DIFFUSE, materials_mod.KIND_CONDUCTOR,
            materials_mod.KIND_DIELECTRIC, materials_mod.KIND_THIN_DIELECTRIC,
            materials_mod.KIND_DIFFUSE_TRANSMISSION,
            materials_mod.KIND_COATED_DIFFUSE]
    out = outs[0]
    for s, kid in zip(outs[1:], kids[1:]):
        sel = kind_ids == kid
        out = bxdfs.BSDFSample(
            jnp.where(sel[:, None], s.wi, out.wi),
            jnp.where(sel[:, None], s.f, out.f),
            jnp.where(sel, s.pdf, out.pdf),
            jnp.where(sel, s.specular, out.specular),
            jnp.where(sel, s.eta_scale, out.eta_scale),
            jnp.where(sel, s.transmitted, out.transmitted),
        )
    if measured and lam is not None:
        from .. import measured as measured_mod

        for slot, brdf in enumerate(measured):
            sel = ((kind_ids == materials_mod.KIND_MEASURED)
                   & (prm["measured_slot"] == slot))
            wi_m, f_m, p_m, valid_m = measured_mod.measured_sample(
                brdf, wo_l, u2, lam)
            out = bxdfs.BSDFSample(
                jnp.where(sel[:, None], wi_m, out.wi),
                jnp.where(sel[:, None], f_m, out.f),
                jnp.where(sel, jnp.where(valid_m, p_m, 0.0), out.pdf),
                jnp.where(sel, False, out.specular),
                jnp.where(sel, 1.0, out.eta_scale),
                jnp.where(sel, False, out.transmitted),
            )
    return out


def _bsdf_f_pdf(kind_ids, prm, wo_l, wi_l, lam=None, measured=()):
    """Masked-select f and pdf over the lobe families (delta lobes: 0)."""
    f_dif = bxdfs.diffuse_f(wo_l, wi_l, prm["albedo"])
    p_dif = bxdfs.diffuse_pdf(wo_l, wi_l)
    f_con = bxdfs.conductor_f(wo_l, wi_l, prm["eta_c"], prm["k_c"],
                              prm["alpha"])
    p_con = bxdfs.conductor_pdf(wo_l, wi_l, prm["alpha"])
    f_die = bxdfs.dielectric_f(wo_l, wi_l, prm["eta_d"], prm["alpha"])
    p_die = bxdfs.dielectric_pdf(wo_l, wi_l, prm["eta_d"], prm["alpha"])
    pr = jnp.max(prm["refl"], -1)
    pt = jnp.max(prm["trans"], -1)
    f_dft = bxdfs.diffuse_transmission_f(wo_l, wi_l, prm["refl"], prm["trans"])
    p_dft = bxdfs.diffuse_transmission_pdf(wo_l, wi_l, pr, pt)
    f_cod = bxdfs.coated_diffuse_f(wo_l, wi_l, prm["albedo"], prm["eta_d"],
                                   prm["alpha"])
    p_cod = bxdfs.coated_diffuse_pdf(wo_l, wi_l, prm["eta_d"], prm["alpha"])
    zero_f = jnp.zeros_like(f_dif)
    zero_p = jnp.zeros_like(p_dif)
    fs = [f_dif, f_con, f_die, zero_f, f_dft, f_cod]
    ps = [p_dif, p_con, p_die, zero_p, p_dft, p_cod]
    kids = [materials_mod.KIND_DIFFUSE, materials_mod.KIND_CONDUCTOR,
            materials_mod.KIND_DIELECTRIC, materials_mod.KIND_THIN_DIELECTRIC,
            materials_mod.KIND_DIFFUSE_TRANSMISSION,
            materials_mod.KIND_COATED_DIFFUSE]
    f, p = fs[0], ps[0]
    for fi, pi, kid in zip(fs[1:], ps[1:], kids[1:]):
        sel = kind_ids == kid
        f = jnp.where(sel[:, None], fi, f)
        p = jnp.where(sel, pi, p)
    if measured and lam is not None:
        from .. import measured as measured_mod

        for slot, brdf in enumerate(measured):
            sel = ((kind_ids == materials_mod.KIND_MEASURED)
                   & (prm["measured_slot"] == slot))
            f = jnp.where(sel[:, None],
                          measured_mod.measured_f(brdf, wo_l, wi_l, lam), f)
            p = jnp.where(sel, measured_mod.measured_pdf(brdf, wo_l, wi_l),
                          p)
    return f, p


def scene_lights_with_area(lights, prims):
    """scene.lights + DiffuseAreaLights wrapping emissive primitives —
    the light list NEE samples from (pbrt: emissive shapes become
    DiffuseAreaLights at scene build)."""
    out = list(lights)
    for p in prims:
        if p.material is not None and p.material.emissive:
            out.append(lights_mod.DiffuseAreaLight(
                shape=p, spectrum=p.material.emission,
                scale=p.material.emission_scale))
    return out


def _power_heuristic(pf, pg):
    pf2 = pf * pf
    return jnp.where(pf > 0, pf2 / jnp.maximum(pf2 + pg * pg, 1e-20), 0.0)


def li_path(
    prims: tuple,
    lights: list,
    o, d, lam, rng,
    *,
    max_depth: int = 5,
    light_strategy: str = "uniform",
    regularize: bool = False,
    uniform_source=None,
    nee: bool = True,
    mis: bool = True,
):
    """PathIntegrator Li (cpu/integrators.cpp PathIntegrator::Li/SampleLd):
    returns (L, rng).  nee=False => SimplePath BSDF-sampling mode; mis=False
    with nee => SimplePath light-sampling mode."""
    N = o.shape[0]
    L_LANES = lam.shape[-1]
    opaque = tuple(p for p in prims if p.material is not None)
    assert opaque, "li_path requires opaque primitives"
    src = uniform_source if uniform_source is not None else PCGSource(rng)
    lights_all = scene_lights_with_area(lights, opaque)

    L = jnp.zeros((N, L_LANES))
    beta = jnp.ones((N, L_LANES))
    alive = jnp.ones((N,), bool)
    spec_prev = jnp.ones((N,), bool)   # camera vertex counts as specular
    pdf_prev = jnp.ones((N,))
    eta_scale = jnp.ones((N,))
    o_cur, d_cur = o, d

    for depth in range(max_depth + 1):
        hit = shapes_mod.intersect_all(opaque, o_cur, d_cur, jnp.inf)
        escaped = alive & ~jnp.isfinite(hit.t)

        # --- escaped: infinite lights, MIS vs NEE of the same lights ---
        # weight rules (PathIntegrator::Li / SimplePathIntegrator::Li):
        #   no NEE             -> 1 (BSDF sampling is the only strategy)
        #   NEE without MIS    -> count only after specular bounces
        #   NEE with MIS       -> power heuristic
        Le_inf, _ = lights_mod.escaped_radiance(lights, d_cur, lam)
        if not nee:
            w_esc = jnp.ones((N,))
        elif not mis:
            w_esc = jnp.where(spec_prev, 1.0, 0.0)
        else:
            pdf_l_esc = lights_mod.pdf_one_light(lights_all, o_cur, d_cur,
                                                 light_strategy)
            w_esc = jnp.where(spec_prev, 1.0,
                              _power_heuristic(pdf_prev, pdf_l_esc))
        L = L + jnp.where(escaped[:, None], beta * Le_inf * w_esc[:, None], 0.0)

        surf = alive & jnp.isfinite(hit.t)
        mid = jnp.clip(hit.prim_id, 0, len(opaque) - 1)
        p_hit = o_cur + hit.t[:, None] * d_cur
        wo = -d_cur

        prm_stacks = _gather_mat_params(opaque, lam, hit.uv, N,
                                        p=p_hit, n=hit.n)
        kind_ids = _take(prm_stacks["kind"], mid)
        prm = {k: _take(v, mid) for k, v in prm_stacks.items()
               if k not in ("kind", "emissive") and not k.startswith("_")}
        emissive_mask = jnp.asarray(prm_stacks["emissive"])[mid]
        measured_tables = prm_stacks["_measured_tables"]

        # --- subsurface scattering (SeparableBSSRDF exit sampling,
        # cpu/integrators.cpp:526-592 reshaped): a subsurface hit teleports
        # to a profile-sampled exit vertex on the same primitive and
        # continues as a Lambertian vertex whose albedo carries the
        # (1 - F(wo)) entry factor and the channel-MIS profile weight ---
        is_ss = surf & (kind_ids == materials_mod.KIND_SUBSURFACE)
        if bool(np.any([getattr(pp.material, "kind", 0)
                        == materials_mod.KIND_SUBSURFACE
                        for pp in opaque])):
            from .. import bssrdf as bssrdf_mod
            from ...utils import spectrum as _spu

            u_ch = src.next(is_ss)
            u_r = src.next(is_ss)
            u_phi = src.next(is_ss)
            n_entry = vmu.face_forward(hit.n, wo)
            # profile family: the reference's tabulated beam-diffusion
            # profile when any subsurface material opts in (one table per
            # scene — multiple differing profiles fall back to burley)
            _ss_mats = [pp.material for pp in opaque
                        if getattr(pp.material, "kind", 0)
                        == materials_mod.KIND_SUBSURFACE]
            _tabulated = (len(_ss_mats) == 1
                          and getattr(_ss_mats[0], "profile", "burley")
                          == "tabulated")
            if _tabulated:
                m0 = _ss_mats[0]
                table = bssrdf_mod.compute_beam_diffusion_table(
                    g=float(getattr(m0, "g", 0.0)), eta=float(m0.eta))
                tab = bssrdf_mod.tabulated_channel_arrays(
                    table, np.asarray(m0.reflectance_rgb),
                    np.asarray(m0.mfp_rgb))
                exit_p, exit_n, w_rgb, _found = \
                    bssrdf_mod.sample_exit_tabulated(
                        opaque, mid, p_hit, n_entry, tab, u_ch, u_r, u_phi)
            else:
                exit_p, exit_n, w_rgb, _found = bssrdf_mod.sample_exit(
                    opaque, mid, p_hit, n_entry, prm["ss_albedo"],
                    prm["ss_ell"], u_ch, u_r, u_phi)
            cos_o = jnp.abs(vmu.dot(n_entry, wo))
            f_o = bxdfs.fresnel_dielectric(cos_o, prm["eta_d"])
            w_spec = _spu.rgb_to_spectrum_smits_batched(
                jnp.clip(w_rgb, 0.0, None), lam) * (1.0 - f_o)[:, None]
            p_hit = jnp.where(is_ss[:, None], exit_p, p_hit)
            hit = hit._replace(n=jnp.where(is_ss[:, None], exit_n, hit.n))
            prm["albedo"] = jnp.where(is_ss[:, None], w_spec, prm["albedo"])
            kind_ids = jnp.where(is_ss, materials_mod.KIND_DIFFUSE, kind_ids)

        # --- emissive hit (one-sided), MIS vs NEE of the area light ---
        front = vmu.dot(hit.n, wo) > 0
        hit_emit = surf & emissive_mask & front
        if not nee:
            w_emit = jnp.ones((N,))
        elif not mis:
            w_emit = jnp.where(spec_prev, 1.0, 0.0)
        else:
            pdf_l_hit = lights_mod.pdf_one_light(lights_all, o_cur, d_cur,
                                                 light_strategy)
            w_emit = jnp.where(spec_prev, 1.0,
                               _power_heuristic(pdf_prev, pdf_l_hit))
        L = L + jnp.where(hit_emit[:, None],
                          beta * prm["emission"] * w_emit[:, None], 0.0)

        if depth == max_depth:
            break

        shade = surf & ~emissive_mask
        n_g = hit.n

        # local shading frame (geometric normal; two-sided lobes handle
        # below-horizon wo)
        bx, by, bz = vmu.frame_from_z(n_g)
        wo_l = vmu.to_local(bx, by, bz, wo)

        # ------------------ NEE ------------------
        if nee:
            u1 = src.next(shade)
            u2 = jnp.stack([src.next(shade), src.next(shade)], -1)
            ls, is_delta = lights_mod.sample_one_light(
                lights_all, p_hit + n_g * jnp.where(
                    vmu.dot(n_g, wo) > 0, _SURF_EPS, -_SURF_EPS)[:, None],
                u1, u2, lam, strategy=light_strategy)
            wi_l_nee = vmu.to_local(bx, by, bz, ls.wi)
            f_nee, pdf_b_nee = _bsdf_f_pdf(kind_ids, prm, wo_l, wi_l_nee,
                                           lam, measured_tables)
            if prm_stacks["_coated_stochastic"]:
                # stochastic coated lanes: NEE must evaluate the SAME
                # slab-aware layered BRDF the walk samples (reference
                # LayeredBxDF::f) — the analytic coated_diffuse_f ignores
                # thickness/g/albedo_med and over-brightens direct light
                ct_lanes = shade & (kind_ids == materials_mod.
                                    KIND_COATED_DIFFUSE) & prm["ct_stoch"]
                rng_f = dda.seed_stream(
                    (src.next(ct_lanes) * (1 << 24)).astype(jnp.uint32),
                    (src.next(ct_lanes) * (1 << 24)).astype(jnp.uint32),
                    salt=0xF1A7)
                f_walk, _ = bxdfs.layered_f(
                    wo_l, wi_l_nee, rng_f, prm["albedo"], prm["eta_d"],
                    prm["alpha"], thickness=prm["ct_thick"], g=prm["ct_g"],
                    med_albedo=prm["ct_alb"])
                f_nee = jnp.where(ct_lanes[:, None], f_walk, f_nee)
            cos_nee = jnp.abs(wi_l_nee[..., 2])
            p_off = p_hit + n_g * jnp.where(
                vmu.dot(n_g, ls.wi) > 0, _SURF_EPS, -_SURF_EPS)[:, None]
            occl = shapes_mod.occluded(
                tuple(pp for pp in opaque if not pp.material.emissive),
                p_off, ls.wi, ls.dist)
            # emissive prims occlude each other's NEE unless they ARE the
            # sampled light; the dist*(1-1e-3) shortening in DiffuseAreaLight
            # handles self-occlusion of the sampled light
            for pp in opaque:
                if pp.material.emissive:
                    t_e, _, _ = pp.intersect(p_off, ls.wi, ls.dist)
                    occl = occl | jnp.isfinite(t_e)
            w_nee = jnp.where(is_delta | ~jnp.asarray(mis), 1.0,
                              _power_heuristic(ls.pdf, pdf_b_nee))
            ok = (shade & ls.valid & (ls.pdf > 0) & ~occl
                  & jnp.any(f_nee > 0, -1))
            contrib = (beta * f_nee * cos_nee[:, None] * ls.L
                       * (w_nee / jnp.maximum(ls.pdf, 1e-20))[:, None])
            L = L + jnp.where(ok[:, None], contrib, 0.0)

        # ------------------ BSDF sampling ------------------
        u_lobe = src.next(shade)
        u2b = jnp.stack([src.next(shade), src.next(shade)], -1)
        alpha_reg = prm["alpha"]
        if regularize:
            # pbrt BSDF::Regularize: after a non-specular bounce, widen
            # near-specular lobes to tame fireflies
            alpha_reg = jnp.where(spec_prev, prm["alpha"],
                                  jnp.maximum(prm["alpha"], 0.3))
        prm_s = dict(prm, alpha=alpha_reg)
        bs = _bsdf_sample(kind_ids, prm_s, wo_l, u_lobe, u2b,
                          lam, measured_tables,
                          coated_stochastic=prm_stacks["_coated_stochastic"])
        cos_b = jnp.abs(bs.wi[..., 2])
        ok_b = shade & (bs.pdf > 0) & jnp.any(bs.f > 0, -1)
        beta_new = beta * bs.f * (cos_b / jnp.maximum(bs.pdf, 1e-20))[:, None]
        wi_w = vmu.from_local(bx, by, bz, bs.wi)

        # Russian roulette (cpu/integrators.cpp PathIntegrator, on
        # beta * etaScale)
        eta_scale_new = eta_scale * bs.eta_scale
        rr_beta = jnp.max(beta_new, -1) * eta_scale_new
        do_rr = ok_b & (depth > 1) & (rr_beta < 1.0)
        q = jnp.clip(1.0 - rr_beta, 0.0, 0.95)
        u_rr = src.next(do_rr)
        killed = do_rr & (u_rr < q)
        beta_new = jnp.where((do_rr & ~killed)[:, None],
                             beta_new / jnp.maximum(1.0 - q, 1e-6)[:, None],
                             beta_new)

        alive = ok_b & ~killed
        beta = jnp.where(alive[:, None], beta_new, beta)
        eta_scale = jnp.where(alive, eta_scale_new, eta_scale)
        side = jnp.where(vmu.dot(n_g, wi_w) > 0, _SURF_EPS, -_SURF_EPS)
        o_cur = jnp.where(alive[:, None], p_hit + n_g * side[:, None], o_cur)
        d_cur = jnp.where(alive[:, None], wi_w, d_cur)
        spec_prev = jnp.where(alive, bs.specular, spec_prev)
        pdf_prev = jnp.where(alive, bs.pdf, pdf_prev)

    # return the source's advanced stream (PCGSource AND PathSampler's
    # fallback stream both live in src.rng); VectorSource has none
    rng_out = getattr(src, "rng", rng)
    return L, rng_out


def li_random_walk(prims, lights, o, d, lam, rng, *, max_depth=5):
    """RandomWalkIntegrator (cpu/integrators.cpp:114): uniform-sphere
    direction sampling, emitted-light only."""
    from ...ops import warps

    N = o.shape[0]
    opaque = tuple(p for p in prims if p.material is not None)
    src = PCGSource(rng)
    L = jnp.zeros(lam.shape)
    beta = jnp.ones(lam.shape)
    alive = jnp.ones((N,), bool)
    o_cur, d_cur = o, d
    for depth in range(max_depth + 1):
        hit = shapes_mod.intersect_all(opaque, o_cur, d_cur, jnp.inf)
        escaped = alive & ~jnp.isfinite(hit.t)
        Le_inf, _ = lights_mod.escaped_radiance(lights, d_cur, lam)
        L = L + jnp.where(escaped[:, None], beta * Le_inf, 0.0)
        surf = alive & jnp.isfinite(hit.t)
        mid = jnp.clip(hit.prim_id, 0, len(opaque) - 1)
        p_hit = o_cur + hit.t[:, None] * d_cur
        wo = -d_cur
        prm_stacks = _gather_mat_params(opaque, lam, hit.uv, N,
                                        p=p_hit, n=hit.n)
        emissive_mask = jnp.asarray(prm_stacks["emissive"])[mid]
        emission = _take(prm_stacks["emission"], mid)
        albedo = _take(prm_stacks["albedo"], mid)
        front = vmu.dot(hit.n, wo) > 0
        L = L + jnp.where((surf & emissive_mask & front)[:, None],
                          beta * emission, 0.0)
        if depth == max_depth:
            break
        shade = surf & ~emissive_mask
        u2 = jnp.stack([src.next(shade), src.next(shade)], -1)
        wi = warps.sample_uniform_sphere(u2)
        cos_w = jnp.abs(vmu.dot(wi, hit.n))
        # diffuse BRDF is reflection-only: f = 0 when wi crosses the surface
        same = (vmu.dot(wi, hit.n) * vmu.dot(wo, hit.n)) > 0
        f = albedo / jnp.pi
        beta = jnp.where(shade[:, None],
                         beta * f * (cos_w / warps.UNIFORM_SPHERE_PDF)[:, None],
                         beta)
        side = jnp.where(vmu.dot(hit.n, wi) > 0, _SURF_EPS, -_SURF_EPS)
        o_cur = jnp.where(shade[:, None], p_hit + hit.n * side[:, None], o_cur)
        d_cur = jnp.where(shade[:, None], wi, d_cur)
        alive = shade & same
    return L, src.rng


def li_ao(prims, lights, o, d, lam, rng, *, max_distance=jnp.inf,
          cos_sample=True, illuminant_scale=1.0):
    """AOIntegrator (cpu/integrators.cpp:296): cosine-weighted visibility."""
    from ...ops import warps

    N = o.shape[0]
    opaque = tuple(p for p in prims if p.material is not None)
    src = PCGSource(rng)
    hit = shapes_mod.intersect_all(opaque, o, d, jnp.inf)
    surf = jnp.isfinite(hit.t)
    p_hit = o + hit.t[:, None] * d
    n_f = vmu.face_forward(hit.n, -d)
    u2 = jnp.stack([src.next(surf), src.next(surf)], -1)
    if cos_sample:
        local = warps.sample_cosine_hemisphere(u2)
        pdf = jnp.maximum(local[..., 2], 1e-9) / jnp.pi
    else:
        local = warps.sample_uniform_hemisphere(u2)
        pdf = jnp.full((N,), warps.UNIFORM_HEMISPHERE_PDF)
    bx, by, bz = vmu.frame_from_z(n_f)
    wi = vmu.from_local(bx, by, bz, local)
    occ = shapes_mod.occluded(opaque, p_hit + n_f * _SURF_EPS,
                              wi, jnp.full((N,), max_distance))
    cos_w = jnp.maximum(vmu.dot(wi, n_f), 0.0)
    a = jnp.where(surf & ~occ, cos_w / (jnp.pi * pdf), 0.0)
    L = a[:, None] * jnp.ones(lam.shape) * illuminant_scale
    return L, src.rng
