"""LightPath integrator — particle tracing from the lights with camera
splats.

Reference: src/pbrt/cpu/integrators.{h,cpp} LightPathIntegrator (:322):
sample a light, sample an emission ray (SampleLe), random-walk it through
the scene, and at the emitter vertex and every surface vertex connect to the
camera and splat the contribution through the film.

Measurement derivation (the splat scale): a pixel value is the average
radiance over the pixel's raster footprint, so the pixel-j importance of a
direction ω through the pinhole is W_j(ω) = W·H / (A·cos³θ) for ω landing in
pixel j, where A is the film area on the z=1 camera plane
(PerspectiveCamera.film_area_z1).  A light-subpath vertex with throughput β
(built with every sampling pdf divided out) splats

    β · f(p → cam) · |cosθ_surface| / d²  ·  W·H / (A · cos²θ_cam)

into its projected pixel, and the image is the splat sum divided by the
total number of traced light paths.  (cosθ_cam enters twice: once from the
geometry term's lens cosine and once removing one of W_j's cos³.)

Volumetric vertices: round-2 (the BDPT module handles volume connections
for s>=1, t>=2 strategies; t=1 splats are surface-only here, like the
reference LightPathIntegrator is surface-only in practice for the target
scenes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import dda, warps
from ...utils import vecmath as vmu
from .. import lights as lights_mod
from .. import shapes as shapes_mod
from .path import PCGSource, _bsdf_sample, _gather_mat_params, _take

_SURF_EPS = 1e-4


def sample_le(lights_all, pmfs, u1, u_pos, u_dir, lam):
    """Batched light emission sampling (pbrt Light::SampleLe) over the
    static light list: returns (p, n_l, d, beta0, from_area, valid).

    beta0 carries Le (or intensity) with every pdf and the selection pmf
    divided out, so a surface splat needs only the BSDF chain after it.
    Delta-direction lights (distant) return is_delta_dir=True in n_l==d
    convention; position lights (point/spot) have n_l = d.
    """
    n = u1.shape[0]
    k = len(lights_all)
    cdf = jnp.asarray(np.cumsum(pmfs), jnp.float32)
    idx = jnp.clip(jnp.searchsorted(cdf, u1), 0, k - 1)
    p_o = jnp.zeros((n, 3))
    n_o = jnp.zeros((n, 3))
    d_o = jnp.zeros((n, 3))
    b_o = jnp.zeros(lam.shape)
    area_o = jnp.zeros((n,), bool)
    ok_o = jnp.zeros((n,), bool)
    for i, lt in enumerate(lights_all):
        sel = idx == i
        pmf = float(pmfs[i])
        if isinstance(lt, lights_mod.DiffuseAreaLight):
            p, nl, pdf_a = lt.shape.sample(u_pos)
            local = warps.sample_cosine_hemisphere(u_dir)
            bx, by, bz = vmu.frame_from_z(nl)
            d = vmu.from_local(bx, by, bz, local)
            # beta0 = Le cos / (pdf_A * (cos/pi) * pmf) = Le*pi/(pdf_A*pmf)
            beta = (lt.spectrum(lam) * lt.scale * np.pi
                    / jnp.maximum(pdf_a, 1e-12)[:, None] / pmf)
            ok = jnp.ones((n,), bool)
            from_area = jnp.ones((n,), bool)
        elif isinstance(lt, lights_mod.PointLight):
            p = jnp.broadcast_to(jnp.asarray(lt.position, jnp.float32), (n, 3))
            d = warps.sample_uniform_sphere(u_dir)
            nl = d
            beta = (lt.spectrum(lam) * lt.scale
                    / warps.UNIFORM_SPHERE_PDF / pmf) * jnp.ones(lam.shape)
            ok = jnp.ones((n,), bool)
            from_area = jnp.zeros((n,), bool)
        elif isinstance(lt, lights_mod.DistantLight):
            # disk of scene radius perpendicular to the light direction
            dirn = jnp.asarray(lt.direction, jnp.float32)
            r = lt.scene_radius
            disk = warps.sample_uniform_disk_concentric(u_pos) * r
            bx, by, bz = vmu.frame_from_z(jnp.broadcast_to(dirn, (n, 3)))
            p = (-2.0 * r * dirn + disk[..., 0:1] * bx + disk[..., 1:2] * by)
            d = jnp.broadcast_to(dirn, (n, 3))
            nl = d
            pdf_pos = 1.0 / (np.pi * r * r)
            beta = (lt.spectrum(lam) * lt.scale / pdf_pos / pmf) * jnp.ones(lam.shape)
            ok = jnp.ones((n,), bool)
            from_area = jnp.zeros((n,), bool)
        else:
            # unsupported emitter family for light tracing: contribute 0
            p = jnp.zeros((n, 3))
            d = jnp.asarray([[0.0, 0.0, 1.0]]) * jnp.ones((n, 3))
            nl = d
            beta = jnp.zeros(lam.shape)
            ok = jnp.zeros((n,), bool)
            from_area = jnp.zeros((n,), bool)
        p_o = jnp.where(sel[:, None], p, p_o)
        n_o = jnp.where(sel[:, None], nl, n_o)
        d_o = jnp.where(sel[:, None], d, d_o)
        b_o = jnp.where(sel[:, None], beta, b_o)
        area_o = jnp.where(sel, from_area, area_o)
        ok_o = jnp.where(sel, ok, ok_o)
    return p_o, n_o, d_o, b_o, area_o, ok_o


def trace_light_paths(
    prims: tuple,
    lights: list,
    camera,
    n_paths: int,
    lam,
    rng,
    *,
    max_depth: int = 5,
    light_strategy: str = "uniform",
):
    """Trace `n_paths` light subpaths; returns (pix_xy int, weights (N,L),
    valid) splat lists of length n_paths * (max_depth + 1), flattened per
    vertex.  Driver divides the splat film by total paths.
    """
    from .path import scene_lights_with_area

    N = n_paths
    opaque = tuple(p for p in prims if p.material is not None)
    src = PCGSource(rng)
    lights_all = [lt for lt in scene_lights_with_area(lights, opaque)
                  if not lt.is_infinite]
    assert lights_all, "lightpath needs at least one finite light"
    if light_strategy == "power":
        pw = np.asarray([lights_mod.light_power(lt) for lt in lights_all])
        pmfs = pw / pw.sum()
    else:
        pmfs = np.full((len(lights_all),), 1.0 / len(lights_all))

    u1 = src.next()
    u_pos = jnp.stack([src.next(), src.next()], -1)
    u_dir = jnp.stack([src.next(), src.next()], -1)
    p, n_l, d, beta, from_area, ok = sample_le(
        lights_all, pmfs, u1, u_pos, u_dir, lam)

    W, H = camera.width, camera.height
    A = camera.film_area_z1()
    cam_p = camera.position

    splat_pix = []
    splat_val = []

    def splat_from(p_v, f_times_cos, mask):
        """f_times_cos: (N, L) = f(p->cam) * |cos(n_s, wi_cam)| at the
        vertex (or Le for the emitter vertex)."""
        to_cam = cam_p - p_v
        d2 = jnp.maximum(vmu.length_squared(to_cam), 1e-12)
        dist = jnp.sqrt(d2)
        wi_cam = to_cam / dist[:, None]
        raster, cos_cam, inside = camera.project(p_v)
        occ = shapes_mod.occluded(opaque, p_v + wi_cam * _SURF_EPS,
                                  wi_cam, dist * (1 - 1e-4))
        w = (f_times_cos
             * (W * H / (A * jnp.maximum(cos_cam, 1e-6) ** 2) / d2)[:, None])
        valid = mask & inside & ~occ & (cos_cam > 1e-6)
        pix = jnp.clip(raster.astype(jnp.int32),
                       jnp.asarray([0, 0]), jnp.asarray([W - 1, H - 1]))
        splat_pix.append(jnp.where(valid[:, None], pix, -1))
        splat_val.append(jnp.where(valid[:, None], w, 0.0))

    # emitter vertex splat (area lights only; one-sided emission)
    if any(isinstance(lt, lights_mod.DiffuseAreaLight) for lt in lights_all):
        to_cam = vmu.normalize(cam_p - p)
        front = vmu.dot(n_l, to_cam) > 0
        # beta0 = Le*pi/pdf_A; emitted radiance toward cam = Le =>
        # contribution = Le/(pdf_A pmf) * G * W_j  = (beta0/pi) * cos_emit...
        # the cos at the emitter is the |cos(n_l, wi_cam)| of the G-term
        le_term = beta / np.pi * jnp.abs(vmu.dot(n_l, to_cam))[:, None]
        splat_from(p, le_term, ok & from_area & front)

    alive = ok
    o_cur, d_cur = p + n_l * _SURF_EPS * from_area[:, None].astype(jnp.float32), d
    for depth in range(max_depth):
        hit = shapes_mod.intersect_all(opaque, o_cur, d_cur, jnp.inf)
        surf = alive & jnp.isfinite(hit.t)
        mid = jnp.clip(hit.prim_id, 0, len(opaque) - 1)
        p_hit = o_cur + hit.t[:, None] * d_cur
        wo = -d_cur
        prm_stacks = _gather_mat_params(opaque, lam, hit.uv, N)
        kind_ids = _take(prm_stacks["kind"], mid)
        prm = {k: _take(v, mid) for k, v in prm_stacks.items()
               if k not in ("kind", "emissive") and not k.startswith("_")}
        emissive_mask = jnp.asarray(prm_stacks["emissive"])[mid]
        shade = surf & ~emissive_mask

        # connect this vertex to the camera
        bx, by, bz = vmu.frame_from_z(hit.n)
        wo_l = vmu.to_local(bx, by, bz, wo)
        to_cam = vmu.normalize(cam_p - p_hit)
        wi_l = vmu.to_local(bx, by, bz, to_cam)
        from .path import _bsdf_f_pdf

        f_cam, _ = _bsdf_f_pdf(kind_ids, prm, wo_l, wi_l, lam,
                               prm_stacks["_measured_tables"])
        cos_cam_s = jnp.abs(wi_l[..., 2])
        p_off = p_hit + hit.n * jnp.where(
            vmu.dot(hit.n, to_cam) > 0, _SURF_EPS, -_SURF_EPS)[:, None]
        splat_from(p_off, beta * f_cam * cos_cam_s[:, None], shade)

        # continue the walk
        u_lobe = src.next(shade)
        u2 = jnp.stack([src.next(shade), src.next(shade)], -1)
        bs = _bsdf_sample(kind_ids, prm, wo_l, u_lobe, u2, lam,
                          prm_stacks["_measured_tables"])
        cos_b = jnp.abs(bs.wi[..., 2])
        ok_b = shade & (bs.pdf > 0) & jnp.any(bs.f > 0, -1)
        beta = jnp.where(ok_b[:, None],
                         beta * bs.f * (cos_b / jnp.maximum(bs.pdf, 1e-20))[:, None],
                         beta)
        wi_w = vmu.from_local(bx, by, bz, bs.wi)
        side = jnp.where(vmu.dot(hit.n, wi_w) > 0, _SURF_EPS, -_SURF_EPS)
        o_cur = jnp.where(ok_b[:, None], p_hit + hit.n * side[:, None], o_cur)
        d_cur = jnp.where(ok_b[:, None], wi_w, d_cur)
        # RR
        rr_beta = jnp.max(beta, -1)
        do_rr = ok_b & (depth > 2) & (rr_beta < 1.0)
        q = jnp.clip(1.0 - rr_beta, 0.0, 0.95)
        u_rr = src.next(do_rr)
        killed = do_rr & (u_rr < q)
        beta = jnp.where((do_rr & ~killed)[:, None],
                         beta / jnp.maximum(1.0 - q, 1e-6)[:, None], beta)
        alive = ok_b & ~killed

    pix = jnp.concatenate(splat_pix, 0)
    val = jnp.concatenate(splat_val, 0)
    return pix, val, src.rng
