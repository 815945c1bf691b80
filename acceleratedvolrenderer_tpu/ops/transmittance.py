"""Ratio-tracking transmittance along shadow rays.

Reference: the SampleT_maj callback inside VolPathIntegrator::SampleLd
(volpath_custom.cpp:669-720 / cpu/integrators.cpp:1282+) — every tentative
collision is treated as a null interaction:
    pdf   = T_maj[0] * sigma_maj[0]
    T_ray *= T_maj * sigma_n / pdf
    r_l   *= T_maj * sigma_maj / pdf
    r_u   *= T_maj * sigma_n / pdf
with Russian roulette once max(T_ray / avg(r_l + r_u)) < 0.05 (q = 0.75),
and a final T_maj / T_maj[0] residual factor at segment end.

Same phase-split tau-target march as ops.dda.delta_track (see its module
docstring): K cheap DDA sub-steps per iteration, collision processing under
a scalar `lax.cond`, per-ray RNG advanced only on consumption.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.math import ONE_MINUS_EPSILON
from . import grid as gridops
from .dda import (
    K_DDA_SUBSTEPS,
    MediumArrays,
    dda_init,
    pcg_uniform_masked,
    world_to_medium,
)


class TrResult(NamedTuple):
    T_ray: jnp.ndarray  # (N, L)
    r_l: jnp.ndarray    # (N, L)
    r_u: jnp.ndarray    # (N, L)
    rng: jnp.ndarray    # (N,)


class _Carry(NamedTuple):
    marching: jnp.ndarray
    t_cur: jnp.ndarray
    dl_target: jnp.ndarray
    dl_since: jnp.ndarray
    reached: jnp.ndarray
    voxel: jnp.ndarray
    next_t: jnp.ndarray
    T_ray: jnp.ndarray
    r_l: jnp.ndarray
    r_u: jnp.ndarray
    rng: jnp.ndarray
    n_steps: jnp.ndarray


def ratio_track(
    med: MediumArrays,
    o, d, t_max,
    rng_state,
    active,
    maj_res,
    rr_threshold: float = 0.05,
    rr_q: float = 0.75,
    homogeneous: bool = False,
    max_steps: int = 100000,
) -> TrResult:
    N = o.shape[0]
    L = med.sigma_a.shape[-1]
    f32 = jnp.float32

    sigma_t = jnp.broadcast_to(med.sigma_a + med.sigma_s, (N, L))
    sigma_a_b = jnp.broadcast_to(med.sigma_a, (N, L))
    sigma_s_b = jnp.broadcast_to(med.sigma_s, (N, L))
    sigma_t0 = sigma_t[:, 0]

    dda_state, t0 = dda_init(o, d, t_max, med.w2m, maj_res)
    maj_res_i = jnp.asarray(maj_res, jnp.int32)

    marching0 = active & dda_state.in_medium
    rng0, u0 = pcg_uniform_masked(rng_state, marching0)
    u0 = jnp.minimum(u0, ONE_MINUS_EPSILON)
    dl0 = jnp.where(sigma_t0 > 0, -jnp.log1p(-u0) / jnp.maximum(sigma_t0, 1e-30), jnp.inf)

    carry0 = _Carry(
        marching=marching0,
        t_cur=t0,
        dl_target=dl0,
        dl_since=jnp.zeros((N,), f32),
        reached=jnp.zeros((N,), bool),
        voxel=dda_state.voxel,
        next_t=dda_state.next_t,
        T_ray=jnp.ones((N, L), f32),
        r_l=jnp.ones((N, L), f32),
        r_u=jnp.ones((N, L), f32),
        rng=rng0,
        n_steps=jnp.int32(0),
    )

    def substep(c: _Carry) -> _Carry:
        hunting = c.marching & ~c.reached
        rz, ry, rx = med.majorant.shape
        vx = jnp.clip(c.voxel[:, 0], 0, rx - 1)
        vy = jnp.clip(c.voxel[:, 1], 0, ry - 1)
        vz = jnp.clip(c.voxel[:, 2], 0, rz - 1)
        maxd = med.majorant[vz, vy, vx]
        seg_end = jnp.minimum(jnp.min(c.next_t, axis=-1), dda_state.t_exit)
        seg_len = jnp.maximum(seg_end - c.t_cur, 0.0)
        dl_seg = maxd * seg_len

        lands = hunting & (dl_seg >= c.dl_target) & (maxd > 0)
        t_col = c.t_cur + jnp.where(maxd > 0, c.dl_target / jnp.maximum(maxd, 1e-30), jnp.inf)

        crossing = hunting & ~lands
        axis = jnp.argmin(c.next_t, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        hit_exit = seg_end >= dda_state.t_exit
        adv = (crossing & ~hit_exit)[:, None] & (onehot != 0)
        voxel = jnp.where((crossing & ~hit_exit)[:, None], c.voxel + onehot * dda_state.step, c.voxel)
        next_t = jnp.where(adv, c.next_t + dda_state.dt, c.next_t)
        out_of_grid = jnp.any((voxel < 0) | (voxel >= maj_res_i), axis=-1)
        escaped = crossing & (hit_exit | out_of_grid)

        dl_target = jnp.where(crossing, c.dl_target - dl_seg, c.dl_target)
        dl_since = c.dl_since + jnp.where(
            lands, c.dl_target, jnp.where(crossing, dl_seg, 0.0)
        )
        t_cur = jnp.where(lands, t_col, jnp.where(crossing, seg_end, c.t_cur))
        return c._replace(
            marching=c.marching & ~escaped,
            t_cur=t_cur, dl_target=dl_target, dl_since=dl_since,
            reached=c.reached | lands, voxel=voxel, next_t=next_t,
        )

    def process(c: _Carry) -> _Carry:
        col = c.reached & c.marching
        if homogeneous:
            dens = jnp.ones((N,), f32)
        else:
            p_w = o + c.t_cur[:, None] * d
            p_m = world_to_medium(med.w2m, p_w)
            dens = gridops.trilerp(med.density, p_m)
        rz, ry, rx = med.majorant.shape
        vx = jnp.clip(c.voxel[:, 0], 0, rx - 1)
        vy = jnp.clip(c.voxel[:, 1], 0, ry - 1)
        vz = jnp.clip(c.voxel[:, 2], 0, rz - 1)
        maxd = med.majorant[vz, vy, vx]

        sa = sigma_a_b * dens[:, None]
        ss = sigma_s_b * dens[:, None]
        sig_maj = sigma_t * maxd[:, None]
        T_maj = jnp.exp(-sigma_t * c.dl_since[:, None])
        sig_n = jnp.clip(sig_maj - sa - ss, 0.0, None)

        pdf = T_maj[:, 0] * sig_maj[:, 0]
        inv_pdf = 1.0 / jnp.maximum(pdf, 1e-30)
        ok = (pdf > 0)[:, None]
        T_new = jnp.where(col[:, None] & ok, c.T_ray * T_maj * sig_n * inv_pdf[:, None], c.T_ray)
        r_l_new = jnp.where(col[:, None] & ok, c.r_l * T_maj * sig_maj * inv_pdf[:, None], c.r_l)
        r_u_new = jnp.where(col[:, None] & ok, c.r_u * T_maj * sig_n * inv_pdf[:, None], c.r_u)

        # Russian roulette (volpath_custom.cpp:700-711)
        denom = jnp.mean(r_l_new + r_u_new, axis=-1)
        Tr = T_new / jnp.maximum(denom, 1e-30)[:, None]
        rr = col & (jnp.max(Tr, axis=-1) < rr_threshold)
        rng, u_rr = pcg_uniform_masked(c.rng, rr)
        killed = rr & (u_rr < rr_q)
        T_new = jnp.where(
            killed[:, None], 0.0, jnp.where(rr[:, None], T_new / (1.0 - rr_q), T_new)
        )
        dead = col & ~jnp.any(T_new != 0.0, axis=-1)

        # new collision target
        rng, u1 = pcg_uniform_masked(rng, col & ~dead)
        u1 = jnp.minimum(u1, ONE_MINUS_EPSILON)
        new_dl = jnp.where(sigma_t0 > 0, -jnp.log1p(-u1) / jnp.maximum(sigma_t0, 1e-30), jnp.inf)
        dl_target = jnp.where(col, new_dl, c.dl_target)
        dl_since = jnp.where(col, 0.0, c.dl_since)

        return c._replace(
            marching=c.marching & ~dead,
            dl_target=dl_target, dl_since=dl_since,
            reached=c.reached & ~col,
            T_ray=T_new, r_l=r_l_new, r_u=r_u_new, rng=rng,
        )

    def cond(c: _Carry):
        return jnp.any(c.marching) & (c.n_steps < max_steps)

    def body(c: _Carry):
        for _ in range(K_DDA_SUBSTEPS):
            c = substep(c)
        c = jax.lax.cond(jnp.any(c.reached), process, lambda x: x, c)
        return c._replace(n_steps=c.n_steps + 1)

    end = jax.lax.while_loop(cond, body, carry0)

    # residual T_maj / T_maj[0] at segment end (volpath_custom.cpp:718-722)
    T_res = jnp.exp(-sigma_t * end.dl_since[:, None])
    f_res = T_res / jnp.maximum(T_res[:, 0:1], 1e-30)
    app = active[:, None]
    return TrResult(
        T_ray=jnp.where(app, end.T_ray * f_res, end.T_ray),
        r_l=jnp.where(app, end.r_l * f_res, end.r_l),
        r_u=jnp.where(app, end.r_u * f_res, end.r_u),
        rng=end.rng,
    )
