"""Pallas TPU kernel: the fused blocked-DDA march step.

This is the hot kernel of the renderer — the north-star "fused Pallas
ray-march kernel over an HBM-resident density grid" (BASELINE.json): one
dispatch advances every ray up to K majorant voxels, resolving the
delta-tracking free-flight target in closed form against the VMEM-resident
majorant table.  The XLA version of the same logic
(volpath_fused.block_substep) compiles to ~15 separate fusions whose
loop-state staging copies dominated the profile; here the whole window is
one kernel with all intermediates in VMEM/registers.

Semantics are identical to K sequential DDA substeps (media.h:730
SampleT_maj's majorant iteration, reshaped): see block_substep for the
estimator-level documentation.  The majorant lookup uses the row-select
gather (ops.pallas_gather): Mosaic's one vectorized dynamic-gather form is
take_along_axis(x, i, axis=1) on (M, 128) tiles, so each of the R=V/128
table rows is broadcast, lane-shuffled, and masked in.

All lane-state arrays are (M, 128) planes (N = M*128 rays); bool flags
travel as int32 planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANES = 128
# majorant tables larger than this fall back to the XLA path; 64^3 = 2048
# rows runs through the MXU one-hot gather (see _gather_rows_mxu) — the
# r1 cap of 512 rows (the O(R) row-select loop) is gone
MAX_TABLE_ROWS = 2048
# tables at or below this row count use the VPU row-select loop (cheaper
# than the MXU one-hot below ~32 rows, i.e. 16^3)
_ROW_SELECT_MAX = 32

_F_INF = 3.0e38
# lane-chunk height (sublane rows) per one-hot matmul: 8 sublanes x 128
# lanes = 1024 lanes per MXU dispatch keeps the one-hot at
# (1024, R) bf16 <= 4 MB for R = 2048
_MXU_CHUNK = 8


def _gather_rows(table_ref, flat, n_rows):
    """table[flat] via the row-select trick; flat (M, 128) int32.

    O(n_rows) VPU ops — only used for tiny tables (<= _ROW_SELECT_MAX
    rows, e.g. the 16^3 production majorant)."""
    row = flat >> 7
    col = flat & 127
    m = flat.shape[0]

    def body(r, acc):
        tab_row = jnp.broadcast_to(table_ref[r, :][None, :], (m, LANES))
        vals = jnp.take_along_axis(tab_row, col, axis=1)
        return jnp.where(row == r, vals, acc)

    return jax.lax.fori_loop(0, n_rows, body,
                             jnp.zeros((m, LANES), table_ref.dtype))


def _gather_rows_mxu(table_ref, flat, n_rows):
    """table[flat] via a one-hot MXU matmul: rowvals = onehot(row) @ table
    selects each lane's whole 128-wide table row on the systolic array,
    then take_along_axis picks the lane's column.  O(R) MACs per lane on
    the MXU instead of O(R) vector ops on the VPU — the win that lifts
    the majorant-table cap from 32^3 to 64^3.

    Exactness: the one-hot is exact and the table values are pre-rounded
    UP to bf16-representable (march_block), so the bf16 MXU pass returns
    them bit-exactly and the majorant stays a conservative upper bound.
    """
    row = flat >> 7
    col = flat & 127
    m = flat.shape[0]
    tab = table_ref[:].astype(jnp.bfloat16)          # (R, 128)
    riota = jax.lax.broadcasted_iota(jnp.int32, (LANES, n_rows), 1)
    n_chunks = m // _MXU_CHUNK
    # Mosaic lowers neither dynamic_slice nor lane->sublane reshapes
    # inside kernels (probed r3), but (8,128)<->(128,8) transposes and
    # sublane-column one-hots DO lower: move the per-lane indices into
    # the sublane dimension via transpose, then one matmul per column.
    outs = []
    for i in range(n_chunks):
        r0 = i * _MXU_CHUNK
        rows_t = row[r0:r0 + _MXU_CHUNK, :].T        # (128, 8)
        cols_t = col[r0:r0 + _MXU_CHUNK, :].T        # (128, 8)
        cols_chunk = []
        for c in range(_MXU_CHUNK):
            onehot = (rows_t[:, c:c + 1] == riota).astype(jnp.bfloat16)
            # (128, R) @ (R, 128): each lane's full table row
            rowvals = jnp.dot(onehot, tab,
                              preferred_element_type=jnp.float32)
            # lane-column select: index constant along axis 1, so every
            # output column holds the wanted value; take column 0
            colsel = jnp.broadcast_to(cols_t[:, c:c + 1], rowvals.shape)
            cols_chunk.append(
                jnp.take_along_axis(rowvals, colsel, axis=1)[:, 0:1])
        vals_t = jnp.concatenate(cols_chunk, axis=1)  # (128, 8)
        outs.append(vals_t.T)                         # (8, 128)
    return jnp.concatenate(outs, axis=0)


def _march_kernel(maj_ref, ctrl_ref,
                  vx_ref, vy_ref, vz_ref,
                  ntx_ref, nty_ref, ntz_ref,
                  dtx_ref, dty_ref, dtz_ref,
                  sx_ref, sy_ref, sz_ref,
                  texit_ref, tcur_ref, dlt_ref, dls_ref,
                  maxd_ref, hunt_ref, resid_ref, ctrld_ref, csince_ref,
                  # outputs
                  ovx_ref, ovy_ref, ovz_ref,
                  ontx_ref, onty_ref, ontz_ref,
                  otcur_ref, odlt_ref, odls_ref, omaxd_ref, oflags_ref,
                  octrld_ref, ocsince_ref,
                  *, K: int, n_rows: int, rx: int, ry: int, rz: int,
                  use_ctrl: bool):
    vx, vy, vz = vx_ref[:], vy_ref[:], vz_ref[:]
    ntx, nty, ntz = ntx_ref[:], nty_ref[:], ntz_ref[:]
    dtx, dty, dtz = dtx_ref[:], dty_ref[:], dtz_ref[:]
    sx, sy, sz = sx_ref[:], sy_ref[:], sz_ref[:]
    t_exit = texit_ref[:]
    s_k = tcur_ref[:]
    dl_target = dlt_ref[:]
    hunting = hunt_ref[:] != 0
    live = hunting

    zf = jnp.zeros_like(s_k)
    cum = zf
    landed = jnp.zeros_like(hunting)
    t_col = zf
    t_end = s_k
    maj_snap = zf
    maxd_last = zf
    svx, svy, svz = vx, vy, vz
    sntx, snty, sntz = ntx, nty, ntz
    live_final = live
    if use_ctrl:
        # residual ratio tracking (shadow lanes, resid != 0): collisions
        # hunt against rate (majorant - minorant) and the CONTROL optical
        # depth integral(minorant * dl) accumulates in closed form — the
        # event block applies exp(-sigma_t * ctrl) deterministically.
        resid_f = (resid_ref[:] != 0).astype(jnp.float32)
        cumc = zf
        ctrl_snap = zf
        ctrl_last = zf
        c_land = zf

    for _ in range(K):
        end_raw = jnp.minimum(jnp.minimum(ntx, nty), ntz)
        end_k = jnp.minimum(end_raw, t_exit)
        len_k = jnp.maximum(end_k - s_k, 0.0)
        hit_exit = end_raw >= t_exit

        cx = jnp.clip(vx, 0, rx - 1)
        cy = jnp.clip(vy, 0, ry - 1)
        cz = jnp.clip(vz, 0, rz - 1)
        flat = (cz * ry + cy) * rx + cx
        if n_rows <= _ROW_SELECT_MAX:
            maj_k = _gather_rows(maj_ref, flat, n_rows)
        else:
            maj_k = _gather_rows_mxu(maj_ref, flat, n_rows)
        if use_ctrl:
            if n_rows <= _ROW_SELECT_MAX:
                ctrl_k = _gather_rows(ctrl_ref, flat, n_rows)
            else:
                ctrl_k = _gather_rows_mxu(ctrl_ref, flat, n_rows)
            ctrl_k = ctrl_k * resid_f      # 0 on main-path lanes
            rate_k = jnp.maximum(maj_k - ctrl_k, 0.0)
        else:
            rate_k = maj_k

        len_c = jnp.minimum(len_k, _F_INF)
        dl_k = jnp.where(live_final & (rate_k > 0), rate_k * len_c, 0.0)
        prev_cum = cum
        cum = cum + dl_k
        ok = live_final & (dl_k > 0) & (cum >= dl_target)
        new_land = ok & ~landed
        t_col = jnp.where(new_land,
                          s_k + (dl_target - prev_cum)
                          / jnp.maximum(rate_k, 1e-30), t_col)
        maj_snap = jnp.where(new_land, maj_k, maj_snap)
        if use_ctrl:
            dc_k = jnp.where(live_final, ctrl_k * len_c, 0.0)
            c_land = jnp.where(
                new_land, cumc + ctrl_k * (t_col - s_k), c_land)
            cumc = cumc + dc_k
            ctrl_snap = jnp.where(new_land, ctrl_k, ctrl_snap)
            ctrl_last = jnp.where(live_final, ctrl_k, ctrl_last)
        svx = jnp.where(new_land, vx, svx)
        svy = jnp.where(new_land, vy, svy)
        svz = jnp.where(new_land, vz, svz)
        sntx = jnp.where(new_land, ntx, sntx)
        snty = jnp.where(new_land, nty, snty)
        sntz = jnp.where(new_land, ntz, sntz)
        landed = landed | ok
        maxd_last = jnp.where(live_final, maj_k, maxd_last)
        t_end = jnp.where(live_final, end_k, t_end)

        # advance one voxel (first-min axis preference == jnp.argmin)
        is_x = (ntx <= nty) & (ntx <= ntz)
        is_y = ~is_x & (nty <= ntz)
        is_z = ~is_x & ~is_y
        vx = jnp.where(is_x, vx + sx, vx)
        vy = jnp.where(is_y, vy + sy, vy)
        vz = jnp.where(is_z, vz + sz, vz)
        ntx = jnp.where(is_x, ntx + dtx, ntx)
        nty = jnp.where(is_y, nty + dty, nty)
        ntz = jnp.where(is_z, ntz + dtz, ntz)
        out = ((vx < 0) | (vx >= rx) | (vy < 0) | (vy >= ry)
               | (vz < 0) | (vz >= rz))
        live_final = live_final & ~hit_exit & ~out
        s_k = end_k

    sel = landed
    adv = hunting & ~landed
    escaped = adv & ~live_final
    dl_tot = jnp.where(hunting, cum, 0.0)

    ovx_ref[:] = jnp.where(sel, svx, jnp.where(adv, vx, vx_ref[:]))
    ovy_ref[:] = jnp.where(sel, svy, jnp.where(adv, vy, vy_ref[:]))
    ovz_ref[:] = jnp.where(sel, svz, jnp.where(adv, vz, vz_ref[:]))
    ontx_ref[:] = jnp.where(sel, sntx, jnp.where(adv, ntx, ntx_ref[:]))
    onty_ref[:] = jnp.where(sel, snty, jnp.where(adv, nty, nty_ref[:]))
    ontz_ref[:] = jnp.where(sel, sntz, jnp.where(adv, ntz, ntz_ref[:]))
    otcur_ref[:] = jnp.where(sel, t_col,
                             jnp.where(adv, t_end, tcur_ref[:]))
    odlt_ref[:] = jnp.where(adv, dl_target - dl_tot, dl_target)
    odls_ref[:] = dls_ref[:] + jnp.where(sel, dl_target,
                                         jnp.where(adv, dl_tot, 0.0))
    omaxd_ref[:] = jnp.where(sel, maj_snap,
                             jnp.where(adv, maxd_last, maxd_ref[:]))
    oflags_ref[:] = (jnp.where(sel, 1, 0)
                     + jnp.where(escaped, 2, 0)).astype(jnp.int32)
    if use_ctrl:
        octrld_ref[:] = jnp.where(sel, ctrl_snap,
                                  jnp.where(adv, ctrl_last, ctrld_ref[:]))
        ocsince_ref[:] = csince_ref[:] + jnp.where(
            sel, c_land, jnp.where(adv, jnp.where(hunting, cumc, 0.0), 0.0))
    else:
        octrld_ref[:] = ctrld_ref[:]
        ocsince_ref[:] = csince_ref[:]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _march_call(static_cfg, n_rows, m, maj2d, ctrl2d, planes_f, planes_i,
                hunt, resid, ctrld, csince):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, rx, ry, rz, use_ctrl = static_cfg
    f32 = jnp.float32
    i32 = jnp.int32
    if n_rows > _ROW_SELECT_MAX:
        # MXU-gather tables: grid over lane chunks so Mosaic reuses the
        # per-chunk one-hot/rowvals VMEM (the fully-unrolled kernel's
        # scoped stack OOMs at 100MB for 64^3 tables at K=12)
        grid = (m // _MXU_CHUNK,)
        lane_spec = pl.BlockSpec((_MXU_CHUNK, LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec((n_rows, LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        blk = _MXU_CHUNK
    else:
        grid = (1,)
        lane_spec = pl.BlockSpec((m, LANES), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec((n_rows, LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        blk = m
    outs = pl.pallas_call(
        functools.partial(_march_kernel, K=K, n_rows=n_rows,
                          rx=rx, ry=ry, rz=rz, use_ctrl=use_ctrl),
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((m, LANES), i32),   # vx
            jax.ShapeDtypeStruct((m, LANES), i32),   # vy
            jax.ShapeDtypeStruct((m, LANES), i32),   # vz
            jax.ShapeDtypeStruct((m, LANES), f32),   # ntx
            jax.ShapeDtypeStruct((m, LANES), f32),   # nty
            jax.ShapeDtypeStruct((m, LANES), f32),   # ntz
            jax.ShapeDtypeStruct((m, LANES), f32),   # t_cur
            jax.ShapeDtypeStruct((m, LANES), f32),   # dl_target
            jax.ShapeDtypeStruct((m, LANES), f32),   # dl_since
            jax.ShapeDtypeStruct((m, LANES), f32),   # maxd
            jax.ShapeDtypeStruct((m, LANES), i32),   # flags
            jax.ShapeDtypeStruct((m, LANES), f32),   # ctrld
            jax.ShapeDtypeStruct((m, LANES), f32),   # ctrl_since
        ],
        in_specs=[tab_spec, tab_spec] + [lane_spec] * 21,
        out_specs=[lane_spec] * 13,
    )(maj2d, ctrl2d, *planes_i[:3], *planes_f[:3], *planes_f[3:6],
      *planes_i[3:6], *planes_f[6:10], planes_f[10], hunt, resid,
      ctrld, csince)
    return outs


def available(majorant_size: int, n: int) -> bool:
    if not (jax.default_backend() == "tpu"
            and majorant_size % LANES == 0
            and 0 < majorant_size <= MAX_TABLE_ROWS * LANES
            and n % LANES == 0):
        return False
    if majorant_size > _ROW_SELECT_MAX * LANES:
        # MXU gather processes _MXU_CHUNK sublane rows per dispatch
        return n % (LANES * _MXU_CHUNK) == 0
    return True


def _bf16_roundup(x):
    """Round positive floats UP to the nearest bf16-representable value so
    the bf16 MXU gather returns them exactly and the majorant stays a
    conservative upper bound."""
    b = x.astype(jnp.bfloat16)
    lo = b.astype(jnp.float32) < x
    bits = jax.lax.bitcast_convert_type(b, jnp.uint16)
    up = jax.lax.bitcast_convert_type(bits + jnp.uint16(1), jnp.bfloat16)
    return jnp.where(lo, up, b).astype(jnp.float32)


def _bf16_rounddown(x):
    """Round positive floats DOWN to bf16-representable so the bf16 MXU
    gather returns the minorant exactly and it stays a LOWER bound."""
    b = x.astype(jnp.bfloat16)
    hi = b.astype(jnp.float32) > x
    bits = jax.lax.bitcast_convert_type(b, jnp.uint16)
    down = jax.lax.bitcast_convert_type(
        bits - jnp.uint16(1), jnp.bfloat16)
    return jnp.maximum(jnp.where(hi, down, b).astype(jnp.float32), 0.0)


def march_block(majorant, voxel, next_t, dt, step, t_exit, t_cur,
                dl_target, dl_since, maxd_in, hunting, K, maj_res,
                control=None, resid=None, ctrld_in=None, csince_in=None):
    """Fused march: see _march_kernel.  All per-lane args are (N,) / (N, 3)
    jnp arrays; returns dict with updated voxel/next_t/t_cur/dl_target/
    dl_since/maxd plus landed/escaped masks.

    control (the minorant table) + resid/ctrld_in/csince_in enable
    residual ratio tracking: `resid` lanes hunt against (majorant -
    control) and `ctrl_since` accumulates the closed-form control depth;
    outputs gain ctrld (control at the event cell) and ctrl_since."""
    rx, ry, rz = maj_res
    n = t_cur.shape[0]
    m = n // LANES
    p = lambda a: a.reshape(m, LANES)
    pi = lambda a: a.astype(jnp.int32).reshape(m, LANES)
    planes_f = [p(next_t[:, 0]), p(next_t[:, 1]), p(next_t[:, 2]),
                p(dt[:, 0]), p(dt[:, 1]), p(dt[:, 2]),
                p(t_exit), p(t_cur), p(dl_target), p(dl_since),
                p(maxd_in)]
    planes_i = [pi(voxel[:, 0]), pi(voxel[:, 1]), pi(voxel[:, 2]),
                pi(step[:, 0]), pi(step[:, 1]), pi(step[:, 2])]
    maj2d = majorant.reshape(-1, LANES)
    use_ctrl = control is not None
    if maj2d.shape[0] > _ROW_SELECT_MAX:
        maj2d = _bf16_roundup(maj2d)
    if use_ctrl:
        ctrl2d = control.reshape(-1, LANES)
        if ctrl2d.shape[0] > _ROW_SELECT_MAX:
            ctrl2d = _bf16_rounddown(ctrl2d)
        resid_p = pi(resid)
        ctrld_p = p(ctrld_in)
        csince_p = p(csince_in)
    else:
        ctrl2d = jnp.zeros_like(maj2d)
        resid_p = jnp.zeros((m, LANES), jnp.int32)
        ctrld_p = jnp.zeros((m, LANES), jnp.float32)
        csince_p = jnp.zeros((m, LANES), jnp.float32)
    outs = _march_call((int(K), int(rx), int(ry), int(rz), use_ctrl),
                       maj2d.shape[0], m, maj2d, ctrl2d, planes_f,
                       planes_i, pi(hunting), resid_p, ctrld_p, csince_p)
    u = lambda a: a.reshape(n)
    flags = u(outs[10])
    out = dict(
        voxel=jnp.stack([u(outs[0]), u(outs[1]), u(outs[2])], -1),
        next_t=jnp.stack([u(outs[3]), u(outs[4]), u(outs[5])], -1),
        t_cur=u(outs[6]), dl_target=u(outs[7]), dl_since=u(outs[8]),
        maxd=u(outs[9]),
        landed=(flags & 1) != 0, escaped=(flags & 2) != 0,
    )
    if use_ctrl:
        out["ctrld"] = u(outs[11])
        out["ctrl_since"] = u(outs[12])
    return out
