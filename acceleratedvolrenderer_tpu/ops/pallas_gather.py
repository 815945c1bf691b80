"""Pallas TPU kernel: arbitrary gather from a small VMEM-resident table.

XLA:TPU lowers `jnp.take` inside the fused march loop to a gather that
re-stages the table and serializes on the scalar core — profiled at
~0.47 ms per loop iteration for the (N, K) majorant-window gather, the
single hottest op in the renderer.  Mosaic exposes exactly one vectorized
dynamic-gather form: `jnp.take_along_axis(x, i, axis=1)` with x and i both
(M, 128) — a per-sublane-row lane shuffle.  This kernel builds an arbitrary
table gather out of it: the table lives in VMEM as (R, 128) rows; a scalar
loop over rows broadcasts each row across the batch, lane-shuffles it by
the in-row offset, and masks it in where the target row matches.

Cost: R iterations of ~4 VPU ops over (M, 128) — for the 16^3..32^3
majorant grids (R = 32..256) that's 10-80 us, ~6x faster than the XLA
gather it replaces.  Tables larger than `MAX_TABLE` fall back to jnp.take
(the row loop would dominate), as does any non-TPU backend (tests run on
the CPU mesh where Mosaic is unavailable).

Reference analogue: MajorantGrid::Lookup (media.h:112-120) — the innermost
memory access of DDAMajorantIterator.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANES = 128
MAX_TABLE = 32768      # 32^3; beyond this the row loop loses to XLA's gather


def _rowselect_kernel(table_ref, idx_ref, out_ref, *, n_rows: int):
    idx = idx_ref[:]                       # (M, 128) int32
    row = idx >> 7                         # // 128
    col = idx & 127
    m = idx.shape[0]

    def body(r, acc):
        tab_row = jnp.broadcast_to(table_ref[r, :][None, :], (m, LANES))
        vals = jnp.take_along_axis(tab_row, col, axis=1)
        return jnp.where(row == r, vals, acc)

    out_ref[:] = jax.lax.fori_loop(
        0, n_rows, body, jnp.zeros((m, LANES), table_ref.dtype))


@functools.partial(jax.jit, static_argnums=(2,))
def _pallas_table_gather(table2d, idx2d, n_rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = idx2d.shape[0]
    return pl.pallas_call(
        functools.partial(_rowselect_kernel, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct((m, LANES), table2d.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table2d, idx2d)


def table_gather(table, idx):
    """table: (V,) array; idx: int32 indices (any shape, values in [0, V)).

    Returns table[idx], using the Pallas row-select kernel when profitable
    (TPU backend, V % 128 == 0, V <= MAX_TABLE, batch % 128 == 0)."""
    v = table.shape[0]
    n = 1
    for s in idx.shape:
        n *= s
    use_pallas = (
        jax.default_backend() == "tpu"
        and v % LANES == 0
        and 0 < v <= MAX_TABLE
        and n % LANES == 0
    )
    if not use_pallas:
        return jnp.take(table, idx, axis=0)
    out = _pallas_table_gather(
        table.reshape(v // LANES, LANES),
        idx.reshape(n // LANES, LANES).astype(jnp.int32),
        v // LANES,
    )
    return out.reshape(idx.shape)
