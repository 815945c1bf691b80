#!/usr/bin/env python
"""Measured verdicts for the r4 costed-not-measured density-gather designs.

The density tap (stochastic 1-tap trilerp from the 67 MB grid) is 51% of
the production loop at the XLA backend's ~7 ns/element serial floor
(docs/PROFILE_r04.md).  r4 rejected two alternatives on cost models; the
r4 VERDICT demanded real numbers.  This script measures, all inside a
serial-dependence lax.scan (the placement that matters on this stack —
standalone microbenchmarks of scatter/gather are not trustworthy,
docs/PROFILE_r03.md):

  1. BASELINE   — XLA gather of N elements from the 16.7M-entry table.
  2. DMA        — Pallas kernel issuing one single-element HBM->VMEM DMA
                  per lane (16 in flight, round-robin semaphores): the
                  "per-lane DMA gather" design.
  3. SORT BOUND — jnp.argsort of the N gather keys: a LOWER bound on the
                  brick-binned design (sort by brick, then in-VMEM
                  select), which must pay this per iteration before any
                  select work.

Usage: python scripts/measure_gather_designs.py [--n 16384] [--iters 200]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

V = 256 ** 3
SLOTS = 16      # DMA copies in flight


def _dma_kernel(idx_ref, table_ref, out_ref, scratch, sems, *, chunk):
    """Per-lane DMA design at its minimum expressible granularity.

    Mosaic rejects sub-tile HBM slices ("Slice shape along dimension 0
    must be aligned to tiling (1024)"), so a single-f32 random fetch is
    NOT expressible — the smallest dynamic HBM->VMEM copy of an f32
    table is one (8, 128) tile = 4 KB.  The kernel issues one tile DMA
    per gathered element into a ring of SLOTS scratch tiles (SLOTS
    copies in flight) — the fastest shape the design can take.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pl_ds = pl.ds

    def copy(j):
        return pltpu.make_async_copy(
            table_ref.at[pl_ds(idx_ref[j], 1)],
            scratch.at[pl_ds(j % SLOTS, 1)], sems.at[j % SLOTS])

    def body(j, _):
        @pl.when(j >= SLOTS)
        def _():
            copy(j - SLOTS).wait()      # reclaim the ring slot
        copy(j).start()
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    def drain(j, _):
        copy(chunk - SLOTS + j).wait()
        return 0

    jax.lax.fori_loop(0, SLOTS, drain, 0)
    out_ref[:] = scratch[0]


@functools.partial(jax.jit, static_argnums=(2,))
def dma_gather(table, idx, chunk):
    """idx are TILE indices into table reshaped (V//1024, 8, 128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t3 = table.reshape(-1, 8, 128)
    return pl.pallas_call(
        functools.partial(_dma_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((8, 128), table.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SLOTS, 8, 128), table.dtype),
                        pltpu.SemaphoreType.DMA((SLOTS,))],
    )(idx, t3)


def timed_scan(step, carry0, iters, reps=3):
    @jax.jit
    def run(c0):
        return jax.lax.scan(step, c0, None, length=iters)[0]

    jax.block_until_ready(run(carry0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run(carry0))
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    N, iters = args.n, args.iters

    table = jnp.asarray(np.random.default_rng(0).random(V), jnp.float32)
    idx0 = jnp.asarray(
        np.random.default_rng(1).integers(0, V, N), jnp.uint32)
    out = {"n": N, "iters": iters, "table_mb": round(V * 4 / 1e6, 1)}

    def mutate(idx, acc):
        # serial dependence: next indices depend on gathered values
        return (idx * jnp.uint32(2654435761)
                + acc.astype(jnp.uint32)) % jnp.uint32(V)

    # 1. XLA gather baseline
    def step_xla(c, _):
        idx, acc = c
        v = table[idx]
        return (mutate(idx, v * 1e3), acc + v), None

    t = timed_scan(step_xla, (idx0, jnp.zeros((N,))), iters)
    out["xla_gather_ns_per_el"] = round(t / iters / N * 1e9, 2)

    # 2. per-lane DMA design: one (8,128)-tile DMA per element (the
    #    minimum expressible granularity), SLOTS in flight.  The scan
    #    carries the last fetched tile so the copies cannot be elided.
    try:
        n_tiles = V // 1024
        tid0 = (idx0 // jnp.uint32(1024)).astype(jnp.int32)

        def step_dma(c, _):
            tid, acc = c
            tile = dma_gather(table, tid, N)
            tid = ((tid * 48271 + tile[0, 0].astype(jnp.int32))
                   % n_tiles + n_tiles) % n_tiles
            return (tid, acc + tile.mean()), None

        t = timed_scan(step_dma, (tid0, jnp.float32(0.0)), iters)
        out["dma_tile_ns_per_el"] = round(t / iters / N * 1e9, 2)
        out["dma_note"] = ("single-f32 DMA not expressible (tiling 1024);"
                          " cost is per 4KB-tile fetch per element")
    except Exception as e:  # noqa: BLE001
        out["dma_gather_error"] = repr(e)[:300]

    # 3. brick-binned lower bound: per-iteration key sort
    def step_sort(c, _):
        idx, acc = c
        order = jnp.argsort(idx)
        v = table[idx[order]]           # the design still gathers bricks
        return (mutate(idx, v * 1e3), acc + v), None

    def step_sort_only(c, _):
        idx, acc = c
        order = jnp.argsort(idx)
        return (mutate(idx, order.astype(jnp.float32)), acc), None

    t = timed_scan(step_sort_only, (idx0, jnp.zeros((N,))), iters)
    out["argsort_ns_per_el"] = round(t / iters / N * 1e9, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
