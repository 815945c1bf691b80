"""Multi-host orchestration.

Reference: none — the C++ renderer is strictly single-host (SURVEY.md §2.4).
TPU-native multi-host is standard JAX SPMD: every host runs the same
program, `jax.distributed.initialize` wires the DCN process group, the mesh
spans all devices, and each host feeds its addressable shard of the pixel
batch.  The only cross-host traffic is the film psum (over ICI within a
slice; DCN only if the mesh spans slices) — scene data (grids, lights)
replicates at startup.

On a single host this module is a no-op passthrough, so the same entry
point serves laptop CPU, one chip, and a pod slice.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize multi-host JAX if the environment asks for it.

    Honors explicit args, else standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or cloud-TPU auto-detection inside
    jax.distributed.initialize).  Safe to call on a single host.
    """
    import jax

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if addr is None and nproc is None:
        return False  # single-host
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )
    return True


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def host_pixel_shard(height: int, width: int):
    """This host's contiguous slice of the pixel batch (equal split over
    processes; the shard_map renderer further splits over local devices)."""
    import jax

    n_proc = jax.process_count()
    pid = jax.process_index()
    total = height * width
    per = (total + n_proc - 1) // n_proc
    start = pid * per
    stop = min(start + per, total)
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    return pix[start:stop], np.arange(start, stop, dtype=np.uint32)
