"""Render checkpoint / resume.

The reference has no render checkpointing (SURVEY.md §5: partial images
double as soft checkpoints via --write-partial-images).  Here it is a
first-class subsystem: the film accumulator (rgb_sum/weight_sum) plus the
next sample index round-trips through an npz, so a long render — or a
preempted TPU job — resumes exactly (the counter-based RNG keys waves by
sample index, so resumed waves are bitwise the waves that would have run).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.film import Film

_VERSION = 1


def save(path: str, film: Film, next_sample: int, meta: Optional[dict] = None):
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        version=_VERSION,
        rgb_sum=np.asarray(film.rgb_sum),
        weight_sum=np.asarray(film.weight_sum),
        next_sample=np.int64(next_sample),
        **{f"meta_{k}": v for k, v in (meta or {}).items()},
    )
    # np.savez appends .npz if missing
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def load(path: str) -> Tuple[Film, int, dict]:
    z = np.load(path, allow_pickle=False)
    if int(z["version"]) != _VERSION:
        raise ValueError(f"checkpoint version {int(z['version'])} unsupported")
    film = Film(jnp.asarray(z["rgb_sum"]), jnp.asarray(z["weight_sum"]))
    meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    return film, int(z["next_sample"]), meta


def render_with_checkpoints(scene, spp=None, checkpoint_path=None,
                            checkpoint_every=32, resume=True):
    """Wave loop with periodic checkpointing; resumes from checkpoint_path
    if it exists."""
    import time

    import jax

    from . import render as render_mod

    spp = spp if spp is not None else scene.spp
    H, W = scene.height, scene.width
    render_wave, density, majorant = render_mod.make_wave_renderer(scene)
    start = 0
    film = Film.create(H, W)
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        film, start, _ = load(checkpoint_path)
        assert film.weight_sum.shape == (H, W), "checkpoint resolution mismatch"
    t0 = time.time()
    for s in range(start, spp):
        film = render_wave(film, density, majorant, jnp.uint32(s))
        if checkpoint_path and (s + 1) % checkpoint_every == 0 and s + 1 < spp:
            jax.block_until_ready(film)
            save(checkpoint_path, film, s + 1, {"spp_target": spp})
    jax.block_until_ready(film)
    dt = time.time() - t0
    if checkpoint_path and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)  # completed: checkpoint no longer needed
    img = np.asarray(film.to_image())
    return img, {"render_time": dt, "spp": spp, "resumed_from": start}
