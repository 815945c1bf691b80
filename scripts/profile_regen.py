#!/usr/bin/env python
"""Capture a jax.profiler trace of the regen bench config and print the
op-level cost table (parses the trace .json.gz directly — no tensorboard).

Usage: python scripts/profile_regen.py [--cfg acc_g4_8k] [--outdir /tmp/prof]
"""
import argparse
import gzip
import glob
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/prof_r4")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--lanes", type=int, default=8192)
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import presets

    W, H = 1280, 720
    scene = presets.cloud(width=W, height=H, spp=args.spp, max_depth=16)
    scene.max_march_steps = 4096
    run, density, majorant = render_mod.make_regen_renderer(
        scene, spp=args.spp, k_substeps=8, stochastic_filter=True,
        work_stride="auto", retire_groups=args.groups, n_lanes=args.lanes,
        accum_spp=bool(args.accum))
    film0 = jnp.zeros((3 * (H * W + 1),))
    film = run(density, majorant, film0)
    jax.block_until_ready(film)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        film = run(density, majorant, jnp.zeros((3 * (H * W + 1),)))
        jax.block_until_ready(film)

    # parse newest trace file
    paths = sorted(glob.glob(os.path.join(
        args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    ev = [e for e in tr.get("traceEvents", [])
          if e.get("ph") == "X" and "dur" in e]
    # keep device-side lanes only (drop python/runtime threads): heuristic —
    # device events carry args with hlo metadata or live on TPU pid rows
    agg = defaultdict(lambda: [0.0, 0])
    for e in ev:
        name = e.get("name", "?")
        a = e.get("args", {}) or {}
        key = a.get("long_name") or name
        agg[name][0] += e["dur"]
        agg[name][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in rows)
    print(f"total traced X-dur: {total/1e6:.3f}s over {len(ev)} events")
    for name, (dur, n) in rows[:args.top]:
        print(f"{dur/1e3:10.1f} ms  n={n:7d}  {name[:110]}")


if __name__ == "__main__":
    main()
