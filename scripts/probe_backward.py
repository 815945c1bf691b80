#!/usr/bin/env python
"""Probe: production-scale backward pass on the real chip.

Step 1: instrumented forward at the backward config -> iteration count.
Step 2: build the windowed-remat diff renderer with fixed_steps sized
        from step 1, compile, time grad steps, check FD on one voxel.

Usage: python scripts/probe_backward.py [--width 640 --height 360
       --spp 4 --lanes 8192 --groups 8 --window 64] [--fd]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--lanes", type=int, default=8192)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--window", type=int, default=0, help="0 = sqrt(S)")
    ap.add_argument("--steps", type=int, default=0,
                    help="0 = measure via instrumented forward")
    ap.add_argument("--fd", action="store_true",
                    help="check one-voxel finite difference")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from acceleratedvolrenderer_tpu.parallel import diff as diff_mod
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import presets

    scene = presets.cloud(width=args.width, height=args.height, spp=args.spp,
                          max_depth=16)
    scene.max_march_steps = 4096
    knobs = dict(k_substeps=8, stochastic_filter=True, accum_spp=True,
                 retire_groups=args.groups, n_lanes=args.lanes)

    steps = args.steps
    if not steps:
        run_h, density, majorant = render_mod.make_regen_renderer(
            scene, spp=args.spp, record_alive=True, work_stride="auto",
            **knobs)
        film_shape = (3 * (args.height * args.width + 1),)
        t0 = time.time()
        film_h, hist = run_h(density, majorant, jnp.zeros(film_shape))
        jax.block_until_ready(hist)
        h = np.asarray(hist)
        iters = int((h > 0).sum())
        print(json.dumps({"stage": "forward_probe", "iters": iters,
                          "wall_s": round(time.time() - t0, 2),
                          "occupancy": round(float(h.sum())
                                             / max(iters * args.lanes, 1), 4)}),
              flush=True)
        steps = int(iters * 1.12) + 16

    window = args.window or max(int(np.sqrt(steps)), 16)
    print(json.dumps({"stage": "config", "fixed_steps": steps,
                      "remat_window": window}), flush=True)

    loss_fn, grad_fn = diff_mod.make_diff_regen_renderer(
        scene, fixed_steps=steps, n_lanes=args.lanes, spp=args.spp,
        accum_spp=True, retire_groups=args.groups, k_substeps=8,
        stochastic_filter=True, remat_window=window, work_stride="auto")
    dens = jnp.asarray(scene.medium.density, jnp.float32)

    # scan-forward loss timing (the honest forward/backward cost ratio:
    # same fixed-steps program, no AD)
    lv = loss_fn(dens)
    jax.block_until_ready(lv)
    lts = []
    for _ in range(args.repeats):
        t0 = time.time()
        lv = loss_fn(dens)
        jax.block_until_ready(lv)
        lts.append(time.time() - t0)
    print(json.dumps({"stage": "loss_timed",
                      "repeats": [round(d, 3) for d in lts],
                      "loss": float(lv)}), flush=True)

    t0 = time.time()
    g = grad_fn(dens)
    jax.block_until_ready(g)
    t_compile_run = time.time() - t0
    print(json.dumps({"stage": "grad_first", "wall_s": round(t_compile_run, 1),
                      "finite": bool(jnp.isfinite(g).all()),
                      "gmax": float(jnp.abs(g).max())}), flush=True)

    dts = []
    for _ in range(args.repeats):
        t0 = time.time()
        g = grad_fn(dens)
        jax.block_until_ready(g)
        dts.append(time.time() - t0)
    rays = args.width * args.height * args.spp
    dt = sorted(dts)[len(dts) // 2]
    out = {"stage": "grad_timed", "repeats": [round(d, 3) for d in dts],
           "grad_step_s": round(dt, 3),
           "backward_mrays_per_s": round(rays / dt / 1e6, 3)}

    if args.fd:
        gnp = np.asarray(g)
        fi = int(np.argmax(np.abs(gnp)))
        iz, iy, ix = np.unravel_index(fi, gnp.shape)
        eps = 1e-2
        e = np.zeros_like(gnp)
        e[iz, iy, ix] = eps
        lp = float(loss_fn(dens + jnp.asarray(e)))
        lm = float(loss_fn(dens - jnp.asarray(e)))
        fd = (lp - lm) / (2 * eps)
        out["fd_check"] = {"voxel": [int(iz), int(iy), int(ix)],
                           "fd": fd, "ad": float(gnp[iz, iy, ix])}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
