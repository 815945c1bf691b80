#!/usr/bin/env python
"""Sweep the regen-renderer perf knobs on the real chip.

Usage: python scripts/sweep_regen.py [--quick]
Prints one line per config: knobs + Mrays/s (steady-state, best of 2).
"""
import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--lanes", type=int, nargs="*", default=None)
    ap.add_argument("--ksub", type=int, nargs="*", default=None)
    ap.add_argument("--groups", type=int, nargs="*", default=None)
    ap.add_argument("--majres", type=int, nargs="*", default=None)
    ap.add_argument("--rounds", type=int, nargs="*", default=None)
    ap.add_argument("--spp", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import presets

    W, H = (640, 360) if args.quick else (1280, 720)
    spp = args.spp

    lanes_opts = args.lanes or [4096, 8192, 16384]
    ksub_opts = args.ksub or [4, 8, 16]
    group_opts = args.groups or [2]
    maj_opts = args.majres or [16]
    round_opts = args.rounds or [1]

    for mr, n_lanes, ksub, groups, rounds in itertools.product(
            maj_opts, lanes_opts, ksub_opts, group_opts, round_opts):
        import dataclasses

        scene = presets.cloud(width=W, height=H, spp=spp, max_depth=16)
        scene.max_march_steps = 4096
        if scene.medium.majorant_res != (mr, mr, mr):
            scene.medium = dataclasses.replace(
                scene.medium, majorant_res=(mr, mr, mr))
        run, density, majorant = render_mod.make_regen_renderer(
            scene, spp=spp, n_lanes=n_lanes, k_substeps=ksub,
            stochastic_filter=True, retire_groups=groups,
            sub_rounds=rounds)
        film0 = jnp.zeros((3 * (H * W + 1),))
        t0 = time.time()
        film = run(density, majorant, film0)
        jax.block_until_ready(film)
        compile_and_first = time.time() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            film = run(density, majorant, jnp.zeros((3 * (H * W + 1),)))
            jax.block_until_ready(film)
            best = min(best, time.time() - t0)
        mrays = W * H * spp / best / 1e6
        print(f"maj={mr:3d} lanes={n_lanes:6d} ksub={ksub:3d} "
              f"groups={groups} rounds={rounds} -> {mrays:7.3f} Mrays/s "
              f"(steady {best:.3f}s, first {compile_and_first:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
