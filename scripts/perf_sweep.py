#!/usr/bin/env python
"""Perf sweep for the regen bench config (r4): accum_spp x retire_groups x
lanes on the disney-cloud 720p analog.  One process, sequential configs,
3 timed reps each; prints one JSON line per config.

Usage: python scripts/perf_sweep.py [--reps 3] [--spp 2] [cfg names...]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("cfgs", nargs="*")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import presets

    W, H = 1280, 720
    spp = args.spp
    scene = presets.cloud(width=W, height=H, spp=spp, max_depth=16)
    scene.max_march_steps = 4096

    CFGS = {
        # r3 production config (control)
        "base_g2": dict(retire_groups=2, n_lanes=16384),
        # accum_spp ladder
        "acc_g2": dict(retire_groups=2, n_lanes=16384, accum_spp=True),
        "acc_g4": dict(retire_groups=4, n_lanes=16384, accum_spp=True),
        "acc_g8": dict(retire_groups=8, n_lanes=16384, accum_spp=True),
        # lane-count interaction
        "acc_g8_32k": dict(retire_groups=8, n_lanes=32768, accum_spp=True),
        "acc_g16_32k": dict(retire_groups=16, n_lanes=32768, accum_spp=True),
        "acc_g4_8k": dict(retire_groups=4, n_lanes=8192, accum_spp=True),
        "acc_g2_8k": dict(retire_groups=2, n_lanes=8192, accum_spp=True),
        "acc_g8_8k": dict(retire_groups=8, n_lanes=8192, accum_spp=True),
        "acc_g2_4k": dict(retire_groups=2, n_lanes=4096, accum_spp=True),
        "acc_g4_4k": dict(retire_groups=4, n_lanes=4096, accum_spp=True),
        "acc_g4_8k_k6": dict(retire_groups=4, n_lanes=8192, accum_spp=True,
                             k_substeps=6),
        "acc_g4_8k_k12": dict(retire_groups=4, n_lanes=8192, accum_spp=True,
                              k_substeps=12),
        "acc_g4_8k_s1": dict(retire_groups=4, n_lanes=8192, accum_spp=True,
                             work_stride=1),
        "acc_g16_8k": dict(retire_groups=16, n_lanes=8192, accum_spp=True),
        "acc_g16_16k": dict(retire_groups=16, n_lanes=16384, accum_spp=True),
        "acc_g32_16k": dict(retire_groups=32, n_lanes=16384, accum_spp=True),
        "acc_g64_16k": dict(retire_groups=64, n_lanes=16384, accum_spp=True),
        "acc_g16_e2": dict(retire_groups=16, n_lanes=16384, accum_spp=True,
                           event_groups=2),
        "acc_g16_e4": dict(retire_groups=16, n_lanes=16384, accum_spp=True,
                           event_groups=4),
        "acc_g8_e2": dict(retire_groups=8, n_lanes=16384, accum_spp=True,
                          event_groups=2),
        "acc_g8_16k": dict(retire_groups=8, n_lanes=16384, accum_spp=True),
        "acc_g8_8k_k6": dict(retire_groups=8, n_lanes=8192, accum_spp=True,
                             k_substeps=6),
    }
    names = args.cfgs or list(CFGS)

    ref_mrays = (1280 * 720 * 1) / 157.28 / 1e6
    for name in names:
        kn = CFGS[name]
        knobs = dict(spp=spp, k_substeps=8, stochastic_filter=True,
                     work_stride="auto")
        knobs.update(kn)
        run, density, majorant = render_mod.make_regen_renderer(scene, **knobs)
        film0 = jnp.zeros((3 * (H * W + 1),))
        film = run(density, majorant, film0)
        jax.block_until_ready(film)
        dts = []
        for _ in range(args.reps):
            t0 = time.time()
            film = run(density, majorant, jnp.zeros((3 * (H * W + 1),)))
            jax.block_until_ready(film)
            dt = time.time() - t0
            if dt < 0.02:
                t0 = time.time()
                film = run(density, majorant, jnp.zeros((3 * (H * W + 1),)))
                np.asarray(film)
                dt = time.time() - t0
            dts.append(dt)
        rays = W * H * spp
        med = sorted(dts)[len(dts) // 2]
        mean_img = float(np.asarray(film).reshape(3, -1)[:, :H * W].mean())
        print(json.dumps({
            "cfg": name, "knobs": {k: v for k, v in kn.items()},
            "mrays_med": round(rays / med / 1e6, 3),
            "mrays_best": round(rays / min(dts) / 1e6, 3),
            "dts": [round(d, 4) for d in dts],
            "img_mean": round(mean_img, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
