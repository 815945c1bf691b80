"""Quick bench-knob sweep on the TPU (production spp=64 config).

Measures lane-count / retire-group combinations end-to-end via bench.py's
machinery (3 repeats, median) and prints one JSON line per config.
Used to re-decide the production knobs each round; the r4 sweep table
lives in docs/PROFILE_r04.md.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402

from acceleratedvolrenderer_tpu.parallel import render as render_mod  # noqa: E402
from acceleratedvolrenderer_tpu.scene import presets  # noqa: E402


def main():
    configs = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [
        {"n_lanes": 16384, "retire_groups": 32},
        {"n_lanes": 24576, "retire_groups": 32},
        {"n_lanes": 24576, "retire_groups": 48},
        {"n_lanes": 32768, "retire_groups": 64},
    ]
    width, height, spp = 1280, 720, 64
    scene = presets.cloud(width=width, height=height, spp=spp, max_depth=16)
    scene.max_march_steps = 4096
    film_shape = (3 * (height * width + 1),)
    rays = width * height * spp
    for cfg in configs:
        knobs = dict(k_substeps=cfg.get("k_substeps", 8),
                     stochastic_filter=True, accum_spp=True,
                     work_stride="auto",
                     retire_groups=cfg["retire_groups"],
                     n_lanes=cfg["n_lanes"])
        run, density, majorant = render_mod.make_regen_renderer(
            scene, spp=spp, **knobs)
        f = run(density, majorant, jnp.zeros(film_shape))
        jax.block_until_ready(f)
        dts = []
        for _ in range(3):
            t0 = time.time()
            f = run(density, majorant, jnp.zeros(film_shape))
            jax.block_until_ready(f)
            dts.append(time.time() - t0)
        dt = sorted(dts)[1]
        print(json.dumps({"cfg": cfg,
                          "mrays_per_s": round(rays / dt / 1e6, 3),
                          "reps": [round(d, 3) for d in dts]}), flush=True)


if __name__ == "__main__":
    main()
