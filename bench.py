#!/usr/bin/env python
"""Benchmark: disney-cloud-720p analog on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): the reference CPU renders disney-cloud 1280x720
@1spp in 157.28 s => 0.00586 Mrays/s (camera rays; path length >> 1).
vs_baseline = our Mrays/s / reference Mrays/s.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import presets

    width, height = 1280, 720
    bench_spp = 2

    import jax.numpy as jnp

    scene = presets.cloud(width=width, height=height, spp=bench_spp, max_depth=16)
    scene.max_march_steps = 4096
    # path-regeneration renderer: one fused kernel per frame x spp batch;
    # stochastic filtering = 1-tap unbiased trilerp (2x on the 256^3 grid)
    run, density, majorant = render_mod.make_regen_renderer(
        scene, spp=bench_spp, k_substeps=8, stochastic_filter=True,
        retire_groups=2)

    film0 = jnp.zeros((3 * (height * width + 1),))
    # warmup / compile
    film = run(density, majorant, film0)
    jax.block_until_ready(film)

    t0 = time.time()
    film = run(density, majorant, jnp.zeros((3 * (height * width + 1),)))
    jax.block_until_ready(film)
    dt = time.time() - t0

    img = (np.asarray(film).reshape(3, height * width + 1)[:, :height * width].T
           / float(bench_spp)).reshape(height, width, 3).astype(np.float32)
    rays = width * height * bench_spp
    mrays_per_s = rays / dt / 1e6

    ref_mrays = (1280 * 720 * 1) / 157.28 / 1e6  # BASELINE.md row 1
    out = {
        "metric": "disney_cloud_720p_mrays_per_sec_per_chip",
        "value": round(mrays_per_s, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_s / ref_mrays, 2),
    }
    print(json.dumps(out))

    # side artifacts for eyeballing (not part of the metric line)
    try:
        from acceleratedvolrenderer_tpu.models.film import write_film

        os.makedirs("out", exist_ok=True)
        write_film("out/bench_cloud.exr", img, render_time=dt, spp=bench_spp)
    except Exception:
        pass


if __name__ == "__main__":
    main()
