#!/usr/bin/env python
"""Graph-precompute parameter sweep on the sphere scene.

Reference: src/graph/sphere_bench.cpp — sweeps dimensionSteps x
iterationsPerStep x radiusModifier over the spherical-medium scene and
reports the average cache light value + precompute runtime per config.
(The reference binary is bit-rotted — it references removed APIs and
hard-codes author paths; this is the working equivalent.)

Usage: python scripts/sphere_bench.py [--cpu] [--quick]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, nargs="*", default=None)
    ap.add_argument("--iters", type=int, nargs="*", default=None)
    ap.add_argument("--radius-mods", type=float, nargs="*", default=None)
    ap.add_argument("--bounces", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np

    from acceleratedvolrenderer_tpu.graph.builder import FreeGraphBuilder
    from acceleratedvolrenderer_tpu.graph.config import (
        GraphBuilderConfig, LightingCalculatorConfig)
    from acceleratedvolrenderer_tpu.graph.lighting import LightingCalculator
    from acceleratedvolrenderer_tpu.scene import presets

    steps = args.steps or ([16, 32] if args.quick else [16, 32, 64])
    iters = args.iters or ([2] if args.quick else [2, 4])
    mods = args.radius_mods or ([1.0] if args.quick else [0.5, 1.0, 2.0])

    scene = presets.sphere_medium()
    light = scene.lights[0]
    light_dir = np.asarray(light.direction, np.float32)

    print(f"{'steps':>6} {'iters':>6} {'rmod':>6} {'verts':>8} {'edges':>9} "
          f"{'avg_light':>10} {'build_s':>8} {'light_s':>8}")
    for ds, it, rm in itertools.product(steps, iters, mods):
        bcfg = GraphBuilderConfig(dimension_steps=ds, iterations_per_step=it,
                                  radius_modifier=rm)
        t0 = time.time()
        g = FreeGraphBuilder(scene.medium, light_dir, bcfg, seed=1).build()
        t_build = time.time() - t0
        t0 = time.time()
        lcfg = LightingCalculatorConfig()
        g = LightingCalculator(g, scene.medium, light_dir, lcfg,
                               seed=1).run()
        t_light = time.time() - t0
        avg = float(np.mean(g.light_scalar)) if g.n_vertices else 0.0
        print(f"{ds:>6d} {it:>6d} {rm:>6.2f} {g.n_vertices:>8d} "
              f"{g.n_edges:>9d} {avg:>10.5f} {t_build:>8.2f} {t_light:>8.2f}",
              flush=True)


if __name__ == "__main__":
    main()
