#!/usr/bin/env python
"""Graph-precompute scale benchmark (VERDICT r4 #6): the acceleration
layer gets a performance identity the way the renderer has one.

Builds a production-scale FreeGraph on the cloud medium (on-chip scatter
-path tracing -> native grid-hash radius merge -> sparse reinforcement ->
lighting power iteration) and reports wall time, vertex/edge counts and
rates.  Reference anchors: free_graph_builder.cpp:143-214 (build loop),
graph_maker.cpp (driver); the reference builds these graphs on a CPU
thread pool — BASELINE.md has no published build-time number, so the
artifact records absolute rates.

Usage: python scripts/graph_bench.py [--out GRAPH_BENCH_r05.json]
       [--target 50000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="GRAPH_BENCH_r05.json")
    ap.add_argument("--target", type=int, default=50000)
    ap.add_argument("--grid-res", type=int, default=128)
    args = ap.parse_args()

    from acceleratedvolrenderer_tpu.graph.builder import FreeGraphBuilder
    from acceleratedvolrenderer_tpu.graph.config import GraphConfig
    from acceleratedvolrenderer_tpu.graph.lighting import LightingCalculator
    from acceleratedvolrenderer_tpu.scene import presets

    scene = presets.cloud(width=64, height=36, spp=1,
                          grid_res=args.grid_res)
    light_dir = np.asarray([0.0, -1.0, 0.15])
    light_dir = light_dir / np.linalg.norm(light_dir)

    cfg = GraphConfig()
    # production-scale knobs: dense entry grid + small merge radius so
    # the vertex count clears the target (the reference's graph_maker
    # configs land in the 10^4-10^5 vertex range, files/*.json)
    cfg.builder.dimension_steps = 96
    cfg.builder.iterations_per_step = 4
    cfg.builder.radius_modifier = 1.2
    cfg.builder.max_depth = 16

    t0 = time.time()
    builder = FreeGraphBuilder(scene.medium, light_dir, cfg.builder, seed=7)
    graph = builder.build()
    t_build = time.time() - t0
    n_v = int(graph.positions.shape[0])
    n_e = int(graph.edges.shape[0]) if graph.edges is not None else 0

    t0 = time.time()
    calc = LightingCalculator(graph, scene.medium, light_dir, cfg.lighting,
                              seed=11)
    graph = calc.run()
    t_light = time.time() - t0

    out = {
        "metric": "free_graph_build",
        "grid": [args.grid_res] * 3,
        "config": {"dimension_steps": cfg.builder.dimension_steps,
                   "iterations_per_step": cfg.builder.iterations_per_step,
                   "radius_modifier": cfg.builder.radius_modifier,
                   "max_depth": cfg.builder.max_depth},
        "vertices": n_v,
        "edges": n_e,
        "build_s": round(t_build, 2),
        "vertices_per_s": round(n_v / t_build, 1),
        "edges_per_s": round(n_e / t_build, 1),
        "lighting_s": round(t_light, 2),
        "total_s": round(t_build + t_light, 2),
        "target_met": bool(n_v >= args.target),
    }

    # second leg: a reference-typical merge radius (graph_maker configs
    # land in the 10^4-10^5 vertex range) for a rate at that scale
    cfg2 = GraphConfig()
    cfg2.builder.dimension_steps = 64
    cfg2.builder.iterations_per_step = 2
    cfg2.builder.radius_modifier = 4.0
    cfg2.builder.max_depth = 16
    t0 = time.time()
    g2 = FreeGraphBuilder(scene.medium, light_dir, cfg2.builder,
                          seed=7).build()
    t2 = time.time() - t0
    out["reference_scale"] = {
        "config": {"dimension_steps": 64, "iterations_per_step": 2,
                   "radius_modifier": 4.0, "max_depth": 16},
        "vertices": int(g2.positions.shape[0]),
        "edges": int(g2.edges.shape[0]) if g2.edges is not None else 0,
        "build_s": round(t2, 2),
        "vertices_per_s": round(g2.positions.shape[0] / t2, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0 if n_v >= args.target else 1


if __name__ == "__main__":
    sys.exit(main())
