"""Graph precompute CLI — the `graph_maker` equivalent.

Reference: src/pbrt/cmd/graph_maker.cpp — parse --config/--node-radius/
--quiet (:37-61), per-scene JSON config auto-derivation (:66-79), scene
parse + MediumData + light dir from the DistantLight (:110-129),
FreeGraphBuilder.BuildGraph (:135-136), LightingCalculator light vector +
transport matrix, per-bounces ComputeFinalLight (:167-180), and
WriteToDisk("<config>_d<depth>.txt") + stats JSON (:138-162, :194-197).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="avrt-graph-maker",
        description="Precompute the graph radiance cache for a volumetric scene",
    )
    ap.add_argument("scene", help=".pbrt scene file or preset:sphere / preset:cloud")
    ap.add_argument("--config", default=None, help="JSON config (util.h:728 schema)")
    ap.add_argument("--node-radius", type=float, default=None,
                    help="override radius modifier (CLI precedence, graph_maker.cpp:55)")
    ap.add_argument("--bounces", type=int, nargs="*", default=None,
                    help="write one graph per bounce count (default: config value)")
    ap.add_argument("--out", default=None, help="output basename")
    ap.add_argument("--format", choices=["txt", "npz", "both"], default="both")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ..graph.builder import FreeGraphBuilder
    from ..graph.config import GraphConfig
    from ..graph.lighting import LightingCalculator, compute_final_light, light_vector
    from ..models import lights as lm

    # scene
    if args.scene.startswith("preset:"):
        from ..scene import presets

        scene = {"sphere": presets.sphere_medium, "cloud": presets.cloud}[
            args.scene.split(":", 1)[1]
        ]()
        base = args.scene.split(":", 1)[1]
    else:
        from ..scene.parser import load_scene

        scene = load_scene(args.scene)
        base = os.path.splitext(os.path.basename(args.scene))[0]

    if scene.medium is None:
        ap.error("scene has no medium")
    distant = [lt for lt in scene.lights if isinstance(lt, lm.DistantLight)]
    if not distant:
        ap.error("graph precompute needs a distant light (graph_maker.cpp:129)")
    light_dir = distant[0].direction

    # config: explicit > per-scene json > defaults (graph_maker.cpp:66-79)
    cfg_path = args.config
    if cfg_path is None and not args.scene.startswith("preset:"):
        auto = os.path.splitext(args.scene)[0] + ".json"
        if os.path.exists(auto):
            cfg_path = auto
    cfg = GraphConfig.from_json(cfg_path) if cfg_path else GraphConfig()
    if args.node_radius is not None:
        cfg.builder.radius_modifier = args.node_radius

    t0 = time.time()
    builder = FreeGraphBuilder(scene.medium, light_dir, cfg.builder, seed=scene.seed)
    graph = builder.build()
    t_build = time.time() - t0
    if not args.quiet:
        print(f"graph built: {graph.n_vertices} vertices, {graph.n_edges} edges "
              f"({t_build:.1f}s)", file=sys.stderr)

    t0 = time.time()
    L0 = light_vector(graph, scene.medium, light_dir, cfg.lighting.light_rays,
                      seed=scene.seed)
    t_light = time.time() - t0

    bounces_list = args.bounces if args.bounces else [cfg.lighting.bounces]
    out_base = args.out or base
    written = []
    for b in bounces_list:
        graph.light_scalar = compute_final_light(graph, L0, b)
        stem = f"{out_base}_d{b}"
        if args.format in ("txt", "both"):
            graph.write_text(stem + ".txt")
            written.append(stem + ".txt")
        if args.format in ("npz", "both"):
            graph.write_npz(stem + ".npz")
            written.append(stem + ".npz")

    stats = {
        **graph.stats(),
        "build_seconds": round(t_build, 2),
        "lighting_seconds": round(t_light, 2),
        "node_radius": graph.vertex_radius,
        "files": written,
    }
    with open(out_base + "_stats.json", "w") as f:
        json.dump(stats, f, indent=2)
    if not args.quiet:
        print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
