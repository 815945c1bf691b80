#!/usr/bin/env python
"""Benchmark: disney-cloud-720p (analog or real grid) on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "spp": S, "repeats": [...], "spread": F, "value_spp2": N, ...}

Baseline (BASELINE.md): the reference CPU renders disney-cloud 1280x720
@1spp in 157.28 s => 0.00586 Mrays/s (camera rays; path length >> 1).
vs_baseline = our Mrays/s / reference Mrays/s.

r4 workload note: the primary metric is measured at spp=64 (in-lane
spp accumulation makes retirement ~free per sample, and throughput keeps
rising with batch size: 13.7 / 15.6 / 16.6 / 17.1 Mrays/s at spp
8/16/32/64 — docs/PROFILE_r04.md), which measures steady-state
throughput at a production-like sample count.  `value_spp2` reports the
r1-r3 workload (spp=2, with its own optimal retire config) for
round-over-round continuity; both are the same per-ray metric,
Mrays/s/chip.

Timing (VERDICT r3 weak #1): `repeats` timed runs (default 5) with the
median as the headline value and max-min as `spread`, replacing the r3
best-of-2 that made round deltas unattributable.

--grid FILE renders a real density grid instead of the procedural analog:
.nvdb (NanoVDB, e.g. the WDAS cloud), .npy, or .npz[density] — the asset
leg of the ingestion pipeline (cmd/nanovdb2pbrt.cpp).
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def load_grid_density(path):
    import numpy as np

    if path.endswith(".nvdb"):
        from acceleratedvolrenderer_tpu.utils import nvdb

        g = nvdb.read_nvdb(path, "density")
        return np.asarray(g.data, np.float32)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".npz"):
        d = np.load(path)
        key = "density" if "density" in d else d.files[0]
        return d[key].astype(np.float32)
    raise SystemExit(f"--grid {path}: unsupported (nvdb/npy/npz)")


def _time_runs(run, density, majorant, film_shape, repeats):
    """Timed repeats with a plausibility floor: block_until_ready over the
    tunnel has (rarely) returned before execution completed (r3); a forced
    host readback is the unambiguous sync."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    film = None
    dts = []
    for _ in range(repeats):
        t0 = time.time()
        film = run(density, majorant, jnp.zeros(film_shape))
        jax.block_until_ready(film)
        dt_i = time.time() - t0
        if dt_i < 0.02:        # implausible for a full render loop
            t0 = time.time()
            film = run(density, majorant, jnp.zeros(film_shape))
            np.asarray(film)   # host readback: cannot return early
            dt_i = time.time() - t0
        dts.append(dt_i)
    return dts, film


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default=None,
                    help="real density grid (.nvdb/.npy/.npz) to render "
                         "instead of the procedural cloud analog")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--lanes", type=int, default=16384,
                    help="regen-renderer lane count (perf knob)")
    ap.add_argument("--retire-groups", type=int, default=32)
    ap.add_argument("--no-occupancy", action="store_true",
                    help="skip the instrumented occupancy pass")
    ap.add_argument("--no-spp2", action="store_true",
                    help="skip the spp=2 continuity measurement")
    ap.add_argument("--no-nvdb-leg", action="store_true",
                    help="skip the compressed-asset ingestion leg "
                         "(256^3 BLOSC .nvdb through the full pipeline)")
    ap.add_argument("--no-backward", action="store_true",
                    help="skip the production-scale gradient leg")
    ap.add_argument("--bw-spp", type=int, default=16)
    ap.add_argument("--bw-scale", type=int, default=1,
                    help="resolution divisor for the backward leg "
                         "(1 = full 720p; 2 = 640x360 quarter-res)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import presets

    width, height = 1280, 720
    bench_spp = args.spp

    scene = presets.cloud(width=width, height=height, spp=bench_spp,
                          max_depth=16)
    metric = "disney_cloud_720p_mrays_per_sec_per_chip"
    if args.grid:
        import dataclasses

        dens = load_grid_density(args.grid)
        scene.medium = dataclasses.replace(scene.medium, density=dens)
        metric = "wdas_cloud_720p_mrays_per_sec_per_chip"
    scene.max_march_steps = 4096
    # r4 production config: path regeneration + in-lane spp accumulation
    # (a work item is a pixel; the film splat fires once per pixel, so
    # high retire_groups shrink the per-iteration scatter without
    # retire-bounding — docs/PROFILE_r04.md has the sweep)
    knobs = dict(k_substeps=8, stochastic_filter=True, accum_spp=True,
                 work_stride="auto", retire_groups=args.retire_groups,
                 n_lanes=args.lanes)
    film_shape = (3 * (height * width + 1),)

    run, density, majorant = render_mod.make_regen_renderer(
        scene, spp=bench_spp, **knobs)
    film = run(density, majorant, jnp.zeros(film_shape))   # warmup/compile
    jax.block_until_ready(film)
    dts, film = _time_runs(run, density, majorant, film_shape, args.repeats)
    dts_sorted = sorted(dts)
    dt = dts_sorted[len(dts) // 2]

    img = (np.asarray(film).reshape(3, height * width + 1)[:, :height * width].T
           / float(bench_spp)).reshape(height, width, 3).astype(np.float32)
    rays = width * height * bench_spp
    mrays_per_s = rays / dt / 1e6

    ref_mrays = (1280 * 720 * 1) / 157.28 / 1e6  # BASELINE.md row 1
    out = {
        "metric": metric,
        "value": round(mrays_per_s, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_s / ref_mrays, 2),
        "spp": bench_spp,
        "repeats": [round(d, 4) for d in dts],
        "spread": round((max(dts) - min(dts)) / dt, 4),
        "best": round(rays / min(dts) / 1e6, 4),
    }

    if not args.no_spp2 and bench_spp != 2:
        # r1-r3 workload continuity: spp=2 with its own optimal retire
        # config (g32 would retire-bound the short workload)
        knobs2 = dict(knobs, retire_groups=4, n_lanes=8192)
        run2, density, majorant = render_mod.make_regen_renderer(
            scene, spp=2, **knobs2)
        f2 = run2(density, majorant, jnp.zeros(film_shape))
        jax.block_until_ready(f2)
        d2, _ = _time_runs(run2, density, majorant, film_shape, 3)
        out["value_spp2"] = round(
            width * height * 2 / sorted(d2)[len(d2) // 2] / 1e6, 4)

    if not args.no_nvdb_leg and not args.grid:
        # Compressed-asset ingestion leg (VERDICT r3 #3): the SAME 256^3
        # cloud, round-tripped through a BLOSC-compressed .nvdb (written
        # by utils/nvdb + the native LZ4 codec), loaded back through the
        # production reader, and rendered end-to-end on the chip — the
        # full `nanovdb2pbrt` ingestion path (cmd/nanovdb2pbrt.cpp:30-126,
        # media.cpp:488-500) at WDAS-export scale.
        from acceleratedvolrenderer_tpu.utils import nvdb
        os.makedirs("out", exist_ok=True)
        nvdb_path = "out/wdas_cloud_256_blosc.nvdb"
        dens0 = np.asarray(scene.medium.density, np.float32)
        t0 = time.time()
        nvdb.write_nvdb(
            nvdb_path,
            nvdb.NvdbGrid(
                name="density", data=dens0, index_min=(0, 0, 0),
                world_bbox=np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]),
                voxel_size=np.array([1.0 / s for s in dens0.shape[::-1]])),
            codec="blosc")
        t_write = time.time() - t0
        t0 = time.time()
        dens1 = np.asarray(nvdb.read_nvdb(nvdb_path, "density").data,
                           np.float32)
        t_read = time.time() - t0
        if dens1.shape != dens0.shape or not (dens1 == dens0).all():
            raise SystemExit("nvdb leg: round-trip mismatch")
        import dataclasses

        scene.medium = dataclasses.replace(scene.medium, density=dens1)
        run_g, density_g, majorant_g = render_mod.make_regen_renderer(
            scene, spp=bench_spp, **knobs)
        fg = run_g(density_g, majorant_g, jnp.zeros(film_shape))
        jax.block_until_ready(fg)
        dg, _ = _time_runs(run_g, density_g, majorant_g, film_shape, 3)
        mg = rays / sorted(dg)[len(dg) // 2] / 1e6
        out["wdas_cloud_720p"] = {
            "metric": "wdas_cloud_720p_mrays_per_sec_per_chip",
            "value": round(mg, 4), "unit": "Mrays/s",
            "vs_baseline": round(mg / ref_mrays, 2),
            "nvdb_bytes": os.path.getsize(nvdb_path),
            "grid_voxels": int(dens0.size),
            "io_write_s": round(t_write, 2), "io_read_s": round(t_read, 2),
        }

    if not args.no_backward and not args.grid:
        # production-scale BACKWARD pass (VERDICT r4 #1): d(mean film)/
        # d(256^3 density voxels) through the production regen program
        # (accum_spp, grouped retirement, Pallas march) — the while_loop
        # swapped for the two-level windowed-remat scan, the film replaced
        # by the loss-cotangent retire so checkpoints stay carry-sized.
        # Reported as rays/s of the differentiated workload (each ray's
        # forward AND backward sweep).
        from acceleratedvolrenderer_tpu.parallel import diff as diff_mod

        bw_w, bw_h = width // args.bw_scale, height // args.bw_scale
        bw_spp = args.bw_spp
        bw_scene = presets.cloud(width=bw_w, height=bw_h, spp=bw_spp,
                                 max_depth=16)
        bw_scene.max_march_steps = 4096
        # in-lane spp accumulation amortizes the backward pass exactly
        # like the forward (retirement ∝ 1/spp), and lane amortization
        # keeps improving with the workload: measured 0.71 Mrays/s-bwd at
        # 360p/spp4/8k-lanes → 1.10 at 360p/spp16 → 1.55 at FULL
        # 720p/spp16/16k/g32 (probe_backward.py sweeps)
        bw_lanes = 16384 if bw_spp >= 8 else 8192
        bw_groups = min(32, 2 * bw_spp)
        bw_knobs = dict(k_substeps=8, stochastic_filter=True,
                        accum_spp=True, retire_groups=bw_groups,
                        n_lanes=bw_lanes)
        run_b, dens_b, maj_b = render_mod.make_regen_renderer(
            bw_scene, spp=bw_spp, record_alive=True, work_stride="auto",
            **bw_knobs)
        _, hist = run_b(dens_b, maj_b,
                        jnp.zeros((3 * (bw_h * bw_w + 1),)))
        iters = int((np.asarray(hist) > 0).sum())
        bw_steps = int(iters * 1.12) + 16
        bw_window = max(int(np.sqrt(bw_steps)), 16)
        loss_fn, grad_fn = diff_mod.make_diff_regen_renderer(
            bw_scene, fixed_steps=bw_steps, n_lanes=bw_lanes, spp=bw_spp,
            accum_spp=True, retire_groups=bw_groups, k_substeps=8,
            stochastic_filter=True, remat_window=bw_window,
            work_stride="auto")
        dens = jnp.asarray(bw_scene.medium.density, jnp.float32)
        g = grad_fn(dens)
        jax.block_until_ready(g)
        gd = []
        for _ in range(3):
            t0 = time.time()
            g = grad_fn(dens)
            jax.block_until_ready(g)
            gd.append(time.time() - t0)
        bw_dt = sorted(gd)[len(gd) // 2]
        bw_rays = bw_w * bw_h * bw_spp
        out["backward"] = {
            "metric": "grad_density_mrays_per_sec_per_chip",
            "value": round(bw_rays / bw_dt / 1e6, 4), "unit": "Mrays/s",
            "grad_step_s": round(bw_dt, 3),
            "width": bw_w, "height": bw_h, "spp": bw_spp,
            "grid": list(np.asarray(dens).shape),
            "fixed_steps": bw_steps, "remat_window": bw_window,
            "grad_finite": bool(jnp.isfinite(g).all()),
            "grad_max": float(jnp.abs(g).max()),
        }

    if not args.no_occupancy:
        # separate instrumented pass: per-iteration alive-lane counts (the
        # record_alive histogram — VERDICT r1 weak #6: occupancy must be a
        # bench artifact, not just wall clock)
        run_h, density, majorant = render_mod.make_regen_renderer(
            scene, spp=bench_spp, record_alive=True, **knobs)
        film_h, hist = run_h(density, majorant, jnp.zeros(film_shape))
        jax.block_until_ready(hist)
        h = np.asarray(hist)
        iters = int((h > 0).sum())
        if iters:
            out["occupancy"] = round(float(h.sum()) / (iters * args.lanes), 4)
            out["mean_alive_lanes"] = round(float(h.sum()) / iters, 1)
            out["loop_iterations"] = iters

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
