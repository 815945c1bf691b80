"""Scaling-efficiency harness (VERDICT r1 #8; BASELINE >=85% gate).

Runs the sharded regen renderer at 1/2/4/8 virtual devices at FIXED TOTAL
WORK and emits efficiency percentages to SCALING_r02.json.

Metric definition (virtual CPU mesh): total work is FIXED, so with zero
sharding overhead T(N) <= T(1) (the XLA CPU backend runs each virtual
device on its own host thread, so N >= 2 additionally engages the second
core — E(N) = 100 * T(1)/T(N) above 100% reflects that, not
super-scaling).  What the harness bounds is the sharding overhead that
real chips would also pay: collective inserts, regen queue fragmentation,
per-device padding, load imbalance.  The >=85% gate == "no mesh size
costs more than 15% extra wall time over the unsharded run"; ICI
transfer costs are validated separately by the driver's dryrun.

Also asserts cross-device-count agreement: images must match within
float-accumulation tolerance (3e-5, the test_multichip contract — RNG
streams key on global work items, not device layout; the film splat
order differs per layout, so bitwise equality is not expected).

Usage: python scripts/scaling.py [--out SCALING_r02.json] [--res 160]
"""
import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def run(res=160, spp=8, n_lanes=2048, repeats=3, device_counts=(1, 2, 4, 8)):
    from acceleratedvolrenderer_tpu.parallel import mesh as mesh_mod
    from acceleratedvolrenderer_tpu.scene import presets

    scene = presets.sphere_medium(res=res, height=res, spp=spp, max_depth=6)
    devs = jax.devices()
    results = {}
    imgs = {}
    for n in device_counts:
        m = Mesh(np.array(devs[:n]), ("rays",))
        run_fn, density, majorant = mesh_mod.make_sharded_regen_renderer(
            scene, m, n_lanes=max(n_lanes // n, 256), spp=spp)
        film = run_fn(density, majorant)          # compile + warm
        jax.block_until_ready(film)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            film = run_fn(density, majorant)
            jax.block_until_ready(film)
            best = min(best, time.time() - t0)
        H = W = res
        img = (np.asarray(film).reshape(3, H * W + 1)[:, :H * W].T
               / float(spp)).reshape(H, W, 3)
        imgs[n] = img
        results[n] = best
        print(f"devices={n} best={best:.3f}s "
              f"rays/s={H * W * spp / best:,.0f}", flush=True)

    t1 = results[device_counts[0]]
    out = {
        "scene": f"sphere_medium {res}x{res} spp={spp}",
        "metric": "fixed-total-work wall time, best of "
                  f"{repeats} (virtual CPU mesh; E(N)=T(1)/T(N) bounds "
                  "sharding overhead)",
        "times_s": {str(n): results[n] for n in device_counts},
        "efficiency_pct": {str(n): 100.0 * t1 / results[n]
                           for n in device_counts},
        "sharding_overhead_pct": {
            str(n): max(0.0, 100.0 * (results[n] - t1) / t1)
            for n in device_counts},
        "images_agree_3e5": all(
            bool(np.allclose(imgs[device_counts[0]], imgs[n], atol=3e-5))
            for n in device_counts[1:]),
    }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r02.json")
    ap.add_argument("--res", type=int, default=160)
    ap.add_argument("--spp", type=int, default=8)
    args = ap.parse_args(argv)
    out = run(res=args.res, spp=args.spp)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    eff8 = out["efficiency_pct"].get("8")
    if eff8 is not None and eff8 < 85.0:
        print(f"WARNING: 8-device efficiency {eff8:.1f}% below the 85% gate")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
