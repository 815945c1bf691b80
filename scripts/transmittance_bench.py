#!/usr/bin/env python
"""Transmittance-estimator variance vs ray count.

Reference: src/graph/transmittance_bench.cpp — shoots N rays through a unit
cube medium, estimates transmittance by ratio tracking, and reports the
estimator mean/variance as N sweeps up.  Here the same sweep runs as one
batched ratio-tracking pass per N (each ray its own lane).

Usage: python scripts/transmittance_bench.py [--sigma 4.0] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigma", type=float, default=4.0,
                    help="sigma_t of the homogeneous unit cube")
    ap.add_argument("--counts", type=int, nargs="*",
                    default=[256, 1024, 4096, 16384, 65536])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from acceleratedvolrenderer_tpu.ops import dda, transmittance

    sig = args.sigma
    exact = float(np.exp(-sig))
    print(f"unit cube, sigma_t={sig}, exact T = {exact:.6f}")
    print(f"{'rays':>8} {'mean':>10} {'var':>12} {'stderr':>10} "
          f"{'rel_err':>9} {'time_s':>8}")
    for n in args.counts:
        med = dda.MediumArrays(
            density=jnp.ones((1, 1, 1)), majorant=jnp.ones((1, 1, 1)),
            w2m=jnp.eye(4), g=jnp.float32(0.0),
            sigma_a=jnp.full((4,), sig), sigma_s=jnp.zeros((4,)),
            Le=jnp.zeros((4,)))
        o = jnp.tile(jnp.asarray([[0.5, 0.5, -0.5]]), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        rng = dda.seed_stream(jnp.arange(n, dtype=jnp.uint32),
                              jnp.zeros((n,), jnp.uint32), salt=7)
        t0 = time.time()
        res = transmittance.ratio_track(
            med, o, d, jnp.full((n,), 1.5), rng,
            jnp.ones((n,), bool), maj_res=(1, 1, 1), homogeneous=True)
        jax.block_until_ready(res.T_ray)
        dt = time.time() - t0
        # MIS-weighted estimate (the SampleLd consumer divides by the
        # ratio trackers; for a pure-transmittance query T = T_ray / r_l)
        Tr = np.asarray(res.T_ray / res.r_l)[:, 0]
        mean = Tr.mean()
        var = Tr.var(ddof=1)
        stderr = np.sqrt(var / n)
        print(f"{n:>8d} {mean:>10.6f} {var:>12.3e} {stderr:>10.3e} "
              f"{abs(mean - exact) / exact:>9.2%} {dt:>8.3f}")


if __name__ == "__main__":
    main()
