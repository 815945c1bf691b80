"""Scaling-efficiency gate (VERDICT r1 #8; BASELINE >=85%).

Small-scene version of scripts/scaling.py: fixed total work across
1/2/4/8 virtual devices must show no significant sharding overhead
(wall-clock T(N) not more than ~15% above T(1); on this 2-core host T(N)
is normally BELOW T(1) because virtual devices engage the second core)
and per-mesh images must agree within the float-accumulation tolerance.
"""
import numpy as np
import pytest


def test_sharding_overhead_and_agreement():
    import jax
    from jax.sharding import Mesh

    from acceleratedvolrenderer_tpu.parallel import mesh as mesh_mod
    from acceleratedvolrenderer_tpu.scene import presets

    scene = presets.sphere_medium(res=64, height=64, spp=4, max_depth=4)
    devs = jax.devices()
    import time

    times, imgs = {}, {}
    for n in (1, 8):
        m = Mesh(np.array(devs[:n]), ("rays",))
        run_fn, density, majorant = mesh_mod.make_sharded_regen_renderer(
            scene, m, n_lanes=max(1024 // n, 128), spp=4)
        film = run_fn(density, majorant)
        jax.block_until_ready(film)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            film = run_fn(density, majorant)
            jax.block_until_ready(film)
            best = min(best, time.time() - t0)
        times[n] = best
        H = W = 64
        imgs[n] = (np.asarray(film).reshape(3, H * W + 1)[:, :H * W].T
                   / 4.0).reshape(H, W, 3)

    # same image regardless of mesh layout (RNG keys on global work items)
    np.testing.assert_allclose(imgs[8], imgs[1], atol=3e-5)
    # sharding overhead bound: the >=85% efficiency gate allows T(8) at
    # most ~1.18x T(1); generous +25% here for host-timing jitter in CI
    assert times[8] <= times[1] * 1.25, times
