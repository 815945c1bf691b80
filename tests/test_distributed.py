"""Real multi-process jax.distributed dryrun (VERDICT r4 #3).

Launches TWO separate Python processes (4 virtual CPU devices each) that
form one 8-device mesh via jax.distributed.initialize and run the sharded
production regen step across the process boundary — exercising the actual
multi-host code path (coordinator handshake, cross-process film psum)
that the single-process virtual mesh cannot.  The films must match the
single-process 8-device render (RNG streams key on global (pixel,
sample), so only float add order may differ).

Skips, with the reason recorded, if the environment forbids multi-process
JAX (no cross-process CPU collectives in this jaxlib, port restrictions).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_matches_single(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_PLATFORM_NAME"):
        env.pop(k, None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed workers timed out (environment-bound)")
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        # Skip ONLY on the worker's explicit capability sentinel — any
        # crash traceback necessarily contains the worker script's path,
        # so matching generic words ("distributed", "initialize") here
        # would convert every real regression into a silent skip.
        if "ENV_SKIP_DISTRIBUTED" in joined:
            pytest.skip(
                "multi-process JAX unavailable in this environment:\n"
                + joined[-2000:])
        raise AssertionError("worker failed:\n" + joined[-4000:])
    films = [np.load(tmp_path / f"film_{i}.npy") for i in range(2)]
    np.testing.assert_array_equal(films[0], films[1])

    # single-process reference on the in-process 8-device mesh
    import jax
    from jax.sharding import Mesh

    from acceleratedvolrenderer_tpu.parallel import mesh as mesh_mod
    from acceleratedvolrenderer_tpu.scene import presets

    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    scene = presets.sphere_medium(res=32, height=32, spp=2, max_depth=4)
    run, density, majorant = mesh_mod.make_sharded_regen_renderer(
        scene, mesh, n_lanes=128, spp=2, accum_spp=True)
    ref = np.asarray(run(density, majorant))
    np.testing.assert_allclose(films[0], ref, atol=3e-5)
