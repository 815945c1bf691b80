#!/usr/bin/env python
"""Two-process jax.distributed dryrun worker (VERDICT r4 #3).

Each of `nproc` processes owns 4 virtual CPU devices;
jax.distributed.initialize forms the global mesh over all 4*nproc
devices; the sharded production regen step runs across the process
boundary — the actual multi-host code path (DCN-style coordinator init,
cross-process film psum) that the single-process virtual mesh in
MULTICHIP_r*.json cannot exercise.  Reference anchor: the C++ renderer
has no multi-host story at all (SURVEY §2.4) — this is the TPU-native
jax.distributed replacement under its minimal real multi-process test.

Usage: distributed_worker.py PID NPROC PORT OUTDIR
Writes OUTDIR/film_PID.npy (the replicated film) and prints WORKER_OK.
"""
import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:
    pass
# Environment-capability failures (no multi-process init / cross-process
# CPU collectives in this jaxlib) print an explicit sentinel the test
# skips on; any OTHER crash must FAIL the test (its traceback inevitably
# contains this script's path, so the test must not pattern-match on
# generic words like "distributed").
try:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
except Exception as e:  # pragma: no cover - environment-dependent
    print(f"ENV_SKIP_DISTRIBUTED: initialize failed: {e!r}", flush=True)
    sys.exit(3)

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from acceleratedvolrenderer_tpu.parallel import mesh as mesh_mod  # noqa: E402
from acceleratedvolrenderer_tpu.scene import presets  # noqa: E402


def main():
    devs = jax.devices()
    assert len(devs) == 4 * nproc, (len(devs), nproc)
    mesh = Mesh(np.array(devs), ("rays",))
    scene = presets.sphere_medium(res=32, height=32, spp=2, max_depth=4)
    try:
        run, density, majorant = mesh_mod.make_sharded_regen_renderer(
            scene, mesh, n_lanes=128, spp=2, accum_spp=True)
        # replicate inputs explicitly over the GLOBAL mesh (multi-
        # controller: every process supplies its addressable shards)
        repl = NamedSharding(mesh, P())
        density = jax.device_put(np.asarray(density), repl)
        majorant = jax.device_put(np.asarray(majorant), repl)
        film = run(density, majorant)
        jax.block_until_ready(film)
    except Exception as e:  # pragma: no cover - environment-dependent
        # Skip-worthy ONLY for backend-capability signatures (the Gloo
        # cross-process CPU collective backend missing, or an op the
        # jaxlib build cannot lower).  Generic words like "collective"
        # must NOT match here — a real sharding regression's error text
        # often contains them and must FAIL the test.
        msg = repr(e)
        if "UNIMPLEMENTED" in msg or "Gloo" in msg or "gloo" in msg:
            print(f"ENV_SKIP_DISTRIBUTED: backend capability missing: "
                  f"{msg[:500]}", flush=True)
            sys.exit(3)
        raise
    film_np = np.asarray(film)       # fully-replicated output
    np.save(os.path.join(outdir, f"film_{pid}.npy"), film_np)
    print("WORKER_OK", pid, float(np.abs(film_np).sum()), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
