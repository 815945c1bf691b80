"""Checkpoint/resume: bitwise-exact film resumption.

The reference has no render checkpointing (SURVEY.md §5); here it is a
first-class subsystem (parallel/checkpoint.py): the film accumulator plus
next-sample-index round-trips through an npz, and the counter-based RNG
keys each wave by sample index, so an interrupted render resumed from a
checkpoint produces THE SAME final image bit for bit.
"""
import os

import numpy as np
import pytest

from acceleratedvolrenderer_tpu.parallel import checkpoint as ckpt
from acceleratedvolrenderer_tpu.parallel import render as render_mod
from acceleratedvolrenderer_tpu.scene import presets


@pytest.fixture(scope="module")
def scene():
    return presets.fog_box(res=24, spp=8)


def test_resume_bitwise_equal(tmp_path, scene):
    path = str(tmp_path / "ck.npz")

    # uninterrupted reference render
    img_ref, _ = render_mod.render(scene)

    # interrupted: run with checkpoint_every=4 but stop after the first
    # checkpoint lands (simulating a kill by capping spp at 4 with the
    # checkpoint left on disk)
    ckpt.render_with_checkpoints(scene, spp=5, checkpoint_path=path,
                                 checkpoint_every=4)
    # spp=5 completes and deletes its checkpoint; recreate a mid-way one
    # by saving after 4 waves manually
    from acceleratedvolrenderer_tpu.models.film import Film
    import jax.numpy as jnp

    render_wave, density, majorant = render_mod.make_wave_renderer(scene)
    film = Film.create(scene.height, scene.width)
    for s in range(4):
        film = render_wave(film, density, majorant, jnp.uint32(s))
    ckpt.save(path, film, 4, {"spp_target": scene.spp})
    assert os.path.exists(path)

    # resume to full spp
    img_res, stats = ckpt.render_with_checkpoints(
        scene, checkpoint_path=path)
    assert stats["resumed_from"] == 4
    np.testing.assert_array_equal(np.asarray(img_res), np.asarray(img_ref))
    # completion removes the checkpoint
    assert not os.path.exists(path)


def test_cli_kill_and_resume(tmp_path):
    """True kill-and-resume (VERDICT r3 #7): drive `cli/pbrt.py
    --checkpoint` as a subprocess, SIGKILL it mid-render once the first
    checkpoint lands, re-run the identical command, and assert the
    resumed EXR is bitwise-equal to an uninterrupted run."""
    import signal
    import subprocess
    import sys
    import time

    from acceleratedvolrenderer_tpu.utils.image import read_exr

    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache_cpu",
               JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES="none")
    env.pop("XLA_FLAGS", None)   # single-device CPU is fine here

    def cmd(out, ck):
        return [sys.executable, "-m", "acceleratedvolrenderer_tpu.cli.pbrt",
                "preset:fog_box", "--res", "24x24", "--spp", "16", "--cpu",
                "--checkpoint", ck, "--checkpoint-every", "1",
                "-o", out]

    ref = str(tmp_path / "ref.exr")
    subprocess.run(cmd(ref, str(tmp_path / "ck_ref.npz")), env=env,
                   check=True, timeout=600, capture_output=True)

    out = str(tmp_path / "resumed.exr")
    ck = str(tmp_path / "ck.npz")
    for attempt in range(3):
        p = subprocess.Popen(cmd(out, ck), env=env,
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
        try:
            # kill the instant the first checkpoint appears (saved after
            # every wave; waves 2..15 remain, so the window is wide)
            deadline = time.time() + 600
            while time.time() < deadline and p.poll() is None:
                if os.path.exists(ck):
                    break
                time.sleep(0.02)
            killed_midway = p.poll() is None and not os.path.exists(out)
            if p.poll() is None:
                p.send_signal(signal.SIGKILL)
            p.wait(timeout=60)
        finally:
            if p.poll() is None:
                p.kill()
        if killed_midway and os.path.exists(ck):
            break
        # raced to completion: scrub and retry
        for f in (out, ck):
            if os.path.exists(f):
                os.remove(f)
    else:
        pytest.skip("render completed before the kill landed (3 tries)")

    assert not os.path.exists(out)
    # resume: identical command picks the checkpoint up and finishes
    subprocess.run(cmd(out, ck), env=env, check=True, timeout=600,
                   capture_output=True)
    assert not os.path.exists(ck)   # completion removes it

    img_ref, _, _ = read_exr(ref)
    img_res, _, _ = read_exr(out)
    np.testing.assert_array_equal(np.asarray(img_res), np.asarray(img_ref))


def test_save_load_roundtrip(tmp_path):
    from acceleratedvolrenderer_tpu.models.film import Film
    import jax.numpy as jnp

    film = Film(jnp.arange(48, dtype=jnp.float32).reshape(4, 4, 3),
                jnp.full((4, 4), 2.0))
    p = str(tmp_path / "f.npz")
    ckpt.save(p, film, 7, {"spp_target": 16})
    f2, nxt, meta = ckpt.load(p)
    assert nxt == 7
    assert int(meta["spp_target"]) == 16
    np.testing.assert_array_equal(np.asarray(f2.rgb_sum),
                                  np.asarray(film.rgb_sum))
    np.testing.assert_array_equal(np.asarray(f2.weight_sum),
                                  np.asarray(film.weight_sum))
