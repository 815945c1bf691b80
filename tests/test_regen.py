"""Path-regeneration renderer: must reproduce the chunked wave driver's
estimates exactly (same per-(pixel,sample) RNG streams; only the film
accumulation order differs)."""
import numpy as np

from acceleratedvolrenderer_tpu.parallel import render as render_mod
from acceleratedvolrenderer_tpu.scene import presets


def _compare(scene, tol=2e-4):
    ref, _ = render_mod.render(scene)
    img, _ = render_mod.render_regen(scene, n_lanes=1024)
    assert np.all(np.isfinite(img))
    err = np.max(np.abs(img - ref)) / max(float(np.abs(ref).max()), 1e-6)
    assert err < tol, err
    return img


def test_regen_matches_chunked_fog_box():
    _compare(presets.fog_box(res=24, spp=4))


def test_regen_matches_chunked_cloud():
    sc = presets.cloud(width=32, height=24, spp=3, max_depth=8, grid_res=48)
    sc.max_march_steps = 3000
    _compare(sc)


def test_regen_matches_chunked_emissive():
    sc = presets.emissive_volume(res=24, spp=2)
    _compare(sc)


def test_regen_lane_count_invariance():
    """The estimate must not depend on the lane-batch width."""
    sc = presets.fog_box(res=16, spp=4)
    a, _ = render_mod.render_regen(sc, n_lanes=256)
    b, _ = render_mod.render_regen(sc, n_lanes=1024)
    assert np.allclose(a, b, atol=2e-5)


def test_accum_spp_matches_per_sample():
    """In-lane spp accumulation (accum_spp=True: a work item is a pixel,
    all spp samples run back-to-back banking rgb in registers) must
    reproduce the per-sample regen estimates to float-associativity — the
    (pixel, sample) film_sample streams are identical by construction."""
    sc = presets.cloud(width=32, height=24, spp=3, max_depth=8, grid_res=48)
    sc.max_march_steps = 3000
    a, _ = render_mod.render_regen(sc, n_lanes=512)
    b, _ = render_mod.render_regen(sc, n_lanes=512, accum_spp=True)
    assert np.all(np.isfinite(b))
    err = np.max(np.abs(b - a)) / max(float(np.abs(a).max()), 1e-6)
    assert err < 2e-5, err


def test_accum_spp_retire_groups():
    """accum_spp with grouped retirement (the production bench config) and
    a different lane count must agree with the plain regen estimate."""
    sc = presets.fog_box(res=24, spp=4)
    a, _ = render_mod.render_regen(sc, n_lanes=1024)
    b, _ = render_mod.render_regen(sc, n_lanes=256, accum_spp=True,
                                   retire_groups=4, work_stride="auto")
    err = np.max(np.abs(b - a)) / max(float(np.abs(a).max()), 1e-6)
    assert err < 2e-5, err


def test_event_groups_match():
    """Event-group round-robin (handle_events on a 1/E lane slice per
    iteration) must be estimate-identical: per-lane RNG streams advance
    only at that lane's own events."""
    sc = presets.cloud(width=32, height=24, spp=3, max_depth=8, grid_res=48)
    sc.max_march_steps = 3000
    a, _ = render_mod.render_regen(sc, n_lanes=512)
    b, _ = render_mod.render_regen(sc, n_lanes=512, accum_spp=True,
                                   retire_groups=4, event_groups=2,
                                   work_stride="auto")
    err = np.max(np.abs(b - a)) / max(float(np.abs(a).max()), 1e-6)
    assert err < 2e-5, err


def test_stochastic_filter_unbiased():
    """1-tap stochastic trilerp (ops.grid.stochastic_corner) must agree
    with the deterministic 8-tap render in expectation: every collision
    factor is linear in the density sample, so only variance changes."""
    sc = presets.cloud(width=32, height=24, spp=48, max_depth=8, grid_res=48)
    sc.max_march_steps = 3000
    det, _ = render_mod.render_regen(sc, n_lanes=1024)
    sto, _ = render_mod.render_regen(sc, n_lanes=1024,
                                     stochastic_filter=True)
    assert np.all(np.isfinite(sto))
    md, ms = float(det.mean()), float(sto.mean())
    # image means agree within MC noise (measured gap on TPU: +0.46% at
    # 64 spp, -0.74% at 256, -0.16% at 1024 -> converging, sign-flipping =
    # noise; ~2% sigma at this tiny 32x24/48spp config)
    assert abs(ms - md) / max(md, 1e-9) < 0.06, (md, ms)


def test_residual_shadow_unbiased():
    """Residual ratio tracking on shadow segments (residual_shadow=True,
    minorant control grid + residual-rate collisions) must agree with the
    plain tracker in expectation: the per-collision null weight keeps the
    full (majorant - density) numerator while the rate and its pdf shrink
    together, and the control term is exact.  Measured on TPU at the
    production config: mean gap 0.16% vs a 1.25% seed-to-seed noise
    floor (docs/PROFILE_r05.md)."""
    sc = presets.cloud(width=32, height=24, spp=48, max_depth=8, grid_res=48)
    sc.max_march_steps = 3000
    plain, _ = render_mod.render_regen(sc, n_lanes=1024,
                                       stochastic_filter=True)
    resid, _ = render_mod.render_regen(sc, n_lanes=1024,
                                       stochastic_filter=True,
                                       residual_shadow=True)
    assert np.all(np.isfinite(resid))
    mp, mr = float(plain.mean()), float(resid.mean())
    assert abs(mr - mp) / max(mp, 1e-9) < 0.06, (mp, mr)


def test_minorant_grid_bounds():
    """build_minorant_grid must lower-bound every trilerp evaluation in
    its cell (the residual weights (maj - rho)/(maj - ctrl) stay in
    [0, 1] only then), mirroring build_majorant_grid's upper bound."""
    from acceleratedvolrenderer_tpu.ops import grid as gridops

    rng = np.random.default_rng(3)
    dens = rng.random((24, 20, 28)).astype(np.float32)
    res = (4, 4, 4)
    maj = gridops.build_majorant_grid(dens, res)
    mino = gridops.build_minorant_grid(dens, res)
    assert np.all(mino <= maj)
    # random continuous samples: each trilerp value bounded by its cell's
    # minorant/majorant pair
    import jax.numpy as jnp

    p = rng.random((4096, 3)).astype(np.float32)
    vals = np.asarray(gridops.trilerp(jnp.asarray(dens), jnp.asarray(p)))
    cell = np.minimum((p * np.asarray(res)).astype(np.int64),
                      np.asarray(res) - 1)
    lo = mino[cell[:, 2], cell[:, 1], cell[:, 0]]
    hi = maj[cell[:, 2], cell[:, 1], cell[:, 0]]
    assert np.all(vals >= lo - 1e-5)
    assert np.all(vals <= hi + 1e-5)
