"""RealisticCamera lens tracing (cameras.h:466)."""
import pytest
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.models.cameras import (RealisticCamera,
                                                       SIMPLE_LENS,
                                                       load_lens_file)
from acceleratedvolrenderer_tpu.utils import vecmath as vm

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 #9 test tiering)


def _cam(**kw):
    return RealisticCamera(
        c2w=vm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)),
        elements=SIMPLE_LENS, width=32, height=32,
        rear_offset=0.045, **kw)


def test_center_ray_goes_forward():
    cam = _cam()
    pix = jnp.asarray([[16, 16]], jnp.int32)
    o, d = cam.generate_rays(pix, jnp.full((1, 2), 0.5),
                             jnp.full((1, 2), 0.5))
    d = np.asarray(d)[0]
    assert d[2] > 0.9       # roughly along +z after the lens stack
    assert np.isfinite(np.asarray(o)).all()


def test_aperture_vignettes_corners():
    """Rays entering at extreme film corners with off-axis lens samples
    vignette more often than center rays."""
    cam = _cam()
    n = 256
    rng = np.random.default_rng(0)
    u_lens = jnp.asarray(rng.random((n, 2)), jnp.float32)
    u_film = jnp.full((n, 2), 0.5)
    center = jnp.tile(jnp.asarray([[16, 16]], jnp.int32), (n, 1))
    corner = jnp.tile(jnp.asarray([[0, 0]], jnp.int32), (n, 1))
    o_c, d_c = cam.generate_rays(center, u_film, u_lens)
    o_k, d_k = cam.generate_rays(corner, u_film, u_lens)

    def frac_valid(o):
        return (np.asarray(o)[:, 0] < 1e6).mean()   # 1e8 = sentinel origin

    assert frac_valid(o_c) >= frac_valid(o_k)
    assert frac_valid(o_c) > 0.3


def test_rays_focus():
    """Rays from one film point through different lens samples converge
    near a common focal point (the lens actually focuses)."""
    cam = _cam()
    n = 64
    rng = np.random.default_rng(1)
    u_lens = jnp.asarray(0.25 + 0.5 * rng.random((n, 2)), jnp.float32)
    pix = jnp.tile(jnp.asarray([[16, 16]], jnp.int32), (n, 1))
    o, d = cam.generate_rays(pix, jnp.full((n, 2), 0.5), u_lens)
    o = np.asarray(o); d = np.asarray(d)
    ok = np.abs(d[:, 2] - 1.0) > 1e-9
    ok = np.isfinite(o[:, 0]) & (np.abs(o[:, 0]) < 1e6)
    o, d = o[ok], d[ok]
    assert len(o) > 8
    # find per-pair closest-approach z: rays should spread slowly
    # (beam waist): compare lateral spread at two depths
    def spread(z):
        t = (z - o[:, 2]) / d[:, 2]
        p = o + t[:, None] * d
        return p[:, :2].std()
    assert spread(3.0) < spread(30.0)


def test_load_lens_file(tmp_path):
    f = tmp_path / "lens.dat"
    f.write_text("# test lens\n35.0 2.0 1.52 26.0\n0 4.0 1 18.0\n-35.0 30.0 1.0 26.0\n")
    e = load_lens_file(str(f))
    assert e.shape == (3, 4)
    # reversed to film-to-scene order; mm -> m; diameter -> radius
    assert abs(e[0, 0] - (-0.035)) < 1e-9
    assert abs(e[2, 3] - 0.013) < 1e-9
