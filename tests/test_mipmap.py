"""MIPMap tests (reference capability: util/mipmap.{h,cpp}).

Checks: pyramid means are exact (box filter), trilinear lod selection
converges to the image mean at wide footprints and to bilinear at width 0,
EWA beats trilinear on anisotropic footprints, non-pow2 resampling keeps
the mean.
"""
import numpy as np
import jax.numpy as jnp

from acceleratedvolrenderer_tpu.models.mipmap import MIPMap
from acceleratedvolrenderer_tpu.models.textures import ImageTexture


def _checker(h, w):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (((yy // 4) + (xx // 4)) % 2).astype(np.float32)


def test_pyramid_levels_and_mean():
    img = np.random.RandomState(0).rand(64, 32, 3).astype(np.float32)
    m = MIPMap(img)
    assert m.n_levels == 7  # 64x32 -> ... -> 1x1
    assert m.shapes[0] == (64, 32) and m.shapes[-1] == (1, 1)
    top = np.asarray(m.flat[int(m.offsets[-1])])
    np.testing.assert_allclose(top, img.mean(axis=(0, 1)), rtol=1e-5)


def test_trilinear_width0_matches_bilinear():
    img = np.random.RandomState(1).rand(32, 32, 1).astype(np.float32)
    tex = ImageTexture(img, filtered=True)
    uv = jnp.asarray(np.random.RandomState(2).rand(128, 2), jnp.float32)
    fine = tex.eval_filtered(uv, jnp.zeros((128,)) + 1e-9)
    base = tex.eval(uv)
    np.testing.assert_allclose(np.asarray(fine), np.asarray(base),
                               rtol=1e-4, atol=1e-5)


def test_trilinear_wide_width_is_mean():
    img = _checker(64, 64)[..., None]
    m = MIPMap(img)
    uv = jnp.asarray([[0.3, 0.7], [0.9, 0.1]], jnp.float32)
    out = m.lookup_trilinear(uv, jnp.full((2,), 4.0))  # footprint >> image
    np.testing.assert_allclose(np.asarray(out)[:, 0], img.mean(), atol=1e-3)


def test_lod_monotone_blur():
    """Wider footprints move the checker lookup toward the global mean."""
    img = _checker(128, 128)[..., None]
    m = MIPMap(img)
    uv = jnp.asarray(np.random.RandomState(3).rand(256, 2), jnp.float32)
    spread_prev = None
    for width in [1 / 128, 1 / 16, 1 / 4, 1.0]:
        out = np.asarray(m.lookup_trilinear(uv, jnp.full((256,), width)))
        spread = np.abs(out[:, 0] - img.mean()).mean()
        if spread_prev is not None:
            assert spread <= spread_prev + 1e-6
        spread_prev = spread
    assert spread_prev < 0.02


def test_ewa_anisotropic_beats_trilinear():
    """Footprint long in u, thin in v over u-stripes: EWA should average
    the stripes out (follow the major axis) with far less v-blur than an
    isotropic filter of the same area."""
    h = w = 128
    yy = np.arange(h)
    img = np.broadcast_to(((yy // 8) % 2).astype(np.float32)[:, None],
                          (h, w)).copy()[..., None]  # stripes vary with v
    m = MIPMap(img, max_anisotropy=16.0, n_probes=8)
    rs = np.random.RandomState(4)
    uv = jnp.asarray(rs.rand(512, 2) * 0.8 + 0.1, jnp.float32)
    duv0 = jnp.broadcast_to(jnp.asarray([0.25, 0.0]), (512, 2))  # major: u
    duv1 = jnp.broadcast_to(jnp.asarray([0.0, 1 / 128]), (512, 2))
    ewa = np.asarray(m.lookup_ewa(uv, duv0, duv1))[:, 0]
    # ground truth: average along u only == point value in v (stripes const in u)
    gt = np.asarray(m.lookup_trilinear(uv, jnp.full((512,), 1 / 128)))[:, 0]
    iso = np.asarray(m.lookup_trilinear(uv, jnp.full((512,), 0.25)))[:, 0]
    err_ewa = np.abs(ewa - gt).mean()
    err_iso = np.abs(iso - gt).mean()
    assert err_ewa < err_iso * 0.5, (err_ewa, err_iso)


def test_nonpow2_resample_keeps_mean():
    img = np.random.RandomState(5).rand(48, 20, 3).astype(np.float32)
    m = MIPMap(img)
    assert m.shapes[0] == (64, 32)
    top = np.asarray(m.flat[int(m.offsets[-1])])
    np.testing.assert_allclose(top, img.mean(axis=(0, 1)), atol=5e-3)
