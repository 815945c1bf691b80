"""Noise/procedural texture tests (textures.h family)."""
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.models import textures as tx


def _uv(n=512, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((n, 2)), jnp.float32)


def test_perlin_range_and_smoothness():
    uv = _uv()
    p = jnp.concatenate([uv * 10, jnp.zeros((uv.shape[0], 1))], -1)
    n = np.asarray(tx.perlin_noise(p))
    assert np.abs(n).max() <= 1.5
    assert n.std() > 0.05            # not constant
    # lattice points have zero gradient-noise value
    lat = tx.perlin_noise(jnp.asarray([[1.0, 2.0, 3.0]]))
    assert abs(float(lat[0])) < 1e-5


def test_fbm_turbulence():
    uv = _uv()
    f = np.asarray(tx.FBmTexture().eval(uv))
    w = np.asarray(tx.WrinkledTexture().eval(uv))
    assert np.isfinite(f).all() and np.isfinite(w).all()
    assert (w >= 0).all()            # turbulence sums |noise|
    assert f.std() > 0.05


def test_marble_windy_dots_bilerp():
    uv = _uv()
    m = np.asarray(tx.MarbleTexture().eval(uv))
    assert m.shape[-1] == 3 and (m >= 0).all() and (m <= 1).all()
    wd = np.asarray(tx.WindyTexture().eval(uv))
    assert (wd >= 0).all()
    d = np.asarray(tx.DotsTexture().eval(uv))
    assert set(np.unique(d)).issubset({0.0, 1.0})
    b = np.asarray(tx.BilerpTexture(0, 1, 0, 1).eval(
        jnp.asarray([[0.0, 0.0], [0.0, 1.0], [0.5, 0.5]])))
    assert abs(b[0]) < 1e-6 and abs(b[1] - 1) < 1e-6 and abs(b[2] - 0.5) < 1e-6


# ---------------------------------------------------------------------------
# Texture mappings + context textures (textures.h:86-248, 832, 891)
# ---------------------------------------------------------------------------

def test_uv_mapping_scale_offset():
    uv = _uv()
    m = tx.UVMapping(su=2.0, sv=3.0, du=0.25, dv=-0.5)
    st = np.asarray(m.map(uv))
    ref = np.asarray(uv) * [2.0, 3.0] + [0.25, -0.5]
    assert np.allclose(st, ref, atol=1e-6)


def test_spherical_mapping_poles_and_equator():
    m = tx.SphericalMapping()
    p = jnp.asarray([[0, 0, 1.0], [0, 0, -1.0], [1.0, 0, 0], [0, 1.0, 0]],
                    jnp.float32)
    uv = jnp.zeros((4, 2), jnp.float32)
    st = np.asarray(m.map(uv, p))
    assert abs(st[0, 0] - 0.0) < 1e-5          # +z pole: theta=0
    assert abs(st[1, 0] - 1.0) < 1e-5          # -z pole: theta=pi
    assert abs(st[2, 0] - 0.5) < 1e-5          # equator
    assert abs(st[2, 1] - 0.0) < 1e-5          # phi=0
    assert abs(st[3, 1] - 0.25) < 1e-5         # phi=pi/2


def test_cylindrical_planar_mapping():
    p = jnp.asarray([[1.0, 0, 0.7], [-1.0, 0, -0.3]], jnp.float32)
    uv = jnp.zeros((2, 2), jnp.float32)
    st = np.asarray(tx.CylindricalMapping().map(uv, p))
    assert abs(st[0, 0] - 0.5) < 1e-5          # atan2(0,1)=0 -> (pi+0)/2pi
    assert abs(st[0, 1] - 0.7) < 1e-5          # t = z
    pl = tx.PlanarMapping(vs=(1, 0, 0), vt=(0, 0, 1), ds=0.1, dt=0.2)
    st2 = np.asarray(pl.map(uv, p))
    assert np.allclose(st2[:, 0], [1.1, -0.9], atol=1e-6)
    assert np.allclose(st2[:, 1], [0.9, -0.1], atol=1e-6)


def test_point_transform_mapping_applies_matrix():
    m4 = np.eye(4, dtype=np.float32)
    m4[:3, 3] = [1.0, 2.0, 3.0]
    m = tx.PointTransformMapping(texture_from_render=tuple(map(tuple, m4)))
    p = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    out = np.asarray(m.map(None, p))
    assert np.allclose(out, [[1.5, 2.5, 3.5]], atol=1e-6)


def test_mapped_texture_checker_through_spherical():
    # checker through a spherical mapping alternates across the equator
    base = tx.CheckerboardTexture(tx.ConstantTexture(1.0),
                                  tx.ConstantTexture(0.0),
                                  uscale=2.0, vscale=1.0)
    t = tx.MappedTexture(base, tx.SphericalMapping())
    p = jnp.asarray([[0, 0.1, 1.0], [0, 0.1, -1.0]], jnp.float32)
    uv = jnp.zeros((2, 2), jnp.float32)
    v = np.asarray(t.eval_ctx(uv, p=p))
    assert v[0] != v[1]                        # opposite theta halves


def test_direction_mix_texture():
    t = tx.DirectionMixTexture(tx.ConstantTexture(1.0),
                               tx.ConstantTexture(0.0), dir=(0, 1, 0))
    uv = jnp.zeros((3, 2), jnp.float32)
    n = jnp.asarray([[0, 1, 0], [0, -1, 0], [1, 0, 0]], jnp.float32)
    v = np.asarray(t.eval_ctx(uv, n=n))
    assert np.allclose(v, [1.0, 1.0, 0.0], atol=1e-6)   # AbsDot
    # rgb variant broadcasts the amount over channels
    t2 = tx.DirectionMixTexture(tx.ConstantRGBTexture((1, 0, 0)),
                                tx.ConstantRGBTexture((0, 0, 1)),
                                dir=(0, 1, 0))
    v2 = np.asarray(t2.eval_ctx(uv, n=n))
    assert np.allclose(v2[0], [1, 0, 0], atol=1e-6)
    assert np.allclose(v2[2], [0, 0, 1], atol=1e-6)


def test_eval_texture_dispatch():
    # plain textures go through eval(uv); context textures get p/n
    c = tx.ConstantTexture(0.7)
    uv = _uv(8)
    assert np.allclose(np.asarray(tx.eval_texture(c, uv)), 0.7)
    d = tx.DirectionMixTexture(tx.ConstantTexture(1.0),
                               tx.ConstantTexture(0.0))
    # without a normal the mix defaults to tex1 (amt=1)
    assert np.allclose(np.asarray(tx.eval_texture(d, uv)), 1.0)


def test_mapped_texture_nested_without_hit_position():
    """ADVICE r2 #1 regression: a spherical/planar-mapped texture nested
    inside Checkerboard/Mix/Scale (whose child eval drops the hit
    context), or evaluated with p=None (the fused constant-parameter
    path), must not crash — it falls back to uv-lifted positions."""
    import jax.numpy as jnp

    from acceleratedvolrenderer_tpu.models import textures as tex

    uv = jnp.asarray(np.random.default_rng(0).random((16, 2)), jnp.float32)
    mapped = tex.MappedTexture(base=tex.ConstantTexture(0.7),
                               mapping=tex.SphericalMapping())
    for parent in (tex.CheckerboardTexture(mapped, tex.ConstantTexture(0.2)),
                   tex.MixTexture(mapped, tex.ConstantTexture(0.1)),
                   tex.ScaleTexture(mapped, 2.0)):
        out = np.asarray(parent.eval(uv))          # p=None path
        assert np.isfinite(out).all()
    # direct p=None eval of every positional mapping
    for mp in (tex.SphericalMapping(), tex.CylindricalMapping(),
               tex.PlanarMapping(), tex.PointTransformMapping()):
        st = np.asarray(mp.map(uv, None))
        assert np.isfinite(st).all()
    # with a real hit position the mapping uses it
    p = jnp.asarray(np.random.default_rng(1).random((16, 3)), jnp.float32)
    a = np.asarray(tex.SphericalMapping().map(uv, p))
    b = np.asarray(tex.SphericalMapping().map(uv, None))
    assert not np.allclose(a, b)


def test_checkerboard3d():
    """Solid 3D checker (textures.h dimension=3): parity of floored
    texture-space coords; positional."""
    import jax.numpy as jnp

    from acceleratedvolrenderer_tpu.models import textures as tex

    t = tex.Checkerboard3DTexture(tex.ConstantTexture(1.0),
                                  tex.ConstantTexture(0.0))
    uv = jnp.zeros((4, 2))
    p = jnp.asarray([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5],
                     [1.5, 1.5, 0.5], [0.2, 0.1, 1.9]], jnp.float32)
    out = np.asarray(t.eval_ctx(uv, p=p))
    np.testing.assert_allclose(out, [1.0, 0.0, 1.0, 0.0])
