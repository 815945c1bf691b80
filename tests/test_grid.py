"""Grid lookup + majorant construction tests."""
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.ops import grid as gridops


def test_trilerp_voxel_centers():
    rng = np.random.default_rng(0)
    g = rng.random((4, 5, 6)).astype(np.float32)  # (nz, ny, nx)
    gj = jnp.asarray(g)
    nz, ny, nx = g.shape
    # voxel centers: p = (i + 0.5)/n per axis
    xs, ys, zs = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    p = np.stack(
        [(xs + 0.5) / nx, (ys + 0.5) / ny, (zs + 0.5) / nz], axis=-1
    ).reshape(-1, 3)
    v = np.asarray(gridops.trilerp(gj, jnp.asarray(p, jnp.float32)))
    expect = g[zs.reshape(-1), ys.reshape(-1), xs.reshape(-1)]
    np.testing.assert_allclose(v, expect, rtol=1e-5)


def test_trilerp_outside_zero():
    g = jnp.ones((4, 4, 4))
    p = jnp.array([[-0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.5, 0.5, 2.0]])
    v = np.asarray(gridops.trilerp(g, p))
    np.testing.assert_allclose(v, 0.0)


def test_trilerp_interpolates():
    g = jnp.zeros((1, 1, 2)).at[0, 0, 1].set(1.0)
    # halfway between the two voxel centers along x
    v = float(gridops.trilerp(g, jnp.array([0.5, 0.5, 0.5])))
    np.testing.assert_allclose(v, 0.5, atol=1e-6)


def test_majorant_conservative():
    rng = np.random.default_rng(1)
    dens = rng.random((33, 47, 29)).astype(np.float32)
    maj = gridops.build_majorant_grid(dens, res=(8, 8, 8))
    assert maj.shape == (8, 8, 8)
    # sample many random points: interpolated density <= majorant of its cell
    p = rng.random((20000, 3)).astype(np.float32)
    d = np.asarray(gridops.trilerp(jnp.asarray(dens), jnp.asarray(p)))
    cell = np.clip((p * 8).astype(int), 0, 7)
    m = maj[cell[:, 2], cell[:, 1], cell[:, 0]]
    assert np.all(d <= m + 1e-5)


def test_majorant_jax_matches_host():
    rng = np.random.default_rng(2)
    dens = rng.random((20, 17, 25)).astype(np.float32)
    host = gridops.build_majorant_grid(dens, res=(4, 4, 4))
    dev = np.asarray(gridops.build_majorant_grid_jax(jnp.asarray(dens), res=(4, 4, 4)))
    np.testing.assert_allclose(host, dev, rtol=1e-6)


def test_majorant_homogeneous():
    maj = gridops.build_majorant_grid(np.ones((1, 1, 1), np.float32), res=(1, 1, 1))
    np.testing.assert_allclose(maj, 1.0)
