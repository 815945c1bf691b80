"""Delta-tracking march + ratio-tracking transmittance statistical tests.

Pattern: the reference's transmittance_test.cpp (expected scatter counts vs
maxDepth in a unit-cube medium) and closed-form Beer–Lambert checks.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.ops import dda, transmittance
from acceleratedvolrenderer_tpu.ops.dda import (
    EVT_ABSORB,
    EVT_ESCAPED,
    EVT_SCATTER,
    MediumArrays,
)

L = 4


def unit_cube_medium(sigma_a, sigma_s, density=None, maj_res=(1, 1, 1)):
    dens = jnp.ones((1, 1, 1)) if density is None else jnp.asarray(density)
    from acceleratedvolrenderer_tpu.ops import grid as gridops

    maj = jnp.asarray(gridops.build_majorant_grid(np.asarray(dens), maj_res))
    return MediumArrays(
        density=dens,
        majorant=maj,
        w2m=jnp.eye(4),
        g=jnp.float32(0.0),
        sigma_a=jnp.full((1, L), jnp.float32(sigma_a)),
        sigma_s=jnp.full((1, L), jnp.float32(sigma_s)),
        Le=jnp.zeros((1, L)),
    )


def x_rays(n):
    o = jnp.tile(jnp.array([[-0.5, 0.5, 0.5]]), (n, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    return o, d


def march(med, n=100_000, t_max=10.0, seed=0, maj_res=(1, 1, 1), homogeneous=False):
    o, d = x_rays(n)
    rng = dda.seed_stream(jnp.arange(n), jnp.zeros(n, jnp.int32), salt=seed)
    ones = jnp.ones((n, L))
    return dda.delta_track(
        med, o, d, jnp.full((n,), t_max), ones, ones, ones, rng,
        jnp.ones(n, bool), maj_res, homogeneous=homogeneous,
    )


def test_pure_absorption_escape_fraction():
    """sigma_s = 0: P(escape) = exp(-sigma_a * length)."""
    med = unit_cube_medium(sigma_a=1.0, sigma_s=0.0)
    res = march(med, homogeneous=True)
    frac = float(jnp.mean(res.event == EVT_ESCAPED))
    assert abs(frac - np.exp(-1.0)) < 5e-3
    assert not bool(jnp.any(res.event == EVT_SCATTER))


def test_pure_scattering_event_fraction():
    med = unit_cube_medium(sigma_a=0.0, sigma_s=2.0)
    res = march(med, homogeneous=True)
    frac_scatter = float(jnp.mean(res.event == EVT_SCATTER))
    assert abs(frac_scatter - (1.0 - np.exp(-2.0))) < 5e-3
    assert not bool(jnp.any(res.event == EVT_ABSORB))


def test_mixed_events():
    sa, ss = 0.5, 1.5
    med = unit_cube_medium(sigma_a=sa, sigma_s=ss)
    res = march(med, homogeneous=True)
    p_int = 1.0 - np.exp(-(sa + ss))
    frac_absorb = float(jnp.mean(res.event == EVT_ABSORB))
    frac_scatter = float(jnp.mean(res.event == EVT_SCATTER))
    assert abs(frac_absorb - p_int * sa / (sa + ss)) < 5e-3
    assert abs(frac_scatter - p_int * ss / (sa + ss)) < 5e-3


def test_scatter_distance_distribution():
    med = unit_cube_medium(sigma_a=0.0, sigma_s=3.0)
    res = march(med, homogeneous=True)
    sc = np.asarray(res.event) == EVT_SCATTER
    # rays start at x=-0.5; the cube spans t in [0.5, 1.5]
    t = np.asarray(res.t_event)[sc] - 0.5
    # conditional mean of truncated exponential on [0, 1] with rate 3
    lam = 3.0
    expected = 1.0 / lam - np.exp(-lam) / (1.0 - np.exp(-lam))
    assert abs(t.mean() - expected) < 5e-3


def test_heterogeneous_grid_escape():
    """Two-slab density grid: exact Beer–Lambert through both slabs."""
    dens = np.ones((1, 1, 2), np.float32)
    dens[0, 0, 1] = 3.0  # second half of the x-range denser
    med = unit_cube_medium(sigma_a=1.0, sigma_s=0.0, density=dens, maj_res=(2, 1, 1))
    res = march(med, maj_res=(2, 1, 1))
    # optical depth of the trilinear profile incl. the zero-padded boundary
    # tents: 0.5->1 on [0,.25], 1->3 on [.25,.75], 3->1.5 on [.75,1]
    tau = 0.25 * 0.75 + 0.5 * 2.0 + 0.25 * 2.25
    frac = float(jnp.mean(res.event == EVT_ESCAPED))
    assert abs(frac - np.exp(-tau)) < 5e-3, (frac, np.exp(-tau))


def test_spectral_residual_ratio():
    """Spectrally varying sigma_t: escaped rays carry beta = T/T[0]."""
    med = unit_cube_medium(sigma_a=1.0, sigma_s=0.0)
    med = med._replace(sigma_a=jnp.asarray([[1.0, 2.0, 0.5, 1.0]]))
    res = march(med, n=20_000, homogeneous=True)
    esc = np.asarray(res.event) == EVT_ESCAPED
    beta = np.asarray(res.beta)[esc]
    # each escaped ray: beta_lane = exp(-sig_lane * tau_dl)/exp(-sig0 * tau_dl)
    # mean over rays of beta * exp(-sig0) = exp(-sig_lane) (unbiased)
    # simpler invariant: lane0 residual is exactly 1
    np.testing.assert_allclose(beta[:, 0], 1.0, atol=1e-5)
    # lane with sigma 2x: beta <= 1; lane with 0.5x: beta >= 1
    assert np.all(beta[:, 1] <= 1.0 + 1e-5)
    assert np.all(beta[:, 2] >= 1.0 - 1e-5)


def test_ratio_tracking_transmittance():
    """E[T_ray / avg(r_l)] == exp(-sigma_t * len) — the delta-light NEE
    estimator (volpath_custom.cpp:723-727)."""
    med = unit_cube_medium(sigma_a=0.7, sigma_s=0.8)
    n = 200_000
    o, d = x_rays(n)
    rng = dda.seed_stream(jnp.arange(n), jnp.zeros(n, jnp.int32), salt=7)
    res = transmittance.ratio_track(
        med, o, d, jnp.full((n,), 10.0), rng, jnp.ones(n, bool), (1, 1, 1),
        homogeneous=True,
    )
    est = np.asarray(res.T_ray[:, 0] / jnp.mean(res.r_l, axis=-1))
    assert abs(est.mean() - np.exp(-1.5)) < 5e-3, est.mean()


def test_ratio_tracking_heterogeneous():
    dens = np.zeros((1, 1, 4), np.float32)
    dens[0, 0, 1] = 2.0
    dens[0, 0, 2] = 1.0
    med = unit_cube_medium(sigma_a=1.0, sigma_s=0.0, density=dens, maj_res=(4, 1, 1))
    n = 300_000
    o, d = x_rays(n)
    rng = dda.seed_stream(jnp.arange(n), jnp.zeros(n, jnp.int32), salt=9)
    res = transmittance.ratio_track(
        med, o, d, jnp.full((n,), 10.0), rng, jnp.ones(n, bool), (4, 1, 1)
    )
    est = np.asarray(res.T_ray[:, 0] / jnp.mean(res.r_l, axis=-1))
    # integrate trilinear density profile: voxel centers at x=1/8,3/8,5/8,7/8
    xs = np.linspace(0, 1, 20001)
    prof = np.interp(xs, [0, 1 / 8, 3 / 8, 5 / 8, 7 / 8, 1.0], [0, 0, 2.0, 1.0, 0, 0])
    tau = np.trapezoid(prof, xs)
    assert abs(est.mean() - np.exp(-tau)) < 1e-2, (est.mean(), np.exp(-tau))


def test_no_medium_hit():
    """Rays missing the cube escape untouched."""
    med = unit_cube_medium(1.0, 1.0)
    n = 16
    o = jnp.tile(jnp.array([[-0.5, 5.0, 0.5]]), (n, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    rng = dda.seed_stream(jnp.arange(n), jnp.zeros(n, jnp.int32))
    ones = jnp.ones((n, L))
    res = dda.delta_track(
        med, o, d, jnp.full((n,), 10.0), ones, ones, ones, rng,
        jnp.ones(n, bool), (1, 1, 1),
    )
    assert np.all(np.asarray(res.event) == EVT_ESCAPED)
    np.testing.assert_allclose(np.asarray(res.beta), 1.0)
