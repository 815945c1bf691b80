"""Dense sampled grids + low-res majorant grids.

Reference: SampledGrid<T> with trilinear Lookup (util/containers.h:765) and
MajorantGrid (media.h:105-133) built at medium construction by taking the max
density over each majorant voxel's continuous bounds (media.cpp:240-246,
16^3 for GridMedium / 64^3 for NanoVDB-scale grids).

TPU-native design: a grid is a plain (nz, ny, nx) jnp array in HBM; trilinear
lookup is 8 vectorized gathers + lerp over the whole ray batch (VPU work);
out-of-range reads return 0 exactly like SampledGrid::Lookup's
InsideExclusive check.  Index convention matches the reference linear layout
(p.z * ny + p.y) * nx + p.x, i.e. array axis order [z, y, x].
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


_CORNERS = np.array(
    [(ox, oy, oz) for oz in (0, 1) for oy in (0, 1) for ox in (0, 1)],
    np.int32)  # (8, 3)


def _corner_indices(p_unit, nx, ny, nz):
    """Shared corner-tap setup: flat indices + trilinear weights.

    Returns (flat (..., 8) int32 into the z-major flattened grid,
    w (..., 8) float32 weights with out-of-range taps zeroed)."""
    n = jnp.asarray([nx, ny, nz], jnp.float32)
    ps = p_unit * n - 0.5
    pi = jnp.floor(ps)
    d = (ps - pi).astype(jnp.float32)
    pi = pi.astype(jnp.int32)
    cx = pi[..., None, 0] + _CORNERS[:, 0]       # (..., 8)
    cy = pi[..., None, 1] + _CORNERS[:, 1]
    cz = pi[..., None, 2] + _CORNERS[:, 2]
    inside = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
              & (cz >= 0) & (cz < nz))
    flat = ((jnp.clip(cz, 0, nz - 1) * ny + jnp.clip(cy, 0, ny - 1)) * nx
            + jnp.clip(cx, 0, nx - 1))
    wx = jnp.where(_CORNERS[:, 0] == 1, d[..., None, 0], 1.0 - d[..., None, 0])
    wy = jnp.where(_CORNERS[:, 1] == 1, d[..., None, 1], 1.0 - d[..., None, 1])
    wz = jnp.where(_CORNERS[:, 2] == 1, d[..., None, 2], 1.0 - d[..., None, 2])
    w = jnp.where(inside, wx * wy * wz, 0.0)
    return flat, w


def trilerp(grid, p_unit):
    """Trilinearly interpolate `grid` ((nz, ny, nx) array) at continuous
    [0,1]^3 coordinates p_unit (..., 3) given as (x, y, z).

    Sample positions follow pbrt: pSamples = p * n - 0.5 (voxel centers at
    (i + 0.5) / n).  Out-of-range taps contribute 0.

    All 8 corner taps go through ONE flattened gather — XLA:TPU charges a
    large fixed cost per gather fusion, so one (..., 8) gather beats eight
    separate (...,) gathers in the fused march loop.
    """
    nz, ny, nx = grid.shape
    flat, w = _corner_indices(p_unit, nx, ny, nz)
    v = jnp.take(grid.reshape(-1), flat, axis=0)
    return jnp.sum(v.astype(jnp.float32) * w, axis=-1)


def trilerp_flat(grid_flat, dims, p_unit):
    """trilerp with a pre-flattened grid (dims = (nz, ny, nx) static).

    Passing the grid 1D keeps XLA from re-laying-out the full grid inside
    hot loops (the 3D->flat bitcast + gather-layout copy was profiled at
    ~0.1 ms/iteration on the 256^3 cloud grid)."""
    nz, ny, nx = dims
    flat, w = _corner_indices(p_unit, nx, ny, nz)
    v = jnp.take(grid_flat, flat, axis=0)
    return jnp.sum(v.astype(jnp.float32) * w, axis=-1)


def trilerp_vec(grid, p_unit):
    """Trilerp for a grid with trailing channel axis (nz, ny, nx, C) ->
    (..., C). Used by RGB-coefficient media.  Single-gather form, like
    trilerp."""
    nz, ny, nx, C = grid.shape
    flat, w = _corner_indices(p_unit, nx, ny, nz)
    v = jnp.take(grid.reshape(-1, C), flat, axis=0)   # (..., 8, C)
    return jnp.sum(v.astype(jnp.float32) * w[..., None], axis=-2)


def max_value_range(density: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> float:
    """Max over the density-sample index range covering continuous bounds
    [lo, hi] in [0,1]^3 — exact SampledGrid::MaxValue semantics
    (containers.h), host-side."""
    nz, ny, nx = density.shape
    n = np.array([nx, ny, nz], np.float64)
    p0 = np.maximum(np.floor(lo * n - 0.5).astype(np.int64), 0)
    p1 = np.minimum(np.floor(hi * n - 0.5).astype(np.int64) + 1, n.astype(np.int64) - 1)
    if np.any(p1 < p0):
        return 0.0
    return float(
        density[p0[2]: p1[2] + 1, p0[1]: p1[1] + 1, p0[0]: p1[0] + 1].max()
    )


def _axis_ranges(r, nn):
    """Per-axis density-sample index range covered by each of r majorant
    cells: cell c spans continuous [c/r, (c+1)/r], so its sample range is
    lo = max(floor(c/r * n - .5), 0), hi = min(floor((c+1)/r*n-.5)+1, n-1)
    — exact SampledGrid::MaxValue bounds (containers.h / media.cpp:240-246).
    Shared by the majorant, minorant, and jit extremum builds so the
    subtle index math lives in exactly one place."""
    c = np.arange(r)
    lo = np.maximum(np.floor(c / r * nn - 0.5).astype(np.int64), 0)
    hi = np.minimum(np.floor((c + 1) / r * nn - 0.5).astype(np.int64) + 1,
                    nn - 1)
    return lo, hi


def _extremum_grid(density, res, op, stack):
    """Separable per-cell extremum (op = 'max' | 'min') over the continuous
    cell bounds: reduce x, then y, then z — O(N) instead of O(N * cells).
    `stack` is np.stack (host) or jnp.stack (jit)."""
    rx, ry, rz = res
    nz, ny, nx = density.shape
    lox, hix = _axis_ranges(rx, nx)
    loy, hiy = _axis_ranges(ry, ny)
    loz, hiz = _axis_ranges(rz, nz)
    red = lambda a, l, h, ax: getattr(a[(slice(None),) * ax
                                        + (slice(l, h + 1),)], op)(axis=ax)
    mx = stack([red(density, l, h, 2) for l, h in zip(lox, hix)], axis=-1)  # (nz, ny, rx)
    mxy = stack([red(mx, l, h, 1) for l, h in zip(loy, hiy)], axis=1)       # (nz, ry, rx)
    return stack([red(mxy, l, h, 0) for l, h in zip(loz, hiz)], axis=0)     # (rz, ry, rx)


def build_majorant_grid(density: np.ndarray, res=(16, 16, 16)) -> np.ndarray:
    """Host-side majorant build: (rz, ry, rx) grid of per-cell max density,
    max taken over the continuous cell bounds exactly as media.cpp:240-246.

    Runs once at scene build; the hot path only reads it.
    """
    return _extremum_grid(np.asarray(density, np.float32), res, "max",
                          np.stack)


def build_minorant_grid(density: np.ndarray, res=(16, 16, 16)) -> np.ndarray:
    """Host-side MINORANT build: per-cell min density over the same
    continuous cell bounds as build_majorant_grid (MaxValue -> MinValue,
    the control grid of residual ratio tracking / decomposition tracking,
    Novák et al. 2014 / Kutz et al. 2017; the reference's machinery at
    media.h:105-133 only tracks the max — the minorant is the TPU-side
    estimator lever that cuts shadow-segment collision rates to
    (majorant - minorant)).

    Any trilerp (or stochastic-corner 1-tap) evaluation inside cell c is
    a convex combination of sample values within the cell's index range,
    so min over that range is a true lower bound.
    """
    return _extremum_grid(np.asarray(density, np.float32), res, "min",
                          np.stack)


def build_majorant_grid_jax(density, res=(16, 16, 16)):
    """JIT-compatible majorant build for the differentiable path (re-run when
    the optimized density changes).  Same index-range semantics, expressed as
    three one-axis segment maxes with static ranges."""
    return _extremum_grid(density, res, "max", jnp.stack)


def stochastic_corner(dims, p_unit, u3):
    """Sample ONE trilerp corner with its trilinear weight (stochastic
    texture filtering — Pharr, "Stochastic Texture Filtering" 2024; also
    the filtering scheme of GPU production volume renderers): per axis the
    upper corner is chosen with probability frac, so
    E[grid[corner]] == trilerp(grid, p_unit) exactly.

    In the null-scattering estimator every per-collision factor is LINEAR
    in the density sample (event probabilities, beta/r ratios, ratio-
    tracking factors), and corner draws are independent across collisions,
    so replacing the 8-tap trilerp with this 1-tap estimate keeps the
    radiance estimator unbiased — it trades a ~2x HBM-gather saving (the
    profiled hot spot of the fused march) for slightly higher variance.

    Returns (flat index into the z-major grid, inside mask)."""
    nz, ny, nx = dims
    n = jnp.asarray([nx, ny, nz], jnp.float32)
    ps = p_unit * n - 0.5
    pi0 = jnp.floor(ps)
    d = (ps - pi0).astype(jnp.float32)
    pi = pi0.astype(jnp.int32)
    c = pi + (u3 < d).astype(jnp.int32)
    inside = ((c[..., 0] >= 0) & (c[..., 0] < nx)
              & (c[..., 1] >= 0) & (c[..., 1] < ny)
              & (c[..., 2] >= 0) & (c[..., 2] < nz))
    flat = ((jnp.clip(c[..., 2], 0, nz - 1) * ny
             + jnp.clip(c[..., 1], 0, ny - 1)) * nx
            + jnp.clip(c[..., 0], 0, nx - 1))
    return flat, inside


def trilerp_stochastic_flat(grid_flat, dims, p_unit, u3):
    """1-tap stochastic trilerp (see stochastic_corner)."""
    flat, inside = stochastic_corner(dims, p_unit, u3)
    return jnp.where(inside, jnp.take(grid_flat, flat, axis=0), 0.0)


def trilerp_vec_stochastic(grid, p_unit, u3):
    """Stochastic trilerp for (nz, ny, nx, C) grids -> (..., C); all C
    channels share the corner draw (they are evaluated at the same point,
    and each enters its collision factor linearly)."""
    nz, ny, nx, C = grid.shape
    flat, inside = stochastic_corner((nz, ny, nx), p_unit, u3)
    v = jnp.take(grid.reshape(-1, C), flat, axis=0)
    return jnp.where(inside[..., None], v, 0.0)
