"""Participating media — scene-level medium descriptions resolved to the
march-time `MediumArrays`.

Reference: src/pbrt/media.{h,cpp} — HomogeneousMedium (media.h:217),
GridMedium (:265, "uniformgrid" in .pbrt), RGBGridMedium (:355),
CloudMedium (:430, procedural), NanoVDBMedium (:602).

TPU-native: every medium becomes the same runtime shape — a density grid +
majorant grid + world->unit-cube transform + per-wavelength coefficient
spectra — so the fused march kernel is specialized only on
homogeneous/heterogeneous, not on a 5-way type dispatch.  CloudMedium's
procedural noise is *baked* to a grid at build time (a few ms of VPU work)
instead of being evaluated per lookup: on TPU a bounded memory read beats
recomputing fractal noise per collision.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import grid as gridops
from ..ops.dda import MediumArrays
from ..utils import vecmath as vmu


@dataclass(frozen=True)
class MediumSpec:
    """Host-side medium description (built by the scene loader)."""
    sigma_a_spec: Callable             # lam -> absorption cross-section
    sigma_s_spec: Callable             # lam -> scattering cross-section
    g: float = 0.0
    scale: float = 1.0
    density: Optional[np.ndarray] = None      # (nz, ny, nx); None => homogeneous
    bounds_lo: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    bounds_hi: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    Le_spec: Optional[Callable] = None
    Le_scale: float = 1.0
    majorant_res: Tuple[int, int, int] = (16, 16, 16)   # media.cpp:229 (16^3)
    # optional medium-to-world transform beyond the bounds box
    m2w: Optional[np.ndarray] = None   # (4,4)
    # RGBGridMedium (media.h:355): per-voxel RGB coefficient grids
    # (nz, ny, nx, 3); when set, `density` is ignored
    sigma_a_rgb: Optional[np.ndarray] = None
    sigma_s_rgb: Optional[np.ndarray] = None
    Le_rgb: Optional[np.ndarray] = None

    @property
    def rgb(self) -> bool:
        return self.sigma_a_rgb is not None

    @property
    def homogeneous(self) -> bool:
        return self.density is None and not self.rgb

    def maj_res(self):
        return (1, 1, 1) if self.homogeneous else self.majorant_res

    def build_majorant(self) -> np.ndarray:
        """Per-cell conservative max.  Scalar grids: max density (the sigma
        spectra multiply at march time).  RGB grids: per-cell max over
        channels of (sigma_a + sigma_s) * scale (media.cpp:364-376)."""
        from ..ops import grid as gridops

        if self.homogeneous:
            return np.ones((1, 1, 1), np.float32)
        if self.rgb:
            st = (np.asarray(self.sigma_a_rgb, np.float32)
                  + np.asarray(self.sigma_s_rgb, np.float32)).max(axis=-1)
            return gridops.build_majorant_grid(st * self.scale, self.maj_res())
        return gridops.build_majorant_grid(np.asarray(self.density), self.maj_res())

    def world_to_unit(self) -> np.ndarray:
        """(4,4) world -> [0,1]^3 medium matrix."""
        lo = np.asarray(self.bounds_lo, np.float64)
        hi = np.asarray(self.bounds_hi, np.float64)
        s = np.eye(4)
        s[:3, :3] = np.diag(1.0 / (hi - lo))
        s[:3, 3] = -lo / (hi - lo)
        if self.m2w is not None:
            return s @ np.linalg.inv(np.asarray(self.m2w, np.float64))
        return s

    def build_arrays(self, lam) -> MediumArrays:
        """Resolve to MediumArrays at the batch's sampled wavelengths
        lam (N, LANES)."""
        maj = jnp.asarray(self.build_majorant())
        if self.homogeneous or self.rgb:
            dens = jnp.ones((1, 1, 1), jnp.float32)
        else:
            dens = jnp.asarray(self.density, jnp.float32)
        sa = self.sigma_a_spec(lam) * self.scale
        ss = self.sigma_s_spec(lam) * self.scale
        Le = self.Le_spec(lam) * self.Le_scale if self.Le_spec is not None else jnp.zeros_like(lam)
        kw = {}
        if self.rgb:
            kw = dict(
                sigma_a_rgb=jnp.asarray(self.sigma_a_rgb, jnp.float32) * self.scale,
                sigma_s_rgb=jnp.asarray(self.sigma_s_rgb, jnp.float32) * self.scale,
                Le_rgb=(jnp.asarray(self.Le_rgb, jnp.float32) * self.Le_scale
                        if self.Le_rgb is not None else None),
            )
        return MediumArrays(
            density=dens,
            majorant=maj,
            w2m=jnp.asarray(self.world_to_unit(), jnp.float32),
            g=jnp.float32(self.g),
            sigma_a=sa,
            sigma_s=ss,
            Le=Le,
            **kw,
        )


def bake_cloud_density(res=(128, 128, 128), density=1.0, wispiness=1.0,
                       extent=0.5, frequency=5.0, seed=0) -> np.ndarray:
    """Procedural cumulus-style density (CloudMedium media.h:430-528
    capability): radial falloff sphere modulated by fractal value noise,
    baked to a dense grid.  Not a port of pbrt's noise tables — uses a
    hash-based value-noise octave stack with the same knobs
    (density/wispiness/frequency/extent)."""
    nx, ny, nz = res
    zs, ys, xs = np.meshgrid(
        np.linspace(0, 1, nz), np.linspace(0, 1, ny), np.linspace(0, 1, nx),
        indexing="ij",
    )
    p = np.stack([xs, ys, zs], -1) - 0.5

    rng = np.random.default_rng(seed)

    def value_noise(q, f, table):
        qi = np.floor(q * f).astype(np.int64)
        qf = q * f - qi
        qf = qf * qf * (3 - 2 * qf)

        def h(ix, iy, iz):
            v = (ix * 73856093) ^ (iy * 19349663) ^ (iz * 83492791)
            return table[np.abs(v) % table.size]

        c000 = h(qi[..., 0], qi[..., 1], qi[..., 2])
        c100 = h(qi[..., 0] + 1, qi[..., 1], qi[..., 2])
        c010 = h(qi[..., 0], qi[..., 1] + 1, qi[..., 2])
        c110 = h(qi[..., 0] + 1, qi[..., 1] + 1, qi[..., 2])
        c001 = h(qi[..., 0], qi[..., 1], qi[..., 2] + 1)
        c101 = h(qi[..., 0] + 1, qi[..., 1], qi[..., 2] + 1)
        c011 = h(qi[..., 0], qi[..., 1] + 1, qi[..., 2] + 1)
        c111 = h(qi[..., 0] + 1, qi[..., 1] + 1, qi[..., 2] + 1)
        fx, fy, fz = qf[..., 0], qf[..., 1], qf[..., 2]
        c00 = c000 * (1 - fx) + c100 * fx
        c10 = c010 * (1 - fx) + c110 * fx
        c01 = c001 * (1 - fx) + c101 * fx
        c11 = c011 * (1 - fx) + c111 * fx
        return (c00 * (1 - fy) + c10 * fy) * (1 - fz) + (c01 * (1 - fy) + c11 * fy) * fz

    table = rng.random(4096).astype(np.float32)
    noise = np.zeros(p.shape[:-1], np.float32)
    amp, f = 1.0, frequency
    for _ in range(4):
        noise += amp * value_noise(p + 0.5, f, table)
        amp *= 0.5 * wispiness
        f *= 2.0
    noise /= noise.max() + 1e-9

    r = np.linalg.norm(p, axis=-1)
    base = np.clip(1.0 - r / extent, 0.0, 1.0)
    d = density * base * (0.5 + 0.5 * noise)
    return d.astype(np.float32)


def homogeneous_box(sigma_a_spec, sigma_s_spec, lo, hi, g=0.0, scale=1.0,
                    Le_spec=None, Le_scale=1.0) -> MediumSpec:
    return MediumSpec(
        sigma_a_spec=sigma_a_spec, sigma_s_spec=sigma_s_spec, g=g, scale=scale,
        density=None, bounds_lo=np.asarray(lo, np.float32),
        bounds_hi=np.asarray(hi, np.float32), Le_spec=Le_spec, Le_scale=Le_scale,
    )
