"""Film: spectral sample accumulation into an RGB image.

Reference: src/pbrt/film.{h,cpp} — PixelSensor (film.h:36, spectral->XYZ via
sensor response + white balance), RGBFilm (film.h:232: AddSample with filter
weight, GetPixelRGB, WriteImage with renderTimeSeconds/spp metadata),
filters (filters.h; default = Gaussian radius 1.5 sigma 0.5 with filter
importance sampling).

TPU-native: the film is a pair of (H, W, 3) rgb-sum / (H, W) weight-sum
arrays; AddSample over a ray batch is one scatter-add (.at[].add), which XLA
lowers to a single fused scatter on TPU.  Filter importance sampling makes
every sample weight a constant, so the scatter carries no per-sample filter
evaluation at all (exactly why pbrt's own GetCameraSample uses it).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import colorspace, spectrum as sp


class GaussianFilter(NamedTuple):
    radius: float = 1.5
    sigma: float = 0.5

    def sample_offset(self, u):
        """Inverse-CDF sample of the truncated Gaussian per axis; u (..., 2)
        -> offset (..., 2) in [-radius, radius], weight == 1 (f/pdf is a
        constant the weight-sum normalization cancels)."""
        import math

        r, s = self.radius, self.sigma
        c = math.erf(r / (s * math.sqrt(2.0)))
        x = jax.scipy.special.erfinv((2.0 * u - 1.0) * c) * (s * np.sqrt(2.0))
        return jnp.clip(x, -r, r)


class BoxFilter(NamedTuple):
    radius: float = 0.5

    def sample_offset(self, u):
        return (u - 0.5) * (2.0 * self.radius)


class TriangleFilter(NamedTuple):
    radius: float = 2.0

    def sample_offset(self, u):
        # tent sampling via inverse CDF
        t = 2.0 * u - 1.0
        off = jnp.sign(t) * (1.0 - jnp.sqrt(jnp.maximum(1.0 - jnp.abs(t), 0.0)))
        return off * self.radius


class Film(NamedTuple):
    """Accumulation state; a pure pytree so it threads through jit/shard_map."""
    rgb_sum: jnp.ndarray     # (H, W, 3)
    weight_sum: jnp.ndarray  # (H, W)

    @staticmethod
    def create(height: int, width: int):
        return Film(jnp.zeros((height, width, 3)), jnp.zeros((height, width)))

    def add_samples(self, pixel_xy, L, swl, weight=None, max_component=jnp.inf):
        """Accumulate spectral radiance samples.

        pixel_xy: (N, 2) int32; L: (N, LANES); swl: SampledWavelengths.
        RGBFilm::AddSample semantics: sensor RGB with optional
        maxComponentValue clamp, then filter-weighted accumulation.
        """
        xyz = sp.to_xyz(L, swl)
        rgb = colorspace.xyz_to_rgb(xyz)
        # clamp the spectral sample like RGBFilm (film.h:251-256)
        m = jnp.max(rgb, axis=-1)
        scale = jnp.where(m > max_component, max_component / jnp.maximum(m, 1e-24), 1.0)
        rgb = rgb * scale[..., None]
        rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)
        w = jnp.ones(rgb.shape[0]) if weight is None else weight
        x = pixel_xy[:, 0]
        y = pixel_xy[:, 1]
        H, W = self.weight_sum.shape
        ok = (x >= 0) & (x < W) & (y >= 0) & (y < H)
        wm = jnp.where(ok, w, 0.0)
        rgb_sum = self.rgb_sum.at[y, x].add(rgb * wm[:, None])
        weight_sum = self.weight_sum.at[y, x].add(wm)
        return Film(rgb_sum, weight_sum)

    def to_image(self):
        w = jnp.maximum(self.weight_sum, 1e-12)[..., None]
        return self.rgb_sum / w


def write_film(path, film_img, render_time=None, spp=None, mse=None, w2c=None):
    from ..utils import image

    md = image.ImageMetadata(
        render_time_seconds=render_time, samples_per_pixel=spp, mse=mse,
        world_to_camera=w2c,
    )
    image.write_exr(path, np.asarray(film_img), md)
