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


# ---------------------------------------------------------------------------
# PixelSensor — spectral -> sensor RGB -> XYZ with white balance
# ---------------------------------------------------------------------------

_BRADFORD = np.array([
    [0.8951, 0.2664, -0.1614],
    [-0.7502, 1.7135, 0.0367],
    [0.0389, -0.0685, 1.0296],
], np.float64)


def _xy_to_xyz(xy):
    x, y = float(xy[0]), float(xy[1])
    return np.array([x / y, 1.0, (1.0 - x - y) / y], np.float64)


def white_balance_matrix(src_xy, dst_xy):
    """3x3 XYZ->XYZ chromatic adaptation (von Kries in Bradford LMS).

    Reference: WhiteBalance (util/color.cpp) used by PixelSensor and
    `imgtool whitebalance`."""
    src = _BRADFORD @ _xy_to_xyz(src_xy)
    dst = _BRADFORD @ _xy_to_xyz(dst_xy)
    scale = np.diag(dst / src)
    return (np.linalg.inv(_BRADFORD) @ scale @ _BRADFORD).astype(np.float32)


# 24 training swatches: Macbeth-chart sRGB values lifted to smooth spectra
# via the Smits basis (replaces the measured swatchReflectances table,
# film.cpp) — only used to least-squares-fit the 3x3 sensor matrix.
_SWATCH_RGBS = np.array([
    [0.45, 0.32, 0.27], [0.76, 0.58, 0.51], [0.37, 0.48, 0.61],
    [0.35, 0.42, 0.26], [0.52, 0.50, 0.69], [0.40, 0.74, 0.67],
    [0.84, 0.49, 0.17], [0.31, 0.36, 0.65], [0.76, 0.35, 0.39],
    [0.36, 0.23, 0.42], [0.62, 0.74, 0.25], [0.88, 0.64, 0.18],
    [0.22, 0.24, 0.59], [0.28, 0.58, 0.29], [0.69, 0.21, 0.23],
    [0.91, 0.78, 0.12], [0.73, 0.34, 0.58], [0.03, 0.52, 0.63],
    [0.95, 0.95, 0.95], [0.79, 0.79, 0.79], [0.63, 0.63, 0.63],
    [0.48, 0.48, 0.48], [0.33, 0.33, 0.33], [0.20, 0.20, 0.20],
], np.float32)


class PixelSensor:
    """Camera sensor model (film.h:36): converts spectral radiance samples
    to sensor RGB via response curves r_bar/g_bar/b_bar, then to XYZ via a
    3x3 matrix least-squares-fit over training swatches rendered under the
    sensor illuminant vs the output illuminant (film.h:45-80).

    The default sensor is the CIE 1931 observer (r=X, g=Y, b=Z), for which
    the fitted matrix is the identity when illuminants match — exactly
    pbrt's CreateDefault.  `white_balance` applies Bradford adaptation from
    the given illuminant chromaticity to D65."""

    def __init__(self, response=None, imaging_ratio: float = 1.0,
                 sensor_illum_xy=None, out_illum_xy=(0.3127, 0.3290)):
        # response: fn lam (..., L) -> (..., L, 3) sensor sensitivities
        self.response = response
        self.imaging_ratio = float(imaging_ratio)
        if response is None and sensor_illum_xy is None:
            self.xyz_from_rgb = np.eye(3, dtype=np.float32)
        else:
            lam = np.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, 95)
            resp = np.asarray(self._resp(jnp.asarray(lam)))  # (95, 3)
            cie = np.asarray(sp.cie_xyz(jnp.asarray(lam)))   # (95, 3)
            sw = np.asarray(sp.rgb_to_spectrum_smits_batched(
                jnp.asarray(_SWATCH_RGBS),
                jnp.broadcast_to(jnp.asarray(lam), (24, 95))))  # (24, 95)
            rgb_cam = sw @ resp                               # (24, 3)
            rgb_cam /= np.maximum((np.ones(95) @ resp)[None, 1], 1e-9)
            xyz_out = sw @ cie
            xyz_out /= np.maximum((np.ones(95) @ cie)[None, 1], 1e-9)
            m, *_ = np.linalg.lstsq(rgb_cam, xyz_out, rcond=None)
            self.xyz_from_rgb = m.T.astype(np.float32)
            if sensor_illum_xy is not None:
                self.xyz_from_rgb = (
                    white_balance_matrix(sensor_illum_xy, out_illum_xy)
                    @ self.xyz_from_rgb)

    def _resp(self, lam):
        if self.response is None:
            return sp.cie_xyz(lam)
        return self.response(lam)

    def to_sensor_rgb(self, L, swl):
        """MC sensor-RGB of spectral samples (ToSensorRGB, film.h:97)."""
        resp = self._resp(swl.lam)                            # (..., L, 3)
        w = jnp.where(swl.pdf > 0, L / jnp.where(swl.pdf > 0, swl.pdf, 1.0),
                      0.0)
        rgb = jnp.mean(w[..., None] * resp, axis=-2) / sp.CIE_Y_INTEGRAL
        return rgb * self.imaging_ratio

    def to_xyz(self, L, swl):
        from ..utils.colorspace import _mat3

        return _mat3(self.to_sensor_rgb(L, swl), self.xyz_from_rgb)


# ---------------------------------------------------------------------------
# SpectralFilm — per-wavelength-bucket accumulation (film.h:401)
# ---------------------------------------------------------------------------

class SpectralFilm(NamedTuple):
    """Accumulates radiance into `n_buckets` equal wavelength bands over
    [lambda_min, lambda_max] alongside the usual RGB (SpectralFilm,
    film.h:401).  Each spectral sample lands in its bucket with its
    pdf-normalized value; output channels are named like the reference
    ("C01_0400.00nm-0428.75nm", alphabetical in the EXR)."""
    rgb_sum: jnp.ndarray        # (H, W, 3)
    weight_sum: jnp.ndarray     # (H, W)
    bucket_sum: jnp.ndarray     # (H, W, B)
    bucket_w: jnp.ndarray       # (H, W, B)
    lambda_min: float
    lambda_max: float

    @staticmethod
    def create(height, width, n_buckets=16, lambda_min=360.0,
               lambda_max=830.0):
        return SpectralFilm(
            jnp.zeros((height, width, 3)), jnp.zeros((height, width)),
            jnp.zeros((height, width, n_buckets)),
            jnp.zeros((height, width, n_buckets)),
            lambda_min, lambda_max)

    def add_samples(self, pixel_xy, L, swl, weight=None, max_component=jnp.inf):
        base = Film(self.rgb_sum, self.weight_sum).add_samples(
            pixel_xy, L, swl, weight=weight, max_component=max_component)
        B = self.bucket_sum.shape[-1]
        H, W = self.weight_sum.shape
        x, y = pixel_xy[:, 0], pixel_xy[:, 1]
        ok = (x >= 0) & (x < W) & (y >= 0) & (y < H)
        b = jnp.clip(((swl.lam - self.lambda_min)
                      / (self.lambda_max - self.lambda_min) * B)
                     .astype(jnp.int32), 0, B - 1)            # (N, L)
        val = jnp.where(swl.pdf > 0, L / jnp.where(swl.pdf > 0, swl.pdf, 1.0),
                        0.0)
        val = jnp.nan_to_num(val, nan=0.0, posinf=0.0, neginf=0.0)
        yb = jnp.where(ok, y, 0)[:, None].repeat(val.shape[-1], 1)
        xb = jnp.where(ok, x, 0)[:, None].repeat(val.shape[-1], 1)
        wm = jnp.where(ok, 1.0, 0.0)[:, None] * jnp.ones_like(val)
        bucket_sum = self.bucket_sum.at[yb, xb, b].add(val * wm)
        bucket_w = self.bucket_w.at[yb, xb, b].add(wm)
        return SpectralFilm(base.rgb_sum, base.weight_sum, bucket_sum,
                            bucket_w, self.lambda_min, self.lambda_max)

    def to_image(self):
        return Film(self.rgb_sum, self.weight_sum).to_image()

    def bucket_images(self):
        return self.bucket_sum / jnp.maximum(self.bucket_w, 1e-12)

    def channel_names(self):
        B = self.bucket_sum.shape[-1]
        edges = np.linspace(self.lambda_min, self.lambda_max, B + 1)
        return [f"C{i + 1:02d}_{edges[i]:07.2f}nm-{edges[i + 1]:07.2f}nm"
                for i in range(B)]

    def write(self, path, render_time=None, spp=None):
        from ..utils import image

        img = np.asarray(self.to_image())
        buckets = np.asarray(self.bucket_images())
        chans = np.concatenate([img, buckets], axis=-1)
        names = ["R", "G", "B"] + self.channel_names()
        md = image.ImageMetadata(render_time_seconds=render_time,
                                 samples_per_pixel=spp)
        image.write_exr(path, chans, md, channel_names=tuple(names))
