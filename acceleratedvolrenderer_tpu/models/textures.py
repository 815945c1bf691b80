"""Textures — spatially varying material parameters over surface uv.

Reference: src/pbrt/textures.h (39 classes; ConstantTexture, ScaleTexture,
CheckerboardTexture, ImageTexture/mipmaps util/mipmap.cpp).  TPU-native
subset: textures are pure batched functions uv -> value; image lookups are
bilinear gathers on an HBM-resident array (mip pyramids are precomputed
numpy-side; lookup picks level 0 — ray differentials round-2).

A "float texture" returns (N,); an "rgb texture" returns (N, 3) which
materials convert to spectra via the Smits basis at shading time.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ConstantTexture:
    value: float = 1.0

    def eval(self, uv):
        return jnp.full(uv.shape[:-1], jnp.float32(self.value))


@dataclass(frozen=True)
class ConstantRGBTexture:
    rgb: tuple = (1.0, 1.0, 1.0)

    def eval(self, uv):
        return jnp.broadcast_to(jnp.asarray(self.rgb, jnp.float32),
                                uv.shape[:-1] + (3,))


@dataclass(frozen=True)
class ScaleTexture:
    base: object
    scale: float = 1.0

    def eval(self, uv):
        return self.base.eval(uv) * jnp.float32(self.scale)


@dataclass(frozen=True)
class CheckerboardTexture:
    """2D checker in uv (pbrt CheckerboardTexture, dimension=2)."""
    tex1: object
    tex2: object
    uscale: float = 1.0
    vscale: float = 1.0

    def eval(self, uv):
        iu = jnp.floor(uv[..., 0] * self.uscale).astype(jnp.int32)
        iv = jnp.floor(uv[..., 1] * self.vscale).astype(jnp.int32)
        odd = ((iu + iv) % 2) != 0
        a = self.tex1.eval(uv)
        b = self.tex2.eval(uv)
        if a.ndim > odd.ndim:
            odd = odd[..., None]
        return jnp.where(odd, b, a)


@dataclass(frozen=True)
class UVTexture:
    """Debug: rgb = (u, v, 0)."""

    def eval(self, uv):
        z = jnp.zeros(uv.shape[:-1] + (1,), jnp.float32)
        return jnp.concatenate([uv, z], -1)


@dataclass(frozen=True)
class MixTexture:
    tex1: object
    tex2: object
    amount: float = 0.5

    def eval(self, uv):
        a = self.tex1.eval(uv)
        b = self.tex2.eval(uv)
        return a * (1.0 - self.amount) + b * self.amount


class ImageTexture:
    """Bilinear image lookup, wrap-repeat (pbrt ImageTexture + mipmap L0)."""

    def __init__(self, image: np.ndarray, scale: float = 1.0,
                 invert: bool = False):
        img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = img[..., None]
        self.image = jnp.asarray(img)          # (H, W, C)
        self.scale = float(scale)
        self.invert = bool(invert)

    def eval(self, uv):
        H, W, C = self.image.shape
        u = uv[..., 0] % 1.0
        v = uv[..., 1] % 1.0
        x = u * W - 0.5
        y = v * H - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        x0w = x0 % W
        x1w = (x0 + 1) % W
        y0w = y0 % H
        y1w = (y0 + 1) % H
        im = self.image
        c00 = im[y0w, x0w]
        c01 = im[y0w, x1w]
        c10 = im[y1w, x0w]
        c11 = im[y1w, x1w]
        out = ((1 - fy)[..., None] * ((1 - fx)[..., None] * c00 + fx[..., None] * c01)
               + fy[..., None] * ((1 - fx)[..., None] * c10 + fx[..., None] * c11))
        out = out * self.scale
        if self.invert:
            out = 1.0 - out
        if C == 1:
            out = out[..., 0]
        return out
