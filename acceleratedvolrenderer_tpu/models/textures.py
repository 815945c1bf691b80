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

    def eval_ctx(self, uv, p=None, n=None):
        return eval_texture(self.base, uv, p=p, n=n) * jnp.float32(self.scale)

    def eval(self, uv):
        return self.eval_ctx(uv)


@dataclass(frozen=True)
class CheckerboardTexture:
    """2D checker in uv (pbrt CheckerboardTexture, dimension=2)."""
    tex1: object
    tex2: object
    uscale: float = 1.0
    vscale: float = 1.0

    def eval_ctx(self, uv, p=None, n=None):
        iu = jnp.floor(uv[..., 0] * self.uscale).astype(jnp.int32)
        iv = jnp.floor(uv[..., 1] * self.vscale).astype(jnp.int32)
        odd = ((iu + iv) % 2) != 0
        a = eval_texture(self.tex1, uv, p=p, n=n)
        b = eval_texture(self.tex2, uv, p=p, n=n)
        if a.ndim > odd.ndim:
            odd = odd[..., None]
        return jnp.where(odd, b, a)

    def eval(self, uv):
        return self.eval_ctx(uv)


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

    def eval_ctx(self, uv, p=None, n=None):
        a = eval_texture(self.tex1, uv, p=p, n=n)
        b = eval_texture(self.tex2, uv, p=p, n=n)
        return a * (1.0 - self.amount) + b * self.amount

    def eval(self, uv):
        return self.eval_ctx(uv)


class ImageTexture:
    """Bilinear image lookup, wrap-repeat (pbrt ImageTexture).

    `filtered=True` builds a MIPMap (models.mipmap: trilinear + fixed-probe
    EWA, the util/mipmap.cpp capability) used by eval_filtered/eval_ewa when
    the caller tracks uv footprints (ray differentials)."""

    def __init__(self, image: np.ndarray, scale: float = 1.0,
                 invert: bool = False, filtered: bool = False,
                 max_anisotropy: float = 8.0):
        img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = img[..., None]
        self.image = jnp.asarray(img)          # (H, W, C)
        self.scale = float(scale)
        self.invert = bool(invert)
        self.mipmap = None
        if filtered:
            from .mipmap import MIPMap

            self.mipmap = MIPMap(img, max_anisotropy=max_anisotropy)

    def _post(self, out):
        out = out * self.scale
        if self.invert:
            out = 1.0 - out
        if self.image.shape[2] == 1:
            out = out[..., 0]
        return out

    def eval_filtered(self, uv, width):
        """Trilinear mip lookup (MIPMap::Filter); width = uv footprint."""
        assert self.mipmap is not None, "construct with filtered=True"
        return self._post(self.mipmap.lookup_trilinear(uv, width))

    def eval_ewa(self, uv, duv0, duv1):
        """Anisotropic EWA lookup (MIPMap::EWA)."""
        assert self.mipmap is not None, "construct with filtered=True"
        return self._post(self.mipmap.lookup_ewa(uv, duv0, duv1))

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


# ---------------------------------------------------------------------------
# Noise textures (textures.h: FBmTexture, WrinkledTexture, WindyTexture,
# MarbleTexture, DotsTexture, BilerpTexture).  Perlin-gradient noise with a
# hashed permutation replaces the reference's static table (util/math.cpp
# Noise) — same octave/omega fractal knobs.
# ---------------------------------------------------------------------------

def _hash3(ix, iy, iz):
    h = (ix.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ iy.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         ^ iz.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    h ^= h >> 15
    h *= jnp.uint32(0x2C1B3C6D)
    h ^= h >> 12
    return h


def _grad(ix, iy, iz, fx, fy, fz):
    h = _hash3(ix, iy, iz) & 15
    u = jnp.where(h < 8, fx, fy)
    v = jnp.where(h < 4, fy, jnp.where((h == 12) | (h == 14), fx, fz))
    return (jnp.where(h & 1 == 0, u, -u)
            + jnp.where(h & 2 == 0, v, -v))


def perlin_noise(p):
    """Gradient noise at points p (..., 3) -> (...,) in ~[-1, 1]."""
    pi = jnp.floor(p)
    pf = p - pi
    ix = pi[..., 0].astype(jnp.int32)
    iy = pi[..., 1].astype(jnp.int32)
    iz = pi[..., 2].astype(jnp.int32)
    fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]

    def fade(t):
        return t * t * t * (t * (t * 6 - 15) + 10)

    wx, wy, wz = fade(fx), fade(fy), fade(fz)
    n = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            n00 = _grad(ix, iy + dy, iz + dz, fx, fy - dy, fz - dz)
            n10 = _grad(ix + 1, iy + dy, iz + dz, fx - 1, fy - dy, fz - dz)
            nx = n00 + wx * (n10 - n00)
            if dy == 0:
                ny0 = nx
            else:
                ny = ny0 + wy * (nx - ny0)
                if dz == 0:
                    nz0 = ny
                else:
                    n = nz0 + wz * (ny - nz0)
    return n


def fbm(p, octaves: int = 6, omega: float = 0.5):
    """Fractional Brownian motion (util/math.cpp FBm)."""
    total = 0.0
    lam, o = 1.0, 1.0
    for _ in range(octaves):
        total = total + o * perlin_noise(p * lam)
        lam *= 1.99
        o *= omega
    return total


def turbulence(p, octaves: int = 6, omega: float = 0.5):
    """Sum of |noise| octaves (util/math.cpp Turbulence)."""
    total = 0.0
    lam, o = 1.0, 1.0
    for _ in range(octaves):
        total = total + o * jnp.abs(perlin_noise(p * lam))
        lam *= 1.99
        o *= omega
    return total


def _uv3(uv, scale):
    return jnp.stack([uv[..., 0] * scale, uv[..., 1] * scale,
                      jnp.zeros_like(uv[..., 0])], -1)


@dataclass(frozen=True)
class FBmTexture:
    octaves: int = 6
    omega: float = 0.5
    scale: float = 8.0

    def eval(self, uv):
        return fbm(_uv3(uv, self.scale), self.octaves, self.omega)


@dataclass(frozen=True)
class WrinkledTexture:
    octaves: int = 6
    omega: float = 0.5
    scale: float = 8.0

    def eval(self, uv):
        return turbulence(_uv3(uv, self.scale), self.octaves, self.omega)


@dataclass(frozen=True)
class WindyTexture:
    """textures.h WindyTexture: low-frequency wind strength modulating
    higher-frequency waves."""
    scale: float = 8.0

    def eval(self, uv):
        p = _uv3(uv, self.scale)
        strength = jnp.abs(fbm(0.1 * p, 3, 0.5))
        height = fbm(p, 6, 0.5)
        return strength * jnp.abs(height)


@dataclass(frozen=True)
class MarbleTexture:
    """textures.h MarbleTexture: sin-warped fbm mapped through a color
    spline; returns (N, 3) rgb."""
    scale: float = 4.0
    variation: float = 0.2
    octaves: int = 6
    omega: float = 0.5

    def eval(self, uv):
        p = _uv3(uv, self.scale)
        t = 0.5 + 0.5 * jnp.sin(
            self.scale * uv[..., 1]
            + self.variation * fbm(p, self.octaves, self.omega) * 10.0)
        c = jnp.asarray([
            [0.58, 0.58, 0.6], [0.58, 0.58, 0.6], [0.58, 0.58, 0.6],
            [0.5, 0.5, 0.5], [0.6, 0.59, 0.58], [0.58, 0.58, 0.6],
            [0.58, 0.58, 0.6], [0.2, 0.2, 0.33], [0.58, 0.58, 0.6],
        ])
        k = t * (len(c) - 1)
        i0 = jnp.clip(k.astype(jnp.int32), 0, len(c) - 2)
        f = (k - i0)[..., None]
        return c[i0] * (1 - f) + c[i0 + 1] * f


@dataclass(frozen=True)
class DotsTexture:
    """textures.h DotsTexture: polka dots with hashed per-cell centers."""
    inside: float = 1.0
    outside: float = 0.0
    scale: float = 8.0

    def eval(self, uv):
        su = uv[..., 0] * self.scale
        sv = uv[..., 1] * self.scale
        cu = jnp.floor(su).astype(jnp.int32)
        cv = jnp.floor(sv).astype(jnp.int32)
        h = _hash3(cu, cv, jnp.zeros_like(cu))
        has_dot = (h & 0xFF) < 128
        cx = cu + 0.35 + 0.3 * ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
        cy = cv + 0.35 + 0.3 * ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
        r = 0.35 * ((h >> 24) & 0xFF).astype(jnp.float32) / 255.0 + 0.1
        inside = has_dot & ((su - cx) ** 2 + (sv - cy) ** 2 < r * r)
        return jnp.where(inside, self.inside, self.outside)


# ---------------------------------------------------------------------------
# Texture-coordinate mappings (textures.h:86-248 UVMapping, SphericalMapping,
# CylindricalMapping, PlanarMapping, PointTransformMapping).  Batched: each
# `map(uv, p)` takes the hit parameterization (N, 2) and the render-space hit
# position (N, 3) and returns texture coordinates (N, 2) ((N, 3) for the 3D
# mapping).  Differentials (dsdx/dtdx) are round-3 with ray differentials.
# ---------------------------------------------------------------------------

def _xform_p(m, p, uv=None):
    """Apply a 4x4 texture-from-render transform to points (N, 3).

    When the hit position is unavailable (p is None — e.g. a mapped
    texture evaluated through a parent that only forwards uv, or the
    constant-parameter path), fall back to lifting uv into 3D so the
    mapping stays defined instead of crashing; positional mappings then
    degrade to a uv-derived parameterization."""
    if p is None:
        if uv is None:
            raise ValueError("positional texture mapping evaluated with "
                             "neither hit position nor uv")
        z = jnp.zeros(uv.shape[:-1] + (1,), jnp.float32)
        p = jnp.concatenate([uv[..., :2], z], -1)
    if m is None:
        return p
    m = jnp.asarray(m, jnp.float32)
    return p @ m[:3, :3].T + m[:3, 3]


@dataclass(frozen=True)
class UVMapping:
    """st = (su*u + du, sv*v + dv) (textures.h:86)."""
    su: float = 1.0
    sv: float = 1.0
    du: float = 0.0
    dv: float = 0.0

    def map(self, uv, p=None):
        return jnp.stack([uv[..., 0] * self.su + self.du,
                          uv[..., 1] * self.sv + self.dv], -1)


@dataclass(frozen=True)
class SphericalMapping:
    """(theta/pi, phi/2pi) of the texture-space hit point (textures.h:109)."""
    texture_from_render: Optional[tuple] = None   # 4x4 row-major

    def map(self, uv, p=None):
        pt = _xform_p(self.texture_from_render, p, uv)
        v = pt / jnp.maximum(jnp.linalg.norm(pt, axis=-1, keepdims=True),
                             1e-20)
        theta = jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))
        phi = jnp.arctan2(v[..., 1], v[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
        return jnp.stack([theta / np.pi, phi / (2 * np.pi)], -1)


@dataclass(frozen=True)
class CylindricalMapping:
    """((pi + atan2(y, x)) / 2pi, z) (textures.h:147)."""
    texture_from_render: Optional[tuple] = None

    def map(self, uv, p=None):
        pt = _xform_p(self.texture_from_render, p, uv)
        s = (np.pi + jnp.arctan2(pt[..., 1], pt[..., 0])) / (2 * np.pi)
        return jnp.stack([s, pt[..., 2]], -1)


@dataclass(frozen=True)
class PlanarMapping:
    """st = (ds + p.vs, dt + p.vt) (textures.h:175)."""
    vs: tuple = (1.0, 0.0, 0.0)
    vt: tuple = (0.0, 1.0, 0.0)
    ds: float = 0.0
    dt: float = 0.0
    texture_from_render: Optional[tuple] = None

    def map(self, uv, p=None):
        pt = _xform_p(self.texture_from_render, p, uv)
        vs = jnp.asarray(self.vs, jnp.float32)
        vt = jnp.asarray(self.vt, jnp.float32)
        return jnp.stack([self.ds + pt @ vs, self.dt + pt @ vt], -1)


@dataclass(frozen=True)
class PointTransformMapping:
    """3D mapping: texture-space point itself (textures.h:229)."""
    texture_from_render: Optional[tuple] = None

    def map(self, uv, p=None):
        return _xform_p(self.texture_from_render, p, uv)


@dataclass(frozen=True)
class MappedTexture:
    """Apply a TextureMapping2D before evaluating `base`.

    The reference threads the mapping through each texture's constructor
    (TextureMapping2D::Create); here it composes as a wrapper so every
    uv-domain texture gains spherical/cylindrical/planar/scaled-uv
    parameterizations without per-class plumbing."""
    base: object
    mapping: object

    def eval_ctx(self, uv, p=None, n=None):
        st = self.mapping.map(uv, p)
        return eval_texture(self.base, st, p=p, n=n)

    def eval(self, uv):
        return self.eval_ctx(uv)


@dataclass(frozen=True)
class DirectionMixTexture:
    """amt = |n . dir|; amt*tex1 + (1-amt)*tex2 (textures.h:832
    FloatDirectionMixTexture / :891 SpectrumDirectionMixTexture)."""
    tex1: object
    tex2: object
    dir: tuple = (0.0, 1.0, 0.0)

    def eval_ctx(self, uv, p=None, n=None):
        a = eval_texture(self.tex1, uv, p=p, n=n)
        b = eval_texture(self.tex2, uv, p=p, n=n)
        if n is None:
            amt = jnp.full(uv.shape[:-1], jnp.float32(1.0))
        else:
            d = jnp.asarray(self.dir, jnp.float32)
            d = d / jnp.maximum(jnp.linalg.norm(d), 1e-20)
            amt = jnp.abs(n @ d)
        if a.ndim > amt.ndim:
            amt = amt[..., None]
        return amt * a + (1.0 - amt) * b

    def eval(self, uv):
        return self.eval_ctx(uv)


def eval_texture(tex, uv, p=None, n=None):
    """Evaluate any texture with the full hit context.

    Textures that use position/normal define eval_ctx(uv, p, n); plain
    uv-domain textures define eval(uv).  This is the batched analogue of
    pbrt's TextureEvalContext dispatch (textures.h:1140)."""
    f = getattr(tex, "eval_ctx", None)
    if f is not None:
        return f(uv, p=p, n=n)
    return tex.eval(uv)


@dataclass(frozen=True)
class BilerpTexture:
    """textures.h BilerpTexture: bilinear blend of four corner values."""
    v00: float = 0.0
    v01: float = 1.0
    v10: float = 0.0
    v11: float = 1.0

    def eval(self, uv):
        u = jnp.clip(uv[..., 0], 0.0, 1.0)
        v = jnp.clip(uv[..., 1], 0.0, 1.0)
        return ((1 - u) * (1 - v) * self.v00 + (1 - u) * v * self.v01
                + u * (1 - v) * self.v10 + u * v * self.v11)


@dataclass(frozen=True)
class Checkerboard3DTexture:
    """Solid 3D checker over texture-space position (pbrt
    CheckerboardTexture with "integer dimension" 3, textures.h:386):
    parity of the floor()ed texture-space coordinates selects tex1/tex2.
    Positional — needs the hit point (falls back to uv-lifted positions
    via _xform_p when unavailable)."""
    tex1: object
    tex2: object
    texture_from_render: Optional[tuple] = None

    def eval_ctx(self, uv, p=None, n=None):
        pt = _xform_p(self.texture_from_render, p, uv)
        c = jnp.floor(pt).astype(jnp.int32)
        odd = ((c[..., 0] + c[..., 1] + c[..., 2]) % 2) != 0
        a = eval_texture(self.tex1, uv, p=p, n=n)
        b = eval_texture(self.tex2, uv, p=p, n=n)
        if a.ndim > odd.ndim:
            odd = odd[..., None]
        return jnp.where(odd, b, a)

    def eval(self, uv):
        return self.eval_ctx(uv)
