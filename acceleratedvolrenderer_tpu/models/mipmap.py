"""MIP map: image pyramid with trilinear and EWA filtered lookups.

Reference: util/mipmap.{h,cpp} — `MIPMap` resamples the base image to
power-of-two, builds a 2x2 box pyramid (Image::GeneratePyramid), and filters
with either trilinear level interpolation (`Filter`) or elliptically weighted
averaging (`EWA`) bounded by `maxAnisotropy`.

TPU-native reshaping: the reference's EWA scans a data-dependent bounding box
of the ellipse per lookup (a dynamic 2D loop — hostile to lockstep SIMD).
Here anisotropy is resolved with a FIXED probe count: the ellipse's minor
axis picks the mip level, and `n_probes` Gaussian-weighted bilinear taps are
placed along the major axis (the standard shader-space software-aniso
scheme; identical limit behavior, compile-time shapes).  All pyramid levels
live in ONE flat (sum_l H_l*W_l, C) array so a batch of lanes at different
lods is a single gather.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class MIPMap:
    """Box-filter pyramid over a wrap-repeat image.

    build: numpy-side (scene construction); lookups: batched jnp.
    """

    def __init__(self, image: np.ndarray, max_anisotropy: float = 8.0,
                 n_probes: int = 6):
        img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = img[..., None]
        H, W, C = img.shape
        # resample to power-of-two via bilinear (the reference uses a
        # separable reconstruction filter; bilinear keeps means exact)
        H2, W2 = _next_pow2(H), _next_pow2(W)
        if (H2, W2) != (H, W):
            ys = (np.arange(H2) + 0.5) * H / H2 - 0.5
            xs = (np.arange(W2) + 0.5) * W / W2 - 0.5
            y0 = np.floor(ys).astype(int)
            x0 = np.floor(xs).astype(int)
            fy = (ys - y0)[:, None, None]
            fx = (xs - x0)[None, :, None]
            y0w, y1w = y0 % H, (y0 + 1) % H
            x0w, x1w = x0 % W, (x0 + 1) % W
            img = ((1 - fy) * ((1 - fx) * img[np.ix_(y0w, x0w)]
                               + fx * img[np.ix_(y0w, x1w)])
                   + fy * ((1 - fx) * img[np.ix_(y1w, x0w)]
                           + fx * img[np.ix_(y1w, x1w)]))
            H, W = H2, W2
        levels = [img]
        while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
            prev = levels[-1]
            h, w = prev.shape[:2]
            nh, nw = max(h // 2, 1), max(w // 2, 1)
            # 2x2 box (Image::GeneratePyramid)
            p = prev[: nh * 2 if h > 1 else 1, : nw * 2 if w > 1 else 1]
            if h > 1 and w > 1:
                p = p.reshape(nh, 2, nw, 2, C).mean(axis=(1, 3))
            elif h > 1:
                p = p.reshape(nh, 2, 1, C).mean(axis=1)
            else:
                p = p.reshape(1, nw, 2, C).mean(axis=2)
            levels.append(p.astype(np.float32))
        self.n_levels = len(levels)
        self.shapes = [(l.shape[0], l.shape[1]) for l in levels]
        offs = np.cumsum([0] + [h * w for h, w in self.shapes])
        self.offsets = jnp.asarray(offs[:-1], jnp.int32)
        self.flat = jnp.asarray(
            np.concatenate([l.reshape(-1, C) for l in levels], axis=0))
        self.hs = jnp.asarray([h for h, _ in self.shapes], jnp.int32)
        self.ws = jnp.asarray([w for _, w in self.shapes], jnp.int32)
        self.channels = C
        self.max_anisotropy = float(max_anisotropy)
        self.n_probes = int(n_probes)

    # -- single-level bilinear over the flat storage ------------------------
    def _bilerp_level(self, uv, level):
        """uv (N, 2) in [0,1); level (N,) int32 -> (N, C)."""
        h = self.hs[level].astype(jnp.float32)
        w = self.ws[level].astype(jnp.float32)
        off = self.offsets[level]
        x = (uv[..., 0] % 1.0) * w - 0.5
        y = (uv[..., 1] % 1.0) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        hi = h.astype(jnp.int32)
        wi = w.astype(jnp.int32)
        x0w = jnp.mod(x0.astype(jnp.int32), wi)
        x1w = jnp.mod(x0.astype(jnp.int32) + 1, wi)
        y0w = jnp.mod(y0.astype(jnp.int32), hi)
        y1w = jnp.mod(y0.astype(jnp.int32) + 1, hi)
        g = lambda yy, xx: self.flat[off + yy * wi + xx]
        return ((1 - fy) * ((1 - fx) * g(y0w, x0w) + fx * g(y0w, x1w))
                + fy * ((1 - fx) * g(y1w, x0w) + fx * g(y1w, x1w)))

    def lookup_trilinear(self, uv, width):
        """Isotropic filtered lookup (MIPMap::Filter): `width` is the filter
        footprint in uv units; blends the two bracketing levels."""
        width = jnp.maximum(jnp.asarray(width, jnp.float32), 1e-8)
        lod = self.n_levels - 1 + jnp.log2(width)
        lod = jnp.clip(lod, 0.0, self.n_levels - 1)
        l0 = jnp.floor(lod).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, self.n_levels - 1)
        t = (lod - l0.astype(jnp.float32))[..., None]
        return ((1 - t) * self._bilerp_level(uv, l0)
                + t * self._bilerp_level(uv, l1))

    def lookup_ewa(self, uv, duv0, duv1):
        """Anisotropic lookup (MIPMap::EWA): duv0/duv1 (N, 2) are the uv
        footprint axes (texture-space differentials of the two screen
        directions).  Fixed-probe scheme: minor axis -> lod, `n_probes`
        Gaussian taps along the major axis."""
        len0 = jnp.linalg.norm(duv0, axis=-1)
        len1 = jnp.linalg.norm(duv1, axis=-1)
        swap = len1 > len0
        major = jnp.where(swap[..., None], duv1, duv0)
        maj_len = jnp.where(swap, len1, len0)
        min_len = jnp.where(swap, len0, len1)
        # clamp eccentricity (mipmap.cpp maxAnisotropy): widen the minor
        # axis rather than blurring the major one
        min_len = jnp.maximum(min_len, maj_len / self.max_anisotropy)
        lod_width = jnp.maximum(min_len, 1e-8)
        n = self.n_probes
        # probe positions: Gaussian quadrature-ish uniform offsets in
        # [-(1-1/n), (1-1/n)] along the major axis, weights exp(-2 r^2)
        ts = (2.0 * (np.arange(n) + 0.5) / n - 1.0).astype(np.float32)
        wts = np.exp(-2.0 * ts ** 2).astype(np.float32)
        wts /= wts.sum()
        out = 0.0
        for t, wt in zip(ts, wts):
            p = uv + major * jnp.float32(t)
            out = out + wt * self.lookup_trilinear(p, lod_width)
        return out


__all__ = ["MIPMap"]
