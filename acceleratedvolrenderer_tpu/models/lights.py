"""Light sources + uniform light sampling.

Reference: src/pbrt/lights.{h,cpp} — LightBase lights.h:156, PointLight :191,
DistantLight :244, SpotLight :742, UniformInfiniteLight :508 and the
uniform/power light samplers (lightsamplers.h).

TPU-native: the scene's light list is *static* python structure; every light
exposes batched pure functions.  NEE evaluates the K candidate samples
un-branched and selects by sampled index (K is small in all target scenes),
which beats `lax.switch` on a vector machine.  Spectra are stored as
callables lam -> value evaluated at the ray batch's sampled wavelengths.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import warps
from ..utils import vecmath as vm


class LightLiSample(NamedTuple):
    L: jnp.ndarray        # (N, LANES)
    wi: jnp.ndarray       # (N, 3)
    dist: jnp.ndarray     # (N,) distance to the light sample (for shadow ray)
    pdf: jnp.ndarray      # (N,) solid-angle pdf
    valid: jnp.ndarray    # (N,) bool


@dataclass(frozen=True)
class DistantLight:
    """Directional light (lights.h:244).  direction = propagation direction
    of the emitted radiance (from -> to in .pbrt)."""
    direction: np.ndarray               # (3,) unit, world
    spectrum: Callable                  # lam -> emitted radiance
    scale: float = 1.0
    scene_radius: float = 1e4
    is_delta = True
    is_infinite = False

    def sample_li(self, p, u2, lam):
        n = p.shape[0]
        d = jnp.asarray(self.direction, jnp.float32)
        wi = jnp.broadcast_to(-d, (n, 3))
        L = jnp.broadcast_to(self.spectrum(lam) * self.scale, lam.shape)
        dist = jnp.full((n,), 2.0 * self.scene_radius)
        return LightLiSample(L, wi, dist, jnp.ones((n,)), jnp.ones((n,), bool))

    def pdf_li(self, p, wi):
        return jnp.zeros(p.shape[0])

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)


@dataclass(frozen=True)
class PointLight:
    position: np.ndarray
    spectrum: Callable                  # lam -> radiant intensity
    scale: float = 1.0
    is_delta = True
    is_infinite = False

    def sample_li(self, p, u2, lam):
        pl = jnp.asarray(self.position, jnp.float32)
        to = pl - p
        d2 = jnp.maximum(vm.length_squared(to), 1e-12)
        dist = jnp.sqrt(d2)
        wi = to / dist[..., None]
        L = self.spectrum(lam) * self.scale / d2[..., None]
        return LightLiSample(L, wi, dist, jnp.ones_like(dist), jnp.ones(dist.shape, bool))

    def pdf_li(self, p, wi):
        return jnp.zeros(p.shape[0])

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)


@dataclass(frozen=True)
class SpotLight:
    """Spot light (lights.h:742): smooth falloff between cosFalloffStart and
    cosFalloffEnd of the total cone angle."""
    position: np.ndarray
    direction: np.ndarray               # unit cone axis
    spectrum: Callable
    scale: float = 1.0
    cone_angle_deg: float = 30.0
    cone_delta_deg: float = 5.0
    is_delta = True
    is_infinite = False

    def sample_li(self, p, u2, lam):
        pl = jnp.asarray(self.position, jnp.float32)
        axis = jnp.asarray(self.direction, jnp.float32)
        to = pl - p
        d2 = jnp.maximum(vm.length_squared(to), 1e-12)
        dist = jnp.sqrt(d2)
        wi = to / dist[..., None]
        cos_t = vm.dot(-wi, axis)
        cos_end = np.cos(np.deg2rad(self.cone_angle_deg))
        cos_start = np.cos(np.deg2rad(self.cone_angle_deg - self.cone_delta_deg))
        from ..utils.math import smoothstep

        falloff = smoothstep(cos_t, cos_end, cos_start)
        L = self.spectrum(lam) * self.scale * falloff[..., None] / d2[..., None]
        return LightLiSample(L, wi, dist, jnp.ones_like(dist), falloff > 0)

    def pdf_li(self, p, wi):
        return jnp.zeros(p.shape[0])

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)


@dataclass(frozen=True)
class UniformInfiniteLight:
    """Constant environment (lights.h:508)."""
    spectrum: Callable
    scale: float = 1.0
    scene_radius: float = 1e4
    is_delta = False
    is_infinite = True

    def sample_li(self, p, u2, lam):
        n = p.shape[0]
        wi = warps.sample_uniform_sphere(u2)
        L = jnp.broadcast_to(self.spectrum(lam) * self.scale, lam.shape)
        dist = jnp.full((n,), 2.0 * self.scene_radius)
        pdf = jnp.full((n,), warps.UNIFORM_SPHERE_PDF)
        return LightLiSample(L, wi, dist, pdf, jnp.ones((n,), bool))

    def pdf_li(self, p, wi):
        return jnp.full(p.shape[0], warps.UNIFORM_SPHERE_PDF)

    def le_escaped(self, d, lam):
        return self.spectrum(lam) * self.scale


@dataclass(frozen=True)
class DiffuseAreaLight:
    """Area emitter over a shape (lights.h:415 DiffuseAreaLight): uniform-
    area sampling converted to solid angle; pdf_li re-intersects the shape."""
    shape: object                       # models.shapes.* (sample/intersect/area)
    spectrum: Callable                  # lam -> emitted radiance
    scale: float = 1.0
    two_sided: bool = False
    is_delta = False
    is_infinite = False

    def sample_li(self, p, u2, lam):
        pl, nl, pdf_area = self.shape.sample(u2)
        to = pl - p
        d2 = jnp.maximum(vm.length_squared(to), 1e-12)
        dist = jnp.sqrt(d2)
        wi = to / dist[..., None]
        cos_l = vm.dot(nl, -wi)
        front = cos_l > 0
        emit = front | self.two_sided
        pdf_sa = pdf_area * d2 / jnp.maximum(jnp.abs(cos_l), 1e-9)
        L = jnp.where(emit[..., None],
                      jnp.broadcast_to(self.spectrum(lam) * self.scale,
                                       lam.shape), 0.0)
        return LightLiSample(L, wi, dist * (1.0 - 1e-3), pdf_sa,
                             emit & (jnp.abs(cos_l) > 1e-9))

    def pdf_li(self, p, wi):
        t, n, _ = self.shape.intersect(p, wi, jnp.full(p.shape[0], jnp.inf))
        hit = jnp.isfinite(t)
        cos_l = jnp.abs(vm.dot(n, -wi))
        d2 = t * t
        pdf = jnp.where(hit, d2 / (jnp.maximum(cos_l, 1e-9) * self.shape.area()),
                        0.0)
        return pdf

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)

    def power_estimate(self) -> float:
        # phi = L * area * pi * (2 if two_sided)
        sides = 2.0 if self.two_sided else 1.0
        return float(self.scale * self.shape.area() * np.pi * sides)


class ImageInfiniteLight:
    """Equal-importance environment map (lights.h:552 ImageInfiniteLight):
    equirectangular image, luminance-importance 2D inverse-CDF sampling."""
    is_delta = False
    is_infinite = True

    def __init__(self, image: np.ndarray, scale: float = 1.0,
                 scene_radius: float = 1e4, rotation=None):
        img = np.asarray(image, np.float32)
        assert img.ndim == 3 and img.shape[-1] == 3
        self.image = jnp.asarray(img)
        self.scale = float(scale)
        self.scene_radius = float(scene_radius)
        H, W, _ = img.shape
        lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
        # sin-theta weight for equirect solid-angle measure
        theta = (np.arange(H) + 0.5) / H * np.pi
        w = lum * np.sin(theta)[:, None] + 1e-12
        self._pdf_img = jnp.asarray(w / w.sum() * (H * W), np.float32)  # density in uv
        marg = w.sum(1)
        self._cdf_rows = jnp.asarray(np.cumsum(marg) / marg.sum(), np.float32)
        cond = np.cumsum(w, axis=1)
        cond = cond / cond[:, -1:]
        self._cdf_cols = jnp.asarray(cond, np.float32)
        self._H, self._W = H, W

    def _dir_to_uv(self, d):
        theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
        phi = jnp.arctan2(d[..., 1], d[..., 0]) % (2 * jnp.pi)
        return jnp.stack([phi / (2 * jnp.pi), theta / jnp.pi], -1)

    def _uv_to_dir(self, uv):
        phi = uv[..., 0] * 2 * jnp.pi
        theta = uv[..., 1] * jnp.pi
        st = jnp.sin(theta)
        return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                          jnp.cos(theta)], -1)

    def _lookup_rgb(self, uv):
        x = jnp.clip((uv[..., 0] * self._W).astype(jnp.int32), 0, self._W - 1)
        y = jnp.clip((uv[..., 1] * self._H).astype(jnp.int32), 0, self._H - 1)
        return self.image[y, x]

    def _pdf_uv(self, uv):
        x = jnp.clip((uv[..., 0] * self._W).astype(jnp.int32), 0, self._W - 1)
        y = jnp.clip((uv[..., 1] * self._H).astype(jnp.int32), 0, self._H - 1)
        return self._pdf_img[y, x]

    def _le_spectral(self, uv, lam):
        from ..utils import spectrum as sp

        rgb = self._lookup_rgb(uv)
        return sp.rgb_to_spectrum_smits_batched(rgb, lam) * self.scale

    def sample_li(self, p, u2, lam):
        n = p.shape[0]
        row = jnp.clip(jnp.searchsorted(self._cdf_rows, u2[..., 0]),
                       0, self._H - 1)
        cols = self._cdf_cols[row]
        col = jnp.clip(jax.vmap(jnp.searchsorted)(cols, u2[..., 1]),
                       0, self._W - 1)
        uv = jnp.stack([(col + 0.5) / self._W, (row + 0.5) / self._H], -1)
        wi = self._uv_to_dir(uv)
        theta = uv[..., 1] * jnp.pi
        # p(uv) -> p(omega): / (2 pi^2 sin(theta))
        pdf = self._pdf_uv(uv) / jnp.maximum(
            2.0 * jnp.pi * jnp.pi * jnp.sin(theta), 1e-9)
        L = self._le_spectral(uv, lam)
        dist = jnp.full((n,), 2.0 * self.scene_radius)
        return LightLiSample(L, wi, dist, pdf, pdf > 0)

    def pdf_li(self, p, wi):
        uv = self._dir_to_uv(wi)
        theta = uv[..., 1] * jnp.pi
        return self._pdf_uv(uv) / jnp.maximum(
            2.0 * jnp.pi * jnp.pi * jnp.sin(theta), 1e-9)

    def le_escaped(self, d, lam):
        return self._le_spectral(self._dir_to_uv(d), lam)

    def power_estimate(self) -> float:
        img = np.asarray(self.image)
        lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
        return float(4 * np.pi * np.pi * self.scale * lum.mean())


class PortalImageInfiniteLight:
    """Portal-windowed environment light (lights.h:639
    PortalImageInfiniteLight, lights.cpp:1109-1337).

    The reference rectifies the equal-area environment map into a portal-
    aligned (alpha, beta) = (atan(x/z), atan(y/z)) parameterization and
    importance-samples it restricted to the image window subtended by the
    portal quad from the shading point, via a summed-area-table
    WindowedPiecewiseConstant2D (util/sampling.h).

    TPU reshape: the SAT lives as a (R+1, R+1) jnp array; windowed CDF
    inversion is a fixed-iteration vectorized bisection over the whole ray
    batch (the distribution is piecewise constant, so bisection on the
    bilinearly-interpolated SAT is exact), replacing the per-thread
    binary search.  Rectification happens once on host in numpy.
    """
    is_delta = False
    is_infinite = True

    def __init__(self, image: np.ndarray, portal, scale: float = 1.0,
                 scene_center=(0.0, 0.0, 0.0), scene_radius: float = 1e4,
                 mapping: str = "equalarea"):
        from ..utils import sky as _sky

        img = np.asarray(image, np.float32)
        assert img.ndim == 3 and img.shape[-1] == 3
        p = np.asarray(portal, np.float64)
        assert p.shape == (4, 3), "portal needs 4 vertices"
        self.portal = p.astype(np.float32)
        self.scale = float(scale)
        self.scene_radius = float(scene_radius)
        self.scene_center = np.asarray(scene_center, np.float32)

        # portal frame (Frame::FromXY(p03, p01), lights.cpp:1152)
        def _nrm(v):
            return v / np.linalg.norm(v)

        fx = _nrm(p[3] - p[0])
        fy = _nrm(p[1] - p[0])
        fz = _nrm(np.cross(fx, fy))
        self._fx = jnp.asarray(fx, jnp.float32)
        self._fy = jnp.asarray(fy, jnp.float32)
        self._fz = jnp.asarray(fz, jnp.float32)

        # rectify the env map into the portal parameterization
        # (lights.cpp:1156-1173); square resolution kept
        R = min(img.shape[0], img.shape[1])
        self._R = R
        ix = (np.arange(R) + 0.5) / R
        uu, vv = np.meshgrid(ix, ix)                       # (R, R) u=x, v=y
        alpha = -np.pi / 2 + uu * np.pi
        beta = -np.pi / 2 + vv * np.pi
        tx, ty = np.tan(alpha), np.tan(beta)
        wl = np.stack([tx, ty, np.ones_like(tx)], -1)
        wl /= np.linalg.norm(wl, axis=-1, keepdims=True)
        wworld = wl[..., 0:1] * fx + wl[..., 1:2] * fy + wl[..., 2:3] * fz
        if mapping == "equalarea":
            src_uv = _sky.equal_area_sphere_to_square(wworld)
            sx = np.clip((src_uv[..., 0] * img.shape[1]).astype(np.int64),
                         0, img.shape[1] - 1)
            sy = np.clip((src_uv[..., 1] * img.shape[0]).astype(np.int64),
                         0, img.shape[0] - 1)
        else:  # equirect source
            th = np.arccos(np.clip(wworld[..., 2], -1, 1))
            ph = np.arctan2(wworld[..., 1], wworld[..., 0]) % (2 * np.pi)
            sx = np.clip((ph / (2 * np.pi) * img.shape[1]).astype(np.int64),
                         0, img.shape[1] - 1)
            sy = np.clip((th / np.pi * img.shape[0]).astype(np.int64),
                         0, img.shape[0] - 1)
        rect = img[sy, sx]                                  # (R, R, 3)
        self.image = jnp.asarray(rect)

        # sampling weights d(x,y) = mean(rgb) * dw/duv so pdf_omega ∝ L
        # (Image::GetSamplingDistribution with the duv_dw callback,
        # lights.cpp:1175-1181)
        dw_duv = (np.pi ** 2 * (1 - wl[..., 0] ** 2) * (1 - wl[..., 1] ** 2)
                  / np.maximum(wl[..., 2], 1e-9))
        d = np.maximum(rect.mean(-1), 0.0).astype(np.float64) * dw_duv
        self._d = jnp.asarray(d, jnp.float32)               # density numerator
        # SAT: sat[j, i] = sum of d over pixels [0..i) x [0..j), scaled so
        # the full-window integral equals mean(d) (uv measure)
        sat = np.zeros((R + 1, R + 1), np.float64)
        np.cumsum(np.cumsum(d, 0), 1, out=sat[1:, 1:])
        self._sat = jnp.asarray(sat / (R * R), jnp.float32)
        # Phi (lights.cpp:1183): fluence * area
        e01 = np.linalg.norm(p[1] - p[0])
        e03 = np.linalg.norm(p[3] - p[0])
        self._area = float(e01 * e03)
        lum = rect.mean(-1).astype(np.float64)
        self._phi = float(scale * self._area
                          * (lum / np.maximum(dw_duv, 1e-9)).mean())

    # -- portal-space mapping (lights.h:685-715) --------------------------
    def _image_from_render(self, w):
        lx = vm.dot(w, self._fx)
        ly = vm.dot(w, self._fy)
        lz = vm.dot(w, self._fz)
        valid = lz > 1e-7
        lzs = jnp.maximum(lz, 1e-7)
        u = jnp.clip((jnp.arctan2(lx, lzs) + jnp.pi / 2) / jnp.pi, 0.0, 1.0)
        v = jnp.clip((jnp.arctan2(ly, lzs) + jnp.pi / 2) / jnp.pi, 0.0, 1.0)
        dw_duv = (jnp.pi ** 2 * (1 - lx * lx) * (1 - ly * ly) / lzs)
        return jnp.stack([u, v], -1), dw_duv, valid

    def _render_from_image(self, uv):
        alpha = -jnp.pi / 2 + uv[..., 0] * jnp.pi
        beta = -jnp.pi / 2 + uv[..., 1] * jnp.pi
        x, y = jnp.tan(alpha), jnp.tan(beta)
        wl = jnp.stack([x, y, jnp.ones_like(x)], -1)
        wl = wl / jnp.linalg.norm(wl, axis=-1, keepdims=True)
        w = (wl[..., 0:1] * self._fx + wl[..., 1:2] * self._fy
             + wl[..., 2:3] * self._fz)
        dw_duv = (jnp.pi ** 2 * (1 - wl[..., 0] ** 2) * (1 - wl[..., 1] ** 2)
                  / jnp.maximum(wl[..., 2], 1e-9))
        return w, dw_duv

    def _bounds(self, pt):
        """Image-space window subtended by the portal (lights.h ImageBounds)."""
        c0 = jnp.asarray(self.portal[0])
        c2 = jnp.asarray(self.portal[2])
        w0 = vm.normalize(c0 - pt)
        w1 = vm.normalize(c2 - pt)
        uv0, _, v0 = self._image_from_render(w0)
        uv1, _, v1 = self._image_from_render(w1)
        lo = jnp.minimum(uv0, uv1)
        hi = jnp.maximum(uv0, uv1)
        return lo, hi, v0 & v1

    # -- SAT windowed distribution (util/sampling.h WindowedPiecewise-
    #    Constant2D, reshaped: bilinear SAT + fixed-iteration bisection) --
    def _sat_at(self, u, v):
        R = self._R
        xf = jnp.clip(u, 0.0, 1.0) * R
        yf = jnp.clip(v, 0.0, 1.0) * R
        x0 = jnp.clip(xf.astype(jnp.int32), 0, R - 1)
        y0 = jnp.clip(yf.astype(jnp.int32), 0, R - 1)
        fx = xf - x0
        fy = yf - y0
        s = self._sat
        s00 = s[y0, x0]
        s01 = s[y0, x0 + 1]
        s10 = s[y0 + 1, x0]
        s11 = s[y0 + 1, x0 + 1]
        return ((1 - fx) * (1 - fy) * s00 + fx * (1 - fy) * s01
                + (1 - fx) * fy * s10 + fx * fy * s11)

    def _window_integral(self, lo, hi):
        return (self._sat_at(hi[..., 0], hi[..., 1])
                - self._sat_at(lo[..., 0], hi[..., 1])
                - self._sat_at(hi[..., 0], lo[..., 1])
                + self._sat_at(lo[..., 0], lo[..., 1]))

    def _density(self, uv):
        R = self._R
        x = jnp.clip((uv[..., 0] * R).astype(jnp.int32), 0, R - 1)
        y = jnp.clip((uv[..., 1] * R).astype(jnp.int32), 0, R - 1)
        return self._d[y, x]

    def _sample_windowed(self, u2, lo, hi):
        """Sample uv ∝ d within window; returns (uv, pdf_uv-within-window)."""
        x0, y0 = lo[..., 0], lo[..., 1]
        x1, y1 = hi[..., 0], hi[..., 1]

        def colint(x):  # integral over [x0, x] x [y0, y1]
            return (self._sat_at(x, y1) - self._sat_at(x, y0)
                    - self._sat_at(x0, y1) + self._sat_at(x0, y0))

        total = colint(x1)
        tgt = u2[..., 0] * total

        def _bis_x(_, ab):
            a, b = ab
            m = 0.5 * (a + b)
            gt = colint(m) < tgt
            return jnp.where(gt, m, a), jnp.where(gt, b, m)

        a, b = jax.lax.fori_loop(0, 24, _bis_x, (x0, x1))
        x = 0.5 * (a + b)             # exact to float32 on a pwc density
        # conditional along the sampled pixel column
        R = self._R
        ix = jnp.clip((x * R).astype(jnp.int32), 0, R - 1)
        cx0, cx1 = ix / R, (ix + 1) / R

        def rowint(y):  # integral over the column x [y0, y]
            return (self._sat_at(cx1, y) - self._sat_at(cx0, y)
                    - self._sat_at(cx1, y0) + self._sat_at(cx0, y0))

        ctot = rowint(y1)
        tgt2 = u2[..., 1] * ctot

        def _bis_y(_, ab):
            a, b = ab
            m = 0.5 * (a + b)
            gt = rowint(m) < tgt2
            return jnp.where(gt, m, a), jnp.where(gt, b, m)

        a, b = jax.lax.fori_loop(0, 24, _bis_y, (y0, y1))
        y = 0.5 * (a + b)
        uv = jnp.stack([x, y], -1)
        # pointwise density: each pixel's weight d covers uv-area 1/R^2 and
        # the SAT is scaled by 1/R^2, so density(uv) = d[pixel] directly
        pdf_uv = self._density(uv) / jnp.maximum(total, 1e-20)
        return uv, pdf_uv, total > 0

    # -- light interface ---------------------------------------------------
    def _le_spectral(self, uv, lam):
        from ..utils import spectrum as sp

        R = self._R
        x = jnp.clip((uv[..., 0] * R).astype(jnp.int32), 0, R - 1)
        y = jnp.clip((uv[..., 1] * R).astype(jnp.int32), 0, R - 1)
        rgb = self.image[y, x]
        return sp.rgb_to_spectrum_smits_batched(rgb, lam) * self.scale

    def sample_li(self, p, u2, lam):
        n = p.shape[0]
        lo, hi, bvalid = self._bounds(p)
        uv, pdf_uv, ok = self._sample_windowed(u2, lo, hi)
        wi, dw_duv = self._render_from_image(uv)
        # pdf_omega = pdf_uv / (dw/duv)  (lights.cpp:1243 "mapPDF / duv_dw")
        pdf = pdf_uv / jnp.maximum(dw_duv, 1e-9)
        L = self._le_spectral(uv, lam)
        dist = jnp.full((n,), 2.0 * self.scene_radius)
        valid = bvalid & ok & (pdf > 0)
        return LightLiSample(L, wi, dist, jnp.maximum(pdf, 1e-20), valid)

    def pdf_li(self, p, wi):
        uv, dw_duv, dvalid = self._image_from_render(wi)
        lo, hi, bvalid = self._bounds(p)
        inside = (jnp.all(uv >= lo, -1) & jnp.all(uv <= hi, -1))
        integ = self._window_integral(lo, hi)
        pdf_uv = self._density(uv) / jnp.maximum(integ, 1e-20)
        return jnp.where(dvalid & bvalid & inside & (integ > 0),
                         pdf_uv / jnp.maximum(dw_duv, 1e-9), 0.0)

    def le_escaped(self, d, lam):
        # reference Le checks ray.o's ImageBounds (lights.cpp:1208); the
        # escaped-ray interface carries direction only, so the window check
        # uses the scene center as the origin proxy
        uv, _, dvalid = self._image_from_render(d)
        lo, hi, bvalid = self._bounds(
            jnp.broadcast_to(jnp.asarray(self.scene_center), d.shape))
        inside = (jnp.all(uv >= lo, -1) & jnp.all(uv <= hi, -1))
        L = self._le_spectral(uv, lam)
        return jnp.where((dvalid & bvalid & inside)[..., None], L, 0.0)

    def power_estimate(self) -> float:
        return max(self._phi, 1e-9)


@dataclass(frozen=True)
class ProjectionLight:
    """Image-projector point light (lights.h:308): intensity modulated by an
    image over the projection field of view along `direction`."""
    position: np.ndarray
    direction: np.ndarray
    image: object                        # textures.ImageTexture-like (rgb)
    spectrum: Callable
    scale: float = 1.0
    fov_deg: float = 45.0
    is_delta = True
    is_infinite = False

    def _frame(self):
        z = np.asarray(self.direction, np.float64)
        z = z / np.linalg.norm(z)
        up = np.array([0, 1, 0.0]) if abs(z[1]) < 0.9 else np.array([1, 0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        return (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                jnp.asarray(z, jnp.float32))

    def sample_li(self, p, u2, lam):
        from ..utils import spectrum as sp

        pl = jnp.asarray(self.position, jnp.float32)
        to = pl - p
        d2 = jnp.maximum(vm.length_squared(to), 1e-12)
        dist = jnp.sqrt(d2)
        wi = to / dist[..., None]
        bx, by, bz = self._frame()
        w = -wi  # direction light -> point
        lz = vm.dot(w, bz)
        tan_half = np.tan(np.deg2rad(self.fov_deg) / 2)
        u = vm.dot(w, bx) / jnp.maximum(lz, 1e-9) / tan_half * 0.5 + 0.5
        v = vm.dot(w, by) / jnp.maximum(lz, 1e-9) / tan_half * 0.5 + 0.5
        inside = (lz > 0) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        rgb = self.image.eval(jnp.stack([u, v], -1))
        mod = sp.rgb_to_spectrum_smits_batched(rgb, lam)
        L = (self.spectrum(lam) * self.scale) * mod / d2[..., None]
        L = jnp.where(inside[..., None], L, 0.0)
        return LightLiSample(L, wi, dist, jnp.ones_like(dist), inside)

    def pdf_li(self, p, wi):
        return jnp.zeros(p.shape[0])

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)

    def power_estimate(self) -> float:
        return float(self.scale)


@dataclass(frozen=True)
class GoniometricLight:
    """Point light with angular intensity distribution from an equirect
    image (lights.h:361)."""
    position: np.ndarray
    image: object
    spectrum: Callable
    scale: float = 1.0
    is_delta = True
    is_infinite = False

    def sample_li(self, p, u2, lam):
        from ..utils import spectrum as sp

        pl = jnp.asarray(self.position, jnp.float32)
        to = pl - p
        d2 = jnp.maximum(vm.length_squared(to), 1e-12)
        dist = jnp.sqrt(d2)
        wi = to / dist[..., None]
        w = -wi
        theta = jnp.arccos(jnp.clip(w[..., 2], -1, 1))
        phi = jnp.arctan2(w[..., 1], w[..., 0]) % (2 * jnp.pi)
        uv = jnp.stack([phi / (2 * jnp.pi), theta / jnp.pi], -1)
        rgb = self.image.eval(uv)
        if rgb.ndim == uv.ndim:
            mod = sp.rgb_to_spectrum_smits_batched(rgb, lam)
        else:
            mod = rgb[..., None]
        L = self.spectrum(lam) * self.scale * mod / d2[..., None]
        return LightLiSample(L, wi, dist, jnp.ones_like(dist),
                             jnp.ones(dist.shape, bool))

    def pdf_li(self, p, wi):
        return jnp.zeros(p.shape[0])

    def le_escaped(self, d, lam):
        return jnp.zeros(lam.shape)

    def power_estimate(self) -> float:
        return float(4 * np.pi * self.scale)


def light_power(lt) -> float:
    """Scalar power proxy for PowerLightSampler pmfs (lightsamplers.h)."""
    if hasattr(lt, "power_estimate"):
        return max(lt.power_estimate(), 1e-9)
    if isinstance(lt, PointLight):
        return max(4 * np.pi * lt.scale, 1e-9)
    if isinstance(lt, SpotLight):
        cos_end = np.cos(np.deg2rad(lt.cone_angle_deg))
        return max(2 * np.pi * (1 - cos_end) * lt.scale, 1e-9)
    if isinstance(lt, DistantLight):
        return max(np.pi * lt.scene_radius ** 2 * lt.scale, 1e-9)
    if isinstance(lt, UniformInfiniteLight):
        return max(4 * np.pi * np.pi * lt.scene_radius ** 2 * lt.scale, 1e-9)
    return 1.0




def _light_center(lt):
    """Representative position for adaptive (BVH-style) importance."""
    if hasattr(lt, "position"):
        return np.asarray(lt.position, np.float32)
    shape = getattr(lt, "shape", None)
    if shape is not None:
        if hasattr(shape, "center"):
            return np.asarray(shape.center, np.float32)
        if hasattr(shape, "origin"):
            o = np.asarray(shape.origin, np.float32)
            e1 = np.asarray(getattr(shape, "e1", 0.0), np.float32)
            e2 = np.asarray(getattr(shape, "e2", 0.0), np.float32)
            return o + 0.5 * e1 + 0.5 * e2
    return np.zeros(3, np.float32)


def _adaptive_pmfs(lights: List, p):
    """Per-point light pmfs — the BVHLightSampler capability
    (lightsamplers.h:260) computed exactly instead of via tree descent.

    The reference builds a BVH over LightBounds (center, power, orientation
    cone) and descends it per shading point to approximate importance
    ~ phi * cos(theta') / d^2 in O(log K) scalar work.  On TPU the whole
    K-vector of importances is one vectorized expression per point, so the
    approximation step is unnecessary: pmf_i(p) is the normalized exact
    importance, with the reference's pInfinite split for infinite lights
    (lightsamplers.h:267-277).  Returns (N, K) pmfs.
    """
    n = p.shape[0]
    k = len(lights)
    inf_mask = np.asarray([lt.is_infinite for lt in lights])
    n_inf = int(inf_mask.sum())
    n_fin = k - n_inf
    p_infinite = n_inf / (n_inf + (1 if n_fin else 0)) if k else 0.0
    imps = []
    for lt in lights:
        if lt.is_infinite:
            imps.append(jnp.zeros((n,)))
            continue
        phi = light_power(lt)
        if isinstance(lt, DistantLight):
            # unbounded direction light: constant importance (no distance)
            imps.append(jnp.full((n,), float(phi)))
            continue
        c = jnp.asarray(_light_center(lt))
        to = p - c
        d2 = jnp.maximum(jnp.sum(to * to, -1), 1e-8)
        imp = float(phi) / d2
        if isinstance(lt, SpotLight):
            # cone falloff factor (LightBounds orientation cone)
            dirn = jnp.asarray(np.asarray(lt.direction, np.float32))
            dirn = dirn / jnp.linalg.norm(dirn)
            cos_p = jnp.sum(to * dirn, -1) / jnp.sqrt(d2)
            cos_cone = float(np.cos(np.deg2rad(lt.cone_angle_deg)))
            imp = imp * jnp.where(cos_p >= cos_cone, 1.0, 1e-3)
        elif isinstance(lt, DiffuseAreaLight) and not lt.two_sided:
            shape = lt.shape
            nrm = None
            if hasattr(shape, "e1"):
                nv = np.cross(np.asarray(shape.e1, np.float64),
                              np.asarray(shape.e2, np.float64))
                ln = np.linalg.norm(nv)
                if ln > 0:
                    nrm = jnp.asarray((nv / ln).astype(np.float32))
            if nrm is not None:
                cos_t = jnp.sum(to * nrm, -1) / jnp.sqrt(d2)
                imp = imp * jnp.maximum(cos_t, 1e-3)
        imps.append(imp)
    imp_mat = jnp.stack(imps, -1)                          # (N, K)
    fin_sum = jnp.maximum(jnp.sum(imp_mat, -1), 1e-30)
    pmf = imp_mat / fin_sum[:, None] * (1.0 - p_infinite)
    if n_inf:
        pmf = pmf + jnp.asarray(inf_mask, jnp.float32) * (p_infinite / n_inf)
    return pmf

def sample_one_light(lights: List, p, u1, u2, lam, strategy: str = "uniform"):
    """Light sampler (lightsamplers.h): pick a light with pmf 1/K
    ("uniform", UniformLightSampler) or power-proportional ("power",
    PowerLightSampler), return its sample with pdf already including the pmf
    and per-light delta flag resolved via masked select."""
    k = len(lights)
    if k == 0:
        n = p.shape[0]
        z = jnp.zeros((n,))
        return (
            LightLiSample(jnp.zeros(lam.shape), jnp.zeros((n, 3)), z, z,
                          jnp.zeros((n,), bool)),
            jnp.zeros((n,), bool),
        )
    pmf_point = None
    if strategy == "bvh":
        pmf_point = _adaptive_pmfs(lights, p)              # (N, K)
        cdf = jnp.cumsum(pmf_point, -1)
        idx = jnp.sum((u1[:, None] >= cdf).astype(jnp.int32), -1)
        idx = jnp.clip(idx, 0, k - 1)
    elif strategy == "power":
        pw = np.asarray([light_power(lt) for lt in lights], np.float64)
        pmfs = pw / pw.sum()
        cdf = jnp.asarray(np.cumsum(pmfs), jnp.float32)
        idx = jnp.clip(jnp.searchsorted(cdf, u1), 0, k - 1)
        pmf_arr = jnp.asarray(pmfs, jnp.float32)
    else:
        idx = jnp.minimum((u1 * k).astype(jnp.int32), k - 1)
        pmf_arr = jnp.full((k,), 1.0 / k, jnp.float32)
    samples = [lt.sample_li(p, u2, lam) for lt in lights]
    out = samples[0]
    is_delta = jnp.full(p.shape[0], bool(lights[0].is_delta))
    for i in range(1, k):
        sel = idx == i
        out = LightLiSample(
            jnp.where(sel[:, None], samples[i].L, out.L),
            jnp.where(sel[:, None], samples[i].wi, out.wi),
            jnp.where(sel, samples[i].dist, out.dist),
            jnp.where(sel, samples[i].pdf, out.pdf),
            jnp.where(sel, samples[i].valid, out.valid),
        )
        is_delta = jnp.where(sel, bool(lights[i].is_delta), is_delta)
    if pmf_point is not None:
        pmf = jnp.take_along_axis(pmf_point, idx[:, None], axis=1)[:, 0]
    else:
        pmf = pmf_arr[idx]
    return LightLiSample(out.L, out.wi, out.dist, out.pdf * pmf, out.valid), is_delta


def pdf_one_light(lights: List, p, wi, strategy: str = "uniform"):
    """Combined pmf-weighted PDF_Li over all non-delta lights for MIS of
    path-sampled emitter hits (cpu/integrators.cpp MIS weights)."""
    k = len(lights)
    n = p.shape[0]
    if k == 0:
        return jnp.zeros((n,))
    if strategy == "bvh":
        pmf_mat = _adaptive_pmfs(lights, p)                # (N, K)
        pdf = jnp.zeros((n,))
        for i, lt in enumerate(lights):
            if not lt.is_delta:
                pdf = pdf + lt.pdf_li(p, wi) * pmf_mat[:, i]
        return pdf
    if strategy == "power":
        pw = np.asarray([light_power(lt) for lt in lights], np.float64)
        pmfs = pw / pw.sum()
    else:
        pmfs = np.full((k,), 1.0 / k)
    pdf = jnp.zeros((n,))
    for lt, pm in zip(lights, pmfs):
        if not lt.is_delta:
            pdf = pdf + lt.pdf_li(p, wi) * float(pm)
    return pdf


def escaped_radiance(lights: List, d, lam):
    """Sum of Le over infinite lights for escaped rays, plus per-light MIS
    pdf (uniform sampler pmf * PDF_Li) for the non-delta ones."""
    L = jnp.zeros(lam.shape)
    pdf = jnp.zeros(d.shape[0])
    k = max(len(lights), 1)
    for lt in lights:
        if lt.is_infinite:
            L = L + lt.le_escaped(d, lam)
            pdf = pdf + lt.pdf_li(d, d) / k
    return L, pdf
