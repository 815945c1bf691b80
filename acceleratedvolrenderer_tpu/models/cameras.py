"""Cameras — batched primary-ray generation.

Reference: src/pbrt/cameras.{h,cpp} (PerspectiveCamera cameras.h:340,
OrthographicCamera :283, SphericalCamera :406; CameraSample cameras.h:212).
TPU-native: a camera is a small pytree + a pure `generate_rays(pixel_xy, u)`
mapping the whole ray batch at once; no per-ray virtual dispatch.

pbrt's fov convention: the given field of view applies to the *shorter* image
axis (screen window spans [-1, 1] on that axis).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.vecmath import Transform, normalize


class PerspectiveCamera(NamedTuple):
    c2w: Transform          # camera-to-world (pbrt CameraTransform render side)
    fov_deg: float
    width: int
    height: int
    lens_radius: float = 0.0
    focal_distance: float = 1e6

    def generate_rays(self, pxy, u_film, u_lens=None):
        """pxy: (N, 2) integer pixel coords; u_film: (N, 2) jitter in [0,1).
        Returns (o, d) world-space with unit d."""
        w, h = self.width, self.height
        tan_half = float(np.tan(np.deg2rad(self.fov_deg) / 2.0))
        aspect = w / h
        if aspect > 1.0:
            sx, sy = tan_half * aspect, tan_half
        else:
            sx, sy = tan_half, tan_half / aspect
        px = (pxy[..., 0] + u_film[..., 0]) / w
        py = (pxy[..., 1] + u_film[..., 1]) / h
        x_cam = (2.0 * px - 1.0) * sx
        y_cam = (1.0 - 2.0 * py) * sy
        d_cam = jnp.stack([x_cam, y_cam, jnp.ones_like(x_cam)], axis=-1)
        if self.lens_radius > 0.0 and u_lens is not None:
            from ..ops.warps import sample_uniform_disk_concentric

            lens = sample_uniform_disk_concentric(u_lens) * self.lens_radius
            ft = self.focal_distance  # focus plane along +z
            p_focus = d_cam * (ft / d_cam[..., 2:3])
            o_cam = jnp.concatenate([lens, jnp.zeros_like(lens[..., :1])], axis=-1)
            d_cam = p_focus - o_cam
        else:
            o_cam = jnp.zeros_like(d_cam)
        o_w = self.c2w.apply_point(o_cam)
        d_w = normalize(self.c2w.apply_vector(d_cam))
        return o_w, d_w

    def _screen_half_extents(self):
        tan_half = float(np.tan(np.deg2rad(self.fov_deg) / 2.0))
        aspect = self.width / self.height
        if aspect > 1.0:
            return tan_half * aspect, tan_half
        return tan_half, tan_half / aspect

    def film_area_z1(self) -> float:
        """Area of the image window on the z=1 camera plane — the 'A' in
        the perspective importance We = 1/(A cos^4 theta)
        (cameras.cpp PerspectiveCamera::We)."""
        sx, sy = self._screen_half_extents()
        return float(4.0 * sx * sy)

    def project(self, p_world):
        """World point -> (raster_xy float, cos_theta vs camera forward,
        valid-in-frustum).  The t = 1 / light-tracing camera connection
        (cameras.cpp PerspectiveCamera::SampleWi raster mapping)."""
        w2c = self.c2w.inverse()
        pc = w2c.apply_point(p_world)
        z = pc[..., 2]
        ok_z = z > 1e-6
        zs = jnp.where(ok_z, z, 1.0)
        x_cam = pc[..., 0] / zs
        y_cam = pc[..., 1] / zs
        sx, sy = self._screen_half_extents()
        px = (x_cam / sx + 1.0) * 0.5 * self.width
        py = (1.0 - y_cam / sy) * 0.5 * self.height
        inside = (ok_z & (px >= 0) & (px < self.width)
                  & (py >= 0) & (py < self.height))
        dist = jnp.linalg.norm(pc, axis=-1)
        cos_t = jnp.where(dist > 0, z / jnp.maximum(dist, 1e-12), 0.0)
        return jnp.stack([px, py], -1), cos_t, inside

    @property
    def position(self):
        return self.c2w.apply_point(jnp.zeros((3,)))


class OrthographicCamera(NamedTuple):
    c2w: Transform
    screen_scale: float     # half-extent of the screen window on the short axis
    width: int
    height: int

    def generate_rays(self, pxy, u_film, u_lens=None):
        w, h = self.width, self.height
        aspect = w / h
        sx = self.screen_scale * (aspect if aspect > 1 else 1.0)
        sy = self.screen_scale * (1.0 if aspect > 1 else 1.0 / aspect)
        px = (pxy[..., 0] + u_film[..., 0]) / w
        py = (pxy[..., 1] + u_film[..., 1]) / h
        o_cam = jnp.stack(
            [(2 * px - 1) * sx, (1 - 2 * py) * sy, jnp.zeros_like(px)], axis=-1
        )
        d_cam = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), o_cam.shape)
        return self.c2w.apply_point(o_cam), normalize(self.c2w.apply_vector(d_cam))


class SphericalCamera(NamedTuple):
    """Equal-area spherical capture (cameras.h:406)."""
    c2w: Transform
    width: int
    height: int

    def generate_rays(self, pxy, u_film, u_lens=None):
        from ..utils.vecmath import equal_area_square_to_sphere

        w, h = self.width, self.height
        uv = jnp.stack(
            [(pxy[..., 0] + u_film[..., 0]) / w, (pxy[..., 1] + u_film[..., 1]) / h],
            axis=-1,
        )
        d_cam = equal_area_square_to_sphere(uv)
        # pbrt remaps (x, y, z) -> (-z up convention); keep simple z-forward
        o_cam = jnp.zeros_like(d_cam)
        return self.c2w.apply_point(o_cam), normalize(self.c2w.apply_vector(d_cam))


class RealisticCamera(NamedTuple):
    """Lens-system camera (cameras.h:466 RealisticCamera): rays trace from
    the film through a stack of spherical lens interfaces (the pbrt lens-
    file rows: curvature radius, thickness, ior, aperture diameter — mm,
    film-to-scene order), refracting at each element and clipped by each
    aperture.

    TPU reshape: the element loop is a short static unroll over the whole
    ray batch (every lens has < ~25 elements); vignetted rays return
    valid=False and the caller treats them as zero-radiance samples, which
    replaces the reference's exit-pupil-bounds resampling with simple
    rejection (unbiased, costs the vignetted fraction of samples).
    Focusing adjusts the rear thickness via the thick-lens equations
    exactly as RealisticCamera::FocusThickLens.
    """
    c2w: Transform
    elements: np.ndarray        # (E, 4) [curvature_radius, thickness, eta, ap_radius] in meters, film to scene
    width: int
    height: int
    film_diag: float = 0.035    # meters (35mm)
    rear_offset: float = 0.0    # film -> first element distance (set by focus)

    def _elem(self):
        return jnp.asarray(self.elements, jnp.float32)

    def generate_rays(self, pxy, u_film, u_lens=None):
        w, h = self.width, self.height
        aspect = w / h
        diag = self.film_diag
        fh = diag / np.sqrt(1 + aspect * aspect)
        fw = fh * aspect
        px = (pxy[..., 0] + u_film[..., 0]) / w
        py = (pxy[..., 1] + u_film[..., 1]) / h
        # film plane at z=0; lens stack extends toward +z (scene side)
        x_f = (0.5 - px) * fw
        y_f = (py - 0.5) * fh
        n = px.shape[0]
        o = jnp.stack([x_f, y_f, jnp.zeros_like(x_f)], -1)
        elems = self._elem()
        # sample the rear element's aperture
        if u_lens is None:
            u_lens = jnp.full((n, 2), 0.5)
        from ..ops.warps import sample_uniform_disk_concentric

        rear_ap = float(self.elements[0, 3])
        lens_p = sample_uniform_disk_concentric(u_lens) * rear_ap
        z0 = self.rear_offset
        target = jnp.concatenate(
            [lens_p, jnp.full_like(lens_p[..., :1], z0)], -1)
        d = target - o
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        valid = jnp.ones((n,), bool)
        z = z0
        eta_prev = 1.0
        E = self.elements.shape[0]
        for i in range(E):
            rad = float(self.elements[i, 0])
            thick = float(self.elements[i, 1])
            eta = float(self.elements[i, 2]) or 1.0
            ap = float(self.elements[i, 3])
            if rad == 0.0:
                # aperture stop: advance to the plane, clip
                t = (z - o[..., 2]) / jnp.where(
                    jnp.abs(d[..., 2]) > 1e-9, d[..., 2], 1e-9)
                p = o + t[..., None] * d
                r2 = p[..., 0] ** 2 + p[..., 1] ** 2
                valid = valid & (r2 <= ap * ap) & (t > 0)
                o = p
            else:
                # sphere centered on axis at z + rad
                cz = z + rad
                oc = o - jnp.asarray([0.0, 0.0, cz])
                b = jnp.sum(oc * d, -1)
                c = jnp.sum(oc * oc, -1) - rad * rad
                disc = b * b - c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                # pbrt: pick the hit on the optical-axis side per curvature
                use_closer = (d[..., 2] > 0) ^ (rad < 0)
                t = jnp.where(use_closer, -b - sq, -b + sq)
                p = o + t[..., None] * d
                r2 = p[..., 0] ** 2 + p[..., 1] ** 2
                valid = valid & (disc >= 0) & (r2 <= ap * ap) & (t > 0)
                nrm = (p - jnp.asarray([0.0, 0.0, cz])) / rad
                nrm = jnp.where(
                    (jnp.sum(nrm * d, -1) > 0)[..., None], -nrm, nrm)
                # refract d about nrm from eta_prev to eta
                ratio = eta_prev / eta
                cos_i = -jnp.sum(d * nrm, -1)
                sin2_t = ratio * ratio * jnp.maximum(1 - cos_i * cos_i, 0.0)
                tir = sin2_t > 1.0
                cos_t = jnp.sqrt(jnp.maximum(1 - sin2_t, 0.0))
                d = (ratio * d
                     + (ratio * cos_i - cos_t)[..., None] * nrm)
                d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
                valid = valid & ~tir
                o = p
                eta_prev = eta
            z += thick
        o_w = self.c2w.apply_point(o)
        d_w = normalize(self.c2w.apply_vector(d))
        # vignetted rays: aim at nothing (degenerate dir flags them); the
        # render drivers treat non-finite/zero-dir rays as black samples
        d_w = jnp.where(valid[..., None], d_w,
                        jnp.asarray([0.0, 0.0, 1.0]))
        o_w = jnp.where(valid[..., None], o_w, jnp.full((3,), 1e8))
        return o_w, d_w


def load_lens_file(path: str) -> np.ndarray:
    """pbrt .dat lens file: rows of curvature_radius thickness eta
    aperture_diameter (mm); returns (E, 4) meters with aperture RADIUS."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) == 4:
                rows.append(vals)
    e = np.asarray(rows, np.float64)
    e[:, 0] *= 1e-3        # radius mm -> m
    e[:, 1] *= 1e-3        # thickness
    e[:, 3] *= 0.5e-3      # diameter mm -> radius m
    # pbrt lens files are scene-to-film; we trace film-to-scene
    return e[::-1].copy()


# A public-domain style simple double-convex + stop + meniscus example
# prescription for tests and as a default (NOT the reference's dgauss.dat).
SIMPLE_LENS = np.array([
    #  radius(m) thick(m)  eta   ap_radius(m)
    [0.0350, 0.0020, 1.5168, 0.0130],
    [-0.2350, 0.0045, 1.0, 0.0130],
    [0.0, 0.0040, 1.0, 0.0090],       # stop
    [0.0420, 0.0025, 1.5168, 0.0110],
    [-0.0500, 0.0300, 1.0, 0.0110],
], np.float64)
