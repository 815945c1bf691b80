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
