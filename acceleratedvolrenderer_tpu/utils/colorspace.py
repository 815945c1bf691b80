"""Color space conversions (reference: src/pbrt/util/color.h/colorspace.h).

Only the sRGB / CIE-XYZ pair is needed by the target scenes; matrices are the
standard IEC 61966-2-1 values.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB primaries, D65 white (standard matrix)
XYZ_TO_SRGB = np.array(
    [
        [3.2406, -1.5372, -0.4986],
        [-0.9689, 1.8758, 0.0415],
        [0.0557, -0.2040, 1.0570],
    ],
    np.float32,
)
SRGB_TO_XYZ = np.linalg.inv(XYZ_TO_SRGB.astype(np.float64)).astype(np.float32)


def _mat3(v, m):
    """(..., 3) x (3, 3)^T as broadcast multiply-adds: exact float32 on the
    TPU VPU (a 3-wide matmul would hit the MXU at bfloat16 precision and
    vary with batch shape)."""
    m = jnp.asarray(m)
    return (v[..., 0:1] * m[:, 0] + v[..., 1:2] * m[:, 1]
            + v[..., 2:3] * m[:, 2])


def xyz_to_rgb(xyz):
    return _mat3(xyz, XYZ_TO_SRGB)


def rgb_to_xyz(rgb):
    return _mat3(rgb, SRGB_TO_XYZ)


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))
