"""FunctionIntegrator — sampler-convergence test harness.

Reference: cpu/integrators.h:481 / cpu/integrators.cpp:3355-3560: every
pixel Monte-Carlo-integrates a known 2D function with the chosen sampler's
per-pixel point set; the integrator records MSE versus the analytic
integral at power-of-two sample counts, writing "<function>-mse.txt".
Registered as integrator "function".

TPU-native: all pixels are lanes of one vectorized estimate; sample counts
advance in a host loop with on-device accumulation.  The same stateless
(pixel, sample) -> (u1, u2) samplers used for film jitter are what is being
measured (models.samplers), so this doubles as their convergence test.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import samplers as samplers_mod

_SQRT2 = 1.414213562373095


def _gauss_integral(x0, x1, mu=0.0, sigma=1.0):
    return 0.5 * (math.erf((mu - x0) / (sigma * _SQRT2))
                  - math.erf((mu - x1) / (sigma * _SQRT2)))


def _checkerboard(u, v):
    freq = 10
    pix = (u * freq).astype(jnp.int32)
    piy = (v * freq).astype(jnp.int32)
    return jnp.where(((pix & 1) ^ (piy & 1)) != 0, 2.0, 0.0)


# name -> (f(u, v) jax fn, exact integral over [0,1]^2)
FUNCTIONS = {
    "step": (lambda u, v: jnp.where(u < 0.5, 2.0, 0.0), 1.0),
    "diagonal": (lambda u, v: jnp.where(u + v < 1.0, 2.0, 0.0), 1.0),
    "disk": (
        lambda u, v: jnp.where(
            (u - 0.5) ** 2 + (v - 0.5) ** 2 < 0.25,
            1.0 / (np.pi * 0.25), 0.0),
        1.0,
    ),
    "checkerboard": (_checkerboard, 1.0),
    "rotatedcheckerboard": (
        lambda u, v: _checkerboard(
            10.0 + u * np.cos(np.pi / 4) - v * np.sin(np.pi / 4),
            10.0 + u * np.sin(np.pi / 4) + v * np.cos(np.pi / 4),
        ) / 1.00006866455078125,
        1.0,
    ),
    "gaussian": (
        lambda u, v: (jnp.exp(-((u - 0.5) ** 2) / 2.0) / np.sqrt(2 * np.pi))
        * (jnp.exp(-((v - 0.5) ** 2) / 2.0) / np.sqrt(2 * np.pi)),
        _gauss_integral(-0.5, 0.5) ** 2,
    ),
}


def render_function(func_name: str = "step", *, width: int = 16,
                    height: int = 16, spp: int = 256,
                    sampler: str = "independent", seed: int = 0):
    """Run the convergence test.

    Returns (estimates (H, W) at full spp, [(n_samples, mse), ...] at
    power-of-two checkpoints — the contents of <function>-mse.txt)."""
    if func_name not in FUNCTIONS:
        raise ValueError(
            f"unknown function '{func_name}' (have {sorted(FUNCTIONS)})")
    f, exact = FUNCTIONS[func_name]
    n_pix = width * height
    pix_idx = jnp.arange(n_pix, dtype=jnp.uint32)
    pix_xy = jnp.stack([jnp.arange(n_pix, dtype=jnp.int32) % width,
                        jnp.arange(n_pix, dtype=jnp.int32) // width], -1)
    acc = jnp.zeros((n_pix,))
    mse_curve = []
    for s in range(spp):
        u1, u2, _ = samplers_mod.film_sample(
            sampler, pix_idx, jnp.full((n_pix,), s, jnp.uint32), spp,
            seed=seed, pix=pix_xy)
        acc = acc + f(u1, u2)
        n = s + 1
        if (n & (n - 1)) == 0:  # power of two checkpoint
            est = acc / n
            mse = float(jnp.mean((est - exact) ** 2))
            mse_curve.append((n, mse))
    est = np.asarray(acc / spp).reshape(height, width)
    return est, mse_curve


def write_mse_file(path: str, mse_curve) -> None:
    """The "<function>-mse.txt" artifact (integrators.cpp:3412)."""
    with open(path, "w") as fh:
        for n, mse in mse_curve:
            fh.write(f"{n} {mse}\n")
