"""Differentiable rendering driver.

North-star requirement (BASELINE.json): pixel gradients w.r.t. per-voxel
sigma_t/sigma_s/emission matching finite differences.  The estimator is the
detached-sampling form (see volpath_fused docstring): with the majorant held
fixed, sample paths are parameter-independent, so reverse-mode AD through
the weight products is an unbiased gradient — and because the RNG is
counter-based, finite differences of the *estimator itself* (same seeds,
same majorant) agree with AD to float precision, which is the testable
contract.

The grid-parameter gradient is produced by XLA as a scatter-add over the
trilerp taps of every collision; under the sharded renderer it psums over
the mesh like any replicated-parameter gradient.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.integrators import volpath_fused
from ..ops import dda
from ..utils import spectrum as sp


def make_diff_renderer(scene, *, fixed_steps: int = 256, spp: int = 4,
                       majorant_inflation: float = 1.5):
    """Returns (render_L(density) -> (N, LANES) radiance, aux) where the
    majorant is frozen at `majorant_inflation` x the build-time density max
    so it stays an upper bound under optimization perturbations (the
    reference's majorant is also conservative-by-construction,
    media.cpp:240-246)."""
    cam = scene.camera
    H, W = cam.height, cam.width
    med_spec = scene.medium
    assert med_spec is not None and not med_spec.homogeneous, (
        "differentiable path optimizes a density grid"
    )
    maj_res = med_spec.maj_res()
    from ..ops import grid as gridops

    majorant_const = jnp.asarray(
        gridops.build_majorant_grid(np.asarray(med_spec.density), maj_res)
        * majorant_inflation
    )
    # frozen sampling-side density: decisions/pdfs stay at the build-time
    # field, making the sample distribution parameter-independent
    density_s_const = jnp.asarray(med_spec.density, jnp.float32)

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1), jnp.int32)
    pixidx = jnp.arange(H * W, dtype=jnp.uint32)

    def render_L(density, sample_idx):
        N = H * W
        rng = dda.seed_stream(pixidx, jnp.full((N,), sample_idx, jnp.uint32),
                              salt=scene.seed)
        rng, ua = dda.pcg_uniform(rng)
        rng, ub = dda.pcg_uniform(rng)
        off = scene.filter.sample_offset(jnp.stack([ua, ub], -1)) + 0.5
        rng, ul = dda.pcg_uniform(rng)
        swl = sp.sample_wavelengths_visible(ul)
        o, d = cam.generate_rays(pix, off, None)
        sa = med_spec.sigma_a_spec(swl.lam) * med_spec.scale
        ss = med_spec.sigma_s_spec(swl.lam) * med_spec.scale
        Le = (med_spec.Le_spec(swl.lam) * med_spec.Le_scale
              if med_spec.Le_spec is not None else jnp.zeros_like(swl.lam))
        med = dda.MediumArrays(
            density=density, majorant=majorant_const,
            w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
            g=jnp.float32(med_spec.g), sigma_a=sa, sigma_s=ss, Le=Le,
            density_s=density_s_const,
        )
        res = volpath_fused.li(
            med, scene.lights, o, d, swl.lam, rng,
            maj_res=maj_res, homogeneous=False,
            max_depth=scene.max_depth, scene_radius=scene.scene_radius,
            fixed_steps=fixed_steps,
        )
        return res.L, swl

    @jax.jit
    def loss_fn(density):
        total = 0.0
        for s in range(spp):
            L, swl = render_L(density, jnp.uint32(s))
            y = sp.y_luminance(L, swl)
            total = total + jnp.sum(y)
        return total / (spp * H * W)

    return loss_fn, jax.jit(jax.grad(loss_fn))


def image_and_density_grad(scene, density=None, **kw):
    """Convenience: mean-luminance loss value + d loss / d density grid."""
    loss_fn, grad_fn = make_diff_renderer(scene, **kw)
    dens = jnp.asarray(scene.medium.density if density is None else density,
                       jnp.float32)
    return float(loss_fn(dens)), np.asarray(grad_fn(dens))
