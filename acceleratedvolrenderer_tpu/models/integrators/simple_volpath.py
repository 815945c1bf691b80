"""SimpleVolPathIntegrator — the teaching-version volumetric path tracer.

Reference: cpu/integrators.cpp:843-945 (SimpleVolPathIntegrator): pure delta
tracking with *no* NEE, no MIS, no spectral rescaling — secondary
wavelengths are terminated up front (lambda.TerminateSecondary) so a single
wavelength carries the estimate; lights are only found by hitting them
(infinite lights on escape).  Useful as a ground-truth cross-check for the
MIS machinery and as the reference's "simplevolpath" integrator option.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import dda, phase as phase_ops
from ...ops.dda import EVT_ABSORB, EVT_ESCAPED, EVT_SCATTER, MediumArrays
from .. import lights as lights_mod


class LiResult(NamedTuple):
    L: jnp.ndarray
    rng: jnp.ndarray


def li(
    med: MediumArrays,
    lights: list,
    o, d, lam, rng,
    *,
    maj_res,
    homogeneous: bool,
    max_depth: int = 5,
    scene_radius: float = 1e4,
    max_march_steps: int = 100000,
) -> LiResult:
    N = o.shape[0]
    LANES = lam.shape[-1]
    f32 = jnp.float32

    class Carry(NamedTuple):
        o: jnp.ndarray
        d: jnp.ndarray
        L: jnp.ndarray
        beta: jnp.ndarray
        depth: jnp.ndarray
        active: jnp.ndarray
        rng: jnp.ndarray
        bounce: jnp.ndarray

    carry0 = Carry(
        o=o, d=d,
        L=jnp.zeros((N, LANES), f32),
        beta=jnp.ones((N, LANES), f32),
        depth=jnp.zeros((N,), jnp.int32),
        active=jnp.ones((N,), bool),
        rng=rng,
        bounce=jnp.int32(0),
    )

    def cond(c):
        return jnp.any(c.active) & (c.bounce <= max_depth)

    def body(c):
        ones = jnp.ones((N, LANES), f32)
        res = dda.delta_track(
            med, c.o, c.d, jnp.full((N,), jnp.inf, f32),
            ones, ones, ones, c.rng, c.active, maj_res,
            collect_emission=True, homogeneous=homogeneous,
            max_steps=max_march_steps,
        )
        rng = res.rng
        L = c.L + jnp.where(c.active[:, None], res.L_emit * c.beta, 0.0)

        esc = c.active & (res.event == EVT_ESCAPED)
        Le_inf, _ = lights_mod.escaped_radiance(lights, c.d, lam)
        L = L + jnp.where(esc[:, None], c.beta * Le_inf, 0.0)

        sc = c.active & (res.event == EVT_SCATTER)
        over = sc & (c.depth >= max_depth)
        sc = sc & ~over
        depth = c.depth + jnp.where(sc, 1, 0)
        p = c.o + res.t_event[:, None] * c.d

        rng, ua = dda.pcg_uniform_masked(rng, sc)
        rng, ub = dda.pcg_uniform_masked(rng, sc)
        wi, _ = phase_ops.sample_hg(-c.d, jnp.stack([ua, ub], -1), med.g)

        return Carry(
            o=jnp.where(sc[:, None], p, c.o),
            d=jnp.where(sc[:, None], wi, c.d),
            L=L, beta=c.beta,
            depth=depth,
            active=sc,
            rng=rng,
            bounce=c.bounce + 1,
        )

    end = jax.lax.while_loop(cond, body, carry0)
    return LiResult(L=end.L, rng=end.rng)
