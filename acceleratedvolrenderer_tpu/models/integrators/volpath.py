"""VolPath — null-scattering spectral volumetric path tracer.

Reference: VolPathIntegrator::Li (cpu/integrators.cpp:962-1281) and the
fork's verbatim VolPathCustomIntegrator (volpath_custom.cpp:280-609), with
SampleLd (volpath_custom.cpp:611-728).  The rescaled path probability
machinery (beta, r_u, r_l) follows Miller et al. 2019 exactly as the
reference implements it.

TPU-native shape: the per-ray recursion becomes one outer masked
`lax.while_loop` over bounces; each bounce is three fused stages over the
whole SoA ray batch —
  1. ops.dda.delta_track     — march to the next real event (nulls inlined)
  2. ops.transmittance.ratio_track — NEE shadow march for scattered rays
  3. HG direction sampling + state update
There is no queue memory: "queues" are boolean masks over the resident
batch, which is the wavefront design (wavefront/integrator.cpp:290-435)
minus the HBM round-trips.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import dda, phase as phase_ops, transmittance
from ...ops.dda import EVT_ABSORB, EVT_ESCAPED, EVT_SCATTER, MediumArrays
from ...models import lights as lights_mod


class LiResult(NamedTuple):
    L: jnp.ndarray     # (N, LANES) spectral radiance (pre pdf-division)
    rng: jnp.ndarray


def li(
    med: MediumArrays,
    lights: list,
    o, d,
    lam,
    rng,
    *,
    maj_res,
    homogeneous: bool,
    max_depth: int = 5,
    scene_radius: float = 1e4,
    max_march_steps: int = 100000,
    uniform_source=None,
) -> LiResult:
    """Estimate radiance along camera rays (o, d) at wavelengths lam.

    All of (o, d): (N, 3); lam: (N, LANES); rng: (N,) pcg states.

    `uniform_source` (path.VectorSource) optionally supplies the
    STRUCTURAL per-bounce draws (NEE light pick + 2D, phase 2D) from an
    explicit primary-sample vector — the volumetric PSS-MLT hook (the
    free-flight distance draws stay on the counter rng stream, which MLT
    carries as a mutated seed).  With a source the bounce loop unrolls to
    max_depth+1 python iterations (fixed dims)."""
    N = o.shape[0]
    LANES = lam.shape[-1]
    f32 = jnp.float32

    class Carry(NamedTuple):
        o: jnp.ndarray
        d: jnp.ndarray
        L: jnp.ndarray
        beta: jnp.ndarray
        r_u: jnp.ndarray
        r_l: jnp.ndarray
        depth: jnp.ndarray     # (N,) int32 — number of real scatters so far
        active: jnp.ndarray
        rng: jnp.ndarray
        bounce: jnp.ndarray    # scalar loop counter

    carry0 = Carry(
        o=o, d=d,
        L=jnp.zeros((N, LANES), f32),
        beta=jnp.ones((N, LANES), f32),
        r_u=jnp.ones((N, LANES), f32),
        r_l=jnp.ones((N, LANES), f32),
        depth=jnp.zeros((N,), jnp.int32),
        active=jnp.ones((N,), bool),
        rng=rng,
        bounce=jnp.int32(0),
    )

    g = med.g

    def cond(c: Carry):
        # each bounce consumes one real scatter; depth-capped rays deactivate
        return jnp.any(c.active) & (c.bounce <= max_depth)

    def body(c: Carry):
        # --- stage 1: march to next real event --------------------------------
        res = dda.delta_track(
            med, c.o, c.d, jnp.full((N,), jnp.inf, f32),
            c.beta, c.r_u, c.r_l, c.rng, c.active, maj_res,
            collect_emission=True, homogeneous=homogeneous,
            max_steps=max_march_steps,
        )
        # volumetric emission only while depth < max_depth
        # (volpath_custom.cpp:322 'depth < maxDepth')
        emit_ok = c.active & (c.depth < max_depth)
        L = c.L + jnp.where(emit_ok[:, None], res.L_emit, 0.0)
        beta, r_u, r_l = res.beta, res.r_u, res.r_l
        rng = res.rng

        # --- escaped rays: infinite lights + terminate ------------------------
        esc = c.active & (res.event == EVT_ESCAPED)
        Le_inf, pdf_inf = lights_mod.escaped_radiance(lights, c.d, lam)
        first = c.depth == 0
        denom_first = jnp.mean(r_u, axis=-1)
        r_l_mis = r_l * pdf_inf[:, None]
        denom_mis = jnp.mean(r_u + r_l_mis, axis=-1)
        denom = jnp.where(first, denom_first, denom_mis)
        contrib = beta * Le_inf / jnp.maximum(denom, 1e-24)[:, None]
        L = L + jnp.where((esc & (denom > 0))[:, None], contrib, 0.0)

        dead = c.active & (res.event == EVT_ABSORB)
        beta_zero = ~jnp.any(beta != 0.0, axis=-1) | ~jnp.any(r_u != 0.0, axis=-1)

        # --- scattered rays ---------------------------------------------------
        sc = c.active & (res.event == EVT_SCATTER) & ~beta_zero
        over = sc & (c.depth >= max_depth)    # 'if (depth++ >= maxDepth)'
        sc = sc & ~over
        depth = c.depth + jnp.where(sc, 1, 0)
        p = c.o + res.t_event[:, None] * c.d
        wo = -c.d

        # --- stage 2: NEE (SampleLd, volpath_custom.cpp:611-728) --------------
        # draws commit per-ray only where consumed => streams are independent
        # of batch composition / sharding
        if uniform_source is not None:
            u1 = uniform_source.next()
            u2a = uniform_source.next()
            u2b = uniform_source.next()
        else:
            rng, u1 = dda.pcg_uniform_masked(rng, sc)
            rng, u2a = dda.pcg_uniform_masked(rng, sc)
            rng, u2b = dda.pcg_uniform_masked(rng, sc)
        ls, is_delta = lights_mod.sample_one_light(
            lights, p, u1, jnp.stack([u2a, u2b], -1), lam
        )
        f_hat = phase_ops.hg_phase(wo, ls.wi, g)           # (N,)
        scatter_pdf = f_hat
        nee_ok = sc & ls.valid & (ls.pdf > 0) & (f_hat > 0)
        tr = transmittance.ratio_track(
            med, p, ls.wi, ls.dist, rng, nee_ok, maj_res,
            homogeneous=homogeneous, max_steps=max_march_steps,
        )
        rng = tr.rng
        r_p = r_u
        r_l_nee = tr.r_l * r_p * ls.pdf[:, None]
        r_u_nee = tr.r_u * r_p * scatter_pdf[:, None]
        denom_nee = jnp.where(
            is_delta, jnp.mean(r_l_nee, axis=-1), jnp.mean(r_l_nee + r_u_nee, axis=-1)
        )
        nee = beta * f_hat[:, None] * tr.T_ray * ls.L / jnp.maximum(denom_nee, 1e-24)[:, None]
        L = L + jnp.where((nee_ok & (denom_nee > 0))[:, None], nee, 0.0)

        # --- stage 3: phase function direction sample -------------------------
        if uniform_source is not None:
            u3a = uniform_source.next()
            u3b = uniform_source.next()
        else:
            rng, u3a = dda.pcg_uniform_masked(rng, sc)
            rng, u3b = dda.pcg_uniform_masked(rng, sc)
        wi, ps_pdf = phase_ops.sample_hg(wo, jnp.stack([u3a, u3b], -1), g)
        ps_ok = ps_pdf > 0
        # beta *= p/pdf == 1 for HG; r_l = r_u / ps_pdf (volpath_custom.cpp:383)
        r_l = jnp.where(sc[:, None], r_u / jnp.maximum(ps_pdf, 1e-24)[:, None], r_l)
        o_new = jnp.where(sc[:, None], p, c.o)
        d_new = jnp.where(sc[:, None], wi, c.d)

        active = sc & ps_ok
        return Carry(
            o=o_new, d=d_new, L=L, beta=beta, r_u=r_u, r_l=r_l,
            depth=depth, active=active, rng=rng, bounce=c.bounce + 1,
        )

    if uniform_source is None:
        end = jax.lax.while_loop(cond, body, carry0)
    else:
        # fixed unroll: VectorSource advances a python-side cursor, so the
        # bounce loop must be unrolled (every lane fully masked already)
        c = carry0
        for _ in range(max_depth + 1):
            c = body(c)
        end = c
    return LiResult(L=end.L, rng=end.rng)
