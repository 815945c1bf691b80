"""Samplers — pixel-sample generation strategies.

Reference: src/pbrt/samplers.h inventory (Independent :442, Stratified :568,
Halton :33, Sobol :479, PaddedSobol :144, ZSobol :225, PMJ02BN :367) with the
`StartPixelSample(p, index, dim)` interface (base/sampler.h:48-66).

TPU-native: there is no sampler *state* — every dimension is a pure function
of (pixel_index, sample_index, purpose).  Path-interior decisions always use
the PCG streams (ops.dda.seed_stream); what the sampler choice controls is
the well-stratified low dimensions that matter most: the film jitter (and
wavelength) of each pixel sample.  Three strategies:

  independent — PCG uniforms (the default; matches IndependentSampler)
  stratified  — sample_index mapped to a sqrt(spp) x sqrt(spp) stratum with
                jitter (StratifiedSampler semantics)
  sobol       — Owen-scrambled (0,2)-sequence (van der Corput + Sobol dim 2),
                scrambled per pixel: the ZSobol/PaddedSobol blue-noise family
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import dda


def _reverse_bits32(x):
    x = ((x >> 16) | (x << 16)) & jnp.uint32(0xFFFFFFFF)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x & jnp.uint32(0xFF00FF00)) >> 8)
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x & jnp.uint32(0xF0F0F0F0)) >> 4)
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x & jnp.uint32(0xCCCCCCCC)) >> 2)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x & jnp.uint32(0xAAAAAAAA)) >> 1)
    return x


def _sobol_dim2(i):
    """Second Sobol dimension (direction numbers = the classic sequence)."""
    v = jnp.uint32(1 << 31)
    result = jnp.zeros_like(i)
    x = i
    # generator matrices for dim 2: v_k = v_{k-1} ^ (v_{k-1} >> 1)
    # computed by unrolled loop over 32 bits
    vs = []
    vv = 1 << 31
    for _ in range(32):
        vs.append(vv)
        vv = vv ^ (vv >> 1)
    vs = jnp.asarray(vs, jnp.uint32)
    for k in range(32):
        bit = (x >> k) & jnp.uint32(1)
        result = result ^ (bit * vs[k])
    return result


def _owen_hash(x, seed):
    """Laine-Karras style hash scramble of a reversed-bit sequence value —
    the cheap Owen scrambling used by modern Sobol samplers."""
    x = x ^ (x * jnp.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> 16) | jnp.uint32(1))
    x = x ^ (x * jnp.uint32(0x05526C56))
    x = x ^ (x * jnp.uint32(0x53A22864))
    return x


def _u01(bits):
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def film_sample(kind: str, pixel_index, sample_index, spp: int, seed: int = 0):
    """Returns ((N,) u1, (N,) u2) film-jitter uniforms plus the advanced rng
    stream for downstream draws.

    kind: 'independent' | 'stratified' | 'sobol'
    """
    rng = dda.seed_stream(pixel_index, sample_index, salt=seed)
    rng, ua = dda.pcg_uniform(rng)
    rng, ub = dda.pcg_uniform(rng)
    if kind == "independent":
        return ua, ub, rng

    if kind == "stratified":
        # factor spp into nx x ny strata (StratifiedSampler xy layout)
        nx = int(np.floor(np.sqrt(spp)))
        nx = max(nx, 1)
        ny = max(spp // nx, 1)
        n = nx * ny
        s = jnp.asarray(sample_index, jnp.uint32) % n
        sx = (s % nx).astype(jnp.float32)
        sy = (s // nx).astype(jnp.float32)
        u1 = (sx + ua) / nx
        u2 = (sy + ub) / ny
        return u1, u2, rng

    if kind == "sobol":
        i = jnp.asarray(sample_index, jnp.uint32)
        pix_seed = dda.seed_stream(pixel_index, jnp.zeros_like(
            jnp.asarray(pixel_index, jnp.uint32)), salt=seed + 77)
        # dim 1: van der Corput, Owen-scrambled per pixel.  The Laine-Karras
        # hash only propagates bits upward, so it must run in the
        # reversed-fraction (= index) domain: scrambled = reverse(hash(i))
        d1 = _reverse_bits32(_owen_hash(i, pix_seed))
        # dim 2: Sobol' direction numbers, separately scrambled
        d2 = _sobol_dim2(i)
        d2 = _reverse_bits32(_owen_hash(_reverse_bits32(d2), pix_seed ^ jnp.uint32(0x9E3779B9)))
        return _u01(d1), _u01(d2), rng

    raise ValueError(f"unknown sampler '{kind}'")
