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
                scrambled per pixel (SobolSampler semantics, per-pixel
                decorrelation replacing the global-sequence pixel offsets)
  paddedsobol — the (0,2) pair with an additional per-pixel random *index
                permutation* (PaddedSobolSampler :144: each pixel consumes a
                shuffled slice of the sequence, decorrelating dimensions
                across pixels)
  zsobol      — sample indices assigned along a hashed Morton curve over
                (pixel, sample) with nested base-4 permutations (the
                Ahmed-Wonka blue-noise ZSobolSampler :225), then the
                scrambled (0,2) point
  halton      — radical inverse base 2 / base 3 with per-pixel digit
                scrambling (HaltonSampler :33 semantics; per-pixel
                scrambling replaces the global pixel-tile index offsets)
  pmj02bn     — generated progressive multi-jittered (0,2) tables with
                best-candidate blue noise (models.pmj02, the Christensen/
                Kensler construction behind PMJ02BNSampler :367), padded
                across pixels by void-and-cluster blue-noise toroidal
                shifts
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


def _feistel_pow2(i, bits: int, key):
    """Bijective permutation of [0, 2^bits) — 4-round balanced Feistel
    keyed by a uint32 (PermutationElement, util/hash.h, restricted to
    power-of-two domains, which is all pmj02 needs)."""
    hb = bits // 2
    lb = bits - hb
    L = (i >> lb) & jnp.uint32((1 << hb) - 1)
    R = i & jnp.uint32((1 << lb) - 1)
    for r in range(4):
        f = _owen_hash(R ^ jnp.uint32((r * 0x68BC21EB) & 0xFFFFFFFF), key)
        L, R = R, L ^ (f & jnp.uint32((1 << hb) - 1))
        hb, lb = lb, hb
    return ((L << lb) | R) & jnp.uint32((1 << bits) - 1)


def _pmj02_index(i, key, permute_epoch0: bool = False):
    """Sample index -> pmj02 table slot with per-wrap-epoch bijective
    permutation: epoch 0 keeps the designed progressive prefix order
    (unless permute_epoch0 — set-reuse dims), later epochs re-cover the
    table in decorrelated orders instead of repeating bit-identically."""
    from . import pmj02 as pmj02_mod

    T = pmj02_mod.TABLE_SIZE
    tbits = int(np.log2(T))
    i = jnp.asarray(i, jnp.uint32)
    epoch = i // jnp.uint32(T)
    ekey = _owen_hash(epoch, key | jnp.uint32(1))
    perm = _feistel_pow2(i & jnp.uint32(T - 1), tbits, ekey)
    if permute_epoch0:
        return perm
    return jnp.where(epoch == 0, i & jnp.uint32(T - 1), perm)


def _radical_inverse_base3(i, perm_seed):
    """Base-3 radical inverse with per-pixel random digit shifts (the
    Halton digit scrambling of util/lowdiscrepancy.h, hash-driven)."""
    i = jnp.asarray(i, jnp.uint32)
    frac = jnp.zeros(i.shape, jnp.float32)
    inv = 1.0 / 3.0
    x = i
    s = perm_seed
    for _ in range(20):          # 3^20 > 2^31: full index coverage
        digit = x % 3
        s = s * jnp.uint32(0x9E3779B9) + jnp.uint32(1)
        shift = (s >> 16) % 3
        frac = frac + ((digit + shift) % 3).astype(jnp.float32) * inv
        inv /= 3.0
        x = x // 3
    return jnp.minimum(frac, np.float32(1.0 - 1e-7))


def _morton2(x, y, bits=16):
    """Interleave the low `bits` of x (even positions) and y (odd)."""
    m = jnp.zeros_like(jnp.asarray(x, jnp.uint32))
    x = jnp.asarray(x, jnp.uint32)
    y = jnp.asarray(y, jnp.uint32)
    for b in range(bits):
        m = m | (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))
    return m


def _zsobol_index(pix, sample_index, spp: int, seed):
    """ZSobolSampler index assignment (samplers.h:225): the (pixel, sample)
    Morton code is permuted with a nested, hash-keyed base-4 permutation so
    nearby pixels get decorrelated-but-stratified slices of the global
    sequence (Ahmed & Wonka blue-noise)."""
    log2_spp = max(int(np.ceil(np.log2(max(spp, 1)))), 0)
    m = _morton2(pix[..., 0], pix[..., 1], bits=12)
    idx = (m << log2_spp) | jnp.asarray(sample_index, jnp.uint32)
    n_digits = (24 + log2_spp + 1) // 2
    # permute base-4 digits top-down; the permutation of each digit is keyed
    # by the digits above it (nested uniform digit scrambling)
    out = jnp.zeros_like(idx)
    prefix = jnp.zeros_like(idx)
    for d in range(n_digits - 1, -1, -1):
        digit = (idx >> jnp.uint32(2 * d)) & 3
        key = _owen_hash(prefix ^ jnp.uint32(0x55 + d), seed)
        pdigit = (digit + (key >> 24)) & 3
        out = out | (pdigit << jnp.uint32(2 * d))
        prefix = (prefix << 2) | digit
    return out


def film_sample(kind: str, pixel_index, sample_index, spp: int, seed: int = 0,
                pix=None):
    """Returns ((N,) u1, (N,) u2) film-jitter uniforms plus the advanced rng
    stream for downstream draws.

    kind: 'independent' | 'stratified' | 'sobol' | 'paddedsobol' | 'zsobol'
          | 'pmj02bn' | 'halton'
    pix: optional (N, 2) integer pixel coords — enables the spatial
         blue-noise index assignment of zsobol/pmj02bn (falls back to a
         hash of pixel_index when absent).
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

    pix_seed = dda.seed_stream(pixel_index, jnp.zeros_like(
        jnp.asarray(pixel_index, jnp.uint32)), salt=seed + 77)

    def sobol02(i, scr):
        # dim 1: van der Corput, Owen-scrambled.  The Laine-Karras hash only
        # propagates bits upward, so it must run in the reversed-fraction
        # (= index) domain: scrambled = reverse(hash(i))
        d1 = _reverse_bits32(_owen_hash(i, scr))
        # dim 2: Sobol' direction numbers, separately scrambled
        d2 = _sobol_dim2(i)
        d2 = _reverse_bits32(
            _owen_hash(_reverse_bits32(d2), scr ^ jnp.uint32(0x9E3779B9)))
        return _u01(d1), _u01(d2)

    if kind == "sobol":
        u1, u2 = sobol02(jnp.asarray(sample_index, jnp.uint32), pix_seed)
        return u1, u2, rng

    if kind == "paddedsobol":
        # PaddedSobolSampler: per pixel, a randomly permuted slice of the
        # sequence — index = perm_pixel(sample_index), bijective via a
        # 4-round Feistel network over the next-pow2 index range (replaces
        # PermutationElement, util/hash.h)
        i = jnp.asarray(sample_index, jnp.uint32)
        bits = max(int(np.ceil(np.log2(max(spp, 2)))), 2)
        lo_b = bits // 2
        hi_b = bits - lo_b
        lo = i & jnp.uint32((1 << lo_b) - 1)
        hi = (i >> lo_b) & jnp.uint32((1 << hi_b) - 1)
        for r in range(4):
            f = _owen_hash(lo ^ jnp.uint32((r * 0x68BC21EB) & 0xFFFFFFFF),
                           pix_seed)
            hi, lo = lo & jnp.uint32((1 << lo_b) - 1), \
                (hi ^ (f & jnp.uint32((1 << hi_b) - 1)))
            lo_b, hi_b = hi_b, lo_b
        perm = (hi << lo_b) | lo
        u1, u2 = sobol02(perm, pix_seed)
        return u1, u2, rng

    if kind == "zsobol":
        if pix is not None:
            idx = _zsobol_index(pix, sample_index, spp,
                                jnp.uint32(seed & 0xFFFFFFFF))
        else:
            idx = _zsobol_index(
                jnp.stack([jnp.asarray(pixel_index, jnp.uint32) & 0xFFF,
                           jnp.asarray(pixel_index, jnp.uint32) >> 12], -1),
                sample_index, spp, jnp.uint32(seed & 0xFFFFFFFF))
        # one GLOBAL scramble: spatial decorrelation comes from the index
        # permutation, which is what yields the blue-noise error distribution
        u1, u2 = sobol02(idx, jnp.uint32(0xA511E9B3) ^ jnp.uint32(seed))
        return u1, u2, rng

    if kind == "pmj02bn":
        # PMJ02BNSampler (samplers.h:367): generated pmj02bn point sets
        # (models.pmj02, Christensen et al. construction) + per-pixel
        # toroidal shifts from a void-and-cluster blue-noise texture
        from . import pmj02 as pmj02_mod

        tables, bn = pmj02_mod.get_tables(0)
        tab = jnp.asarray(tables[0])                      # (T, 2)
        bn_t = jnp.asarray(bn)                            # (64, 64, 2)
        i_raw = jnp.asarray(sample_index, jnp.uint32)
        # spp > TABLE_SIZE: each wrap epoch consumes the set in a fresh
        # bijective order (epoch 0 keeps the designed progressive prefix),
        # so extra samples keep stratifying instead of repeating
        # bit-identically (advisor r3)
        i = _pmj02_index(i_raw, jnp.uint32(0xE0C0 ^ (seed * 0x9E37)))
        u = tab[i]                                        # (N, 2)
        if pix is not None:
            bx = jnp.asarray(pix[..., 0], jnp.uint32) % 64
            by = jnp.asarray(pix[..., 1], jnp.uint32) % 64
        else:
            p_u = jnp.asarray(pixel_index, jnp.uint32)
            bx, by = p_u % 64, (p_u // 64) % 64
        # seed rotates the texture so independent renders decorrelate
        sx = jnp.uint32(_owen_hash(jnp.uint32(seed), jnp.uint32(0x51)) % 64)
        shift = bn_t[(by + sx) % 64, (bx + sx) % 64]      # (N, 2)
        u1 = (u[..., 0] + shift[..., 0]) % 1.0
        u2 = (u[..., 1] + shift[..., 1]) % 1.0
        return u1, u2, rng

    if kind == "halton":
        i = jnp.asarray(sample_index, jnp.uint32)
        d1 = _reverse_bits32(_owen_hash(i, pix_seed))   # base-2 + scramble
        u2 = _radical_inverse_base3(i, pix_seed ^ jnp.uint32(0x68BC21EB))
        return _u01(d1), u2, rng

    raise ValueError(f"unknown sampler '{kind}'")


# ---------------------------------------------------------------------------
# Path-interior dimensions (VERDICT r1 #30): the reference stratifies EVERY
# sampler dimension, not just the film jitter (samplers.h Get1D/Get2D advance
# `dimension` and HaltonSampler:33 / SobolSampler:479 map it to radical-
# inverse bases / Sobol dims).  TPU-native equivalent: a per-dimension
# scrambled radical inverse in the first 32 prime bases — table-free (no
# copied direction-number/permutation data), pure function of
# (pixel, sample_index, dim), with per-(pixel, dim) digit scrambling for
# cross-pixel decorrelation (the PaddedSobol padding construction).
# ---------------------------------------------------------------------------

_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
           59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
           127, 131)


def _radical_inverse_scrambled(base: int, i, perm_seed):
    """Digit-scrambled radical inverse in `base` (util/lowdiscrepancy.h
    ScrambledRadicalInverse).  perm_seed: (N,) uint32 per-lane key; the
    digit shift at each level comes from an evolving LCG of the key, so
    equal-key lanes share one Halton permutation (a proper digit
    scramble, not white noise)."""
    if base == 2:
        return _u01(_reverse_bits32(_owen_hash(jnp.asarray(i, jnp.uint32),
                                               perm_seed)))
    i = jnp.asarray(i, jnp.uint32)
    n_digits = int(np.ceil(32.0 / np.log2(base)))
    frac = jnp.zeros(i.shape, jnp.float32)
    inv = 1.0 / base
    x = i
    s = perm_seed
    for _ in range(n_digits):
        digit = x % base
        s = s * jnp.uint32(0x9E3779B9) + jnp.uint32(1)
        shift = (s >> 16) % base
        frac = frac + ((digit + shift) % base).astype(jnp.float32) * inv
        inv /= base
        x = x // base
    return jnp.minimum(frac, np.float32(1.0 - 1e-7))


def path_dim_sample(kind: str, pixel_index, sample_index, spp: int,
                    dim: int, seed: int = 0):
    """One (N,) uniform for path dimension `dim`.

    kinds: 'halton'/'sobol'/'zsobol'/'paddedsobol'/'pmj02bn' — scrambled
    radical inverse, base = dim-th prime (padded across pixels);
    'stratified' — 1D strata over spp with hashed jitter; anything else —
    PCG white noise keyed by (pixel, sample, dim)."""
    pix = jnp.asarray(pixel_index, jnp.uint32)
    i = jnp.asarray(sample_index, jnp.uint32)
    if kind == "stratified":
        rng = dda.seed_stream(pix, i, salt=(seed ^ (0x5D1 + 0x9E37 * dim)) & 0xFFFFFFFF)
        rng, jit = dda.pcg_uniform(rng)
        shift_rng = dda.seed_stream(pix, jnp.zeros_like(pix),
                                    salt=(seed ^ (0xA51 + 0x68BC * dim)) & 0xFFFFFFFF)
        _, shift = dda.pcg_uniform(shift_rng)
        n = max(int(spp), 1)
        stratum = (i + (shift * n).astype(jnp.uint32)) % n
        return (stratum.astype(jnp.float32) + jit) / n
    if kind == "pmj02bn":
        # interior dims draw from the remaining generated point sets,
        # padded across pixels by a blue-noise toroidal shift (the
        # reference's per-dimension pmj02bn set rotation)
        from . import pmj02 as pmj02_mod

        tables, bn = pmj02_mod.get_tables(0)
        tab = jnp.asarray(tables[1 + (dim % (pmj02_mod.N_SETS - 1))])
        bn_t = jnp.asarray(bn)
        # dims that REUSE a set (dim >= N_SETS-1) consume it in a
        # dim-keyed bijective order, as PMJ02BNSampler permutes the sample
        # index on reuse — otherwise dims d and d+4 draw the identical 1D
        # sequence up to a constant shift and are perfectly rank-
        # correlated (advisor r3); wrap epochs are folded into the key
        reuse = dim // (pmj02_mod.N_SETS - 1)
        ii = _pmj02_index(i, jnp.uint32((0xC2B2AE35 * (reuse + seed + 1))
                                        & 0xFFFFFFFF),
                          permute_epoch0=reuse > 0)
        u = tab[ii, dim % 2]
        bx, by = pix % 64, (pix // 64) % 64
        sx = jnp.uint32((0x9E3779B9 * (dim + seed + 1)) % 64)
        shift = bn_t[(by + sx) % 64, (bx + 2 * sx) % 64, dim % 2]
        return (u + shift) % 1.0
    if kind in ("halton", "sobol", "zsobol", "paddedsobol"):
        base = _PRIMES[dim % len(_PRIMES)]
        # per-(pixel, dim) scramble key: equal within a pixel (one Halton
        # permutation per pixel), decorrelated across pixels/dims
        scr = dda.seed_stream(pix, jnp.zeros_like(pix),
                              salt=(seed ^ (0x77 + 0x9E3779B9 * dim))
                              & 0xFFFFFFFF)
        return _radical_inverse_scrambled(base, i, scr)
    rng = dda.seed_stream(pix, i, salt=(seed ^ (0xD1CE + 0x85EB * dim)) & 0xFFFFFFFF)
    _, u = dda.pcg_uniform(rng)
    return u


class PathSampler:
    """UniformSource over all path dimensions (plugs into the staged
    integrators' `uniform_source` seam next to PCGSource/VectorSource).

    Sequential `next()` calls consume dimensions 0, 1, 2, ... of the
    per-(pixel, sample) low-discrepancy point; after `max_dims` (deep
    bounces, where stratification no longer pays) it falls back to the
    PCG stream — the same high-dims policy as the reference's Sobol
    samplers, which wrap past their table width."""

    def __init__(self, kind, pixel_index, sample_index, spp, seed=0,
                 max_dims: int = 32, rng=None):
        self.kind = kind
        self.pixel_index = pixel_index
        self.sample_index = sample_index
        self.spp = int(spp)
        self.seed = int(seed)
        self.max_dims = int(max_dims)
        self.dim = 0
        self.rng = (rng if rng is not None else
                    dda.seed_stream(jnp.asarray(pixel_index, jnp.uint32),
                                    jnp.asarray(sample_index, jnp.uint32),
                                    salt=seed + 0x51))

    def next(self, mask=None):
        if self.dim >= self.max_dims:
            self.rng, u = dda.pcg_uniform(self.rng)
            return u
        u = path_dim_sample(self.kind, self.pixel_index, self.sample_index,
                            self.spp, self.dim, self.seed)
        self.dim += 1
        return u
