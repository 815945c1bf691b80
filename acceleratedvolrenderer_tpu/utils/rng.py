"""Counter-based RNG utilities.

The reference carries stateful per-thread samplers (PCG32, src/pbrt/util/rng.h;
Sampler inventory samplers.h:33-735) and the graph builder leans on
`StartPixelSample` determinism to map abstract work indices to fake pixels
(free_graph_builder.cpp:194-200).  The TPU-native replacement is a pure
counter-based design: every random number is a function of
(pixel_index, sample_index, depth, purpose) via jax.random fold-ins, so any
path/bounce is exactly replayable from indices alone (= the reference's
`--debugstart` deterministic replay, volpath_custom.cpp:39-59, for free) and
generation vectorizes over the whole ray batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def base_key(seed: int):
    return jax.random.PRNGKey(seed)


def pixel_sample_key(key, pixel_index, sample_index):
    """Key for one (pixel, spp-index) pair; arguments may be arrays."""
    k = jax.random.fold_in(key, 0)
    # fold_in accepts array data via vmap-free broadcasting trick: use
    # random.fold_in on scalars only, so combine indices into one int32 hash.
    return fold_in_array(k, pixel_index * jnp.int32(9781) + sample_index)


def fold_in_array(key, data):
    """fold_in that accepts integer *arrays*, producing a batch of keys.

    jax.random.fold_in requires scalar data; vmap it over the flattened
    array and reshape back to data.shape + (2,)-keyshape."""
    data = jnp.asarray(data, jnp.uint32)
    flat = data.reshape(-1)
    keys = jax.vmap(lambda d: jax.random.fold_in(key, d))(flat)
    return keys.reshape(data.shape + keys.shape[1:]) if data.ndim else keys[0]


def hash_uint32(x):
    """MurmurHash3 finalizer — cheap well-mixed per-lane hashing for use
    inside kernels (reference uses MixBits, util/hash.h)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def uniform_from_bits(bits):
    """uint32 -> float32 in [0, 1)."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
