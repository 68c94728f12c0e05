"""Cheap counter-based dropout.

`jax.random.bernoulli` lowers to a threefry2x32 keystream — ~0.9 ms per call
on the (16, 1056, 1408) GEGLU hidden at flagship shape (hlo_stats), and the
backward re-generates it. Dropout needs no cryptographic stream: this uses
the same murmur3-finalizer counter hash as the flash-attention kernel's
in-kernel dropout (ops/flash_attention.py) over the element's linear index —
~6 integer VPU ops per element, bit-exactly recomputable in the backward for
free.

The seed mixes the raw key data of an `nnx.Rngs` stream draw (no threefry
dispatch at all); successive draws from the stream give independent masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from e2_tts_tpu.ops.flash_attention import _fmix32, _keep_threshold, _U


def _seed_from_key(key: jax.Array) -> jax.Array:
    """uint32 seed from a typed PRNG key without running the PRNG."""
    data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seed = data[0]
    for i in range(1, data.shape[0]):
        seed = _fmix32(seed ^ data[i])
    return seed


_PRIMES = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F,
           0x165667B1, 0xD3A2646D)


def hash_keep(shape, seed: jax.Array, rate: float) -> jax.Array:
    """Boolean keep mask over `shape` with P(keep) = 1-rate, a pure function
    of (seed, coordinates): counters come from per-axis broadcasted iotas (a
    flat `lax.iota` + reshape defeats XLA's elementwise fusion and runs as a
    standalone pass); each axis gets its own odd multiplier so distinct
    coordinates map to distinct counters. The fused GEGLU kernel
    (ops/geglu_kernel.py) regenerates this exact mask from block-local
    coordinates."""
    assert len(shape) <= len(_PRIMES)
    ctr = seed
    for axis in range(len(shape)):
        i = jax.lax.broadcasted_iota(jnp.uint32, shape, axis)
        ctr = ctr + i * _U(_PRIMES[axis])
    return _fmix32(ctr) >= _U(_keep_threshold(rate))


def hash_dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Dropout with keep probability 1-rate and 1/(1-rate) scaling."""
    if rate <= 0.0:
        return x
    assert rate < 1.0
    keep = hash_keep(x.shape, _seed_from_key(key), rate)
    return jnp.where(keep, x * (1.0 / (1.0 - rate)), 0.0).astype(x.dtype)
