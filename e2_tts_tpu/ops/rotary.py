"""Rotary position embeddings (RoPE).

Functional equivalent of the x-transformers `RotaryEmbedding` used by the
reference backbone (e2_tts.py:46, 599-600, 793-798): half-split rotation,
theta=10000, full-head rotary. Stateless — frequencies are derived constants,
so everything fuses under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rotary_freqs(seq_len: int, dim_head: int, theta: float = 10_000.0) -> jax.Array:
    """(seq_len, dim_head // 2) angle table."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.einsum('n,d->nd', t, inv_freq)
    return jnp.asarray(freqs, dtype=jnp.float32)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate((-x2, x1), axis=-1)


def apply_rotary(t: jax.Array, freqs: jax.Array) -> jax.Array:
    """Apply RoPE to ``t (..., n, dh)`` given ``freqs (n, dh/2)``."""
    dtype = t.dtype
    emb = jnp.concatenate((freqs, freqs), axis=-1)       # (n, dh)
    cos = jnp.cos(emb)
    sin = jnp.sin(emb)
    out = t.astype(jnp.float32) * cos + _rotate_half(t.astype(jnp.float32)) * sin
    return out.astype(dtype)


def apply_rotary_packed(t: jax.Array, freqs: jax.Array) -> jax.Array:
    """RoPE on projection-layout ``t (b, n, h*dh)`` (heads packed in the
    last dim) given ``freqs (n, dh/2)``. Pure elementwise after two free
    reshapes — fuses with the surrounding projection slices under XLA, so
    the packed attention path never materialises a head-split transpose."""
    b, n, D = t.shape
    dh = 2 * freqs.shape[-1]
    t4 = t.reshape(b, n, D // dh, dh).astype(jnp.float32)
    emb = jnp.concatenate((freqs, freqs), axis=-1)        # (n, dh)
    cos = jnp.cos(emb)[None, :, None, :]
    sin = jnp.sin(emb)[None, :, None, :]
    out = t4 * cos + _rotate_half(t4) * sin
    return out.reshape(b, n, D).astype(t.dtype)


class RotaryEmbedding:
    """Thin stateless holder mirroring the reference's
    `RotaryEmbedding.forward_from_seq_len` API (e2_tts.py:793)."""

    def __init__(self, dim_head: int, theta: float = 10_000.0):
        self.dim_head = dim_head
        self.theta = theta

    def forward_from_seq_len(self, seq_len: int) -> jax.Array:
        return rotary_freqs(seq_len, self.dim_head, self.theta)
