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


def _rotate_half_matrix(dh: int, heads: int) -> jax.Array:
    """Block-diagonal (h*dh, h*dh) ±1 matrix R with ``x @ R`` = per-head
    rotate_half on packed (b, n, h*dh) tensors. R[i+dh/2, i] = -1 and
    R[i, i+dh/2] = +1 within each head block (so R^T = -R). Constant under
    jit; bf16 entries keep the product exact (each output is ±one input)."""
    half = dh // 2
    r = np.zeros((dh, dh), dtype=np.float32)
    i = np.arange(half)
    r[i + half, i] = -1.0
    r[i, i + half] = 1.0
    big = np.kron(np.eye(heads, dtype=np.float32), r)
    return jnp.asarray(big, dtype=jnp.bfloat16)


def apply_rotary_packed(t: jax.Array, freqs: jax.Array) -> jax.Array:
    """RoPE on projection-layout ``t (b, n, h*dh)`` (heads packed in the
    last dim) given ``freqs (n, dh/2)``.

    rotate_half is expressed as one (D, D) block-diagonal ±1 matmul
    (``t @ R``) instead of a 4-D reshape/slice/concat: the head-split
    reshape forces XLA into {1,3,2,0} layouts with full-tensor f32 layout
    copies around every q/k (~22 ms/step measured at flagship shape),
    while the matmul form stays in the packed 3-D layout, rides the MXU
    (~0.05 ms at (16896, 512)), and lets the cos/sin elementwise fuse
    into the surrounding projections. The product ``t @ R`` is exact in
    bf16 (each output element is ±one input element)."""
    b, n, D = t.shape
    dh = 2 * freqs.shape[-1]
    emb = jnp.concatenate((freqs, freqs), axis=-1)        # (n, dh)
    cos = jnp.tile(jnp.cos(emb), (1, D // dh))[None]      # (1, n, D) f32
    sin = jnp.tile(jnp.sin(emb), (1, D // dh))[None]
    rot = jax.lax.dot_general(
        t, _rotate_half_matrix(dh, D // dh).astype(t.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = t.astype(jnp.float32) * cos + rot * sin
    return out.astype(t.dtype)


class RotaryEmbedding:
    """Thin stateless holder mirroring the reference's
    `RotaryEmbedding.forward_from_seq_len` API (e2_tts.py:793)."""

    def __init__(self, dim_head: int, theta: float = 10_000.0):
        self.dim_head = dim_head
        self.theta = theta

    def forward_from_seq_len(self, seq_len: int) -> jax.Array:
        return rotary_freqs(seq_len, self.dim_head, self.theta)
