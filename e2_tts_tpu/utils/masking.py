"""Mask / length utilities, fully traced & static-shape friendly.

Functional equivalents of the reference mask helpers (e2_tts.py:173-244),
re-designed for XLA: every function takes static max lengths so shapes stay
fixed under jit, and randomness comes in through explicit PRNG keys instead
of global RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from e2_tts_tpu.utils.helpers import exists


def lens_to_mask(lens: jax.Array, length: int | None = None) -> jax.Array:
    """``lens (b,) -> bool mask (b, length)`` (reference: e2_tts.py:173-182).

    ``length`` must be a static int under jit; defaults to ``lens.max()``
    which only works outside of tracing.
    """
    if not exists(length):
        if isinstance(lens, jax.core.Tracer):
            raise ValueError(
                'lens_to_mask: `length` defaults to int(lens.max()), which is '
                'data-dependent and unavailable under jit — pass a static '
                '`length=` when calling from traced code.')
        length = int(lens.max())

    seq = jnp.arange(length, dtype=lens.dtype)
    return seq[None, :] < lens[:, None]


def mask_from_start_end_indices(
    start: jax.Array,  # (b,) int
    end: jax.Array,    # (b,) int
    length: int,
) -> jax.Array:
    """Bool mask that is True on [start, end) (reference: e2_tts.py:184-191)."""
    seq = jnp.arange(length, dtype=start.dtype)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(
    key: jax.Array,
    seq_len: jax.Array,       # (b,) int
    frac_lengths: jax.Array,  # (b,) float in [0, 1]
    max_length: int,
) -> jax.Array:
    """Random span mask whose span covers ``frac * len`` frames at a uniform
    random start (reference: e2_tts.py:193-210). PRNG-key threaded.
    """
    lengths = (frac_lengths * seq_len.astype(frac_lengths.dtype)).astype(seq_len.dtype)
    max_start = seq_len - lengths

    rand = jax.random.uniform(key, shape=frac_lengths.shape, dtype=frac_lengths.dtype)
    start = jnp.clip((max_start.astype(rand.dtype) * rand).astype(seq_len.dtype), min=0)
    end = start + lengths

    return mask_from_start_end_indices(start, end, max_length)


def maybe_masked_mean(t: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Mean over the sequence axis, respecting an optional bool mask
    (reference: e2_tts.py:212-224). ``t (b, n, d) -> (b, d)``.
    """
    if not exists(mask):
        return t.mean(axis=1)

    t = jnp.where(mask[..., None], t, 0.0)
    num = t.sum(axis=1)
    den = mask.astype(t.dtype).sum(axis=-1)
    return num / jnp.clip(den, min=1.0)[..., None]


def pad_to_length(t: jax.Array, length: int, value=None) -> jax.Array:
    """Right-pad (or truncate) the LAST axis to ``length``
    (reference: e2_tts.py:226-235).
    """
    seq_len = t.shape[-1]
    if length > seq_len:
        pad_widths = [(0, 0)] * (t.ndim - 1) + [(0, length - seq_len)]
        t = jnp.pad(t, pad_widths, constant_values=0 if value is None else value)
    return t[..., :length]
