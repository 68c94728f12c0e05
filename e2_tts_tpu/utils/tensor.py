"""Tensor helpers: projection and 1-D interpolation.

The reference's `project` (e2_tts.py:113-124) upcasts to float64; TPUs do not
natively support f64, so we upcast to float32 (or f64 when jax_enable_x64 is
on) — documented deviation, numerically irrelevant at CFG scales.

`interpolate_1d` (reference: e2_tts.py:237-244) is a bilinear resize of a
`(n, d)` sequence. The reference calls it in a per-sample python loop inside
`InterpolatedCharacterEmbed` (e2_tts.py:445-467); here it is a fully
vectorized gather so the whole batch interpolates in one XLA op with traced
per-sample lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(t: jax.Array) -> jax.Array:
    return t / jnp.clip(jnp.linalg.norm(t, axis=-1, keepdims=True), min=1e-12)


def project(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Decompose ``x`` into components parallel / orthogonal to ``y``, per
    batch element over all remaining axes (reference: e2_tts.py:113-124).
    Used by APG classifier-free guidance (arXiv 2410.02416).
    """
    dtype = x.dtype
    batch = x.shape[0]
    xf = x.reshape(batch, -1).astype(jnp.float32)
    yf = y.reshape(batch, -1).astype(jnp.float32)

    unit = yf / jnp.clip(jnp.linalg.norm(yf, axis=-1, keepdims=True), min=1e-12)
    parallel = (xf * unit).sum(axis=-1, keepdims=True) * unit
    orthogonal = xf - parallel

    return (
        parallel.reshape(x.shape).astype(dtype),
        orthogonal.reshape(x.shape).astype(dtype),
    )


def _linear_resize_positions(src_len, tgt_len, out_len: int, dtype=jnp.float32):
    """Source coordinates for bilinear resize with align_corners=False
    (torch F.interpolate semantics): src = (i + 0.5) * scale - 0.5.

    ``src_len`` / ``tgt_len`` may be traced scalars; ``out_len`` is the static
    padded output length (positions beyond tgt_len are junk, mask downstream).
    """
    i = jnp.arange(out_len, dtype=dtype)
    scale = src_len.astype(dtype) / jnp.maximum(tgt_len.astype(dtype), 1.0)
    src = (i + 0.5) * scale - 0.5
    return jnp.clip(src, 0.0, jnp.maximum(src_len.astype(dtype) - 1.0, 0.0))


def interpolate_1d(x: jax.Array, length: int) -> jax.Array:
    """Bilinear resize ``(n, d) -> (length, d)``, matching
    torch.nn.functional.interpolate(mode='bilinear', align_corners=False)
    on a (n, 1) image (reference: e2_tts.py:237-244).
    """
    n = x.shape[0]
    src = _linear_resize_positions(jnp.asarray(n), jnp.asarray(length), length)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.clip(lo + 1, max=n - 1)
    w = (src - lo.astype(src.dtype))[:, None]
    return x[lo] * (1.0 - w) + x[hi] * w


def masked_interpolate_1d(
    x: jax.Array,          # (b, n_src_max, d) sources, valid prefix per sample
    src_lens: jax.Array,   # (b,) traced ints
    tgt_lens: jax.Array,   # (b,) traced ints
    out_len: int,          # static padded output length
) -> jax.Array:
    """Batched variable-length bilinear resize via gather.

    For each sample, resizes the first ``src_lens[b]`` rows of ``x[b]`` to
    ``tgt_lens[b]`` rows; output padded to ``out_len``. This replaces the
    reference's per-sample python loop (e2_tts.py:445-467) with one
    vectorized gather — shapes stay static under jit.
    """
    dtype = x.dtype
    n_src = x.shape[1]

    def per_sample(xb, sl, tl):
        src = _linear_resize_positions(sl, tl, out_len)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.clip(lo + 1, max=jnp.maximum(sl - 1, 0))
        lo = jnp.clip(lo, 0, n_src - 1)
        hi = jnp.clip(hi, 0, n_src - 1)
        w = (src - lo.astype(src.dtype))[:, None].astype(dtype)
        return xb[lo] * (1.0 - w) + xb[hi] * w

    return jax.vmap(per_sample)(x, src_lens, tgt_lens)


def iter_module_items(module):
    """(path, submodule) pairs, depth-first — a thin indirection over
    `flax.nnx.iter_modules` (the `m.iter_modules()` METHOD is deprecated in
    flax 0.12)."""
    from flax import nnx
    return nnx.iter_modules(module)


def set_compute_dtype(module, dtype):
    """Set the COMPUTE dtype of every nnx submodule that carries one.

    Flax layers and this repo's blocks read ``self.dtype`` at call time to
    promote activations; parameters keep their ``param_dtype``. This is the
    post-hoc analog of constructing with ``dtype=`` — the trainer uses it
    for its mixed-precision passthrough (the reference's
    ``accelerate_kwargs={'mixed_precision': ...}``, trainer.py:149)."""
    for _, m in iter_module_items(module):
        cls_attr = getattr(type(m), 'dtype', None)
        if isinstance(cls_attr, property):
            continue   # derived dtypes (e.g. LazyStreams) are not settable
        if hasattr(m, 'dtype'):
            m.dtype = dtype
    return module
