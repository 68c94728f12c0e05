"""Attention compute op with the reference's "epicycles".

The reference reaches ATen SDPA through x-transformers `Attention`
(e2_tts.py:641, 689, 911) with: logit softclamping (tanh), LASER attention
(exp-space values, arXiv 2411.03493 style with a softclamp), key-padding
masking and attention dropout. This module implements those semantics as a
pure function over (b, h, n, dh) tensors with an XLA path and a Pallas
flash-attention path (ops/flash_attention.py) selected by `backend`.

Value-head gating and value-residual mixing live in the Attention *module*
(models/blocks.py) — they are elementwise pre/post ops, not part of the
softmax core, so both backends share them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from e2_tts_tpu.utils.helpers import exists

NEG_INF = -1e30


def softclamp(x: jax.Array, value: float) -> jax.Array:
    """tanh soft clamp: value * tanh(x / value)."""
    return jnp.tanh(x / value) * value


def attention(
    q: jax.Array,                 # (b, h, n, dh)
    k: jax.Array,                 # (b, h, n, dh)
    v: jax.Array,                 # (b, h, n, dh)
    mask: jax.Array | None = None,   # (b, n) key padding mask, True = attend
    *,
    scale: float | None = None,
    softclamp_value: float | None = 50.0,   # x-transformers softclamp_logits default
    laser: bool = False,
    laser_softclamp_value: float = 15.0,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    backend: str = 'xla',
) -> jax.Array:
    if not exists(scale):
        scale = q.shape[-1] ** -0.5

    if laser:
        # LASER: attention over exp-space values, log after aggregation
        # (x-transformers laser flag, e2_tts.py:543-544)
        v = jnp.exp(softclamp(v.astype(jnp.float32), laser_softclamp_value))

    # auto: the flash kernel (fwd + block-wise bwd) avoids all O(n^2)
    # materialisation — measured faster end-to-end in training (many
    # batch*head grid rows) and far lighter on HBM. At tiny batch (sampling
    # with b=1) its grid under-fills the chip and XLA's fused attention wins,
    # so route by parallelism. Attention-prob dropout (the reference's
    # training default, e2_tts.py:540) runs inside the kernel via a
    # counter-based RNG — it does not force the XLA path.
    use_pallas = backend == 'pallas' or (
        backend == 'auto'
        and jax.default_backend() == 'tpu'
        and q.shape[2] >= 128   # tiny sequences (e.g. freq-axis attention
                                # over a handful of tokens) under-fill the
                                # kernel's minimum 8x128 MXU tile and its
                                # grid; XLA fused attention wins there
        and (q.shape[0] * q.shape[1] >= 64 or q.shape[2] > 2048)
    )

    if use_pallas:
        from e2_tts_tpu.ops.flash_attention import flash_attention
        dropping = dropout_rate > 0.0 and exists(dropout_rng)
        seed = (jax.random.randint(dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                                   dtype=jnp.int32) if dropping else None)
        out = flash_attention(
            q, k, v.astype(q.dtype), mask,
            scale=scale, softclamp_value=softclamp_value,
            dropout_rate=dropout_rate if dropping else 0.0,
            dropout_seed=seed,
        )
    else:
        out = _xla_attention(
            q, k, v, mask,
            scale=scale, softclamp_value=softclamp_value,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        )

    if laser:
        out = jnp.log(jnp.clip(out.astype(jnp.float32), min=1e-20))

    return out.astype(q.dtype)


def lane_expand_matrix(heads: int, dim_head: int) -> jax.Array:
    """(h, h*dh) 0/1 matrix E with E[i, i*dh:(i+1)*dh] = 1: ``s @ E``
    broadcasts a per-head scalar (b, n, h) to packed lanes (b, n, h*dh) as
    one MXU contraction — a 4-D reshape would force XLA into {1,3,2,0}
    layouts with full-tensor copies (see ops/rotary.py). Only the numpy
    array is cached (a cached jnp constant would be a leaked tracer)."""
    return jnp.asarray(_lane_expand_matrix_np(heads, dim_head))


@functools.cache
def _lane_expand_matrix_np(heads: int, dim_head: int):
    return np.kron(np.eye(heads, dtype=np.float32),
                   np.ones((1, dim_head), dtype=np.float32))


def attention_packed(
    q: jax.Array,                 # (b, n, h*dh) — heads packed in lanes
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,   # (b, n) key padding mask, True = attend
    *,
    heads: int,
    scale: float | None = None,
    softclamp_value: float | None = 50.0,
    laser: bool = False,
    laser_softclamp_value: float = 15.0,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    backend: str = 'auto',
    gate_logits: jax.Array | None = None,   # (b, n, h) per-head output gate
    sp_mesh=None,                  # jax Mesh: ring attention over sp_axis
    sp_axis: str = 'seq',
) -> jax.Array:
    """`attention` on projection-layout tensors: no head split/merge
    transposes anywhere on the Pallas path (the lane-packed kernels consume
    (b, n, h*dh) directly — see ops/flash_attention.py). Shapes the packed
    kernels can't take, and the XLA fallback, transpose internally.

    ``gate_logits`` applies the x-transformers per-head sigmoid output gate
    (``gate_value_heads``, e2_tts.py:548-551): folded into the kernel
    finalise on the packed path, an explicit lane-expanded multiply on the
    fallback. Under LASER the gate must follow the post-aggregation log, so
    it always applies outside the kernel.

    ``sp_mesh``: sequence-parallel mode — q/k/v arrive sharded on the
    ``sp_axis`` mesh axis and the core runs as ring attention
    (parallel/sp.py) with the same softclamp/mask/dropout semantics (dropout
    draws the dense kernel's counter-hash bits). LASER / gate / the value
    residual are per-row elementwise and stay local."""
    from e2_tts_tpu.ops.flash_attention import packed_eligible

    b, n, D = q.shape
    dh = D // heads
    if not exists(scale):
        scale = dh ** -0.5

    if laser:
        v = jnp.exp(softclamp(v.astype(jnp.float32), laser_softclamp_value))

    if exists(sp_mesh):
        from e2_tts_tpu.parallel.sp import ring_attention
        dropping = dropout_rate > 0.0 and exists(dropout_rng)
        seed = (jax.random.randint(dropout_rng, (1,), 0,
                                   jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                if dropping else None)
        out = ring_attention(
            q, k, v.astype(q.dtype), mask, mesh=sp_mesh, heads=heads,
            scale=scale, softclamp_value=softclamp_value, axis_name=sp_axis,
            dropout_rate=dropout_rate if dropping else 0.0,
            dropout_seed=seed)
        if laser:
            out = jnp.log(jnp.clip(out.astype(jnp.float32), min=1e-20))
        if exists(gate_logits):
            gate = jax.lax.dot_general(
                jax.nn.sigmoid(gate_logits),
                lane_expand_matrix(heads, dh).astype(gate_logits.dtype),
                (((2,), (0,)), ((), ())))
            out = out * gate.astype(out.dtype)
        return out.astype(q.dtype)

    use_packed = (
        backend in ('pallas', 'auto')
        and jax.default_backend() == 'tpu'
        and packed_eligible(heads, dh)
        and n >= 128
        and (b * heads >= 64 or n > 2048)
    )
    fold_gate = exists(gate_logits) and use_packed and not laser

    if use_packed:
        from e2_tts_tpu.ops.flash_attention import flash_attention_packed
        dropping = dropout_rate > 0.0 and exists(dropout_rng)
        seed = (jax.random.randint(dropout_rng, (1,), 0,
                                   jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                if dropping else None)
        out = flash_attention_packed(
            q, k, v.astype(q.dtype), mask, heads=heads,
            scale=scale, softclamp_value=softclamp_value,
            dropout_rate=dropout_rate if dropping else 0.0,
            dropout_seed=seed,
            gate_logits=gate_logits if fold_gate else None,
        )
    else:
        to_bhnd = lambda t: t.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)
        out = attention(
            to_bhnd(q), to_bhnd(k), to_bhnd(v), mask,
            scale=scale, softclamp_value=softclamp_value, laser=False,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            backend=backend,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, D)

    if laser:
        out = jnp.log(jnp.clip(out.astype(jnp.float32), min=1e-20))

    if exists(gate_logits) and not fold_gate:
        gate = jax.lax.dot_general(
            jax.nn.sigmoid(gate_logits),
            lane_expand_matrix(heads, dh).astype(gate_logits.dtype),
            (((2,), (0,)), ((), ())))
        out = out * gate.astype(out.dtype)

    return out.astype(q.dtype)


def _xla_attention(q, k, v, mask, *, scale, softclamp_value, dropout_rate, dropout_rng):
    logits = jnp.einsum('bhid,bhjd->bhij', q, k, preferred_element_type=jnp.float32) * scale

    if exists(softclamp_value):
        logits = softclamp(logits, softclamp_value)

    if exists(mask):
        logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)

    if dropout_rate > 0.0 and exists(dropout_rng):
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    # probs ride the MXU in v's dtype (bf16 in the hot path — fp32 operands
    # run at 1/4 MXU rate) with fp32 accumulation; in LASER mode v is already
    # fp32 exp-space and stays so.
    return jnp.einsum('bhij,bhjd->bhid', probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
