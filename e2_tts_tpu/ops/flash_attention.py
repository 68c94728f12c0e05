"""Pallas TPU flash attention with logit softclamping.

The reference's attention reaches ATen SDPA (fused CUDA kernels) through
x-transformers (SURVEY.md §2, e2_tts.py:641). This is the TPU-native
equivalent: an online-softmax (flash) kernel that keeps the (n x n) score
matrix in VMEM tiles, fused with the tanh logit softclamp and key-padding
masking the reference configures. LASER and the per-head value gates compose
outside the kernel (ops/attention.py, models/blocks.py).

Backward pass: a custom VJP recomputes scores with plain XLA einsums
(including the softclamp jacobian). At E2-TTS sequence lengths (<= 4k frames)
the quadratic recompute fits comfortably and keeps the backward on the MXU;
the forward — which dominates sampling (124 transformer calls per utterance)
— stays flash.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2_tts_tpu.utils.helpers import exists, round_up_to_multiple

NEG_INF = -1e30
_INTERPRET = False   # flipped by tests on CPU


def _fa_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
               m_scr, l_scr, acc_scr, *, scale, softclamp_value):
    """Grid (bh, nq, nk): the kv axis is the innermost ('arbitrary') grid dim,
    so the Pallas pipeline double-buffers k/v block DMAs against compute;
    running max / denominator / accumulator live in VMEM scratch."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # keep inputs in native (bf16) dtype: the MXU takes bf16 operands with
    # fp32 accumulation; upcasting first would force 4x-slower fp32 passes
    q = q_ref[0]                                       # (bq, dh)
    k = k_ref[0]                                       # (bk, dh)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (bq, bk) fp32

    if exists(softclamp_value):
        s = jnp.tanh(s / softclamp_value) * softclamp_value

    s = s + bias_ref[0, 0][None, :]

    m_prev = m_scr[:, 0]
    l_prev = l_scr[:, 0]

    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new[:, None])
    alpha = jnp.exp(m_prev - m_new)

    l_new = l_prev * alpha + p.sum(axis=-1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scr[:, 0] = m_new
    l_scr[:, 0] = l_new

    @pl.when(kb == num_kb - 1)
    def _finalise():
        o_ref[0] = (acc_scr[:] / jnp.clip(l_scr[:, 0], min=1e-30)[:, None]
                    ).astype(o_ref.dtype)


def _flash_forward(q, k, v, bias, scale, softclamp_value, block_q=512, block_k=512):
    b, h, n, dh = q.shape
    n_pad = round_up_to_multiple(n, max(block_q, block_k))
    block_q = min(block_q, n_pad)
    block_k = min(block_k, n_pad)

    pad = n_pad - n
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF)
    bias3 = bias[:, None, :]   # (b, 1, n_pad): TPU-tileable block shape

    qf = q.reshape(b * h, n_pad, dh)
    kf = k.reshape(b * h, n_pad, dh)
    vf = v.reshape(b * h, n_pad, dh)

    grid = (b * h, n_pad // block_q, n_pad // block_k)

    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale,
                          softclamp_value=softclamp_value),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda i, j, kb: (i // h, 0, kb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda i, j, kb: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),    # running max
            pltpu.VMEM((block_q, 1), jnp.float32),    # running denom
            pltpu.VMEM((block_q, dh), jnp.float32),   # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_INTERPRET,
    )(qf, kf, vf, bias3)

    out = out.reshape(b, h, n_pad, dh)
    return out[:, :, :n, :]


def _xla_recompute_bwd(res, g):
    q, k, v, bias, scale, softclamp_value = res
    s_raw = jnp.einsum('bhid,bhjd->bhij', q, k,
                       preferred_element_type=jnp.float32) * scale
    if exists(softclamp_value):
        th = jnp.tanh(s_raw / softclamp_value)
        s = th * softclamp_value
        dsoft = 1.0 - th * th
    else:
        s = s_raw
        dsoft = None

    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)

    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum('bhij,bhid->bhjd', p, g32, preferred_element_type=jnp.float32)
    dp = jnp.einsum('bhid,bhjd->bhij', g32, v32, preferred_element_type=jnp.float32)
    ds = p * (dp - (dp * p).sum(-1, keepdims=True))
    if exists(dsoft):
        ds = ds * dsoft
    ds = ds * scale

    dq = jnp.einsum('bhij,bhjd->bhid', ds, k.astype(jnp.float32))
    dk = jnp.einsum('bhij,bhid->bhjd', ds, q.astype(jnp.float32))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, bias, scale, softclamp_value):
    return _flash_forward(q, k, v, bias, scale, softclamp_value)


def _flash_fwd(q, k, v, bias, scale, softclamp_value):
    out = _flash_forward(q, k, v, bias, scale, softclamp_value)
    return out, (q, k, v, bias)


def _flash_bwd(scale, softclamp_value, res, g):
    q, k, v, bias = res
    return _xla_recompute_bwd((q, k, v, bias, scale, softclamp_value), g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,                    # (b, h, n, dh)
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,   # (b, n) key padding, True = attend
    *,
    scale: float | None = None,
    softclamp_value: float | None = None,
) -> jax.Array:
    if scale is None:
        scale = q.shape[-1] ** -0.5

    b, _, n, _ = q.shape
    if exists(mask):
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, n), dtype=jnp.float32)

    return _flash(q, k, v, bias, scale, softclamp_value)
