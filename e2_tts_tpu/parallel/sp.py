"""Sequence parallelism: ring attention over a mesh axis.

Beyond-reference capability (SURVEY.md §2d: the reference has NO sequence/
context parallelism — long audio is handled only by the `max_seq_len=8192`
abs-pos cap, e2_tts.py:537). This module scales the attention sequence
dimension across devices the TPU-native way: activations are sharded on a
`seq` mesh axis, and attention runs as a RING — each device computes online-
softmax partials of its local queries against the k/v block it currently
holds, then rotates k/v (and the key-padding mask) one neighbour around the
ring with `ppermute` over ICI. After P steps every query has attended to
every key; no device ever materialises the full sequence or the full score
matrix (arXiv 2310.01889-style blockwise attention, expressed with
`shard_map` so XLA schedules the collective-compute overlap).

Numerics match dense attention to fp32 online-softmax accuracy — the same
rescaling scheme the Pallas flash kernel uses (ops/flash_attention.py), so
parity tests oracle against `ops.attention.attention`.

Layout is the packed (b, n, h*dh) projection layout used model-wide; the
per-shard block math transposes in-register at block scale, which XLA fuses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from e2_tts_tpu.ops.attention import NEG_INF, softclamp
from e2_tts_tpu.utils.helpers import default, exists

SEQ_AXIS = 'seq'


def make_seq_mesh(seq: int, data: int = 1, devices=None) -> Mesh:
    """(data, seq) mesh; `seq` shards the sequence axis of activations."""
    import numpy as np
    devices = default(devices, jax.devices())
    assert len(devices) >= data * seq
    arr = np.asarray(devices[:data * seq]).reshape(data, seq)
    return Mesh(arr, ('data', SEQ_AXIS))


def _block_attend(q, k, v, kmask, m, l, acc, *, heads, scale, softclamp_value):
    """One online-softmax update of local queries against one k/v block.

    q: (b, nq, h*dh) fp32/bf16;  k/v: (b, nk, h*dh);  kmask: (b, nk) bool.
    m, l: (b, h, nq) fp32 running max / denominator; acc: (b, h, nq, dh) fp32.
    """
    b, nq, D = q.shape
    dh = D // heads
    qh = q.reshape(b, nq, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)

    s = jnp.einsum('bhid,bhjd->bhij', qh, kh,
                   preferred_element_type=jnp.float32) * scale
    if exists(softclamp_value):
        s = softclamp(s, softclamp_value)
    if exists(kmask):
        s = jnp.where(kmask[:, None, None, :], s, NEG_INF)

    m_blk = jnp.max(s, axis=-1)                      # (b, h, nq)
    m_new = jnp.maximum(m, m_blk)
    # fully-masked rows: every s == m_new == NEG_INF (a finite sentinel), so
    # p == 1 per key and the output degenerates to the value mean — exactly
    # the dense oracle's softmax-over-NEG_INF behaviour
    p = jnp.exp(s - m_new[..., None])                # (b, h, nq, nk)
    alpha = jnp.exp(jnp.clip(m - m_new, max=0.0))
    l_new = l * alpha + p.sum(axis=-1)
    acc_new = acc * alpha[..., None] + jnp.einsum(
        'bhij,bhjd->bhid', p.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32)
    return m_new, l_new, acc_new


def _ring_attention_local(q, k, v, kmask, *, heads, scale, softclamp_value,
                          axis_name):
    """Per-shard body under shard_map: P ring steps of block attention."""
    b, nq, D = q.shape
    dh = D // heads
    p_size = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % p_size) for i in range(p_size)]

    m0 = jnp.full((b, heads, nq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, heads, nq), jnp.float32)
    acc0 = jnp.zeros((b, heads, nq, dh), jnp.float32)

    def body(i, carry):
        k_c, v_c, mask_c, m, l, acc = carry
        m, l, acc = _block_attend(q, k_c, v_c, mask_c, m, l, acc,
                                  heads=heads, scale=scale,
                                  softclamp_value=softclamp_value)
        # rotate k/v/mask one neighbour around the ring (skippable on the
        # last step, but a static rotation keeps the loop body uniform and
        # XLA overlaps it with the next block's compute)
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        if exists(mask_c):
            mask_c = jax.lax.ppermute(mask_c, axis_name, perm)
        return k_c, v_c, mask_c, m, l, acc

    _, _, _, m, l, acc = jax.lax.fori_loop(
        0, p_size, body, (k, v, kmask, m0, l0, acc0))

    out = acc / jnp.clip(l, min=1e-30)[..., None]    # (b, h, nq, dh)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, D).astype(q.dtype)


def ring_attention(q, k, v, mask=None, *, mesh: Mesh, heads: int,
                   scale: float | None = None, softclamp_value: float | None = 50.0,
                   axis_name: str = SEQ_AXIS):
    """Sequence-parallel attention on packed (b, n, h*dh) tensors whose
    sequence axis is sharded over ``axis_name`` of ``mesh``.

    ``mask`` is the (b, n) key-padding mask (True = attend), sharded the
    same way. Returns the attention output in the same sharded layout.
    """
    dh = q.shape[-1] // heads
    scale = default(scale, dh ** -0.5)

    data_axes = tuple(a for a in mesh.axis_names if a != axis_name)
    dspec = data_axes[0] if data_axes else None
    xspec = P(dspec, axis_name, None)
    mspec = P(dspec, axis_name)

    fn = functools.partial(_ring_attention_local, heads=heads, scale=scale,
                           softclamp_value=softclamp_value,
                           axis_name=axis_name)
    if mask is None:
        local = lambda q_, k_, v_: fn(q_, k_, v_, None)
        return shard_map(local, mesh=mesh, in_specs=(xspec, xspec, xspec),
                         out_specs=xspec, check_rep=False)(q, k, v)
    return shard_map(fn, mesh=mesh, in_specs=(xspec, xspec, xspec, mspec),
                     out_specs=xspec, check_rep=False)(q, k, v, mask)


def shard_sequence(x, mesh: Mesh, axis_name: str = SEQ_AXIS):
    """Place (b, n, ...) activations with the sequence axis sharded."""
    spec = P(None, axis_name, *([None] * (x.ndim - 2)))
    return jax.device_put(x, NamedSharding(mesh, spec))
