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

from e2_tts_tpu.ops.attention import NEG_INF, softclamp
from e2_tts_tpu.ops.flash_attention import _fmix32, _keep_threshold, _U
from e2_tts_tpu.utils.helpers import default, exists

SEQ_AXIS = 'seq'


def make_seq_mesh(seq: int, data: int = 1, devices=None) -> Mesh:
    """(data, seq) mesh; `seq` shards the sequence axis of activations."""
    import numpy as np
    devices = default(devices, jax.devices())
    assert len(devices) >= data * seq
    arr = np.asarray(devices[:data * seq]).reshape(data, seq)
    return Mesh(arr, ('data', SEQ_AXIS))


def _ring_keep_mask(shape_bhqk, seed_u32, b0, row0, col0, rate: float):
    """(b, h, nq, nk) keep mask drawing the SAME bits as the dense flash
    kernel's in-kernel counter hash (ops/flash_attention.py::_keep_tile /
    dropout_keep_mask): a pure function of (seed, global batch*head index,
    absolute row, absolute col). `b0/row0/col0` are this shard's global
    offsets — the ring path's dropout is therefore bit-identical to the
    dense kernel's for the same seed, which the parity tests exploit."""
    b, h, nq, nk = shape_bhqk
    bhs = ((b0 + jnp.arange(b, dtype=jnp.uint32))[:, None] * _U(h)
           + jnp.arange(h, dtype=jnp.uint32)[None, :])[:, :, None, None]
    rows = (row0.astype(jnp.uint32)
            + jnp.arange(nq, dtype=jnp.uint32))[None, None, :, None]
    cols = (col0.astype(jnp.uint32)
            + jnp.arange(nk, dtype=jnp.uint32))[None, None, None, :]
    hh = _fmix32(seed_u32 ^ (bhs * _U(0x27D4EB2F)))
    u = _fmix32(hh + rows * _U(0x9E3779B1) + cols * _U(0x85EBCA77), rounds=1)
    return u >= _U(_keep_threshold(rate))


def _block_attend(q, k, v, kmask, m, l, acc, *, heads, scale, softclamp_value,
                  dropout_rate=0.0, dropout_seed=None, b0=None, row0=None,
                  col0=None):
    """One online-softmax update of local queries against one k/v block.

    q: (b, nq, h*dh) fp32/bf16;  k/v: (b, nk, h*dh);  kmask: (b, nk) bool.
    m, l: (b, h, nq) fp32 running max / denominator; acc: (b, h, nq, dh) fp32.

    With dropout, the denominator accumulates UN-dropped probabilities and
    only the value accumulation sees the scaled keep mask — dropout acts
    after softmax, matching torch ``F.dropout(attn, p)`` and the Pallas
    flash kernels (flash_attention.py:23-25).
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
    p_v = p
    if dropout_rate > 0.0:
        keep = _ring_keep_mask(p.shape, dropout_seed, b0, row0, col0,
                               dropout_rate)
        p_v = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    acc_new = acc * alpha[..., None] + jnp.einsum(
        'bhij,bhjd->bhid', p_v.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32)
    return m_new, l_new, acc_new


def _ring_attention_local(q, k, v, kmask, seed, *, heads, scale,
                          softclamp_value, dropout_rate, axis_name,
                          data_axis):
    """Per-shard body under shard_map: P ring steps of block attention."""
    b, nq, D = q.shape
    dh = D // heads
    p_size = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % p_size) for i in range(p_size)]

    s_idx = jax.lax.axis_index(axis_name)
    row0 = (s_idx * nq).astype(jnp.uint32)
    b0 = (jax.lax.axis_index(data_axis).astype(jnp.uint32) * _U(b)
          if exists(data_axis) else jnp.uint32(0))
    seed_u32 = (jnp.asarray(seed).reshape(()).astype(jnp.uint32)
                if exists(seed) else None)

    m0 = jnp.full((b, heads, nq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, heads, nq), jnp.float32)
    acc0 = jnp.zeros((b, heads, nq, dh), jnp.float32)

    def body(i, carry):
        k_c, v_c, mask_c, m, l, acc = carry
        # the k/v block held at ring step i originated from shard
        # (s_idx - i) mod P — its global column offset pins the dropout bits
        col0 = (((s_idx - i) % p_size) * nq).astype(jnp.uint32)
        m, l, acc = _block_attend(q, k_c, v_c, mask_c, m, l, acc,
                                  heads=heads, scale=scale,
                                  softclamp_value=softclamp_value,
                                  dropout_rate=dropout_rate,
                                  dropout_seed=seed_u32, b0=b0, row0=row0,
                                  col0=col0)
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
                   dropout_rate: float = 0.0, dropout_seed=None,
                   axis_name: str = SEQ_AXIS):
    """Sequence-parallel attention on packed (b, n, h*dh) tensors whose
    sequence axis is sharded over ``axis_name`` of ``mesh``.

    ``mask`` is the (b, n) key-padding mask (True = attend), sharded the
    same way. Returns the attention output in the same sharded layout.

    ``dropout_rate``/``dropout_seed`` apply attention-prob dropout with the
    SAME counter-hash bits as the dense Pallas kernels (a pure function of
    seed and global coordinates — see _ring_keep_mask), so training
    semantics are preserved across the ring, bit-for-bit.
    """
    dh = q.shape[-1] // heads
    scale = default(scale, dh ** -0.5)
    n, p_size = q.shape[1], mesh.shape[axis_name]
    if n % p_size != 0:
        raise ValueError(
            f'ring_attention: sequence length {n} is not divisible by the '
            f'`{axis_name}` mesh axis ({p_size} shards). For the E2TTS '
            f'backbone the attended length is frames + num_registers — pick '
            f'a frame bucket so (frames + num_registers) % {p_size} == 0 '
            f'(e.g. E2Trainer(..., sequence_parallel={p_size}) validates '
            f'this per batch).')
    dropping = dropout_rate > 0.0 and exists(dropout_seed)

    data_axes = tuple(a for a in mesh.axis_names if a != axis_name)
    dspec = data_axes[0] if data_axes else None
    xspec = P(dspec, axis_name, None)
    mspec = P(dspec, axis_name)

    fn = functools.partial(_ring_attention_local, heads=heads, scale=scale,
                           softclamp_value=softclamp_value,
                           dropout_rate=dropout_rate if dropping else 0.0,
                           axis_name=axis_name, data_axis=dspec)
    args, specs = [q, k, v], [xspec, xspec, xspec]
    if exists(mask):
        args.append(mask)
        specs.append(mspec)
    if dropping:
        args.append(jnp.asarray(dropout_seed))
        specs.append(P())    # replicated scalar seed
    has_mask = exists(mask)

    def local(*a):
        i = 3
        kmask = a[i] if has_mask else None
        i += 1 if has_mask else 0
        seed = a[i] if dropping else None
        return fn(a[0], a[1], a[2], kmask, seed)

    return jax.shard_map(local, mesh=mesh, in_specs=tuple(specs),
                         out_specs=xspec, check_vma=False)(*args)


def enable_sequence_parallel(model, mesh: Mesh, axis_name: str = SEQ_AXIS):
    """Route every `Attention` module in ``model`` through ring attention
    over ``axis_name`` of ``mesh``: activations stay sequence-sharded through
    the whole backbone (pointwise ops and the depthwise conv's halo exchange
    are handled by GSPMD; the O(n^2) attention core is the one op that needs
    the explicit ring). Gives the model a long-audio story the reference
    lacks (its only cap: max_seq_len=8192 abs-pos table, e2_tts.py:537).

    Frequency-axis attention modules (`freq_attn`) are skipped: their
    "sequence" is the handful of frequency tokens, which rides a DIFFERENT
    tensor axis and is never sharded.

    Returns the number of attention modules routed.
    """
    from e2_tts_tpu.models.blocks import Attention
    from e2_tts_tpu.utils.tensor import iter_module_items
    n = 0
    for path, module in iter_module_items(model):
        if isinstance(module, Attention) and 'freq_attn' not in path:
            module.sp_mesh = mesh
            module.sp_axis = axis_name
            n += 1
    return n


class sp_paused:
    """Context manager: temporarily route ``model``'s attentions densely.

    Inference-time lengths (batch-1 prompts, duration-bucketed pads) rarely
    satisfy the ring's divisibility precondition; `E2TTS.sample()` wraps
    itself in this so a trainer-enabled model can sample without the caller
    having to know about `disable_sequence_parallel` (restores the routing
    on exit, including on error)."""

    def __init__(self, *models):
        self.models = [m for m in models if m is not None]
        self._saved = []

    def __enter__(self):
        from e2_tts_tpu.models.blocks import Attention
        from e2_tts_tpu.utils.tensor import iter_module_items
        for model in self.models:
            for _, module in iter_module_items(model):
                if isinstance(module, Attention) and exists(module.sp_mesh):
                    self._saved.append(
                        (module, module.sp_mesh, module.sp_axis))
                    module.sp_mesh = None
        return self

    def __exit__(self, *exc):
        for module, mesh, axis in self._saved:
            module.sp_mesh = mesh
            module.sp_axis = axis
        self._saved.clear()
        return False


def disable_sequence_parallel(model):
    """Undo `enable_sequence_parallel`."""
    from e2_tts_tpu.models.blocks import Attention
    from e2_tts_tpu.utils.tensor import iter_module_items
    n = 0
    for _, module in iter_module_items(model):
        if isinstance(module, Attention):
            module.sp_mesh = None
            n += 1
    return n


def shard_sequence(x, mesh: Mesh, axis_name: str = SEQ_AXIS):
    """Place (b, n, ...) activations with the sequence axis sharded."""
    spec = P(None, axis_name, *([None] * (x.ndim - 2)))
    return jax.device_put(x, NamedSharding(mesh, spec))
