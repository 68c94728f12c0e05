"""Pallas TPU flash attention with logit softclamping.

The reference's attention reaches ATen SDPA (fused CUDA kernels) through
x-transformers (SURVEY.md §2, e2_tts.py:641). This is the TPU-native
equivalent: an online-softmax (flash) kernel that keeps the (n x n) score
matrix in VMEM tiles, fused with the tanh logit softclamp and key-padding
masking the reference configures. LASER and the per-head value gates compose
outside the kernel (ops/attention.py, models/blocks.py).

Backward: FlashAttention-2-style block-wise kernels (no n^2 materialisation):
the forward also emits the per-row log-sum-exp; dq is accumulated over key
blocks, dk/dv over query blocks, with the tanh softclamp jacobian applied to
the recomputed scores. Peak memory stays O(n * d) — the XLA attention
backward at (16, 8, 1056) holds multiple 594 MB fp32 score tensors and OOMs
a v5e chip at larger batch.

Attention-prob dropout (the reference trains with dropout=0.1 on every
attention, e2_tts.py:540, 641, 689) runs INSIDE the kernel: a counter-based
hash RNG (murmur3 finalizer over (seed, batch*head, abs row, abs col)) draws
the keep mask per score tile, so the backward kernels regenerate the exact
forward mask from the same seed with zero extra memory. Pure-jnp integer ops
(not pltpu.prng_*) so the mask is bit-identical in interpret mode on CPU and
reconstructible in plain JAX for parity tests (`dropout_keep_mask`). The
softmax denominator is computed from UN-dropped probabilities (dropout after
softmax), matching torch `F.dropout(attn, p)` semantics.

All matmuls keep bf16 operands with fp32 accumulation (fp32 MXU passes run
at 1/4 rate).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2_tts_tpu.utils.helpers import exists

NEG_INF = -1e30
_INTERPRET = False   # flipped by tests on CPU


# -- counter-based dropout RNG ---------------------------------------------------

_U = lambda x: jnp.uint32(x)


def _fmix32(x, rounds: int = 2):
    """32-bit mix finalizer (murmur3-style). rounds=2 gives full avalanche;
    rounds=1 (xorshift-multiply-xorshift) is enough bit diffusion for a
    dropout keep mask at half the VPU cost."""
    x = x ^ (x >> 16)
    x = x * _U(0x7FEB352D)
    x = x ^ (x >> 15)
    if rounds >= 2:
        x = x * _U(0x846CA68B)
        x = x ^ (x >> 16)
    return x


def _keep_threshold(rate: float) -> int:
    """uint32 threshold with P(bits < threshold) = rate."""
    return min(int(rate * 4294967296.0), 4294967295)


def _keep_tile(seed_u32, bh_u32, row0_u32, col0_u32, bq, bk, rate: float):
    """(bq, bk) bool keep mask, a pure function of (seed, bh, abs row, abs col)
    — the backward kernels regenerate the forward's exact mask from the same
    coordinates.

    One scalar fmix over (seed, bh) then a single per-element finalizer:
    dropout needs uniform, decorrelated bits, not crypto — the full double
    fmix measured +0.2 ms fwd / +0.7 ms bwd per flagship call (the backward
    regenerates the mask in both kernels)."""
    rows = row0_u32 + jax.lax.broadcasted_iota(jnp.uint32, (bq, bk), 0)
    cols = col0_u32 + jax.lax.broadcasted_iota(jnp.uint32, (bq, bk), 1)
    h = _fmix32(seed_u32 ^ (bh_u32 * _U(0x27D4EB2F)))
    u = _fmix32(h + rows * _U(0x9E3779B1) + cols * _U(0x85EBCA77), rounds=1)
    return u >= _U(_keep_threshold(rate))


def dropout_keep_mask(seed, bh_total: int, n: int, rate: float) -> jax.Array:
    """Full (bh, n, n) keep mask in plain JAX — same bits the kernels draw.
    For tests / the XLA-parity oracle only (materialises n^2)."""
    seed_u32 = jnp.asarray(seed).reshape(()).astype(jnp.uint32)
    rows = jnp.arange(n, dtype=jnp.uint32)[None, :, None]
    cols = jnp.arange(n, dtype=jnp.uint32)[None, None, :]
    bhs = jnp.arange(bh_total, dtype=jnp.uint32)[:, None, None]
    h = _fmix32(seed_u32 ^ (bhs * _U(0x27D4EB2F)))
    u = _fmix32(h + rows * _U(0x9E3779B1) + cols * _U(0x85EBCA77), rounds=1)
    return u >= _U(_keep_threshold(rate))


# -- ragged-tail hygiene ---------------------------------------------------------
#
# Block sizes need not divide seq_len: Mosaic handles the short tail block by
# masking stores, but the out-of-range VMEM rows of INPUT blocks are undefined
# (measured on v5e: stale, can be NaN — 0 * NaN would poison in-range outputs
# through the matmul contractions). The fix costs only the tail tile: under a
# lax.cond on the tile index, zero the garbage rows of contraction operands and
# fold the column/row masking into the 1-D bias/lse/delta vectors the kernels
# already consume. Interior tiles run the exact unmasked fast path.


def _zero_rows_from(t, start_row, limit):
    """Zero rows >= limit of a block whose row r is absolute `start_row + r`."""
    rows = start_row + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    return jnp.where(rows < limit, t, 0).astype(t.dtype)


def _clean_kv_tail(k, v, bias_row, kb, num_kb, seq_len):
    """On the tail kv tile: zero k/v garbage rows (k: finite scores; v: PV
    contraction) and set bias NEG_INF on out-of-range columns (makes softmax
    probs exactly 0 there, so no 2-D score masking is ever needed)."""
    bk = k.shape[0]
    if seq_len % bk == 0:
        return k, v, bias_row

    def _clean(ops):
        k, v, bias_row = ops
        base = kb * bk
        k = _zero_rows_from(k, base, seq_len)
        v = _zero_rows_from(v, base, seq_len)
        col = base + jax.lax.broadcasted_iota(jnp.int32, bias_row.shape, 1)
        bias_row = jnp.where(col < seq_len, bias_row, NEG_INF)
        return k, v, bias_row

    return jax.lax.cond(kb == num_kb - 1, _clean, lambda ops: ops,
                        (k, v, bias_row))


def _clean_q_tail(q, do, lse_col, delta_col, qb, num_qb, seq_len):
    """On the tail q tile (dkv kernel): zero q/do garbage rows (both ride the
    over-rows contraction into dk/dv) and fold the row masking into the
    (bq, 1) lse (+LARGE => p = 0) and delta (0) columns."""
    bq = q.shape[0]
    if seq_len % bq == 0:
        return q, do, lse_col, delta_col

    def _clean(ops):
        q, do, lse_col, delta_col = ops
        base = qb * bq
        q = _zero_rows_from(q, base, seq_len)
        do = _zero_rows_from(do, base, seq_len)
        row = base + jax.lax.broadcasted_iota(jnp.int32, lse_col.shape, 0)
        lse_col = jnp.where(row < seq_len, lse_col, -NEG_INF)
        delta_col = jnp.where(row < seq_len, delta_col, 0.0)
        return q, do, lse_col, delta_col

    return jax.lax.cond(qb == num_qb - 1, _clean, lambda ops: ops,
                        (q, do, lse_col, delta_col))


# -- forward -------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, softclamp_value, dropout_rate,
                seq_len, bh_group):
    """Grid (bh/G, nq, nk): kv is the innermost ('arbitrary') grid dim so the
    pipeline double-buffers k/v DMAs against compute; running max/denom/acc
    live in VMEM scratch.

    Each grid step processes G = `bh_group` batch-heads (a static in-kernel
    loop): with dim_head 64 the per-head matmuls are ~70 MXU cycles, so at
    G=1 the grid's fixed per-step cost dominates (measured ~1 ms of the
    2.1 ms call at 1152 steps). G heads per step amortise it. G divides the
    head count, so all G rows of a step share one batch => one bias row.

    `seq_len` is the true (unpadded) length: the grid may have a ragged tail
    block whose out-of-range VMEM rows read garbage (measured: can be NaN).
    Only the tail tile pays for cleaning (`_clean_kv_tail` under lax.cond);
    Mosaic masks tail-row stores. No HBM-level pad/slice copies around the
    kernel (they cost ~1.3 ms per attention at flagship shape)."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # bias arrives in sublane layout (bk, 1) — one tiny transpose per grid
    # step serves all G heads
    bias_row0 = jnp.transpose(bias_ref[0], (1, 0))     # (1, bk) fp32

    for g in range(bh_group):
        q = q_ref[g]                                   # (bq, dh) compute dtype
        k = k_ref[g]                                   # (bk, dh)
        v = v_ref[g]

        k, v, bias_row = _clean_kv_tail(k, v, bias_row0, kb, num_kb, seq_len)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (bq, bk) fp32

        if exists(softclamp_value):
            s = jnp.tanh(s / softclamp_value) * softclamp_value

        s = s + bias_row

        m_prev = m_scr[g][:, 0]
        l_prev = l_scr[g][:, 0]

        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)

        # denominator accumulates UN-dropped probs (dropout acts after softmax)
        l_new = l_prev * alpha + p.sum(axis=-1)

        if dropout_rate > 0.0:
            bq, bk = p.shape
            keep = _keep_tile(
                seed_ref[0].astype(jnp.uint32),
                (pl.program_id(0) * bh_group + g).astype(jnp.uint32),
                (pl.program_id(1) * bq).astype(jnp.uint32),
                (kb * bk).astype(jnp.uint32),
                bq, bk, dropout_rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)

        acc_scr[g] = acc_scr[g] * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        m_scr[g] = m_new[:, None]
        l_scr[g] = l_new[:, None]

    @pl.when(kb == num_kb - 1)
    def _finalise():
        for g in range(bh_group):
            l_fin = jnp.clip(l_scr[g][:, 0], min=1e-30)
            o_ref[g] = (acc_scr[g] / l_fin[:, None]).astype(o_ref.dtype)
            lse_ref[g] = (m_scr[g][:, 0] + jnp.log(l_fin))[:, None]


def _pick_block(n: int, target: int = 512) -> int:
    """Block size from {128..target} minimising padded work ceil(n/b)*b
    (largest block on ties) — the kernels mask the ragged tail in-kernel,
    so n need not divide the block."""
    best, best_total = 128, ((n + 127) // 128) * 128
    for b in range(256, target + 1, 128):
        total = -(-n // b) * b
        if total <= best_total:
            best, best_total = b, total
    return best


# experiment knob: (block_q, block_k) override for device-time sweeps
_BLOCK_OVERRIDE: tuple | None = None


def _blocks(n: int):
    """(block_q, block_k) for sequence length n.

    Preferred: the largest multiple-of-8 DIVISOR of n in [128, 640] — an
    exact tiling with no ragged tail, so the kernels run with zero masking
    work. (Legal because the n-sized axes live in sublane position for the
    1-D tensors: bias/lse/delta are laid out (..., n, 1).) The E2TTS frame
    buckets (64k + 32 registers) essentially always have one, e.g.
    1056 -> 352, 1024 -> 512.

    Fallback: 128-quantum blocks with a ragged tail handled in-kernel under
    lax.cond — correct, but the cond materialises operand copies on EVERY
    tile (measured +0.65 ms/call at flagship shape), so exact tilings are
    strongly preferred."""
    if _BLOCK_OVERRIDE is not None:
        return _BLOCK_OVERRIDE
    best = None
    for b in range(128, 641, 8):
        if n % b == 0:
            best = b
    if best is not None:
        return best, best
    b = _pick_block(n)
    return b, b


def _bh_group(h: int, block_q: int, block_k: int, dh: int,
              dropping: bool = False) -> int:
    """Batch-heads per grid step: largest G in {8,4,2,1} dividing h whose
    VMEM footprint fits the 16 MB scoped limit. The dominant term is the
    per-g (block_q, block_k) fp32 score/prob temporaries — Mosaic stack-
    allocates them per unrolled g WITHOUT reuse (measured: G=8 at 512-blocks
    wants 16.56 MB), so budget ~8 bytes per score element per g plus the
    double-buffered io blocks."""
    if _GROUP_OVERRIDE is not None:
        return _GROUP_OVERRIDE
    budget = 13 * 2 ** 20
    per_elem = 8 + (8 if dropping else 0)   # fp32 s/p (+ uint32 iota/hash)
    for g in (8, 4, 2, 1):
        if h % g and g != 1:
            continue
        scores = g * block_q * block_k * per_elem
        io = g * (block_q + 2 * block_k) * dh * 2 * 2 + g * block_q * dh * (4 + 2)
        if scores + io <= budget:
            return g
    return 1


_GROUP_OVERRIDE: int | None = None


def _flash_forward(q, k, v, bias, seed, scale, softclamp_value, dropout_rate):
    b, h, n, dh = q.shape
    block_q, block_k = _blocks(n)
    G = _bh_group(h, block_q, block_k, dh, dropout_rate > 0.0)

    bias3 = bias[:, :, None]   # (b, n, 1): sublane layout — n-sized axes in
    hg = h // G                # sublane position tile with mult-of-8 blocks

    qf = q.reshape(b * h, n, dh)
    kf = k.reshape(b * h, n, dh)
    vf = v.reshape(b * h, n, dh)

    grid = (b * h // G, -(-n // block_q), -(-n // block_k))

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale,
                          softclamp_value=softclamp_value,
                          dropout_rate=dropout_rate, seq_len=n, bh_group=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, block_q, dh), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_k, dh), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_k, dh), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda i, j, kb: (i // hg, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),     # dropout seed (1,)
        ],
        out_specs=[
            pl.BlockSpec((G, block_q, dh), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_q, 1), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, block_q, 1), jnp.float32),    # running max
            pltpu.VMEM((G, block_q, 1), jnp.float32),    # running denom
            pltpu.VMEM((G, block_q, dh), jnp.float32),   # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_INTERPRET,
    )(qf, kf, vf, bias3, seed)

    return out.reshape(b, h, n, dh), lse


def _recompute_p_ds(q, k, bias, lse, do, v, delta, keep_scaled, *,
                    scale, softclamp_value):
    """Shared block math for the backward kernels: recompute probabilities and
    the score gradient (with the softclamp jacobian). All fp32 block-local.

    With dropout, ``keep_scaled`` is the forward's keep mask / (1 - rate):
    the emitted probs (for dv) become p * keep_scaled and the softmax
    backward uses d(p)_ij = keep_scaled_ij * dp_ij; delta = rowsum(do * o)
    already equals sum_k p_dropped dp (see module docstring).

    Ragged-tail hygiene happens in the callers (`_clean_kv_tail` /
    `_clean_q_tail`): inputs here are already finite, with bias NEG_INF on
    out-of-range columns (=> p exactly 0) and lse +LARGE on out-of-range rows
    where that matters (dkv)."""
    s_raw = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # (bq, bk)

    if exists(softclamp_value):
        th = jnp.tanh(s_raw / softclamp_value)
        s = th * softclamp_value
        jac = 1.0 - th * th
    else:
        s = s_raw
        jac = None

    s = s + bias
    p = jnp.exp(s - lse)                                   # (bq, bk)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (bq, bk)
    if exists(keep_scaled):
        ds = p * (keep_scaled * dp - delta)
        p = p * keep_scaled
    else:
        ds = p * (dp - delta)
    if exists(jac):
        ds = ds * jac
    ds = ds * scale
    return p, ds


def _bwd_keep_scaled(seed_ref, bh, qb, kb, bq, bk, dropout_rate):
    """Regenerate the forward's keep mask (scaled) for batch-head `bh`'s
    (qb, kb) tile."""
    if dropout_rate <= 0.0:
        return None
    keep = _keep_tile(
        seed_ref[0].astype(jnp.uint32),
        bh.astype(jnp.uint32),
        (qb * bq).astype(jnp.uint32),
        (kb * bk).astype(jnp.uint32),
        bq, bk, dropout_rate)
    return keep.astype(jnp.float32) * (1.0 / (1.0 - dropout_rate))


def _bwd_merged_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref,
                       delta_ref, seed_ref, dq_ref, dk_ref, dv_ref,
                       dq_scr, dk_scr, dv_scr, *, scale, softclamp_value,
                       dropout_rate, block_q, block_k, seq_len, bh_group):
    """ONE backward kernel for dq, dk AND dv — grid (bh/G, nk, nq), q inner.

    The split dq/dkv kernels each recompute scores + softclamp + probs +
    dropout mask per tile (2x the transcendental/hash VPU work and 2x the
    q/k/v/do DMA). Here the recompute happens once: dk/dv accumulate in
    per-kv-block scratch as usual, while dq accumulates into a
    WHOLE-SEQUENCE VMEM scratch (G, n, dh) fp32 — only ~2 MB at flagship
    shape — indexed by a mult-of-8-aligned dynamic sublane slice, and is
    flushed to HBM once on the final grid step of each bh group."""
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    num_kb = pl.num_programs(1)
    num_qb = pl.num_programs(2)

    @pl.when((kb == 0) & (qb == 0))
    def _init_dq():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(qb == 0)
    def _init_dkv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    bias_row0 = jnp.transpose(bias_ref[0], (1, 0))     # (1, bk)

    for g in range(bh_group):
        k, v, bias_row = _clean_kv_tail(k_ref[g], v_ref[g], bias_row0,
                                        kb, num_kb, seq_len)
        q, do, lse_col, delta_col = _clean_q_tail(
            q_ref[g], do_ref[g], lse_ref[g], delta_ref[g], qb, num_qb,
            seq_len)

        keep_scaled = _bwd_keep_scaled(
            seed_ref, pl.program_id(0) * bh_group + g, qb, kb,
            block_q, block_k, dropout_rate)
        p, ds = _recompute_p_ds(
            q, k, bias_row, lse_col, do, v, delta_col, keep_scaled,
            scale=scale, softclamp_value=softclamp_value)

        dv_scr[g] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scr[g] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        sl = pl.ds(qb * block_q, block_q)
        dq_scr[g, sl] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qb == num_qb - 1)
    def _flush_dkv():
        for g in range(bh_group):
            dk_ref[g] = dk_scr[g].astype(dk_ref.dtype)
            dv_ref[g] = dv_scr[g].astype(dv_ref.dtype)

    @pl.when((kb == num_kb - 1) & (qb == num_qb - 1))
    def _flush_dq():
        for g in range(bh_group):
            # dq_scr is padded to num_qb*block_q rows in the ragged
            # fallback; garbage tail rows are simply not copied out
            dq_ref[g] = dq_scr[g, :seq_len].astype(dq_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref, delta_ref,
               seed_ref, dq_ref, dq_scr, *, scale, softclamp_value,
               dropout_rate, block_q, block_k, seq_len, bh_group):
    """Grid (bh/G, nq, nk): accumulate dq over key blocks; G batch-heads per
    step (see _fwd_kernel).

    Ragged q tail needs no handling here: garbage q/lse/delta rows only
    produce garbage dq rows, which Mosaic's masked store drops."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    bias_row0 = jnp.transpose(bias_ref[0], (1, 0))     # (1, bk)

    for g in range(bh_group):
        k, v, bias_row = _clean_kv_tail(k_ref[g], v_ref[g], bias_row0,
                                        kb, num_kb, seq_len)

        keep_scaled = _bwd_keep_scaled(
            seed_ref, pl.program_id(0) * bh_group + g, pl.program_id(1), kb,
            block_q, block_k, dropout_rate)
        p, ds = _recompute_p_ds(
            q_ref[g], k, bias_row, lse_ref[g], do_ref[g], v,
            delta_ref[g], keep_scaled,
            scale=scale, softclamp_value=softclamp_value)

        dq_scr[g] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _done():
        for g in range(bh_group):
            dq_ref[g] = dq_scr[g].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref, delta_ref,
                seed_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale,
                softclamp_value, dropout_rate, block_q, block_k, seq_len,
                bh_group):
    """Grid (bh/G, nk, nq): accumulate dk/dv over query blocks; G batch-heads
    per step (see _fwd_kernel).

    Ragged kv tail needs no handling here: garbage k/v/bias columns only
    produce garbage dk/dv rows on the tail kv tile, which the masked store
    drops. The q tail DOES matter — garbage q/do rows ride the over-rows
    contraction into every dk/dv row — so the tail q tile zeroes q/do and
    folds the row mask into lse (+LARGE => p = 0) and delta (0)."""
    qb = pl.program_id(2)
    num_qb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    bias_row0 = jnp.transpose(bias_ref[0], (1, 0))     # (1, bk)

    for g in range(bh_group):
        q, do, lse_col, delta_col = _clean_q_tail(
            q_ref[g], do_ref[g], lse_ref[g], delta_ref[g], qb, num_qb,
            seq_len)

        keep_scaled = _bwd_keep_scaled(
            seed_ref, pl.program_id(0) * bh_group + g, qb, pl.program_id(1),
            block_q, block_k, dropout_rate)
        p, ds = _recompute_p_ds(
            q, k_ref[g], bias_row0, lse_col, do, v_ref[g],
            delta_col, keep_scaled,
            scale=scale, softclamp_value=softclamp_value)

        dv_scr[g] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scr[g] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qb == num_qb - 1)
    def _done():
        for g in range(bh_group):
            dk_ref[g] = dk_scr[g].astype(dk_ref.dtype)
            dv_ref[g] = dv_scr[g].astype(dv_ref.dtype)


def _flash_backward(q, k, v, bias, seed, o, lse, g, scale, softclamp_value,
                    dropout_rate):
    b, h, n, dh = q.shape
    block_q, block_k = _blocks(n)

    bias3 = bias[:, :, None]                           # (b, n, 1) sublane

    qf = q.reshape(b * h, n, dh)
    kf = k.reshape(b * h, n, dh)
    vf = v.reshape(b * h, n, dh)
    of = o.reshape(b * h, n, dh)
    gf = g.reshape(b * h, n, dh)

    # delta = rowsum(do * o) — tiny elementwise pre-pass in XLA
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1)[:, :, None]               # (bh, n, 1) sublane

    nq_blocks = -(-n // block_q)
    nk_blocks = -(-n // block_k)
    n_pad = nq_blocks * block_q

    # merged-kernel group size: the whole-sequence dq scratch joins the
    # VMEM budget. 0 => no G fits, fall back to the split dq/dkv kernels.
    def _merged_group():
        budget = 13 * 2 ** 20
        # the merged kernel holds s/p/dp/ds (+ dropout iota/hash) fp32
        # score-shaped temporaries live per unrolled g — Mosaic stack does
        # not reuse slots across the loop (measured: 8 B/elem OOMs at G=4)
        per_elem = 28 + (8 if dropout_rate > 0.0 else 0)
        for g in (8, 4, 2, 1):
            if h % g:
                continue
            scores = g * block_q * block_k * per_elem
            dq_scr = g * n_pad * dh * 4
            io = g * (2 * block_q + 2 * block_k) * dh * 2 * 2 \
                + g * 2 * block_k * dh * 4
            if scores + dq_scr + io <= budget:
                return g
        return 0

    Gm = _merged_group()
    if Gm:
        hg = h // Gm
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_merged_kernel, scale=scale,
                softclamp_value=softclamp_value, dropout_rate=dropout_rate,
                block_q=block_q, block_k=block_k, seq_len=n, bh_group=Gm),
            grid=(b * h // Gm, nk_blocks, nq_blocks),
            in_specs=[
                pl.BlockSpec((Gm, block_q, dh), lambda i, j, qb: (i, qb, 0),
                             memory_space=pltpu.VMEM),   # q
                pl.BlockSpec((Gm, block_k, dh), lambda i, j, qb: (i, j, 0),
                             memory_space=pltpu.VMEM),   # k
                pl.BlockSpec((Gm, block_k, dh), lambda i, j, qb: (i, j, 0),
                             memory_space=pltpu.VMEM),   # v
                pl.BlockSpec((1, block_k, 1), lambda i, j, qb: (i // hg, j, 0),
                             memory_space=pltpu.VMEM),   # bias
                pl.BlockSpec((Gm, block_q, 1), lambda i, j, qb: (i, qb, 0),
                             memory_space=pltpu.VMEM),   # lse
                pl.BlockSpec((Gm, block_q, dh), lambda i, j, qb: (i, qb, 0),
                             memory_space=pltpu.VMEM),   # do
                pl.BlockSpec((Gm, block_q, 1), lambda i, j, qb: (i, qb, 0),
                             memory_space=pltpu.VMEM),   # delta
                pl.BlockSpec(memory_space=pltpu.SMEM),   # dropout seed (1,)
            ],
            out_specs=[
                pl.BlockSpec((Gm, n, dh), lambda i, j, qb: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # dq (whole seq)
                pl.BlockSpec((Gm, block_k, dh), lambda i, j, qb: (i, j, 0),
                             memory_space=pltpu.VMEM),   # dk
                pl.BlockSpec((Gm, block_k, dh), lambda i, j, qb: (i, j, 0),
                             memory_space=pltpu.VMEM),   # dv
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
                jax.ShapeDtypeStruct((b * h, n, dh), k.dtype),
                jax.ShapeDtypeStruct((b * h, n, dh), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((Gm, n_pad, dh), jnp.float32),
                pltpu.VMEM((Gm, block_k, dh), jnp.float32),
                pltpu.VMEM((Gm, block_k, dh), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
            interpret=_INTERPRET,
        )(qf, kf, vf, bias3, lse, gf, delta, seed)
        to_bhnd = lambda t: t.reshape(b, h, n, dh)
        return to_bhnd(dq), to_bhnd(dk), to_bhnd(dv)

    G = _bh_group(h, block_q, block_k, dh, dropout_rate > 0.0)
    hg = h // G
    common = dict(scale=scale, softclamp_value=softclamp_value,
                  dropout_rate=dropout_rate, block_q=block_q, block_k=block_k,
                  seq_len=n, bh_group=G)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(b * h // G, nq_blocks, nk_blocks),
        in_specs=[
            pl.BlockSpec((G, block_q, dh), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((G, block_k, dh), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((G, block_k, dh), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),   # v
            pl.BlockSpec((1, block_k, 1), lambda i, j, kb: (i // hg, kb, 0),
                         memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec((G, block_q, 1), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec((G, block_q, dh), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),   # do
            pl.BlockSpec((G, block_q, 1), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),   # delta
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dropout seed (1,)
        ],
        out_specs=pl.BlockSpec((G, block_q, dh), lambda i, j, kb: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((G, block_q, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_INTERPRET,
    )(qf, kf, vf, bias3, lse, gf, delta, seed)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid=(b * h // G, nk_blocks, nq_blocks),
        in_specs=[
            pl.BlockSpec((G, block_q, dh), lambda i, j, qb: (i, qb, 0),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((G, block_k, dh), lambda i, j, qb: (i, j, 0),
                         memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((G, block_k, dh), lambda i, j, qb: (i, j, 0),
                         memory_space=pltpu.VMEM),   # v
            pl.BlockSpec((1, block_k, 1), lambda i, j, qb: (i // hg, j, 0),
                         memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec((G, block_q, 1), lambda i, j, qb: (i, qb, 0),
                         memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec((G, block_q, dh), lambda i, j, qb: (i, qb, 0),
                         memory_space=pltpu.VMEM),   # do
            pl.BlockSpec((G, block_q, 1), lambda i, j, qb: (i, qb, 0),
                         memory_space=pltpu.VMEM),   # delta
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dropout seed (1,)
        ],
        out_specs=[
            pl.BlockSpec((G, block_k, dh), lambda i, j, qb: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_k, dh), lambda i, j, qb: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n, dh), k.dtype),
            jax.ShapeDtypeStruct((b * h, n, dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, block_k, dh), jnp.float32),
            pltpu.VMEM((G, block_k, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_INTERPRET,
    )(qf, kf, vf, bias3, lse, gf, delta, seed)

    to_bhnd = lambda t: t.reshape(b, h, n, dh)
    return to_bhnd(dq), to_bhnd(dk), to_bhnd(dv)


# -- custom VJP ----------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash(q, k, v, bias, seed, scale, softclamp_value, dropout_rate):
    out, _ = _flash_forward(q, k, v, bias, seed, scale, softclamp_value,
                            dropout_rate)
    return out


def _flash_fwd(q, k, v, bias, seed, scale, softclamp_value, dropout_rate):
    out, lse = _flash_forward(q, k, v, bias, seed, scale, softclamp_value,
                              dropout_rate)
    return out, (q, k, v, bias, seed, out, lse)


def _flash_bwd(scale, softclamp_value, dropout_rate, res, g):
    q, k, v, bias, seed, o, lse = res
    dq, dk, dv = _flash_backward(q, k, v, bias, seed, o, lse, g, scale,
                                 softclamp_value, dropout_rate)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias), dseed


_flash.defvjp(_flash_fwd, _flash_bwd)


# -- lane-packed (transpose-free) kernels --------------------------------------
#
# The (b, n, h, dh) -> (b, h, n, dh) head-split transposes around the kernels
# above are pure data formatting: at flagship shape they burn ~19 ms/step of
# HBM bandwidth doing zero FLOPs (8 transposes of 17 MB per attention call,
# fwd+bwd, x16 calls). These kernels consume q/k/v in the PROJECTION's own
# layout — (b, n, h*dh), heads contiguous in the lane dimension — so the
# module runs projection -> kernel -> out-projection with no transposes at
# all, forward or backward.
#
# Per-head math inside a 128-lane tile uses the lane-masking identity: with
# dh | 128, head hh occupies lanes [hh*dh, (hh+1)*dh) of its tile, and
#   scores_hh = q_tile @ (k_tile masked to hh's lanes)^T
# is exact — the zeroed k lanes annihilate the other heads' q lanes in the
# contraction. MXU cost is unchanged: a dh=64 contraction already half-fills
# the 128-deep systolic array, so contracting 128 lanes (half zeros) takes
# the same passes; likewise PV with 64 output lanes occupies a full output
# tile. The masks are cheap VPU selects on bf16 tiles.
#
# Running max / denom / lse keep the (heads, n, 1) SUBLANE layout of the
# kernels above — per grid step these are (heads_per_block, block, 1) blocks
# whose dim-0 index rides the global (b*h) head order, which the lane-block
# grid enumerates contiguously.


def packed_eligible(heads: int, dim_head: int) -> bool:
    """Shapes the lane-packed kernels accept: whole lane tiles of whole
    heads. Everything else routes to the transposing kernels above."""
    return (128 % dim_head == 0) and ((heads * dim_head) % 128 == 0)


def _packed_lane_mask(shape_rows: int, lo: int, hi: int):
    """(rows, 128) bf16-friendly lane mask for lanes [lo, hi)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (shape_rows, 128), 1)
    return (lane >= lo) & (lane < hi)


def _lane_col(tile, idx):
    """Extract lane column ``idx`` of a (rows, L) f32 tile as (rows,) via a
    masked FULL-width reduce: a direct ``tile[:, idx]`` keeps a lane-offset
    layout Mosaic cannot relayout/reduce ("Not implemented: Offset change"),
    and ``idx`` may be traced (program_id-derived global head index)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    return jnp.sum(jnp.where(lane == idx, tile, 0.0), axis=-1)


def _packed_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale,
                       softclamp_value, dropout_rate, seq_len, dh,
                       lane_blocks, total_heads, gated=False):
    """Grid (b * lane_blocks, nq, nk), kv innermost. Blocks are
    (1, block, LB) slabs of the packed (b, n, D) arrays; each grid step
    processes LB // dh heads (all heads living in its lane block).

    ``gated``: a per-head sigmoid value gate (the x-transformers
    ``gate_value_heads``, e2_tts.py:548-551) multiplies into the output
    INSIDE the finalise — the separate (b, n, D) elementwise pass (and its
    lane-expansion) disappears. The gate scales o only, never the softmax
    stats, so lse stays gate-free. The gate always arrives as (1, bq, h)
    blocks of the projection-native (b, n, h) tensor (ALL heads in lanes;
    this step's columns are extracted by global head index via `_lane_col`)
    — never the legacy (b*h, n, 1) sublane layout, whose host-side
    transpose is a pathological 8-lane strided copy (~1.3 ms/step at
    flagship shape, r5 profile)."""
    if gated:
        gate_ref, seed_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        seed_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
        gate_ref = None
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    LB = q_ref.shape[2]
    hpt = 128 // dh                    # heads per 128-lane tile
    n_tiles = LB // 128

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    bias_row = jnp.transpose(bias_ref[0], (1, 0))        # (1, bk) fp32
    base = pl.program_id(1) * q_ref.shape[1]             # abs q row 0
    kbase = kb * k_ref.shape[1]                          # abs k row 0
    # ragged kv tail: fold column masking into the bias row (NEG_INF => p=0)
    if seq_len % k_ref.shape[1] != 0:
        col = kbase + jax.lax.broadcasted_iota(jnp.int32, bias_row.shape, 1)
        bias_row = jnp.where(col < seq_len, bias_row, NEG_INF)

    q_all = q_ref[0]                                     # (bq, LB)
    k_all = k_ref[0]                                     # (bk, LB)
    v_all = v_ref[0]
    bq, bk = q_all.shape[0], k_all.shape[0]
    # ragged kv tail: zero garbage k/v rows (k: finite scores; v: PV)
    if seq_len % bk != 0:
        k_all = _zero_rows_from(k_all, kbase, seq_len)
        v_all = _zero_rows_from(v_all, kbase, seq_len)

    # heads handled by this grid step start at this global head index
    head0 = (pl.program_id(0) % lane_blocks) * (LB // dh)
    batch = pl.program_id(0) // lane_blocks

    for t in range(n_tiles):
        sl = slice(128 * t, 128 * (t + 1))
        q_t = q_all[:, sl]
        k_t = k_all[:, sl]
        v_t = v_all[:, sl]

        alpha_lanes = None
        pv = None
        for hh in range(hpt):
            hs = t * hpt + hh                            # head slot in block
            lo, hi = hh * dh, (hh + 1) * dh
            k_h = jnp.where(_packed_lane_mask(bk, lo, hi), k_t, 0)

            s = jax.lax.dot_general(
                q_t, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale     # (bq, bk)

            if exists(softclamp_value):
                s = jnp.tanh(s / softclamp_value) * softclamp_value
            s = s + bias_row

            m_prev = m_scr[hs][:, 0]
            l_prev = l_scr[hs][:, 0]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[:, None])
            alpha = jnp.exp(m_prev - m_new)
            l_scr[hs] = (l_prev * alpha + p.sum(axis=-1))[:, None]
            m_scr[hs] = m_new[:, None]

            if dropout_rate > 0.0:
                keep = _keep_tile(
                    seed_ref[0].astype(jnp.uint32),
                    (batch * total_heads + head0 + hs).astype(jnp.uint32),
                    base.astype(jnp.uint32), kbase.astype(jnp.uint32),
                    bq, bk, dropout_rate)
                p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)

            v_h = jnp.where(_packed_lane_mask(bk, lo, hi), v_t, 0)
            contrib = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bq, 128)
            pv = contrib if pv is None else pv + contrib

            a_col = alpha[:, None]                       # (bq, 1)
            mask_l = _packed_lane_mask(bq, lo, hi)
            alpha_lanes = (jnp.where(mask_l, a_col, 0.0) if alpha_lanes is None
                           else jnp.where(mask_l, a_col, alpha_lanes))

        acc_scr[:, sl] = acc_scr[:, sl] * alpha_lanes + pv

    @pl.when(kb == num_kb - 1)
    def _finalise():
        bq = q_ref.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, LB), 1)
        recip = jnp.zeros((bq, LB), jnp.float32)
        for t in range(n_tiles):
            for hh in range(hpt):
                hs = t * hpt + hh
                l_fin = jnp.clip(l_scr[hs][:, 0], min=1e-30)
                lse_ref[hs] = (m_scr[hs][:, 0] + jnp.log(l_fin))[:, None]
                lo, hi = 128 * t + hh * dh, 128 * t + (hh + 1) * dh
                sc = 1.0 / l_fin
                if gated:
                    sc = sc * _lane_col(gate_ref[0], head0 + hs)
                recip = jnp.where((lane >= lo) & (lane < hi),
                                  sc[:, None], recip)
        o_ref[0] = (acc_scr[...] * recip).astype(o_ref.dtype)


def _packed_choose(n: int, D: int, dh: int, dropping: bool, backward: bool):
    """(block, LB): sequence block from the divisor set (`_blocks`), lane
    block LB a multiple-of-128 divisor of D — largest combo whose VMEM
    footprint fits. The dominant term is the per-head fp32 score temporaries,
    stack-allocated per unrolled head WITHOUT reuse (see `_bh_group`)."""
    budget = 13 * 2 ** 20
    per_head = (28 if backward else 8) + (8 if dropping else 0)
    blk0, _ = _blocks(n)
    # shrink path: smaller divisor blocks of n (exact tilings), then 128
    blocks = [blk0] + [bb for bb in range(blk0 - 8, 127, -8)
                       if n % bb == 0] + ([128] if blk0 != 128 else [])
    for block in blocks:
        n_pad = -(-n // block) * block
        for LB in (512, 384, 256, 128):
            if LB > D or D % LB:
                continue
            H_blk = LB // dh
            scores = H_blk * block * block * per_head
            if backward:
                fixed = n_pad * LB * 4 + 2 * block * LB * 4 \
                    + (2 * block + 2 * block) * LB * 2 * 2
            else:
                fixed = block * LB * 4 + (block + 2 * block) * LB * 2 * 2
            if scores + fixed <= budget:
                return block, LB
    return blocks[-1], 128


def _flash_packed_forward(q, k, v, bias, seed, heads, scale, softclamp_value,
                          dropout_rate, gate=None):
    """``gate``: optional (b, n, h) f32 per-head output gate values (sigmoid
    already applied, projection-native head-lanes layout), folded into the
    finalise. Always consumed directly as (1, block, h) blocks — every grid
    step loads ALL heads' gate columns (the lane dim cannot be sub-blocked
    below 128) and extracts its own by global head index; the re-read is a
    few KB. The legacy (b*h, n, 1) sublane staging is gone: its host-side
    transpose ran as a pathological 8-lane strided copy (~1.3 ms/step at
    flagship shape, NL=4)."""
    b, n, D = q.shape
    dh = D // heads
    block, LB = _packed_choose(n, D, dh, dropout_rate > 0.0, backward=False)
    NL = D // LB                     # lane blocks
    H_blk = LB // dh                 # heads per grid step

    bias3 = bias[:, :, None]         # (b, n, 1) sublane
    grid = (b * NL, -(-n // block), -(-n // block))

    gate_ops, gate_specs = (), ()
    if exists(gate):
        gate_ops = (gate,)
        gate_specs = (pl.BlockSpec((1, block, heads),
                                   lambda i, j, kb: (i // NL, j, 0),
                                   memory_space=pltpu.VMEM),)

    out, lse = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale,
                          softclamp_value=softclamp_value,
                          dropout_rate=dropout_rate, seq_len=n, dh=dh,
                          lane_blocks=NL, total_heads=heads,
                          gated=exists(gate)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, LB), lambda i, j, kb: (i // NL, j, i % NL),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, LB), lambda i, j, kb: (i // NL, kb, i % NL),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, LB), lambda i, j, kb: (i // NL, kb, i % NL),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, 1), lambda i, j, kb: (i // NL, kb, 0),
                         memory_space=pltpu.VMEM),
            *gate_specs,
            pl.BlockSpec(memory_space=pltpu.SMEM),     # dropout seed (1,)
        ],
        out_specs=[
            pl.BlockSpec((1, block, LB), lambda i, j, kb: (i // NL, j, i % NL),
                         memory_space=pltpu.VMEM),
            # (b*h, n, 1) sublane lse: the lane-block grid walks global heads
            # contiguously, H_blk per step
            pl.BlockSpec((H_blk, block, 1), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, D), q.dtype),
            jax.ShapeDtypeStruct((b * heads, n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H_blk, block, 1), jnp.float32),    # running max
            pltpu.VMEM((H_blk, block, 1), jnp.float32),    # running denom
            pltpu.VMEM((block, LB), jnp.float32),          # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_INTERPRET,
    )(q, k, v, bias3, *gate_ops, seed)

    return out, lse


def _packed_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref,
                       delta_ref, *rest, scale, softclamp_value,
                       dropout_rate, seq_len, dh, lane_blocks, total_heads,
                       gated=False):
    """Merged packed backward — grid (b * lane_blocks, nk, nq), q innermost.
    dk/dv accumulate in per-kv-block scratch; dq in a whole-sequence
    (n_pad, LB) fp32 scratch flushed on the last grid step (same scheme as
    `_bwd_merged_kernel`). Per-head math uses the lane-masking identities:
    scores/dq mask k, dk masks q, dv masks do — each contraction sees
    exactly one head's lanes.

    ``gated``: the fwd output was gated per head in its finalise; the
    incoming do is multiplied by the same per-head gate values here (the
    adjoint of `o_final = o_pre * g` wrt the pre-gate output), so dq/dk/dv
    flow through unchanged math. lse/delta are gate-invariant: delta is
    computed from (do, o_final) outside, and rowsum(do * o_final) ==
    rowsum(do_pre * o_pre).

    delta (and the gate, when gated) arrive as (1, block, h) blocks of
    projection-native (b, n, h) tensors — ALL heads in lanes, this step's
    columns extracted by global head index via `_lane_col`; no host-side
    transpose to the (b*h, n, 1) sublane layout in any NL case. lse keeps
    the sublane layout: it is produced by the forward KERNEL in that
    layout, so no host copy is ever involved."""
    if gated:
        gate_ref, seed_ref, dq_ref, dk_ref, dv_ref, \
            dq_scr, dk_scr, dv_scr = rest
    else:
        seed_ref, dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr = rest
        gate_ref = None
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    num_kb = pl.num_programs(1)
    num_qb = pl.num_programs(2)
    LB = q_ref.shape[2]
    hpt = 128 // dh
    n_tiles = LB // 128
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when((kb == 0) & (qb == 0))
    def _init_dq():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(qb == 0)
    def _init_dkv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    bias_row = jnp.transpose(bias_ref[0], (1, 0))        # (1, bk)
    qbase = qb * block_q
    kbase = kb * block_k

    q_all = q_ref[0]
    do_all = do_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    if seq_len % block_k != 0:
        col = kbase + jax.lax.broadcasted_iota(jnp.int32, bias_row.shape, 1)
        bias_row = jnp.where(col < seq_len, bias_row, NEG_INF)
        k_all = _zero_rows_from(k_all, kbase, seq_len)
        v_all = _zero_rows_from(v_all, kbase, seq_len)
    ragged_q = seq_len % block_q != 0
    if ragged_q:
        q_all = _zero_rows_from(q_all, qbase, seq_len)
        do_all = _zero_rows_from(do_all, qbase, seq_len)

    head0 = (pl.program_id(0) % lane_blocks) * (LB // dh)
    batch = pl.program_id(0) // lane_blocks

    if gated:
        # do_pre = do * g, assembled per head lane range (one VPU pass)
        lane = jax.lax.broadcasted_iota(jnp.int32, (block_q, LB), 1)
        gl = jnp.zeros((block_q, LB), jnp.float32)
        for t in range(n_tiles):
            for hh in range(hpt):
                hs = t * hpt + hh
                lo, hi = 128 * t + hh * dh, 128 * t + (hh + 1) * dh
                g_col = _lane_col(gate_ref[0], head0 + hs)[:, None]
                gl = jnp.where((lane >= lo) & (lane < hi), g_col, gl)
        do_all = (do_all.astype(jnp.float32) * gl).astype(do_all.dtype)

    for t in range(n_tiles):
        sl = slice(128 * t, 128 * (t + 1))
        q_t, k_t, v_t, do_t = (q_all[:, sl], k_all[:, sl], v_all[:, sl],
                               do_all[:, sl])
        dq_tile = None
        dk_tile = None
        dv_tile = None
        for hh in range(hpt):
            hs = t * hpt + hh
            lo, hi = hh * dh, (hh + 1) * dh
            kmask = _packed_lane_mask(block_k, lo, hi)
            qmask = _packed_lane_mask(block_q, lo, hi)
            k_h = jnp.where(kmask, k_t, 0)
            v_h = jnp.where(kmask, v_t, 0)
            q_h = jnp.where(qmask, q_t, 0)
            do_h = jnp.where(qmask, do_t, 0)

            lse_col = lse_ref[hs]                        # (bq, 1)
            delta_col = _lane_col(delta_ref[0], head0 + hs)[:, None]
            if ragged_q:
                row = qbase + jax.lax.broadcasted_iota(
                    jnp.int32, lse_col.shape, 0)
                lse_col = jnp.where(row < seq_len, lse_col, -NEG_INF)
                delta_col = jnp.where(row < seq_len, delta_col, 0.0)

            keep_scaled = _bwd_keep_scaled(
                seed_ref,
                batch * total_heads + head0 + hs,
                qb, kb, block_q, block_k, dropout_rate)
            # q_t (not q_h) is fine for scores: k_h's zero lanes annihilate
            # the other heads' q lanes in the contraction
            p, ds = _recompute_p_ds(
                q_t, k_h, bias_row, lse_col, do_t, v_h, delta_col,
                keep_scaled, scale=scale, softclamp_value=softclamp_value)

            c_dv = jax.lax.dot_general(
                p.astype(do_h.dtype), do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (bk, 128)
            dv_tile = c_dv if dv_tile is None else dv_tile + c_dv
            c_dk = jax.lax.dot_general(
                ds.astype(q_h.dtype), q_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_tile = c_dk if dk_tile is None else dk_tile + c_dk
            c_dq = jax.lax.dot_general(
                ds.astype(k_h.dtype), k_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (bq, 128)
            dq_tile = c_dq if dq_tile is None else dq_tile + c_dq

        dk_scr[:, sl] += dk_tile
        dv_scr[:, sl] += dv_tile
        qsl = pl.ds(qb * block_q, block_q)
        dq_scr[qsl, sl] += dq_tile

    @pl.when(qb == num_qb - 1)
    def _flush_dkv():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

    @pl.when((kb == num_kb - 1) & (qb == num_qb - 1))
    def _flush_dq():
        dq_ref[0] = dq_scr[:seq_len].astype(dq_ref.dtype)


@functools.lru_cache(maxsize=None)
def _seg_reduce_matrix_np(heads: int, dim_head: int):
    """(h*dh, h) 0/1 matrix S with S[i*dh:(i+1)*dh, i] = 1: ``x @ S`` sums
    packed lanes per head — the per-head lane reduction as one MXU
    contraction, avoiding the 4-D (b, n, h, dh) reshape whose layout
    pathology costs full-tensor copies (see ops/rotary.py)."""
    e = np.zeros((heads * dim_head, heads), dtype=np.float32)
    for i in range(heads):
        e[i * dim_head:(i + 1) * dim_head, i] = 1.0
    return e


def _delta_kernel(o_ref, do_ref, seg_ref, out_ref):
    """delta_bnh block: rowsum(do * o) per packed head, one VMEM pass.
    The lane contraction rides the MXU via the 0/1 segment matrix; rows of
    a ragged tail block compute garbage that the out-of-bounds write drops
    (the lane dot never mixes rows)."""
    prod = o_ref[0].astype(jnp.float32) * do_ref[0].astype(jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        prod, seg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _delta_bnh_pallas(o, do, heads):
    """(b, n, h) f32 ``rowsum(do * o)`` per head, fused: reads o/do bf16
    once and writes the tiny (b, n, h) result directly — no (b, n, D) f32
    product materialization and no lane-width-``h`` XLA GEMM (both layout
    pathologies, BENCH_NOTES r4/r5). Oracle: the `_delta_bnh_xla` pre-pass;
    select with ``E2TTS_FLASH_DELTA=pallas`` (default xla until the kernel
    is profiler-measured on hardware)."""
    b, n, D = o.shape
    # ~18 B per (row, lane) element: bf16 o/do windows + their f32 casts +
    # the f32 product; divisor blocks preferred but a ragged tail is safe
    cap = max(8, (10 * 2 ** 20) // (18 * D) // 8 * 8)
    block = min(_blocks(n)[0], cap)
    seg = jnp.asarray(_seg_reduce_matrix_np(heads, D // heads))
    return pl.pallas_call(
        _delta_kernel,
        grid=(b, -(-n // block)),
        in_specs=[
            pl.BlockSpec((1, block, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, heads), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, heads), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, heads), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        interpret=_INTERPRET,
    )(o, do, seg)


def _delta_bnh_xla(o, do, heads):
    """XLA delta pre-pass (the historical form and the parity oracle)."""
    b, n, D = o.shape
    prod = (do.astype(jnp.float32) * o.astype(jnp.float32))     # (b, n, D)
    return jax.lax.dot_general(
        prod, jnp.asarray(_seg_reduce_matrix_np(heads, D // heads)),
        (((2,), (0,)), ((), ())))                               # (b, n, h)


def _delta_bnh(o, do, heads):
    if (os.environ.get('E2TTS_FLASH_DELTA', 'xla') == 'pallas'
            and (jax.default_backend() == 'tpu' or _INTERPRET)):
        return _delta_bnh_pallas(o, do, heads)
    return _delta_bnh_xla(o, do, heads)


def _flash_packed_backward(q, k, v, bias, seed, o, lse, g, heads, scale,
                           softclamp_value, dropout_rate, gate=None,
                           return_delta_bnh=False):
    b, n, D = q.shape
    dh = D // heads
    block, LB = _packed_choose(n, D, dh, dropout_rate > 0.0, backward=True)
    NL = D // LB
    H_blk = LB // dh

    bias3 = bias[:, :, None]
    # delta = rowsum(do * o) per head via the 0/1 segment matmul
    # (gate-invariant: rowsum(do*o_final) == rowsum(do_pre*o_pre) since the
    # per-head gate cancels). Stays in (b, n, h) — the kernel always
    # consumes it lane-wise (all heads per block, extracted by global head
    # index); the legacy (b*h, n, 1) sublane transpose ran as a pathological
    # 8-lane strided copy on XLA (~2.3 ms/step at flagship shape, NL=4).
    delta_bnh = _delta_bnh(o, g, heads)                      # (b, n, h)

    nq_blocks = -(-n // block)
    nk_blocks = -(-n // block)
    n_pad = nq_blocks * block

    delta_spec = pl.BlockSpec((1, block, heads),
                              lambda i, j, qb: (i // NL, qb, 0),
                              memory_space=pltpu.VMEM)

    gate_ops, gate_specs = (), ()
    if exists(gate):
        gate_ops = (gate,)
        gate_specs = (pl.BlockSpec((1, block, heads),
                                   lambda i, j, qb: (i // NL, qb, 0),
                                   memory_space=pltpu.VMEM),)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale,
                          softclamp_value=softclamp_value,
                          dropout_rate=dropout_rate, seq_len=n, dh=dh,
                          lane_blocks=NL, total_heads=heads,
                          gated=exists(gate)),
        grid=(b * NL, nk_blocks, nq_blocks),
        in_specs=[
            pl.BlockSpec((1, block, LB), lambda i, j, qb: (i // NL, qb, i % NL),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, block, LB), lambda i, j, qb: (i // NL, j, i % NL),
                         memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((1, block, LB), lambda i, j, qb: (i // NL, j, i % NL),
                         memory_space=pltpu.VMEM),   # v
            pl.BlockSpec((1, block, 1), lambda i, j, qb: (i // NL, j, 0),
                         memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec((H_blk, block, 1), lambda i, j, qb: (i, qb, 0),
                         memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec((1, block, LB), lambda i, j, qb: (i // NL, qb, i % NL),
                         memory_space=pltpu.VMEM),   # do
            delta_spec,                              # delta
            *gate_specs,
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dropout seed (1,)
        ],
        out_specs=[
            pl.BlockSpec((1, n, LB), lambda i, j, qb: (i // NL, 0, i % NL),
                         memory_space=pltpu.VMEM),   # dq (whole seq)
            pl.BlockSpec((1, block, LB), lambda i, j, qb: (i // NL, j, i % NL),
                         memory_space=pltpu.VMEM),   # dk
            pl.BlockSpec((1, block, LB), lambda i, j, qb: (i // NL, j, i % NL),
                         memory_space=pltpu.VMEM),   # dv
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, D), q.dtype),
            jax.ShapeDtypeStruct((b, n, D), k.dtype),
            jax.ShapeDtypeStruct((b, n, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, LB), jnp.float32),
            pltpu.VMEM((block, LB), jnp.float32),
            pltpu.VMEM((block, LB), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
        interpret=_INTERPRET,
    )(q, k, v, bias3, lse, g, delta_bnh, *gate_ops, seed)
    if return_delta_bnh:
        return dq, dk, dv, delta_bnh
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_packed(q, k, v, bias, seed, heads, scale, softclamp_value,
                  dropout_rate):
    out, _ = _flash_packed_forward(q, k, v, bias, seed, heads, scale,
                                   softclamp_value, dropout_rate)
    return out


def _flash_packed_fwd(q, k, v, bias, seed, heads, scale, softclamp_value,
                      dropout_rate):
    out, lse = _flash_packed_forward(q, k, v, bias, seed, heads, scale,
                                     softclamp_value, dropout_rate)
    return out, (q, k, v, bias, seed, out, lse)


def _flash_packed_bwd(heads, scale, softclamp_value, dropout_rate, res, g):
    q, k, v, bias, seed, o, lse = res
    dq, dk, dv = _flash_packed_backward(q, k, v, bias, seed, o, lse, g,
                                        heads, scale, softclamp_value,
                                        dropout_rate)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias), dseed


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def _gate_values(gate_logits):
    """(b, n, h) logits -> (b, n, h) f32 sigmoid values, kept in the
    projection-native layout (the forward/backward wrappers feed them to the
    kernels lane-wise; the legacy sublane transpose only exists inside the
    NL > 1 fallback — host-side it is a pathological 8-lane strided copy,
    ~4.5 ms/step at flagship shape)."""
    return jax.nn.sigmoid(gate_logits.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash_packed_gated(q, k, v, bias, seed, gate_logits, heads, scale,
                        softclamp_value, dropout_rate):
    """`_flash_packed` with the per-head sigmoid output gate
    (x-transformers ``gate_value_heads``, e2_tts.py:548-551) folded into the
    kernels: o_final = o_pre * sigmoid(gate_logits)[head]. The gate grad
    rides the delta computation for free:
        d gate_logits = rowsum_head(do * o_final) * (1 - sigmoid(logits))
    since rowsum(do * o_final) = rowsum(do_pre * o_pre) * g / g."""
    out, _ = _flash_packed_forward(
        q, k, v, bias, seed, heads, scale, softclamp_value, dropout_rate,
        gate=_gate_values(gate_logits))
    return out


def _flash_packed_gated_fwd(q, k, v, bias, seed, gate_logits, heads, scale,
                            softclamp_value, dropout_rate):
    out, lse = _flash_packed_forward(
        q, k, v, bias, seed, heads, scale, softclamp_value, dropout_rate,
        gate=_gate_values(gate_logits))
    return out, (q, k, v, bias, seed, out, lse, gate_logits)


def _flash_packed_gated_bwd(heads, scale, softclamp_value, dropout_rate,
                            res, g):
    q, k, v, bias, seed, o, lse, gate_logits = res
    gv = jax.nn.sigmoid(gate_logits.astype(jnp.float32))      # (b, n, h)
    dq, dk, dv, delta_bnh = _flash_packed_backward(
        q, k, v, bias, seed, o, lse, g, heads, scale, softclamp_value,
        dropout_rate, gate=gv, return_delta_bnh=True)
    dlogits = (delta_bnh * (1.0 - gv)).astype(gate_logits.dtype)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias), dseed, dlogits


_flash_packed_gated.defvjp(_flash_packed_gated_fwd, _flash_packed_gated_bwd)


def flash_attention_packed(
    q: jax.Array,                    # (b, n, h*dh) — heads packed in lanes
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,   # (b, n) key padding, True = attend
    *,
    heads: int,
    scale: float | None = None,
    softclamp_value: float | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int | None = None,
    gate_logits: jax.Array | None = None,   # (b, n, h) per-head output gate
) -> jax.Array:
    """Transpose-free flash attention on projection-layout tensors.
    Semantically identical to `flash_attention` on the (b, h, n, dh)
    reshape/transpose of the same data (same dropout bits per global head
    index), optionally with the per-head sigmoid output gate fused into the
    kernels. Requires `packed_eligible(heads, dim_head)`."""
    b, n, D = q.shape
    dh = D // heads
    assert packed_eligible(heads, dh), (heads, dh)
    if scale is None:
        scale = dh ** -0.5

    if exists(mask):
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, n), dtype=jnp.float32)

    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0:
        assert dropout_rate < 1.0
        assert exists(dropout_seed), 'dropout_rate > 0 requires dropout_seed'
        seed = jnp.asarray(dropout_seed, dtype=jnp.int32).reshape((1,))
    else:
        seed = jnp.zeros((1,), dtype=jnp.int32)

    if exists(gate_logits):
        return _flash_packed_gated(q, k, v, bias, seed, gate_logits, heads,
                                   scale, softclamp_value, dropout_rate)
    return _flash_packed(q, k, v, bias, seed, heads, scale, softclamp_value,
                         dropout_rate)


def flash_attention(
    q: jax.Array,                    # (b, h, n, dh)
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,   # (b, n) key padding, True = attend
    *,
    scale: float | None = None,
    softclamp_value: float | None = None,
    dropout_rate: float = 0.0,       # attention-prob dropout (static)
    dropout_seed: jax.Array | int | None = None,   # int32; traced OK
) -> jax.Array:
    if scale is None:
        scale = q.shape[-1] ** -0.5

    b, _, n, _ = q.shape
    if exists(mask):
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, n), dtype=jnp.float32)

    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0:
        assert dropout_rate < 1.0
        assert exists(dropout_seed), 'dropout_rate > 0 requires dropout_seed'
        seed = jnp.asarray(dropout_seed, dtype=jnp.int32).reshape((1,))
    else:
        seed = jnp.zeros((1,), dtype=jnp.int32)

    return _flash(q, k, v, bias, seed, scale, softclamp_value, dropout_rate)
