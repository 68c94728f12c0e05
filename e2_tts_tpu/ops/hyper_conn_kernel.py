"""Pallas kernels for the hyper-connections width connection.

The width connection (arXiv 2409.19606; models/hyper_connections.py) is a
bandwidth-bound chain — rms-stat, two tiny projections, tanh, and a 4->5
stream mix — that XLA executes ~10x off memory-bound (measured 2.4 ms per
call at (4, 16x1056, 512) bf16 on v5e vs ~0.25 ms of pure HBM traffic).
The forward kernel does the whole chain in one VMEM pass per row tile:
streams are read once and the mixed streams written once.

Backward: a hand-derived adjoint kernel with the same single-pass structure
(read r + g_mixed once, write g_r once; parameter grads accumulate in
fp32 output blocks across the sequential row-tile grid). The pure-XLA
vjp-replay path is kept as the non-TPU fallback and as the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from e2_tts_tpu.utils.helpers import round_up_to_multiple

_INTERPRET = False
_LANE_PAD = 8   # pad the weight column dim to a full sublane group

# The beta head is FOLDED into the alpha head's MXU projection: the packed
# (d, pad) weight carries dyn_alpha_w in columns 0..s and dyn_beta_w in
# column s+1; statics pack the same way ((s, pad) with static_beta at
# column s+1) and the tanh/scale/static chain runs ONCE on the (T, pad)
# tile — beta used to cost a separate per-stream row-sum (an expensive
# cross-lane reduce), a 1-lane tanh and its own adjoint chain/outputs.
# In the adjoint the incoming g_beta rides column s+1 of the mix-adjoint
# tile, so dW for BOTH heads falls out of one (d, pad) dot and the static
# grads out of one (s, pad) column-sum.
_BETA_COL = lambda s: s + 1

# perf-sweep knobs (see scripts/_hc_micro.py); defaults are the measured best:
# block 128 (256 exceeds scoped VMEM; the lane-positioned (s, block) blocks
# need block % 128 == 0), and NO state saving — fused fwd+bwd measured
# 1.129 ms with the adjoint recomputing its forward intermediates vs
# 1.211 ms consuming saved state (r4 sweep: the extra HBM/VMEM state traffic
# costs more than the tanh/rsqrt recompute it avoids)
_BWD_BLOCK_M = int(os.environ.get('E2TTS_HC_BWD_BLOCK', '128'))
_SAVE_STATE = os.environ.get('E2TTS_HC_SAVE_STATE', '0') != '0'
# adjoint row-sum reductions (sq/pb/ga/g_inv — 8+ per stream): 'mxu' runs
# them as (T, d) @ (d, 1) dots, 'vpu' (default) as cross-lane reduces.
# MEASURED (v5e, r4 sweep at (4, 16x1056, 512) bf16): mxu is ~20% SLOWER
# (fused fwd+bwd 1.358 vs 1.129 ms) — f32 MXU runs at 1/4 rate and an N=1
# dot wastes 127/128 output lanes, so staging the product through the MXU
# loses to Mosaic's native reduce trees. Kept as a sweep knob only.
_MXU_ROWSUM = os.environ.get('E2TTS_HC_ROWSUM', 'vpu') == 'mxu'


def _width_reference(residuals, static_alpha, static_beta, dyn_alpha_w,
                     dyn_alpha_scale, dyn_beta_w, dyn_beta_scale):
    """Pure-XLA reference (same math as the kernel); used for the backward
    pass and as the interpret-mode oracle. residuals: (s, M, d)."""
    dt = residuals.dtype
    d = residuals.shape[-1]

    sq = jnp.einsum('smd,smd->sm', residuals, residuals,
                    preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(jnp.clip(sq / d, min=1e-12))
    normed = residuals * inv[..., None].astype(dt)

    dyn = jnp.tanh(
        jnp.einsum('smd,dt->smt', normed, dyn_alpha_w.astype(dt),
                   preferred_element_type=jnp.float32)) * dyn_alpha_scale
    alpha = (dyn + static_alpha[:, None, :]).astype(dt)        # (s, M, s+1)

    dynb = jnp.tanh(
        jnp.einsum('smd,d->sm', normed, dyn_beta_w.astype(dt),
                   preferred_element_type=jnp.float32)) * dyn_beta_scale
    beta = (dynb + static_beta[:, None]).astype(dt)            # (s, M)

    mixed = jnp.einsum('smt,smd->tmd', alpha, residuals,
                       preferred_element_type=jnp.float32).astype(dt)
    return mixed, beta


def _width_core(rs, sa_ref, aw_ref, scales_ref,
                b_ref, c_ref, beta_ref, num_streams, state_refs=None):
    """Width-connection math over a list of per-stream (T, d) residuals —
    shared by the plain kernel (reads them from HBM) and the depth-fused
    kernel (computes them from carried/branch/beta in VMEM).

    The branch input (mix column 0) and the carried streams (columns 1..s)
    are written to SEPARATE outputs: callers consume them separately, and a
    single (s+1, ...) output forced a full-tensor slice in the forward and
    a pad+concat in the backward (~7 ms/step at flagship shape).

    ``aw_ref``/``sa_ref`` are the beta-FOLDED packs: alpha weight/static in
    columns 0..s, beta weight/static at column s+1 (see _BETA_COL note) —
    beta comes out of the shared (T, pad) projection/tanh/affine chain at
    no extra cost.

    ``state_refs = (ta_ref, inv_ref)``, when given, saves the cheap forward
    intermediates — tanh of the packed projection (s, T, pad) f32 (beta's
    tanh at column s+1) and the rms reciprocal (s, T) f32 — ~0.03% of the
    stream bytes, letting the adjoint kernel skip its forward recompute."""
    s = num_streams
    a_scale = scales_ref[0, 0]
    b_scale = scales_ref[0, 1]

    dt = rs[0].dtype
    d = rs[0].shape[-1]

    aw = aw_ref[...]                   # (d, pad) compute dtype, beta-folded
    pad = aw.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, pad), 1)
    scale_row = jnp.where(col == s + 1, b_scale, a_scale)     # (1, pad) f32

    # per-stream projections (python loop: s is a small static constant).
    # f32 views of each stream are cast ONCE and reused — the mix loop
    # below reads every stream s+1 times, and repeated bf16->f32 converts
    # were the dominant VPU cost of this kernel.
    alphas = []
    betas = []
    invs = []
    rs_f32 = [r.astype(jnp.float32) for r in rs]
    for si in range(s):
        r_f32 = rs_f32[si]
        sq = jnp.sum(r_f32 * r_f32, axis=-1)
        inv = jax.lax.rsqrt(jnp.clip(sq / d, min=1e-12))
        normed = rs[si] * inv[:, None].astype(dt)              # (T, d)

        proj = jax.lax.dot_general(
            normed, aw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (T, pad)
        ta = jnp.tanh(proj)
        alpha = ta * scale_row + sa_ref[si][None, :]           # (T, pad)
        # beta = column s+1, extracted as a masked full-width lane reduce:
        # a direct alpha[:, s+1] keeps a lane-offset layout that Mosaic
        # cannot reduce/relayout ("Not implemented: Offset change")
        betas.append(jnp.sum(jnp.where(col == s + 1, alpha, 0.0), axis=-1))
        alphas.append(alpha.astype(dt))   # bf16 rounding matches the oracle

        if state_refs is not None:
            ta_ref, inv_ref = state_refs
            ta_ref[si] = ta
            invs.append(inv)

    # stream mix: mixed[t] = sum_s alpha[s][:, t] * r[s] (column casts of
    # alpha are (T, 1) — cheap; the big (T, d) casts are the cached rs_f32)
    # NB minor-dim insertion ([:, None]) must happen on f32: Mosaic only
    # lowers non-no-op minor-dim reshapes for 32-bit types (bf16 (T,)->(T,1)
    # fails to compile; bf16 (T,1) broadcasts are fine)
    for t in range(s + 1):
        acc = alphas[0][:, t].astype(jnp.float32)[:, None] * rs_f32[0]
        for si in range(1, s):
            acc += alphas[si][:, t].astype(jnp.float32)[:, None] * rs_f32[si]
        if t == 0:
            b_ref[...] = acc.astype(dt)
        else:
            c_ref[t - 1] = acc.astype(dt)

    beta_ref[...] = jnp.stack(betas).astype(dt)
    if state_refs is not None:
        _, inv_ref = state_refs
        inv_ref[...] = jnp.stack(invs)


def _width_kernel(r_ref, sa_ref, aw_ref, scales_ref,
                  b_ref, c_ref, beta_ref, *, num_streams):
    rs = [r_ref[si] for si in range(num_streams)]
    _width_core(rs, sa_ref, aw_ref, scales_ref,
                b_ref, c_ref, beta_ref, num_streams)


def _width_kernel_save(r_ref, sa_ref, aw_ref, scales_ref,
                       b_ref, c_ref, beta_ref, ta_ref, inv_ref, *,
                       num_streams):
    rs = [r_ref[si] for si in range(num_streams)]
    _width_core(rs, sa_ref, aw_ref, scales_ref,
                b_ref, c_ref, beta_ref, num_streams,
                state_refs=(ta_ref, inv_ref))


def _load_fused_rs(carried_ref, branch_ref, betaT_ref, num_streams):
    """r[si] = carried[si] + branch * beta[si] computed in VMEM — the depth
    connection of the PREVIOUS branch fused into this kernel, so the (s,M,d)
    residual streams are never materialised in HBM between branches.
    betaT is (M, s): the column layout puts M in sublane position, matching
    the (T, d) row tiles."""
    branch = branch_ref[...]
    dt = branch.dtype
    # f32 before [:, None]: Mosaic rejects bf16 minor-dim insertion
    return [carried_ref[si]
            + branch * betaT_ref[:, si].astype(jnp.float32)[:, None].astype(dt)
            for si in range(num_streams)]


def _width_fused_kernel(carried_ref, branch_ref, betaT_ref, sa_ref,
                        aw_ref, scales_ref, b_ref, c_ref, beta_ref, *,
                        num_streams):
    rs = _load_fused_rs(carried_ref, branch_ref, betaT_ref, num_streams)
    _width_core(rs, sa_ref, aw_ref, scales_ref,
                b_ref, c_ref, beta_ref, num_streams)


def _width_fused_kernel_save(carried_ref, branch_ref, betaT_ref, sa_ref,
                             aw_ref, scales_ref, b_ref,
                             c_ref, beta_ref, ta_ref, inv_ref, *,
                             num_streams):
    rs = _load_fused_rs(carried_ref, branch_ref, betaT_ref, num_streams)
    _width_core(rs, sa_ref, aw_ref, scales_ref,
                b_ref, c_ref, beta_ref, num_streams,
                state_refs=(ta_ref, inv_ref))


def _state_specs(s, m_pad, block_m, pad_cols):
    """out_specs/out_shapes for the saved adjoint state (ta, inv)."""
    specs = [
        pl.BlockSpec((s, block_m, pad_cols), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, block_m), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    shapes = [
        jax.ShapeDtypeStruct((s, m_pad, pad_cols), jnp.float32),
        jax.ShapeDtypeStruct((s, m_pad), jnp.float32),
    ]
    return specs, shapes


def _pack_heads(static_alpha, static_beta, dyn_alpha_w, dyn_beta_w,
                dyn_alpha_scale, dyn_beta_scale, dt):
    """Beta-folded parameter packs: (s, pad) statics / (d, pad) weights with
    the alpha head in columns 0..s and the beta head at column s+1 (padded
    so lane-dim slices stay aligned)."""
    s = static_alpha.shape[0]
    pad_cols = _LANE_PAD * ((s + 2 + _LANE_PAD - 1) // _LANE_PAD)
    sa = jnp.concatenate([
        static_alpha.astype(jnp.float32),
        static_beta.astype(jnp.float32)[:, None],
        jnp.zeros((s, pad_cols - (s + 2)), jnp.float32)], axis=1)
    aw = jnp.concatenate([
        dyn_alpha_w, dyn_beta_w[:, None],
        jnp.zeros((dyn_alpha_w.shape[0], pad_cols - (s + 2)),
                  dyn_alpha_w.dtype)], axis=1).astype(dt)
    scales = jnp.stack([dyn_alpha_scale,
                        dyn_beta_scale]).astype(jnp.float32)[None, :]
    return sa, aw, scales, pad_cols


def _width_pallas(residuals, static_alpha, static_beta, dyn_alpha_w,
                  dyn_alpha_scale, dyn_beta_w, dyn_beta_scale,
                  block_m: int = 256, save_state: bool = False):
    s, m, d = residuals.shape
    dt = residuals.dtype

    m_pad = round_up_to_multiple(m, block_m)
    if m_pad != m:
        residuals = jnp.pad(residuals, ((0, 0), (0, m_pad - m), (0, 0)))

    sa, aw, scales, pad_cols = _pack_heads(
        static_alpha, static_beta, dyn_alpha_w, dyn_beta_w,
        dyn_alpha_scale, dyn_beta_scale, dt)

    grid = (m_pad // block_m,)
    out_specs = [
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, block_m), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m_pad, d), dt),
        jax.ShapeDtypeStruct((s, m_pad, d), dt),
        jax.ShapeDtypeStruct((s, m_pad), dt),
    ]
    kern = _width_kernel
    if save_state:
        sp, sh = _state_specs(s, m_pad, block_m, pad_cols)
        out_specs += sp
        out_shape += sh
        kern = _width_kernel_save

    outs = pl.pallas_call(
        functools.partial(kern, num_streams=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, pad_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, pad_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(residuals, sa, aw, scales)

    branch_in, carried, beta = outs[:3]
    pub = (branch_in[:m], carried[:, :m], beta[:, :m])
    if save_state:
        # trim to m: fwd and bwd use different block sizes, so the bwd
        # re-pads to its own m_pad (zero state rows are inert — their
        # incoming grads are zero-padded too)
        ta, inv = outs[3:]
        return pub, (ta[:, :m], inv[:, :m])
    return pub


def _width_bwd_core(rs, gb0_ref, gc_ref, gb_ref, sa_ref, aw_ref,
                    scales_ref, gsa_ref, gaw_ref,
                    gscales_ref, num_streams, state_refs=None):
    """Adjoint of the width connection over per-stream (T, d) residuals.

    Recomputes the cheap forward intermediates (rms stat, projection, tanh),
    applies the hand-derived chain rule, accumulates the parameter grads into
    fp32 output blocks (constant index map — the sequential row-tile grid
    revisits the same VMEM block), and RETURNS the per-stream fp32 residual
    grads for the caller to route (plain: written to g_r; depth-fused:
    split into g_carried / g_branch / g_beta).

    The beta head rides column s+1 of the folded packs everywhere: the
    incoming g_beta row joins the mix-adjoint tile at that column, so the
    tanh/scale chain, g_n backprojection, and BOTH weight grads (gaw, gbw)
    come out of the alpha head's (T, pad)/(d, pad) ops with no separate
    row-sums or scalar chains. gsa/gaw outputs carry gsb/gbw at column s+1;
    the host wrapper unpacks them."""
    s = num_streams
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        gsa_ref[...] = jnp.zeros_like(gsa_ref)
        gaw_ref[...] = jnp.zeros_like(gaw_ref)
        gscales_ref[...] = jnp.zeros_like(gscales_ref)

    a_scale = scales_ref[0, 0]
    b_scale = scales_ref[0, 1]

    gb = gb_ref[...]                    # (s, T)
    dt = rs[0].dtype
    d = rs[0].shape[-1]
    pad_cols = aw_ref.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, pad_cols), 1)
    scale_row = jnp.where(col == s + 1, b_scale, a_scale)     # (1, pad) f32

    if _MXU_ROWSUM:
        ones_col = jnp.ones((d, 1), jnp.float32)
        rowsum = lambda x: jax.lax.dot_general(
            x, ones_col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0]
    else:
        rowsum = lambda x: jnp.sum(x, axis=-1)

    aw = aw_ref[...]                    # (d, pad) dt, beta-folded

    # g_mixed arrives SPLIT (branch-input grad + carried grads) — no
    # (s+1, ...) concat on the caller side. Cast each incoming grad tensor
    # to f32 ONCE and hold it in VMEM: the mix adjoint below reads every
    # gm tensor 2s times (s row-dots for ga + s multiply-adds for g_r),
    # and per-use converts were a dominant VPU cost.
    gms = [gb0_ref[...].astype(jnp.float32)] \
        + [gc_ref[t].astype(jnp.float32) for t in range(s)]
    gm_f32 = lambda t: gms[t]

    g_ascale = jnp.zeros((), jnp.float32)
    g_bscale = jnp.zeros((), jnp.float32)
    gsa_rows = []            # (pad,) per stream; col s+1 = gsb
    gaw_acc = jnp.zeros(gaw_ref.shape, jnp.float32)
    g_rs = []

    for si in range(s):
        r_s = rs[si]                                    # (T, d) dt
        r_f32 = r_s.astype(jnp.float32)
        gb_s = gb[si].astype(jnp.float32)               # (T,)

        if state_refs is not None:
            # forward intermediates SAVED by the fwd kernel (bit-identical
            # to the recompute below): skip the rms stat, the projection
            # and the tanh (beta's tanh is ta's column s+1)
            ta_ref, inv_ref = state_refs
            inv = inv_ref[si]                           # (T,) f32
            ta = ta_ref[si]                             # (T, pad) f32
            var_ok = inv < 1e6   # inv==rsqrt(clip(var,1e-12)): var>1e-12
        else:
            # -- recompute forward intermediates (same casts as the fwd) --
            sq = rowsum(r_f32 * r_f32)
            var = sq / d
            inv = jax.lax.rsqrt(jnp.clip(var, min=1e-12))
            var_ok = var > 1e-12
        n_s = r_s * inv[:, None].astype(dt)             # (T, d) dt

        if state_refs is None:
            pa = jax.lax.dot_general(
                n_s, aw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (T, pad)
            ta = jnp.tanh(pa)
        alpha = (ta * scale_row + sa_ref[si][None, :]).astype(dt)  # (T, pad)

        # -- mix adjoints --
        # g_alpha[m, t] = gm[t, m] . r_s[m];  g_beta joins at column s+1
        ga_cols = [rowsum(gm_f32(t) * r_f32) for t in range(s + 1)]
        ga = jnp.stack(
            ga_cols + [gb_s]
            + [jnp.zeros_like(gb_s)] * (pad_cols - (s + 2)),
            axis=-1)                                    # (T, pad) f32

        # g_r from the mix: sum_t alpha[:, t] * gm[t]
        g_r = alpha[:, 0].astype(jnp.float32)[:, None] * gm_f32(0)
        for t in range(1, s + 1):
            g_r += alpha[:, t].astype(jnp.float32)[:, None] * gm_f32(t)

        # -- both heads at once on the (T, pad) tile --
        g_p = ga * scale_row * (1.0 - ta * ta)          # (T, pad) f32
        gt = ga * ta
        # masked full-width sums, not column slices: lane-offset slice
        # reductions fail Mosaic lowering ("Offset change"). Columns
        # s+2..pad of ga are zeros, so the alpha sum can take them along.
        beta_col = col == s + 1
        g_ascale += jnp.sum(jnp.where(beta_col, 0.0, gt))
        g_bscale += jnp.sum(jnp.where(beta_col, gt, 0.0))
        gsa_rows.append(jnp.sum(ga, axis=0))

        g_n = jax.lax.dot_general(
            g_p.astype(dt), aw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (T, d) f32

        # -- parameter grads (column s+1 = gbw) --
        gaw_acc += jax.lax.dot_general(
            n_s, g_p.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (d, pad)

        # -- rms-norm backward --
        g_inv = rowsum(g_n * r_f32)                     # (T,)
        g_r += g_n * inv[:, None]
        g_sq = jnp.where(var_ok,
                         g_inv * (-0.5) * inv * inv * inv / d, 0.0)
        g_r += 2.0 * r_f32 * g_sq[:, None]

        g_rs.append(g_r)

    # whole-block accumulations (row/scalar VMEM writes are not tile-friendly)
    gsa_ref[...] += jnp.stack(gsa_rows)                  # (s, pad)
    gaw_ref[...] += gaw_acc
    gscales_ref[...] += jnp.stack([g_ascale, g_bscale])[None, :]
    return g_rs


def _width_bwd_core_tall(rs, gb0_ref, gc_ref, gb_ref, sa_ref, aw_ref,
                         scales_ref, gsa_ref, gaw_ref, gscales_ref,
                         num_streams):
    """Stream-stacked ('tall') variant of `_width_bwd_core` — the DEFAULT
    backward core (opt out with E2TTS_HC_TALL=0): the per-stream (T, d)
    tiles concatenate on SUBLANES into one (s*T, d) tile so the
    norm/projection chain — rms stat, the n@aw dot, tanh, the g_p@aw^T
    backprojection, the gaw accumulation and the g_inv rowsum — issues
    ONCE instead of s times (same element throughput, ~4x fewer op issues
    and one s*T-row MXU dot instead of s T-row ones). The mix adjoint's
    pairwise (stream x output) products are inherent to the einsum and
    stay per-stream slices. Measured on v5e at flagship shape: with-text
    step 160.68 -> 158.06 ms, loss bit-identical (round-5 BENCH_NOTES)."""
    s = num_streams
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        gsa_ref[...] = jnp.zeros_like(gsa_ref)
        gaw_ref[...] = jnp.zeros_like(gaw_ref)
        gscales_ref[...] = jnp.zeros_like(gscales_ref)

    a_scale = scales_ref[0, 0]
    b_scale = scales_ref[0, 1]

    dt = rs[0].dtype
    T, d = rs[0].shape
    pad_cols = aw_ref.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, pad_cols), 1)
    scale_row = jnp.where(col == s + 1, b_scale, a_scale)     # (1, pad) f32

    aw = aw_ref[...]                    # (d, pad) dt, beta-folded
    gb = gb_ref[...]                    # (s, T)

    r_tall = jnp.concatenate(rs, axis=0)                      # (s*T, d) dt
    r_tall_f32 = r_tall.astype(jnp.float32)

    gms = [gb0_ref[...].astype(jnp.float32)] \
        + [gc_ref[t].astype(jnp.float32) for t in range(s)]

    # -- forward recompute, one tall pass --
    sq = jnp.sum(r_tall_f32 * r_tall_f32, axis=-1)            # (s*T,)
    var = sq / d
    inv = jax.lax.rsqrt(jnp.clip(var, min=1e-12))
    var_ok = var > 1e-12
    n_tall = r_tall * inv[:, None].astype(dt)
    pa = jax.lax.dot_general(
        n_tall, aw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (s*T, pad)
    ta = jnp.tanh(pa)
    sa_tall = jnp.concatenate(
        [jnp.broadcast_to(sa_ref[si][None, :], (T, pad_cols))
         for si in range(s)], axis=0)
    alpha_tall = (ta * scale_row + sa_tall).astype(dt)

    # -- mix adjoints: pairwise products over per-stream sublane slices --
    ga_rows = []
    mix_g_rs = []
    for si in range(s):
        sl = slice(si * T, (si + 1) * T)
        r_f32 = r_tall_f32[sl]
        gb_s = gb[si].astype(jnp.float32)
        ga_cols = [jnp.sum(gms[t] * r_f32, axis=-1) for t in range(s + 1)]
        ga_rows.append(jnp.stack(
            ga_cols + [gb_s]
            + [jnp.zeros_like(gb_s)] * (pad_cols - (s + 2)),
            axis=-1))                                         # (T, pad) f32
        alpha = alpha_tall[sl]
        g_r = alpha[:, 0].astype(jnp.float32)[:, None] * gms[0]
        for t in range(1, s + 1):
            g_r += alpha[:, t].astype(jnp.float32)[:, None] * gms[t]
        mix_g_rs.append(g_r)
    ga_tall = jnp.concatenate(ga_rows, axis=0)                # (s*T, pad)

    # -- both heads at once on the tall (s*T, pad) tile --
    g_p = ga_tall * scale_row * (1.0 - ta * ta)
    gt = ga_tall * ta
    beta_col = col == s + 1
    g_ascale = jnp.sum(jnp.where(beta_col, 0.0, gt))
    g_bscale = jnp.sum(jnp.where(beta_col, gt, 0.0))
    gsa_rows = [jnp.sum(ga_rows[si], axis=0) for si in range(s)]

    g_n = jax.lax.dot_general(
        g_p.astype(dt), aw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (s*T, d)
    gaw_acc = jax.lax.dot_general(
        n_tall, g_p.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (d, pad)

    # -- rms-norm backward, one tall pass --
    g_inv = jnp.sum(g_n * r_tall_f32, axis=-1)                # (s*T,)
    g_sq = jnp.where(var_ok, g_inv * (-0.5) * inv * inv * inv / d, 0.0)
    g_r_tall = g_n * inv[:, None] + 2.0 * r_tall_f32 * g_sq[:, None]

    g_rs = [mix_g_rs[si] + g_r_tall[si * T:(si + 1) * T] for si in range(s)]

    gsa_ref[...] += jnp.stack(gsa_rows)
    gaw_ref[...] += gaw_acc
    gscales_ref[...] += jnp.stack([g_ascale, g_bscale])[None, :]
    return g_rs


_TALL = os.environ.get('E2TTS_HC_TALL', '1') != '0'
# the save-state kernels keep the per-stream core (state rides (s, T, ...)
# blocks); the tall knob applies to the default recompute path only
_BWD_CORE = _width_bwd_core_tall if _TALL else _width_bwd_core


def _width_bwd_kernel(r_ref, gb0_ref, gcar_ref, gb_ref, sa_ref,
                      aw_ref, scales_ref, gr_ref, gsa_ref,
                      gaw_ref, gscales_ref, *, num_streams):
    rs = [r_ref[si] for si in range(num_streams)]
    g_rs = _BWD_CORE(rs, gb0_ref, gcar_ref, gb_ref, sa_ref,
                     aw_ref, scales_ref, gsa_ref,
                     gaw_ref, gscales_ref, num_streams)
    for si in range(num_streams):
        gr_ref[si] = g_rs[si].astype(gr_ref.dtype)


def _width_bwd_kernel_save(r_ref, gb0_ref, gcar_ref, gb_ref, sa_ref,
                           aw_ref, scales_ref, ta_ref,
                           inv_ref, gr_ref, gsa_ref, gaw_ref,
                           gscales_ref, *, num_streams):
    rs = [r_ref[si] for si in range(num_streams)]
    g_rs = _width_bwd_core(rs, gb0_ref, gcar_ref, gb_ref, sa_ref,
                           aw_ref, scales_ref, gsa_ref,
                           gaw_ref, gscales_ref, num_streams,
                           state_refs=(ta_ref, inv_ref))
    for si in range(num_streams):
        gr_ref[si] = g_rs[si].astype(gr_ref.dtype)


def _fused_bwd_epilogue(g_rs, branch_ref, betaT_ref, gc_ref, gbr_ref,
                        gbT_ref, num_streams):
    """Split residual grads by the depth-connection chain rule:
    g_carried[si] = g_r[si];  g_branch = sum_si g_r[si] * beta[si];
    g_beta[si] = sum_d g_r[si] * branch."""
    branch_f32 = branch_ref[...].astype(jnp.float32)
    gbranch = jnp.zeros_like(branch_f32)
    gbeta_cols = []
    for si in range(num_streams):
        gc_ref[si] = g_rs[si].astype(gc_ref.dtype)
        beta_col = betaT_ref[:, si].astype(jnp.float32)[:, None]   # (T, 1)
        gbranch += g_rs[si] * beta_col
        gbeta_cols.append(jnp.sum(g_rs[si] * branch_f32, axis=-1))  # (T,)
    gbr_ref[...] = gbranch.astype(gbr_ref.dtype)
    gbT_ref[...] = jnp.stack(gbeta_cols, axis=-1).astype(gbT_ref.dtype)


def _width_fused_bwd_kernel(carried_ref, branch_ref, betaT_ref, gb0_ref,
                            gcar_ref, gb_ref, sa_ref, aw_ref,
                            scales_ref, gc_ref, gbr_ref, gbT_ref, gsa_ref,
                            gaw_ref, gscales_ref, *,
                            num_streams):
    """Depth-fused adjoint: r[si] = carried[si] + branch * beta[si] is
    recomputed in VMEM, then the shared adjoint core + chain-rule split."""
    s = num_streams
    rs = _load_fused_rs(carried_ref, branch_ref, betaT_ref, s)
    g_rs = _BWD_CORE(rs, gb0_ref, gcar_ref, gb_ref, sa_ref,
                     aw_ref, scales_ref, gsa_ref,
                     gaw_ref, gscales_ref, s)
    _fused_bwd_epilogue(g_rs, branch_ref, betaT_ref, gc_ref, gbr_ref,
                        gbT_ref, s)


def _width_fused_bwd_kernel_save(carried_ref, branch_ref, betaT_ref, gb0_ref,
                                 gcar_ref, gb_ref, sa_ref, aw_ref,
                                 scales_ref, ta_ref, inv_ref,
                                 gc_ref, gbr_ref, gbT_ref, gsa_ref,
                                 gaw_ref, gscales_ref, *,
                                 num_streams):
    s = num_streams
    rs = _load_fused_rs(carried_ref, branch_ref, betaT_ref, s)
    g_rs = _width_bwd_core(rs, gb0_ref, gcar_ref, gb_ref, sa_ref,
                           aw_ref, scales_ref, gsa_ref,
                           gaw_ref, gscales_ref, s,
                           state_refs=(ta_ref, inv_ref))
    _fused_bwd_epilogue(g_rs, branch_ref, betaT_ref, gc_ref, gbr_ref,
                        gbT_ref, s)


def _pad_state(state, m, m_pad):
    """Pad saved (ta, inv) rows to the bwd's m_pad (zero rows are inert:
    their incoming grads are zero-padded too)."""
    if state is None or m_pad == m:
        return state
    ta, inv = state
    return (jnp.pad(ta, ((0, 0), (0, m_pad - m), (0, 0))),
            jnp.pad(inv, ((0, 0), (0, m_pad - m))))


def _state_in_specs(s, block_m, pad_cols):
    return [
        pl.BlockSpec((s, block_m, pad_cols), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, block_m), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]


def _width_bwd_pallas(residuals, static_alpha, static_beta, dyn_alpha_w,
                      dyn_alpha_scale, dyn_beta_w, dyn_beta_scale,
                      g_branch_in, g_carried, g_beta, block_m: int | None = None,
                      state=None):
    block_m = block_m or _BWD_BLOCK_M
    # block_m 128 (not the fwd's 256): the adjoint holds several fp32
    # row-tile temporaries and double-buffers 2s+1 stream blocks — 256-row
    # tiles exceed the 16 MB scoped-VMEM limit at d=512
    s, m, d = residuals.shape
    dt = residuals.dtype

    m_pad = round_up_to_multiple(m, block_m)
    state = _pad_state(state, m, m_pad)
    if m_pad != m:
        residuals = jnp.pad(residuals, ((0, 0), (0, m_pad - m), (0, 0)))
        g_branch_in = jnp.pad(g_branch_in, ((0, m_pad - m), (0, 0)))
        g_carried = jnp.pad(g_carried, ((0, 0), (0, m_pad - m), (0, 0)))
        g_beta = jnp.pad(g_beta, ((0, 0), (0, m_pad - m)))
        # padded rows have r = 0 and g = 0 => contribute nothing anywhere

    sa, aw, scales, pad_cols = _pack_heads(
        static_alpha, static_beta, dyn_alpha_w, dyn_beta_w,
        dyn_alpha_scale, dyn_beta_scale, dt)

    grid = (m_pad // block_m,)
    const = lambda i: (0, 0)

    in_specs = [
        pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),          # r
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # g_branch_in
        pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),          # g_carried
        pl.BlockSpec((s, block_m), lambda i: (0, i),
                     memory_space=pltpu.VMEM),          # g_beta
        pl.BlockSpec((s, pad_cols), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, pad_cols), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2), const, memory_space=pltpu.SMEM),
    ]
    operands = [residuals, g_branch_in, g_carried, g_beta, sa, aw,
                scales]
    kern = _width_bwd_kernel
    if state is not None:
        in_specs += _state_in_specs(s, block_m, pad_cols)
        operands += list(state)
        kern = _width_bwd_kernel_save

    g_r, g_sa, g_aw, g_scales = pl.pallas_call(
        functools.partial(kern, num_streams=s),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),          # g_r
            pl.BlockSpec((s, pad_cols), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, pad_cols), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, m_pad, d), dt),
            jax.ShapeDtypeStruct((s, pad_cols), jnp.float32),
            jax.ShapeDtypeStruct((d, pad_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),   # sequential: accumulators
        interpret=_INTERPRET,
    )(*operands)

    p32 = static_alpha.dtype
    return (g_r[:, :m],
            g_sa[:, :s + 1].astype(p32),
            g_sa[:, s + 1].astype(static_beta.dtype),
            g_aw[:, :s + 1].astype(dyn_alpha_w.dtype),
            g_scales[0, 0].astype(dyn_alpha_scale.dtype),
            g_aw[:, s + 1].astype(dyn_beta_w.dtype),
            g_scales[0, 1].astype(dyn_beta_scale.dtype))


def _fused_prepare(carried, branch, betaT, static_alpha, dyn_alpha_w,
                   static_beta, dyn_beta_w, dyn_alpha_scale, dyn_beta_scale,
                   block_m):
    s, m, d = carried.shape
    dt = carried.dtype
    m_pad = round_up_to_multiple(m, block_m)
    if m_pad != m:
        carried = jnp.pad(carried, ((0, 0), (0, m_pad - m), (0, 0)))
        branch = jnp.pad(branch, ((0, m_pad - m), (0, 0)))
        betaT = jnp.pad(betaT, ((0, m_pad - m), (0, 0)))
        # padded rows: r = 0 + 0*0 = 0 => contribute nothing anywhere
    sa, aw, scales, pad_cols = _pack_heads(
        static_alpha, static_beta, dyn_alpha_w, dyn_beta_w,
        dyn_alpha_scale, dyn_beta_scale, dt)
    return carried, branch, betaT, sa, aw, scales, m_pad, pad_cols


def _width_fused_pallas(carried, branch, betaT, static_alpha, static_beta,
                        dyn_alpha_w, dyn_alpha_scale, dyn_beta_w,
                        dyn_beta_scale, block_m: int = 256,
                        save_state: bool = False):
    s, m, d = carried.shape
    dt = carried.dtype
    carried, branch, betaT, sa, aw, scales, m_pad, pad_cols = \
        _fused_prepare(carried, branch, betaT, static_alpha, dyn_alpha_w,
                       static_beta, dyn_beta_w, dyn_alpha_scale,
                       dyn_beta_scale, block_m)
    grid = (m_pad // block_m,)
    const = lambda i: (0, 0)

    out_specs = [
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, block_m), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m_pad, d), dt),
        jax.ShapeDtypeStruct((s, m_pad, d), dt),
        jax.ShapeDtypeStruct((s, m_pad), dt),
    ]
    kern = _width_fused_kernel
    if save_state:
        sp, sh = _state_specs(s, m_pad, block_m, pad_cols)
        out_specs += sp
        out_shape += sh
        kern = _width_fused_kernel_save

    outs = pl.pallas_call(
        functools.partial(kern, num_streams=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),          # carried
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # branch
            pl.BlockSpec((block_m, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # betaT
            pl.BlockSpec((s, pad_cols), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, pad_cols), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), const, memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(carried, branch, betaT, sa, aw, scales)

    branch_in, carried_out, beta = outs[:3]
    pub = (branch_in[:m], carried_out[:, :m], beta[:, :m])
    if save_state:
        ta, inv = outs[3:]
        return pub, (ta[:, :m], inv[:, :m])
    return pub


def _width_fused_bwd_pallas(carried, branch, betaT, static_alpha,
                            static_beta, dyn_alpha_w, dyn_alpha_scale,
                            dyn_beta_w, dyn_beta_scale, g_branch_in,
                            g_carried_in, g_beta, block_m: int | None = None,
                            state=None):
    block_m = block_m or _BWD_BLOCK_M
    s, m, d = carried.shape
    dt = carried.dtype
    m_pad = round_up_to_multiple(m, block_m)
    state = _pad_state(state, m, m_pad)
    if m_pad != m:
        g_branch_in = jnp.pad(g_branch_in, ((0, m_pad - m), (0, 0)))
        g_carried_in = jnp.pad(g_carried_in, ((0, 0), (0, m_pad - m), (0, 0)))
        g_beta = jnp.pad(g_beta, ((0, 0), (0, m_pad - m)))
    carried, branch, betaT, sa, aw, scales, m_pad, pad_cols = \
        _fused_prepare(carried, branch, betaT, static_alpha, dyn_alpha_w,
                       static_beta, dyn_beta_w, dyn_alpha_scale,
                       dyn_beta_scale, block_m)
    grid = (m_pad // block_m,)
    const = lambda i: (0, 0)

    in_specs = [
        pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),          # carried
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # branch
        pl.BlockSpec((block_m, s), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # betaT
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # g_branch_in
        pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),          # g_carried_in
        pl.BlockSpec((s, block_m), lambda i: (0, i),
                     memory_space=pltpu.VMEM),          # g_beta
        pl.BlockSpec((s, pad_cols), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, pad_cols), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2), const, memory_space=pltpu.SMEM),
    ]
    operands = [carried, branch, betaT, g_branch_in, g_carried_in, g_beta,
                sa, aw, scales]
    kern = _width_fused_bwd_kernel
    if state is not None:
        in_specs += _state_in_specs(s, block_m, pad_cols)
        operands += list(state)
        kern = _width_fused_bwd_kernel_save

    outs = pl.pallas_call(
        functools.partial(kern, num_streams=s),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),          # g_carried
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # g_branch
            pl.BlockSpec((block_m, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # g_betaT
            pl.BlockSpec((s, pad_cols), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, pad_cols), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, m_pad, d), dt),
            jax.ShapeDtypeStruct((m_pad, d), dt),
            jax.ShapeDtypeStruct((m_pad, s), dt),
            jax.ShapeDtypeStruct((s, pad_cols), jnp.float32),
            jax.ShapeDtypeStruct((d, pad_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),   # sequential: accumulators
        interpret=_INTERPRET,
    )(*operands)

    g_c, g_br, g_bT, g_sa, g_aw, g_scales = outs
    p32 = static_alpha.dtype
    return (g_c[:, :m], g_br[:m], g_bT[:m],
            g_sa[:, :s + 1].astype(p32),
            g_sa[:, s + 1].astype(static_beta.dtype),
            g_aw[:, :s + 1].astype(dyn_alpha_w.dtype),
            g_scales[0, 0].astype(dyn_alpha_scale.dtype),
            g_aw[:, s + 1].astype(dyn_beta_w.dtype),
            g_scales[0, 1].astype(dyn_beta_scale.dtype))


def _split_reference(mixed, beta):
    """(s+1, M, d) mixed -> (branch_input, carried) to match the split
    kernel outputs."""
    return mixed[0], mixed[1:], beta


def _width_reference_split(residuals, static_alpha, static_beta, dyn_alpha_w,
                           dyn_alpha_scale, dyn_beta_w, dyn_beta_scale):
    return _split_reference(*_width_reference(
        residuals, static_alpha, static_beta, dyn_alpha_w,
        dyn_alpha_scale, dyn_beta_w, dyn_beta_scale))


def _width_fused_reference(carried, branch, betaT, static_alpha, static_beta,
                           dyn_alpha_w, dyn_alpha_scale, dyn_beta_w,
                           dyn_beta_scale):
    r = carried + branch[None].astype(carried.dtype) \
        * jnp.transpose(betaT)[..., None].astype(carried.dtype)
    return _width_reference(r, static_alpha, static_beta, dyn_alpha_w,
                            dyn_alpha_scale, dyn_beta_w, dyn_beta_scale)


def _width_fused_reference_split(*args):
    return _split_reference(*_width_fused_reference(*args))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def width_connection_fused(carried, branch, betaT, static_alpha, static_beta,
                           dyn_alpha_w, dyn_alpha_scale, dyn_beta_w,
                           dyn_beta_scale):
    """Depth-connection-fused width connection.

    carried (s, M, d) + branch (M, d) + betaT (M, s) implicitly form
    r[si] = carried[si] + branch * betaT[:, si] (the previous branch's depth
    connection) INSIDE the kernel — the residual streams never round-trip
    through HBM between branches. Returns ``(branch_input (M, d),
    carried (s, M, d), beta (s, M))`` — the mix's column 0 and columns 1..s
    as separate arrays (a single (s+1, ...) output forced a slice in the
    forward and a pad+concat in the backward)."""
    if (jax.default_backend() == 'tpu' or _INTERPRET):
        return _width_fused_pallas(carried, branch, betaT, static_alpha,
                                   static_beta, dyn_alpha_w, dyn_alpha_scale,
                                   dyn_beta_w, dyn_beta_scale)
    return _width_fused_reference_split(carried, branch, betaT, static_alpha,
                                        static_beta, dyn_alpha_w,
                                        dyn_alpha_scale, dyn_beta_w,
                                        dyn_beta_scale)


def _width_fused_fwd(*args):
    if jax.default_backend() == 'tpu' or _INTERPRET:
        # save the cheap forward intermediates (tanh projections, rms
        # reciprocal — ~0.03% extra bytes) so the adjoint kernel skips its
        # forward recompute
        if not _SAVE_STATE:
            return _width_fused_pallas(*args), (args, None)
        pub, state = _width_fused_pallas(*args, save_state=True)
        return pub, (args, state)
    return _width_fused_reference_split(*args), (args, None)


def _width_fused_bwd(res, g):
    args, state = res
    g_branch_in, g_carried, g_beta = g
    if jax.default_backend() == 'tpu' or _INTERPRET:
        return _width_fused_bwd_pallas(*args, g_branch_in, g_carried, g_beta,
                                       state=state)
    _, vjp = jax.vjp(_width_fused_reference_split, *args)
    return vjp(g)


width_connection_fused.defvjp(_width_fused_fwd, _width_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def width_connection(residuals, static_alpha, static_beta, dyn_alpha_w,
                     dyn_alpha_scale, dyn_beta_w, dyn_beta_scale):
    """(s, M, d) streams -> (branch_input (M, d), carried (s, M, d),
    beta (s, M)) — mix column 0 and columns 1..s as separate outputs."""
    return _width_pallas(residuals, static_alpha, static_beta, dyn_alpha_w,
                         dyn_alpha_scale, dyn_beta_w, dyn_beta_scale)


def _width_fwd(*args):
    if jax.default_backend() == 'tpu' or _INTERPRET:
        if not _SAVE_STATE:
            return _width_pallas(*args), (args, None)
        pub, state = _width_pallas(*args, save_state=True)
        return pub, (args, state)
    return _width_reference_split(*args), (args, None)


def _width_bwd(res, g):
    args, state = res
    g_branch_in, g_carried, g_beta = g
    if jax.default_backend() == 'tpu' or _INTERPRET:
        return _width_bwd_pallas(*args, g_branch_in, g_carried, g_beta,
                                 state=state)
    _, vjp = jax.vjp(_width_reference_split, *args)
    return vjp(g)


width_connection.defvjp(_width_fwd, _width_bwd)
