"""Fused GEGLU + counter-hash dropout Pallas kernel.

The reference FeedForward (x-transformers ``FeedForward(glu=True)``, used at
e2_tts.py:531-536) computes ``h * gelu(gate)`` then dropout. As separate XLA
fusions the pair ran at ~410 GB/s of the 819 GB/s v5e HBM peak (~5.6 ms per
flagship step across the speech+text FF layers, hlo_stats). This kernel does
the whole chain — halves split, exact (erf) GELU in f32, counter-hash
dropout — in ONE VMEM pass per row tile: the projection output is read once
and the gated hidden written once; the backward regenerates the mask and the
GELU derivative from the saved projection output in one pass as well.

Layout notes (why the halves arrive as two block windows): the GEGLU hidden
is the (b, n, 2*inner) output of one fused projection GEMM. An in-kernel
lane slice at offset ``inner`` would force a relayout; instead the SAME
array is passed twice with block windows at lane-block offsets 0 and 1, and
each half lands tile-aligned in VMEM. This requires ``inner % 128 == 0``
(Mosaic: a block's last dim must be a multiple of 128 or the full array
dim) — the speech FF (inner=1408) qualifies; the text FF (inner=704, a
multiple of 64 only) falls back to the XLA reference path via
``_use_pallas``.

GELU uses the Abramowitz–Stegun 7.1.26 rational erf (|err| <= 1.5e-7 in f32
— below bf16 resolution) because Mosaic has no erf lowering; the pure-XLA
reference path (`_geglu_dropout_reference`, exact `jax.lax.erf`) runs
everywhere else and is the test oracle. Dropout masks are BIT-IDENTICAL
across the two paths (both are `ops.dropout.hash_keep` over the (b, n,
inner) coordinates). ``E2TTS_FF_BACKEND=xla`` forces the reference path
(debug escape hatch, same convention as E2TTS_HC_BACKEND).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2_tts_tpu.ops.dropout import hash_keep
from e2_tts_tpu.ops.flash_attention import _U, _fmix32, _keep_threshold

_INTERPRET = False

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327
# hash_dropout axis multipliers for a 3-D (b, n, inner) tensor
_P0, _P1, _P2 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D


def _erf_f32(x):
    """Rational erf (Abramowitz–Stegun 7.1.26), |err| <= 1.5e-7 on f32 —
    Mosaic has no lowering for lax.erf. Built from supported primitives
    (exp, select, fma)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    pos = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0.0, -pos, pos)


def _gelu_f32(g):
    return 0.5 * g * (1.0 + _erf_f32(g * _INV_SQRT2))


def _keep_block(seed, b_idx, row0, bn, inner, rate):
    """(bn, inner) keep mask matching ops.dropout.hash_keep on the full
    (b, n, inner) tensor, regenerated from block-local coordinates."""
    rows = row0 + jax.lax.broadcasted_iota(jnp.uint32, (bn, inner), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (bn, inner), 1)
    ctr = (seed + b_idx * _U(_P0) + rows * _U(_P1) + cols * _U(_P2))
    return _fmix32(ctr) >= _U(_keep_threshold(rate))


def _fwd_kernel(seed_ref, h_ref, g_ref, o_ref, *, rate, bn):
    h = h_ref[0].astype(jnp.float32)            # (bn, inner)
    g = g_ref[0].astype(jnp.float32)
    act = h * _gelu_f32(g)
    if rate > 0.0:
        b_idx = pl.program_id(0).astype(jnp.uint32)
        row0 = (pl.program_id(1) * bn).astype(jnp.uint32)
        keep = _keep_block(seed_ref[0, 0], b_idx, row0, *act.shape, rate)
        act = jnp.where(keep, act * (1.0 / (1.0 - rate)), 0.0)
    o_ref[0] = act.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, h_ref, g_ref, go_ref, gh2_ref, *, rate, bn):
    h = h_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    gout = go_ref[0].astype(jnp.float32)
    if rate > 0.0:
        b_idx = pl.program_id(0).astype(jnp.uint32)
        row0 = (pl.program_id(1) * bn).astype(jnp.uint32)
        keep = _keep_block(seed_ref[0, 0], b_idx, row0, *gout.shape, rate)
        gout = jnp.where(keep, gout * (1.0 / (1.0 - rate)), 0.0)
    phi = 0.5 * (1.0 + _erf_f32(g * _INV_SQRT2))        # Φ(g)
    gelu_g = g * phi
    # d gelu/dg = Φ(g) + g φ(g)
    dgelu = phi + g * jnp.exp(-0.5 * g * g) * _INV_SQRT2PI
    g_h = gout * gelu_g
    g_g = gout * h * dgelu
    dt = gh2_ref.dtype
    gh2_ref[0] = jnp.concatenate(
        [g_h.astype(dt), g_g.astype(dt)], axis=-1)


# scoped-VMEM budget per kernel invocation. Mosaic's stack limit is 16 MB;
# measured fwd usage at (bn=352, inner=1408) was 16.07 MB = 32.4 B per block
# element (bf16 h/g/out windows + f32 intermediates). Budget with margin.
_VMEM_BUDGET = 12_000_000
_FWD_BYTES_PER_ELEM = 36
_BWD_BYTES_PER_ELEM = 56     # + gout window, d-gelu temps, (bn, 2*inner) out


def _pick_bn(n: int, inner: int, bytes_per_elem: int) -> int | None:
    """Largest divisor of n that is a multiple of 8 and keeps the kernel's
    scoped-VMEM stack under budget (divisor blocks: no ragged tail, no
    padding pass)."""
    cap = _VMEM_BUDGET // (bytes_per_elem * inner)
    for bn in range(min(cap, n), 7, -1):
        if n % bn == 0 and bn % 8 == 0:
            return bn
    return None


def _specs(inner, bn, n_blocks):
    seed_spec = pl.BlockSpec((1, 1), lambda bi, j: (0, 0),
                             memory_space=pltpu.SMEM)
    h_spec = pl.BlockSpec((1, bn, inner), lambda bi, j: (bi, j, 0),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, bn, inner), lambda bi, j: (bi, j, 1),
                          memory_space=pltpu.VMEM)
    return seed_spec, h_spec, g_spec


def _fwd_pallas(h2, seed, rate):
    b, n, two_inner = h2.shape
    inner = two_inner // 2
    bn = _pick_bn(n, inner, _FWD_BYTES_PER_ELEM)
    seed2d = seed.astype(jnp.uint32).reshape(1, 1)
    seed_spec, h_spec, g_spec = _specs(inner, bn, n // bn)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, bn=bn),
        grid=(b, n // bn),
        in_specs=[seed_spec, h_spec, g_spec],
        out_specs=pl.BlockSpec((1, bn, inner), lambda bi, j: (bi, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, inner), h2.dtype),
        interpret=_INTERPRET,
    )(seed2d, h2, h2)


def _bwd_pallas(h2, seed, rate, gout):
    b, n, two_inner = h2.shape
    inner = two_inner // 2
    bn = _pick_bn(n, inner, _BWD_BYTES_PER_ELEM)
    seed2d = seed.astype(jnp.uint32).reshape(1, 1)
    seed_spec, h_spec, g_spec = _specs(inner, bn, n // bn)
    go_spec = pl.BlockSpec((1, bn, inner), lambda bi, j: (bi, j, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, bn=bn),
        grid=(b, n // bn),
        in_specs=[seed_spec, h_spec, g_spec, go_spec],
        out_specs=pl.BlockSpec((1, bn, two_inner), lambda bi, j: (bi, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, two_inner), h2.dtype),
        interpret=_INTERPRET,
    )(seed2d, h2, h2, gout)


def _geglu_dropout_reference(h2, seed, rate):
    """Pure-XLA oracle: exactly the pre-fusion FeedForward chain (split,
    exact-erf GELU, ops.dropout.hash_keep mask)."""
    h, g = jnp.split(h2, 2, axis=-1)
    act = h * jax.nn.gelu(g, approximate=False)
    if rate > 0.0:
        keep = hash_keep(act.shape, seed, rate)
        act = jnp.where(keep, act * (1.0 / (1.0 - rate)), 0.0).astype(h2.dtype)
    return act


def _use_pallas(h2, rate) -> bool:
    if os.environ.get('E2TTS_FF_BACKEND', '') == 'xla':
        return False
    if not (jax.default_backend() == 'tpu' or _INTERPRET):
        return False
    b, n, two_inner = h2.shape
    inner = two_inner // 2
    # the halves arrive as block windows of shape (1, bn, inner) at lane-block
    # offsets 0/1, and Mosaic requires a block's last dim to be a multiple of
    # 128 (or the full array dim). inner is only guaranteed a multiple of 64
    # (text FF: 704) — non-128-divisible inners take the XLA path.
    if two_inner != 2 * inner or inner % 128 != 0:
        return False
    return (_pick_bn(n, inner, _FWD_BYTES_PER_ELEM) is not None
            and _pick_bn(n, inner, _BWD_BYTES_PER_ELEM) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def geglu_dropout(h2, seed, rate: float):
    """``h2 (b, n, 2*inner) -> (b, n, inner)``: h * gelu(gate) + dropout,
    fused. `seed` is a uint32 scalar (ops.dropout._seed_from_key); `rate` is
    a static python float (0.0 disables the mask)."""
    if _use_pallas(h2, rate):
        return _fwd_pallas(h2, seed, rate)
    return _geglu_dropout_reference(h2, seed, rate)


def _geglu_fwd(h2, seed, rate):
    return geglu_dropout(h2, seed, rate), (h2, seed)


def _geglu_bwd(rate, res, gout):
    h2, seed = res
    if _use_pallas(h2, rate):
        return _bwd_pallas(h2, seed, rate, gout), None
    _, vjp = jax.vjp(lambda a: _geglu_dropout_reference(a, seed, rate), h2)
    return vjp(gout)[0], None


geglu_dropout.defvjp(_geglu_fwd, _geglu_bwd)
