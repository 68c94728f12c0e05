"""Pallas kernel for the hyper-connections width connection.

The width connection (arXiv 2409.19606; models/hyper_connections.py) is a
bandwidth-bound chain — rms-stat, two tiny projections, tanh, and a 4->5
stream mix — that XLA executes ~10x off memory-bound (measured 2.4 ms per
call at (4, 16x1056, 512) bf16 on v5e vs ~0.25 ms of pure HBM traffic).
This kernel does the whole chain in one VMEM pass per row tile: streams are
read once and the mixed streams written once.

Backward: custom VJP that replays the pure-XLA reference implementation
under jax.vjp — numerically identical gradients, no hand-derived adjoint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2_tts_tpu.utils.helpers import round_up_to_multiple

_INTERPRET = False
_LANE_PAD = 8   # pad the (s+1) weight column dim to a full sublane group


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


def _width_kernel(r_ref, sa_ref, sb_ref, aw_ref, bw_ref, scales_ref,
                  mixed_ref, beta_ref, *, num_streams):
    s = num_streams
    a_scale = scales_ref[0, 0]
    b_scale = scales_ref[0, 1]

    r = r_ref[...]                     # (s, T, d) compute dtype
    dt = r.dtype
    d = r.shape[-1]

    sq = jnp.sum(r.astype(jnp.float32) * r.astype(jnp.float32), axis=-1)
    inv = jax.lax.rsqrt(jnp.clip(sq / d, min=1e-12))
    normed = r * inv[..., None].astype(dt)                     # (s, T, d)

    aw = aw_ref[...]                   # (d, pad) compute dtype
    bw = bw_ref[...]                   # (1, d)

    # per-stream projections (python loop: s is a small static constant)
    alphas = []
    betas = []
    for si in range(s):
        proj = jax.lax.dot_general(
            normed[si], aw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (T, pad)
        alpha = jnp.tanh(proj) * a_scale + sa_ref[si][None, :]  # (T, pad)
        alphas.append(alpha.astype(dt))

        projb = jnp.sum(normed[si].astype(jnp.float32)
                        * bw[0][None, :].astype(jnp.float32), axis=-1)
        betas.append(jnp.tanh(projb) * b_scale + sb_ref[0, si])

    # stream mix: mixed[t] = sum_s alpha[s][:, t] * r[s]
    for t in range(s + 1):
        acc = alphas[0][:, t][:, None].astype(jnp.float32) * r[0].astype(jnp.float32)
        for si in range(1, s):
            acc += alphas[si][:, t][:, None].astype(jnp.float32) * r[si].astype(jnp.float32)
        mixed_ref[t] = acc.astype(dt)

    beta_ref[...] = jnp.stack(betas).astype(dt)


def _width_pallas(residuals, static_alpha, static_beta, dyn_alpha_w,
                  dyn_alpha_scale, dyn_beta_w, dyn_beta_scale,
                  block_m: int = 256):
    s, m, d = residuals.shape
    dt = residuals.dtype

    m_pad = round_up_to_multiple(m, block_m)
    if m_pad != m:
        residuals = jnp.pad(residuals, ((0, 0), (0, m_pad - m), (0, 0)))

    # pad the (s+1) column dim so lane-dim slices stay aligned
    pad_cols = _LANE_PAD * ((s + 1 + _LANE_PAD - 1) // _LANE_PAD)
    sa = jnp.pad(static_alpha.astype(jnp.float32),
                 ((0, 0), (0, pad_cols - (s + 1))))
    aw = jnp.pad(dyn_alpha_w.astype(dt), ((0, 0), (0, pad_cols - (s + 1))))
    bw = dyn_beta_w.astype(dt)[None, :]                       # (1, d)
    sb = static_beta.astype(jnp.float32)[None, :]             # (1, s)
    scales = jnp.stack([dyn_alpha_scale, dyn_beta_scale]).astype(jnp.float32)[None, :]

    grid = (m_pad // block_m,)

    mixed, beta = pl.pallas_call(
        functools.partial(_width_kernel, num_streams=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, block_m, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, pad_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, pad_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((s + 1, block_m, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, block_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s + 1, m_pad, d), dt),
            jax.ShapeDtypeStruct((s, m_pad), dt),
        ],
        interpret=_INTERPRET,
    )(residuals, sa, sb, aw, bw, scales)

    return mixed[:, :m], beta[:, :m]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def width_connection(residuals, static_alpha, static_beta, dyn_alpha_w,
                     dyn_alpha_scale, dyn_beta_w, dyn_beta_scale):
    """(s, M, d) streams -> ((s+1, M, d) mixed [0 = branch input], (s, M) beta)."""
    return _width_pallas(residuals, static_alpha, static_beta, dyn_alpha_w,
                         dyn_alpha_scale, dyn_beta_w, dyn_beta_scale)


def _width_fwd(*args):
    return width_connection(*args), args


def _width_bwd(args, g):
    _, vjp = jax.vjp(_width_reference, *args)
    return vjp(g)


width_connection.defvjp(_width_fwd, _width_bwd)
