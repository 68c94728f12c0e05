"""Hyper-connections (arXiv 2409.19606).

Capability imported by the reference from the `hyper-connections` package
(e2_tts.py:48, 607, 818-821): each residual branch reads a learned mixture of
N residual streams (width connection) and writes back through learned
per-stream gains (depth connection), with tanh-bounded dynamic (input
conditioned) corrections on top of static weights.

TPU-native layout: streams are an explicit leading axis ``(s, b, n, d)`` —
pure einsums, no batch reshuffling; with ``num_streams == 1`` everything
degenerates to a plain residual (reference `disable=` path, e2_tts.py:607).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx



class LazyStreams(NamedTuple):
    """Residual streams left as (carried, branch, beta) — the depth
    connection `carried + branch * beta` is NOT materialised; the next
    HyperConnection fuses it into its width kernel (a full (s, b, n, d)
    HBM write+read saved per chained branch). `materialize()` at chain
    breaks (cross-condition, UNet skips, stream reduction)."""

    carried: jax.Array   # (s, b, n, d)
    branch: jax.Array    # (b, n, d)
    beta: jax.Array      # (s, b, n)

    @property
    def dtype(self):
        return self.carried.dtype

    @property
    def shape(self):
        return self.carried.shape

    def materialize(self) -> jax.Array:
        return self.carried + self.branch[None].astype(self.carried.dtype) \
            * self.beta[..., None].astype(self.carried.dtype)


def materialize(x):
    """Concrete (s, b, n, d) streams from either layout."""
    return x.materialize() if isinstance(x, LazyStreams) else x


def expand_stream(x: jax.Array, num_streams: int) -> jax.Array:
    """(b, n, d) -> (s, b, n, d), each stream initialised with a copy."""
    if num_streams == 1:
        return x[None]
    return jnp.broadcast_to(x[None], (num_streams, *x.shape))


def reduce_stream(x) -> jax.Array:
    """(s, b, n, d) -> (b, n, d) by summing streams."""
    if isinstance(x, LazyStreams):
        # sum_s (carried + branch*beta) = sum carried + branch * sum beta
        return (x.carried.sum(axis=0)
                + x.branch * x.beta.sum(axis=0)[..., None].astype(x.branch.dtype))
    return x.sum(axis=0)


class HyperConnection(nnx.Module):
    """One residual-branch router.

    ``__call__(residuals) -> (branch_input, add_residual)`` mirrors the
    reference usage ``x, add_residual = conv_residual(x)`` (e2_tts.py:900-902)
    with residuals shaped (s, b, n, d) and branch_input (b, n, d).
    """

    def __init__(self, dim: int, num_streams: int, layer_index: int = 0, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs | None = None):
        self.num_streams = num_streams
        if num_streams == 1:
            return

        s = num_streams
        init_alpha0 = jnp.zeros((s, 1), dtype=param_dtype).at[layer_index % s, 0].set(1.0)
        # column 0 routes into the branch input; columns 1..s carry streams through
        self.static_alpha = nnx.Param(
            jnp.concatenate([init_alpha0, jnp.eye(s, dtype=param_dtype)], axis=1))  # (s, s+1)
        self.static_beta = nnx.Param(jnp.ones((s,), dtype=param_dtype))
        self.dynamic_alpha_fn = nnx.Param(jnp.zeros((dim, s + 1), dtype=param_dtype))
        self.dynamic_alpha_scale = nnx.Param(jnp.asarray(1e-2, dtype=param_dtype))
        self.dynamic_beta_fn = nnx.Param(jnp.zeros((dim,), dtype=param_dtype))
        self.dynamic_beta_scale = nnx.Param(jnp.asarray(1e-2, dtype=param_dtype))

    def __call__(self, residuals):
        """residuals: (s, b, n, d) array or a LazyStreams from the previous
        branch (its depth connection then fuses into this width kernel)."""
        if self.num_streams == 1:
            x = materialize(residuals)[0]
            return x, lambda branch_out: (x + branch_out)[None]

        from e2_tts_tpu.ops import hyper_conn_kernel as hck

        lazy = isinstance(residuals, LazyStreams)
        dtype = residuals.dtype
        s, b, n, d = residuals.shape
        params = (
            self.static_alpha[...], self.static_beta[...],
            self.dynamic_alpha_fn[...], self.dynamic_alpha_scale[...],
            self.dynamic_beta_fn[...], self.dynamic_beta_scale[...],
        )

        # width connection: one fused VMEM pass on TPU (Pallas); the pure-XLA
        # reference path everywhere else. Both share the same math
        # (ops/hyper_conn_kernel.py); norm stats in fp32, streams in compute
        # dtype — the mix is bandwidth-bound. The kernel emits the branch
        # input and the carried streams as SEPARATE outputs (and its adjoint
        # consumes their grads separately): no (s+1, ...) slice/concat.
        # E2TTS_HC_BACKEND=xla forces the reference path (debug escape hatch).
        import os
        on_tpu = (jax.default_backend() == 'tpu' or hck._INTERPRET) \
            and os.environ.get('E2TTS_HC_BACKEND', '') != 'xla'
        if lazy:
            carried_f = residuals.carried.reshape(s, b * n, d)
            branch_f = residuals.branch.reshape(b * n, d)
            betaT = jnp.transpose(residuals.beta.reshape(s, b * n))
            fn = (hck.width_connection_fused if on_tpu
                  else hck._width_fused_reference_split)
            branch_input, carried, beta = fn(carried_f, branch_f, betaT, *params)
        else:
            flat = residuals.reshape(s, b * n, d)
            fn = (hck.width_connection if on_tpu
                  else hck._width_reference_split)
            branch_input, carried, beta = fn(flat, *params)
        branch_input = branch_input.reshape(b, n, d)
        carried = carried.reshape(s, b, n, d)
        beta = beta.reshape(s, b, n)

        def add_residual(branch_out: jax.Array) -> LazyStreams:
            # depth connection, deferred: the next HyperConnection in the
            # chain consumes it fused; boundaries call materialize()
            return LazyStreams(carried, branch_out.astype(dtype), beta)

        return branch_input, add_residual


def get_init_and_expand_reduce_stream_functions(num_streams: int, disable: bool | None = None):
    """Mirrors the hyper-connections package factory used at e2_tts.py:607."""
    if disable:
        num_streams = 1

    counter = {'i': 0}

    def init(dim: int, *, rngs: nnx.Rngs | None = None, param_dtype=jnp.float32):
        layer_index = counter['i']
        counter['i'] += 1
        return HyperConnection(dim, num_streams, layer_index,
                               param_dtype=param_dtype, rngs=rngs)

    expand = lambda x: expand_stream(x, num_streams)
    return init, expand, reduce_stream
