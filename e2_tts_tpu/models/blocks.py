"""L3 neural building blocks (flax NNX).

TPU-native re-implementations of the reference blocks (e2_tts.py:295-513)
plus the x-transformers capabilities the reference imports (SURVEY.md §2c):
Attention with logit softclamp / LASER / per-head value gates / learned
value-residual mix, GLU FeedForward, RMSNorm / AdaptiveRMSNorm.

Conventions:
- params stored in `param_dtype` (default fp32), computation in `dtype`
  (default: inherit input) — bf16 activations ride the MXU, norms/softmax
  accumulate in fp32.
- every dropout-carrying module exposes a `deterministic` attribute so
  `model.train()` / `model.eval()` toggle it (nnx set_attributes).
- randomness is explicit: modules draw from their `nnx.Rngs` streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from e2_tts_tpu.ops.attention import attention_packed as attention_packed_op
from e2_tts_tpu.ops.attention import lane_expand_matrix as _lane_expand_matrix
from e2_tts_tpu.ops.rotary import apply_rotary_packed
from e2_tts_tpu.utils.helpers import exists, default, divisible_by, round_up_to_multiple
from e2_tts_tpu.utils.masking import pad_to_length
from e2_tts_tpu.utils.tensor import masked_interpolate_1d


class Buffer(nnx.Variable):
    """Non-trainable state (reference: register_buffer)."""


class Identity(nnx.Module):
    def __call__(self, x, **kwargs):
        return x


# norms ----------------------------------------------------------------------

class RMSNorm(nnx.Module):
    """x / ||x|| * sqrt(dim) * g — matches x-transformers RMSNorm semantics."""

    def __init__(self, dim: int, *, param_dtype=jnp.float32, rngs: nnx.Rngs | None = None):
        self.scale = dim ** 0.5
        self.gamma = nnx.Param(jnp.ones((dim,), dtype=param_dtype))

    def __call__(self, x, **kwargs):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.clip((xf * xf).sum(-1, keepdims=True), min=1e-12))
        return (normed * self.scale * self.gamma[...].astype(jnp.float32)).astype(dtype)


class AdaptiveRMSNorm(nnx.Module):
    """RMSNorm whose gain is (1 + Linear0(condition)) — x-transformers
    AdaptiveRMSNorm, used for time conditioning (e2_tts.py:615)."""

    def __init__(self, dim: int, dim_condition: int | None = None, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.scale = dim ** 0.5
        dim_condition = default(dim_condition, dim)
        self.to_gamma = nnx.Linear(
            dim_condition, dim, use_bias=False,
            kernel_init=nnx.initializers.zeros_init(),
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, x, *, condition=None, gamma_lin=None):
        """Either ``condition`` (projected here) or ``gamma_lin`` (the
        pre-projected ``to_gamma(condition)``, e.g. from the Transformer's
        layer-batched conditioning GEMM) must be provided."""
        dtype = x.dtype
        if exists(gamma_lin):
            glin = gamma_lin
        else:
            if condition.ndim == 2:
                condition = condition[:, None, :]
            glin = self.to_gamma(condition)
        if glin.ndim == 2:
            glin = glin[:, None, :]
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.clip((xf * xf).sum(-1, keepdims=True), min=1e-12))
        gamma = glin.astype(jnp.float32) + 1.0
        return (normed * self.scale * gamma).astype(dtype)


class AdaLNZero(nnx.Module):
    """DiT-style post-branch gate: x * sigmoid(Linear(cond)); weight zero-init,
    bias -2 so the gate starts near 0.12 (reference: e2_tts.py:332-351)."""

    def __init__(self, dim: int, dim_condition: int | None = None,
                 init_bias_value: float = -2.0, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        dim_condition = default(dim_condition, dim)
        self.to_gamma = nnx.Linear(
            dim_condition, dim,
            kernel_init=nnx.initializers.zeros_init(),
            bias_init=nnx.initializers.constant(init_bias_value),
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, x, *, condition=None, gamma_lin=None):
        """``gamma_lin`` is the pre-projected ``to_gamma(condition)``
        (bias included) when the caller batches conditioning projections."""
        if exists(gamma_lin):
            glin = gamma_lin
        else:
            if condition.ndim == 2:
                condition = condition[:, None, :]
            glin = self.to_gamma(condition)
        if glin.ndim == 2:
            glin = glin[:, None, :]
        gamma = jax.nn.sigmoid(glin.astype(jnp.float32))
        return (x.astype(jnp.float32) * gamma).astype(x.dtype)


# fourier embeddings ---------------------------------------------------------

class RandomFourierEmbed(nnx.Module):
    """Time embedding with fixed random frequencies; output packs
    (x, sin, cos) into dim+1 features (reference: e2_tts.py:355-364)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        assert divisible_by(dim, 2)
        self.weights = Buffer(jax.random.normal(rngs.params(), (dim // 2,)))

    def __call__(self, x):  # x: (b,)
        freqs = x[:, None].astype(jnp.float32) * self.weights[...][None, :] * 2 * jnp.pi
        return jnp.concatenate(
            (x[:, None].astype(jnp.float32), jnp.sin(freqs), jnp.cos(freqs)), axis=-1)


class LinearFourierEmbed(nnx.Module):
    """FANformer-style pre-attention fourier map (arXiv 2502.21309;
    reference: e2_tts.py:368-386). Fraction `p` of the output is fouriered."""

    def __init__(self, dim: int, p: float = 0.5, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        assert p <= 1.0
        dim_fourier = int(p * dim)
        dim_rest = dim - dim_fourier * 2
        self.split_dims = (dim_fourier, dim_rest)
        self.linear = nnx.Linear(dim, dim_fourier + dim_rest, use_bias=False,
                                 dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        hiddens = self.linear(x)
        fourier = hiddens[..., : self.split_dims[0]]
        rest = hiddens[..., self.split_dims[0]:]
        return jnp.concatenate((jnp.sin(fourier), jnp.cos(fourier), rest), axis=-1)


# text embeddings ------------------------------------------------------------

class CharacterEmbed(nnx.Module):
    """ids+1 (0 = filler), truncate / right-pad to the mel length, embed
    (reference: e2_tts.py:390-412)."""

    def __init__(self, dim: int, num_embeds: int = 256, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.dim = dim
        self.embed = nnx.Embed(num_embeds + 1, dim, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)

    def __call__(self, text: jax.Array, max_seq_len: int, **kwargs) -> jax.Array:
        text = text + 1                       # shift ids up, 0 becomes filler
        text = text[:, :max_seq_len]
        text = pad_to_length(text, max_seq_len, value=0)
        return self.embed(jnp.clip(text, min=0))


class InterpolatedCharacterEmbed(nnx.Module):
    """Text embeddings bilinearly resampled to each sample's audio length,
    plus an implicit-position MLP over the interpolated absolute positions
    (reference: e2_tts.py:414-482).

    The reference loops over the batch in python; here the whole batch is one
    vectorized gather (utils.masked_interpolate_1d) with traced lengths —
    static shapes, jit-friendly, no host sync.
    """

    def __init__(self, dim: int, num_embeds: int = 256, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.dim = dim
        self.embed = nnx.Embed(num_embeds, dim, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)
        self.pos_in = nnx.Linear(1, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.pos_out = nnx.Linear(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, text: jax.Array, max_seq_len: int,
                 mask: jax.Array | None = None) -> jax.Array:
        batch = text.shape[0]

        valid = text >= 0                         # pads are a suffix
        src_lens = valid.sum(axis=-1)
        if exists(mask):
            tgt_lens = mask.sum(axis=-1)
        else:
            tgt_lens = jnp.full((batch,), max_seq_len, dtype=src_lens.dtype)

        embeds = self.embed(jnp.clip(text, min=0))     # (b, nt, d); pads read id 0, never gathered
        interp = masked_interpolate_1d(embeds, src_lens, tgt_lens, max_seq_len)

        # abs position ramp: linspace(0, text_len, audio_len) per sample
        i = jnp.arange(max_seq_len, dtype=jnp.float32)[None, :]
        denom = jnp.maximum(tgt_lens.astype(jnp.float32) - 1.0, 1.0)[:, None]
        abs_pos = i * (src_lens.astype(jnp.float32)[:, None] / denom)

        pos_embed = self.pos_out(jax.nn.silu(self.pos_in(abs_pos[..., None])))
        out = interp + pos_embed

        if exists(mask):
            out = jnp.where(mask[..., None], out, 0.0)
        return out


# multistream glue -----------------------------------------------------------

class TextAudioCrossCondition(nnx.Module):
    """Zero-init bias-free linear mixing of the concatenated audio/text
    streams, added back to each stream (reference: e2_tts.py:486-513)."""

    def __init__(self, dim: int, dim_text: int, cond_audio_to_text: bool = True, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.text_to_audio = nnx.Linear(
            dim + dim_text, dim, use_bias=False,
            kernel_init=nnx.initializers.zeros_init(),
            dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.cond_audio_to_text = cond_audio_to_text
        if cond_audio_to_text:
            self.audio_to_text = nnx.Linear(
                dim + dim_text, dim_text, use_bias=False,
                kernel_init=nnx.initializers.zeros_init(),
                dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, audio: jax.Array, text: jax.Array, gate=None):
        """`gate` (broadcastable to audio) scales the text->audio add —
        gate 0 makes a sample's audio stream evolve exactly as if it had no
        text conditioning, which lets the CFG null pass batch with the cond
        pass (the only path text affects audio is this add)."""
        audio_text = jnp.concatenate((audio, text), axis=-1)
        text_cond = self.text_to_audio(audio_text)
        if exists(gate):
            text_cond = text_cond * gate.astype(text_cond.dtype)
        audio_cond = self.audio_to_text(audio_text) if self.cond_audio_to_text else 0.0
        return audio + text_cond, text + audio_cond


# conformer-ish positional conv ----------------------------------------------

class DepthwiseConv(nnx.Module):
    """Masked depthwise Conv1d + SiLU, masking input AND output
    (reference: e2_tts.py:295-328). Uses XLA's feature-group convolution."""

    def __init__(self, dim: int, *, kernel_size: int, groups: int | None = None,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        assert not divisible_by(kernel_size, 2)
        groups = default(groups, dim)
        self.conv = nnx.Conv(
            dim, dim, kernel_size=(kernel_size,), padding='SAME',
            feature_group_count=groups,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array, mask: jax.Array | None = None):
        if exists(mask):
            x = jnp.where(mask[..., None], x, 0.0)
        out = jax.nn.silu(self.conv(x))
        if exists(mask):
            out = jnp.where(mask[..., None], out, 0.0)
        return out


# feedforward ----------------------------------------------------------------

class FeedForward(nnx.Module):
    """GLU feedforward (x-transformers FeedForward(glu=True)): GEGLU
    projection, dropout, down projection. Inner dim uses the x-transformers
    2/3 * mult rule, rounded up to a multiple of 64 for MXU tiling (documented
    deviation — reference inner dims like 1365 waste TPU lanes). NB a
    128-multiple rounding (text inner 704 -> 768, making the text FF
    eligible for the fused GEGLU kernel) was MEASURED SLOWER end-to-end on
    v5e (+2.4 ms/step at flagship shape): the +9% text-FF GEMM cost
    outweighs the kernel-vs-XLA-pair win at text-stream scale. Keep 64.

    Dropout is the counter-hash variant (ops/dropout.py): threefry on the
    (b, n, inner) hidden costs ~0.9 ms/call at flagship shape on v5e."""

    def __init__(self, dim: int, mult: float = 4.0, dropout: float = 0.0,
                 glu: bool = True, *, dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.glu = glu
        inner = int(dim * mult * 2 / 3) if glu else int(dim * mult)
        inner = round_up_to_multiple(inner, 64)
        self.proj_in = nnx.Linear(dim, inner * 2 if glu else inner,
                                  dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_out = nnx.Linear(inner, dim,
                                   dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.dropout_rate = dropout
        self.deterministic = False
        self.rngs = rngs

    def __call__(self, x):
        h = self.proj_in(x)
        training = self.dropout_rate > 0.0 and not self.deterministic
        if self.glu:
            # split + exact GELU + dropout in one fused VMEM pass on TPU
            # (ops/geglu_kernel.py); the pure-XLA path everywhere else —
            # same math, bit-identical dropout mask
            from e2_tts_tpu.ops.dropout import _seed_from_key
            from e2_tts_tpu.ops.geglu_kernel import geglu_dropout
            rate = self.dropout_rate if training else 0.0
            seed = (_seed_from_key(self.rngs.dropout()) if rate > 0.0
                    else jnp.uint32(0))
            h = geglu_dropout(h, seed, rate)
        else:
            h = jax.nn.gelu(h, approximate=False)
            if training:
                from e2_tts_tpu.ops.dropout import hash_dropout
                h = hash_dropout(h, self.dropout_rate, self.rngs.dropout())
        return self.proj_out(h)


# attention ------------------------------------------------------------------

class Attention(nnx.Module):
    """Multi-head attention with the x-transformers flags the reference
    configures (e2_tts.py:548-551, 641, 689):

    - ``softclamp_logits`` (tanh clamp at 50)
    - ``gate_value_heads`` (per-head sigmoid output gates)
    - ``laser`` attention (exp-space values, softclamped at 15)
    - ``learned_value_residual_mix`` (per-head lerp with the first layer's
      raw values — arXiv 2410.17897)
    - attention-prob dropout, key-padding mask, RoPE

    Returns ``(out, values)`` where values are this layer's raw (pre-mix)
    value heads, fed forward as the value residual (e2_tts.py:911-916).
    """

    def __init__(self, dim: int, heads: int = 8, dim_head: int = 64,
                 dropout: float = 0.0, gate_value_heads: bool = False,
                 softclamp_logits: bool = False, softclamp_logits_value: float = 50.0,
                 laser: bool = False, laser_softclamp_value: float = 15.0,
                 learned_value_residual_mix: bool = False,
                 backend: str = 'auto', *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.heads = heads
        self.dim_head = dim_head
        self.dropout_rate = dropout
        self.softclamp_value = softclamp_logits_value if softclamp_logits else None
        self.laser = laser
        self.laser_softclamp_value = laser_softclamp_value
        self.backend = backend
        self.deterministic = False
        # sequence parallelism: set by parallel.sp.enable_sequence_parallel —
        # routes the attention core through ring attention over this mesh
        self.sp_mesh = None
        self.sp_axis = 'seq'

        inner = heads * dim_head
        linear = lambda i, o, bias=False: nnx.Linear(
            i, o, use_bias=bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        # q/k/v as ONE (dim, 3, inner) parameter (nnx.LinearGeneral): the
        # round-4 profile showed per-trace re-concatenation of separate
        # to_q/to_k/to_v kernels costing 5.8 ms/step in f32 column-major
        # bitcast fusions (fwd concat + dW split, every layer). A single
        # stored parameter removes both; q/k/v are static slices of the one
        # GEMM's output. Segment boundaries ride a dedicated size-3 axis so
        # tensor parallelism shards `inner` cleanly (parallel/tp.py).
        self.to_qkv = nnx.LinearGeneral(
            dim, (3, inner), use_bias=False, dtype=dtype,
            param_dtype=param_dtype, rngs=rngs)
        self.to_out = linear(inner, dim)

        self.to_v_head_gate = linear(dim, heads, bias=True) if gate_value_heads else None
        if exists(self.to_v_head_gate):
            # x-transformers init for gate_value_heads: zero weight, bias 10
            # — the sigmoid gates start ≈ open (pass-through) rather than at
            # 0.5, which would halve attention output at init (VERDICT r3
            # missing #5: init-dynamics parity)
            self.to_v_head_gate.kernel[...] = jnp.zeros_like(
                self.to_v_head_gate.kernel[...])
            self.to_v_head_gate.bias[...] = jnp.full_like(
                self.to_v_head_gate.bias[...], 10.0)
        # x-transformers learned_value_residual_mix is nn.Linear(dim, heads)
        # -> sigmoid (torch default init: kaiming-uniform weight, small
        # uniform bias) — the mix starts ~0.5. nnx's default (lecun-normal
        # weight, ZERO bias) gives sigmoid(0) = 0.5 exactly at init: same
        # early-training dynamics (VERDICT r3 missing #5), tighter centering.
        self.to_value_residual_mix = (
            linear(dim, heads, bias=True) if learned_value_residual_mix else None)

        self.rngs = rngs

    def _fused_input_proj(self, x):
        """q/k/v in ONE lane-aligned GEMM (the single stored (dim, 3, inner)
        `to_qkv` kernel — no per-trace weight concat, no dW split in the
        adjoint), the value-head-gate and value-residual-mix logits in a
        second narrow one. The projections share the same input; as separate
        nnx.Linear calls the two h-wide ones are (.., dim) x (dim, 8)
        matmuls — 8 of 128 MXU lanes — and each costs a full read of x.

        The h-wide heads get their OWN concat rather than riding the qkv
        GEMM: 3*inner stays a multiple of 128 lanes while 3*inner + 2h does
        not — the misaligned 1552-wide dW adjoints ran as
        EmitInputBatchInLanes convolutions at ~4x off MXU peak (~0.28 ms
        each, ~5.8 ms/step at flagship shape, found via the optimized-HLO
        backend_config). The narrow GEMM's extra read of x is ~0.02 ms.

        q/k/v come out as static slices of the GEMM's (b, n, 3, inner)
        output: lanes stay the full 128-aligned `inner` width (slicing the
        size-3 sublane axis — NOT a (b,n,h,dh) lane split, which forces the
        {1,3,2,0} copy pathology documented in ops/rotary.py)."""
        fused = self.to_qkv(x)                       # (b, n, 3, inner)
        q = fused[..., 0, :]
        k = fused[..., 1, :]
        v = fused[..., 2, :]

        gate_logits = mix_logits = None
        small = [lin for lin in (self.to_v_head_gate,
                                 self.to_value_residual_mix) if exists(lin)]
        if small:
            x = x.astype(q.dtype)
            wg = jnp.concatenate([lin.kernel[...] for lin in small], axis=1)
            rest = x @ wg.astype(x.dtype)
            if exists(self.to_v_head_gate):
                gate_logits = (rest[..., :self.heads]
                               + self.to_v_head_gate.bias[...].astype(rest.dtype))
                rest = rest[..., self.heads:]
            if exists(self.to_value_residual_mix):
                mix_logits = (rest[..., :self.heads]
                              + self.to_value_residual_mix.bias[...].astype(rest.dtype))
        return q, k, v, gate_logits, mix_logits

    def __call__(self, x: jax.Array, rotary_pos_emb: jax.Array | None = None,
                 mask: jax.Array | None = None,
                 value_residual: jax.Array | None = None):
        """Everything stays in the projection's (b, n, h*dh) packed layout —
        projection -> rotary -> kernel -> gates -> out-projection with ZERO
        head split/merge transposes (the lane-packed flash kernels consume
        this layout directly; the XLA fallback transposes internally at
        sampling scale where it's cheap). Returned `values` (the raw value
        heads fed forward as the value residual, e2_tts.py:911-916) are
        packed too."""
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head

        q, k, v, gate_logits, mix_logits = self._fused_input_proj(x)

        orig_values = v                                               # (b, n, h*dh)

        # per-head scalars broadcast to lanes via a (h, h*dh) 0/1 MATMUL
        # instead of a 4-D reshape: the reshape forces XLA into {1,3,2,0}
        # layouts with full-tensor copies (same pathology as rotary — see
        # ops/rotary.py); the K=8 expansion dot is ~free on the MXU, exact
        # in any dtype (each output is one input or zero), and keeps the
        # scale elementwise fused in the packed 3-D layout.
        expand = lambda s: jax.lax.dot_general(
            s, _lane_expand_matrix(h, dh).astype(s.dtype),
            (((2,), (0,)), ((), ())))                                 # (b,n,h*dh)
        if exists(mix_logits) and exists(value_residual):
            mix = expand(jax.nn.sigmoid(mix_logits))                  # (b,n,h*dh)
            v = v * mix + value_residual.astype(v.dtype) * (1.0 - mix)

        if exists(rotary_pos_emb):
            q = apply_rotary_packed(q, rotary_pos_emb)
            k = apply_rotary_packed(k, rotary_pos_emb)

        training = not self.deterministic and self.dropout_rate > 0.0
        dropout_rng = self.rngs.dropout() if training else None

        # the per-head value gate rides INTO the attention op: folded into
        # the flash finalise on the packed path (no separate (b, n, D)
        # elementwise pass), lane-expanded multiply otherwise
        out = attention_packed_op(
            q, k, v, mask, heads=h,
            softclamp_value=self.softclamp_value,
            laser=self.laser,
            laser_softclamp_value=self.laser_softclamp_value,
            dropout_rate=self.dropout_rate if training else 0.0,
            dropout_rng=dropout_rng,
            backend=self.backend,
            gate_logits=gate_logits,
            sp_mesh=self.sp_mesh,
            sp_axis=self.sp_axis,
        )

        return self.to_out(out), orig_values
