"""Dual-stream ("multistream") transformer backbone.

TPU-native redesign of the reference `Transformer` (e2_tts.py:518-952): a
speech stream (dim) and a smaller text stream (dim_text) run side by side and
cross-condition at every text layer; UNet-style skip connections join the
first and second halves of the speech stack; 32 register tokens are prepended
to both streams; residuals route through hyper-connections; time conditioning
enters via AdaptiveRMSNorm + AdaLNZero gates; an optional frequency axis adds
per-layer attention across frequency tokens.

Used by both `E2TTS` (cond_on_time=True) and `DurationPredictor`
(cond_on_time=False), exactly like the reference (e2_tts.py:984-987, 1159-1162).

JAX notes: the layer loop is unrolled under jit (depth <= 16 compiles fast and
lets XLA specialise each layer's fused kernels; the UNet skip asymmetry breaks
scan anyway — SURVEY.md §7). All shapes are static; masks carry raggedness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from e2_tts_tpu.models.blocks import (
    Identity, RMSNorm, AdaptiveRMSNorm, AdaLNZero, RandomFourierEmbed,
    LinearFourierEmbed, TextAudioCrossCondition, DepthwiseConv, FeedForward,
    Attention,
)
from e2_tts_tpu.models.hyper_connections import (
    HyperConnection, get_init_and_expand_reduce_stream_functions,
    expand_stream, reduce_stream, materialize,
)
from e2_tts_tpu.ops.rotary import RotaryEmbedding
from e2_tts_tpu.utils.helpers import exists, default, divisible_by, xnor
from e2_tts_tpu.utils.typing import Bool, Float, Num, typecheck


class SpeechLayer(nnx.Module):
    """Per-layer speech-stream modules (reference speech_modules, e2_tts.py:658-671)."""

    def __init__(self, *, dim, heads, dim_head, ff_mult, kernel_size, dropout,
                 is_first_block, is_later_half, has_freq_axis, freq_heads,
                 freq_dim_head, cond_on_time, attn_laser, attn_laser_softclamp_value,
                 attn_fourier_embed_input, attn_fourier_embed_input_frac,
                 attn_kwargs, ff_kwargs, attn_backend, dtype, param_dtype, rngs):
        norm_klass = AdaptiveRMSNorm if cond_on_time else RMSNorm
        mk_norm = lambda: norm_klass(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) \
            if cond_on_time else RMSNorm(dim, param_dtype=param_dtype)
        mk_gate = lambda: (AdaLNZero(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
                           if cond_on_time else Identity())

        self.skip_proj = nnx.Linear(
            dim * 2, dim, use_bias=False, dtype=dtype, param_dtype=param_dtype,
            rngs=rngs) if is_later_half else None

        self.conv = DepthwiseConv(dim, kernel_size=kernel_size, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)

        self.attn_norm = mk_norm()
        self.attn_input_fourier_embed = (
            LinearFourierEmbed(dim, p=attn_fourier_embed_input_frac, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)
            if attn_fourier_embed_input else Identity())
        self.attn = Attention(
            dim, heads=heads, dim_head=dim_head, dropout=dropout,
            learned_value_residual_mix=not is_first_block,
            laser=attn_laser, laser_softclamp_value=attn_laser_softclamp_value,
            backend=attn_backend, dtype=dtype, param_dtype=param_dtype,
            rngs=rngs, **attn_kwargs)
        self.attn_adaln_zero = mk_gate()

        self.ff_norm = mk_norm()
        self.ff = FeedForward(dim, mult=ff_mult, dropout=dropout, glu=True,
                              dtype=dtype, param_dtype=param_dtype, rngs=rngs, **ff_kwargs)
        self.ff_adaln_zero = mk_gate()

        if has_freq_axis:
            self.freq_attn_norm = mk_norm()
            self.freq_attn = Attention(dim, heads=freq_heads, dim_head=freq_dim_head,
                                       backend=attn_backend, dtype=dtype,
                                       param_dtype=param_dtype, rngs=rngs)
            self.freq_attn_adaln_zero = mk_gate()
        else:
            self.freq_attn_norm = self.freq_attn = self.freq_attn_adaln_zero = None


class TextLayer(nnx.Module):
    """Per-layer text-stream modules (reference text_modules, e2_tts.py:683-707)."""

    def __init__(self, *, dim, dim_text, heads, dim_head, ff_mult, kernel_size,
                 dropout, is_first_block, is_last_text_layer, attn_laser,
                 attn_laser_softclamp_value, attn_kwargs, ff_kwargs,
                 attn_backend, dtype, param_dtype, rngs):
        self.conv = DepthwiseConv(dim_text, kernel_size=kernel_size, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)
        self.attn_norm = RMSNorm(dim_text, param_dtype=param_dtype)
        self.attn = Attention(
            dim_text, heads=heads, dim_head=dim_head, dropout=dropout,
            learned_value_residual_mix=not is_first_block,
            laser=attn_laser, laser_softclamp_value=attn_laser_softclamp_value,
            backend=attn_backend, dtype=dtype, param_dtype=param_dtype,
            rngs=rngs, **attn_kwargs)
        self.ff_norm = RMSNorm(dim_text, param_dtype=param_dtype)
        self.ff = FeedForward(dim_text, mult=ff_mult, dropout=dropout, glu=True,
                              dtype=dtype, param_dtype=param_dtype, rngs=rngs, **ff_kwargs)
        self.cross_condition = TextAudioCrossCondition(
            dim, dim_text, cond_audio_to_text=not is_last_text_layer,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs)


def _make_layer_fn(orig_batch: int, freq_seq_len: int, push_skip: bool,
                   has_freq_axis: bool):
    """One transformer layer as a standalone function over its modules and
    carried arrays — so it can be wrapped with nnx.remat (per-layer
    rematerialisation trades recompute for HBM, enabling larger batches)."""

    def layer_fn(sl, tl, t_hcs, s_hcs, x, text_embed, skip, mask, rotary,
                 text_rotary, freq_rotary, cond, freq_cond,
                 attn_v, text_v, freq_v, text_gate=None):
        # `cond` is either the raw time embedding (each module projects it
        # itself) or a dict of THIS layer's pre-projected gamma slices from
        # the layer-batched conditioning GEMM (_batched_time_cond)
        if isinstance(cond, dict):
            attn_norm_kw = dict(gamma_lin=cond['attn_norm'])
            ff_norm_kw = dict(gamma_lin=cond['ff_norm'])
            attn_gate_kw = dict(gamma_lin=cond['attn_gate'])
            ff_gate_kw = dict(gamma_lin=cond['ff_gate'])
            freq_norm_kw = freq_gate_kw = None   # built at the use site
        else:
            norm_kwargs = dict(condition=cond) if exists(cond) else {}
            attn_norm_kw = ff_norm_kw = norm_kwargs
            attn_gate_kw = ff_gate_kw = norm_kwargs
            freq_kwargs = (dict(condition=freq_cond)
                           if exists(freq_cond) else {})
            freq_norm_kw = freq_gate_kw = freq_kwargs

        # text stream first, then cross-condition (e2_tts.py:853-883).
        # Residuals flow between chained branches as LazyStreams: each
        # branch's depth connection fuses into the NEXT width kernel;
        # materialize() only at chain breaks (cross-condition, skips,
        # layer exit).
        if exists(text_embed) and exists(tl):
            t_conv_hc, t_attn_hc, t_ff_hc = t_hcs[0], t_hcs[1], t_hcs[2]

            t_in, add_residual = t_conv_hc(text_embed)
            text_embed = add_residual(tl.conv(t_in, mask=mask))

            t_in, add_residual = t_attn_hc(text_embed)
            t_attn_out, t_values = tl.attn(
                tl.attn_norm(t_in), rotary_pos_emb=text_rotary, mask=mask,
                value_residual=text_v)
            text_embed = add_residual(t_attn_out)
            text_v = default(text_v, t_values)

            t_in, add_residual = t_ff_hc(text_embed)
            text_embed = add_residual(tl.ff(tl.ff_norm(t_in)))

            x, text_embed = tl.cross_condition(
                materialize(x), materialize(text_embed), gate=text_gate)

        # UNet skips on the speech stream (e2_tts.py:887-896)
        x = materialize(x)
        skip_out = x if push_skip else None
        if exists(skip):
            x = jnp.concatenate((x, skip), axis=-1)
            x = sl.skip_proj(x)

        # position-generating convolution
        conv_hc, attn_hc, ff_hc = s_hcs[0], s_hcs[1], s_hcs[2]
        b_in, add_residual = conv_hc(x)
        x = add_residual(sl.conv(b_in, mask=mask))

        # attention
        b_in, add_residual = attn_hc(x)
        h = sl.attn_norm(b_in, **attn_norm_kw)
        h = sl.attn_input_fourier_embed(h)
        attn_out, values = sl.attn(
            h, rotary_pos_emb=rotary, mask=mask, value_residual=attn_v)
        attn_out = sl.attn_adaln_zero(attn_out, **attn_gate_kw)
        x = add_residual(attn_out)
        attn_v = default(attn_v, values)

        # attention across frequency tokens (e2_tts.py:920-932)
        if has_freq_axis:
            freq_hc = s_hcs[3]
            b_in, add_residual = freq_hc(x)
            # (b f) n d -> (b n) f d
            bf, n, d = b_in.shape
            h = b_in.reshape(orig_batch, freq_seq_len, n, d)
            h = h.transpose(0, 2, 1, 3).reshape(orig_batch * n, freq_seq_len, d)
            if freq_norm_kw is None:
                # pre-projected slices are per original batch row: repeat to
                # the (b n) batch of the frequency attention
                freq_norm_kw = dict(
                    gamma_lin=jnp.repeat(cond['freq_norm'], n, axis=0))
                freq_gate_kw = dict(
                    gamma_lin=jnp.repeat(cond['freq_gate'], n, axis=0))
            h = sl.freq_attn_norm(h, **freq_norm_kw)
            f_out, f_values = sl.freq_attn(
                h, rotary_pos_emb=freq_rotary, value_residual=freq_v)
            f_out = sl.freq_attn_adaln_zero(f_out, **freq_gate_kw)
            f_out = f_out.reshape(orig_batch, n, freq_seq_len, d)
            f_out = f_out.transpose(0, 2, 1, 3).reshape(bf, n, d)
            x = add_residual(f_out)
            freq_v = default(freq_v, f_values)

        # feedforward
        b_in, add_residual = ff_hc(x)
        ff_out = sl.ff(sl.ff_norm(b_in, **ff_norm_kw))
        ff_out = sl.ff_adaln_zero(ff_out, **ff_gate_kw)
        x = add_residual(ff_out)

        return materialize(x), text_embed, skip_out, attn_v, text_v, freq_v

    return layer_fn


class TransformerLayer(nnx.Module):
    """One backbone layer bundled — speech + text modules + their
    hyper-connections — so homogeneous layer groups can be created stacked
    (`nnx.vmap`) and driven by `nnx.scan` (``scan_layers`` mode).

    `ind` may be a traced array under vmapped creation: it only feeds the
    hyper-connection `layer_index` rotation (a jnp `.at[]` init), never a
    Python branch."""

    def __init__(self, *, ind, dim, dim_text, has_text, is_first_block,
                 is_later_half, is_last_text_layer, heads, dim_head, ff_mult,
                 text_heads, text_dim_head, text_ff_mult, kernel_size, dropout,
                 has_freq_axis, freq_heads, freq_dim_head, cond_on_time,
                 attn_laser, attn_laser_softclamp_value,
                 attn_fourier_embed_input, attn_fourier_embed_input_frac,
                 num_residual_streams, attn_kwargs, ff_kwargs, attn_backend,
                 dtype, param_dtype, rngs, text_layers_before=None):
        common = dict(attn_kwargs=dict(attn_kwargs), ff_kwargs=dict(ff_kwargs),
                      attn_backend=attn_backend, dtype=dtype,
                      param_dtype=param_dtype)
        self.speech = SpeechLayer(
            dim=dim, heads=heads, dim_head=dim_head, ff_mult=ff_mult,
            kernel_size=kernel_size, dropout=dropout,
            is_first_block=is_first_block, is_later_half=is_later_half,
            has_freq_axis=has_freq_axis, freq_heads=freq_heads,
            freq_dim_head=freq_dim_head, cond_on_time=cond_on_time,
            attn_laser=attn_laser,
            attn_laser_softclamp_value=attn_laser_softclamp_value,
            attn_fourier_embed_input=attn_fourier_embed_input,
            attn_fourier_embed_input_frac=attn_fourier_embed_input_frac,
            rngs=rngs, **common)

        # hyper-connection branch indices continue the unrolled counter order:
        # per layer [speech conv, attn, ff, (freq)], then [text conv, attn, ff].
        # `text_layers_before` = how many of the PRECEDING layers carry text
        # modules (min(ind, text_depth)) — with text_depth < depth the later
        # layers have no text HCs, so the counter advances by n_speech only
        n_speech = 3 + int(has_freq_axis)
        if text_layers_before is None:
            text_layers_before = ind if has_text else 0
        base = ind * n_speech + text_layers_before * 3
        mk_hc = lambda d, off: HyperConnection(
            d, num_residual_streams, base + off, param_dtype=param_dtype,
            rngs=rngs)
        self.speech_hcs = nnx.List([mk_hc(dim, o) for o in range(n_speech)])

        if has_text:
            self.text = TextLayer(
                dim=dim, dim_text=dim_text, heads=text_heads,
                dim_head=text_dim_head, ff_mult=text_ff_mult,
                kernel_size=kernel_size, dropout=dropout,
                is_first_block=is_first_block,
                is_last_text_layer=is_last_text_layer,
                attn_laser=attn_laser,
                attn_laser_softclamp_value=attn_laser_softclamp_value,
                rngs=rngs, **common)
            self.text_hcs = nnx.List(
                [mk_hc(dim_text, n_speech + o) for o in range(3)])
        else:
            self.text = None
            self.text_hcs = None


class Transformer(nnx.Module):

    @typecheck
    def __init__(
        self,
        *,
        dim: int,
        dim_text: int | None = None,       # defaults to dim // 2 (e2_tts.py:566)
        depth: int = 8,
        heads: int = 8,
        dim_head: int = 64,
        ff_mult: int = 4,
        text_depth: int | None = None,
        text_heads: int | None = None,
        text_dim_head: int | None = None,
        text_ff_mult: int | None = None,
        has_freq_axis: bool = False,
        freq_heads: int | None = None,
        freq_dim_head: int | None = None,
        cond_on_time: bool = True,
        abs_pos_emb: bool = True,
        max_seq_len: int = 8192,
        kernel_size: int = 31,
        dropout: float = 0.1,
        num_registers: int = 32,
        scale_residual: bool = False,   # accepted for API parity; the
                                        # reference takes but never uses it
                                        # (e2_tts.py:542)
        attn_laser: bool = False,
        attn_laser_softclamp_value: float = 15.0,
        attn_fourier_embed_input: bool = False,
        attn_fourier_embed_input_frac: float = 0.25,
        num_residual_streams: int = 4,
        attn_kwargs: dict = dict(gate_value_heads=True, softclamp_logits=True),
        ff_kwargs: dict = dict(),
        attn_backend: str = 'auto',
        remat: bool | str = False,
        scan_layers: bool = False,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs | None = None,
    ):
        rngs = default(rngs, nnx.Rngs(0))
        assert divisible_by(depth, 2), 'depth needs to be even'

        self.dim = dim
        self.depth = depth
        self.max_seq_len = max_seq_len
        self.cond_on_time = cond_on_time
        self.has_freq_axis = has_freq_axis
        # remat: False / True (full per-layer checkpoint) / the name of a
        # jax.checkpoint_policies policy (e.g. 'dots_with_no_batch_dims_saveable')
        # for SELECTIVE remat — save matmul outputs, recompute elementwise;
        # cheaper recompute than full remat while still bounding temp HBM.
        if isinstance(remat, str) and not hasattr(jax.checkpoint_policies, remat):
            raise ValueError(
                f'remat={remat!r} is not a jax.checkpoint_policies name; '
                f"try 'dots_with_no_batch_dims_saveable'")
        self.remat = remat
        self.num_registers = num_registers
        self.dtype = dtype

        dim_text = default(dim_text, dim // 2)
        self.dim_text = dim_text

        text_heads = default(text_heads, heads)
        text_dim_head = default(text_dim_head, dim_head)
        text_ff_mult = default(text_ff_mult, ff_mult)
        text_depth = default(text_depth, depth)
        assert 1 <= text_depth <= depth, \
            'must have at least 1 layer of text conditioning, but less than total number of speech layers'
        self.text_depth = text_depth

        freq_heads = default(freq_heads, heads)
        freq_dim_head = default(freq_dim_head, dim_head)

        # absolute positional embedding (learned table, e2_tts.py:560)
        self.abs_pos_emb = nnx.Embed(
            max_seq_len, dim, dtype=dtype, param_dtype=param_dtype,
            rngs=rngs) if abs_pos_emb else None

        # registers (ViT-registers; e2_tts.py:590-595)
        init_normal = nnx.initializers.normal(0.02)
        self.registers = nnx.Param(init_normal(rngs.params(), (num_registers, dim), param_dtype))
        self.text_registers = nnx.Param(init_normal(rngs.params(), (num_registers, dim_text), param_dtype))

        # rotary embeddings (stateless)
        self.rotary_emb = RotaryEmbedding(dim_head)
        self.text_rotary_emb = RotaryEmbedding(text_dim_head)
        self.freq_rotary_emb = RotaryEmbedding(freq_dim_head) if has_freq_axis else None

        # hyper connections
        self.num_residual_streams = num_residual_streams
        init_hyper_conn, _, _ = get_init_and_expand_reduce_stream_functions(
            num_residual_streams, disable=num_residual_streams == 1)

        # time conditioning MLP (e2_tts.py:618-625)
        if cond_on_time:
            self.time_fourier = RandomFourierEmbed(dim, rngs=rngs)
            self.time_mlp = nnx.Linear(dim + 1, dim, dtype=dtype,
                                       param_dtype=param_dtype, rngs=rngs)
        else:
            self.time_fourier = self.time_mlp = None

        common = dict(attn_kwargs=dict(attn_kwargs), ff_kwargs=dict(ff_kwargs),
                      attn_backend=attn_backend, dtype=dtype,
                      param_dtype=param_dtype)

        # scan_layers: compile-time mode. The two heterogeneous layers (first:
        # no value-residual mix; last: no audio->text cross-condition) stay
        # unrolled; the two homogeneous middle groups are created stacked with
        # nnx.vmap and driven by nnx.scan in __call__ — the layer body is
        # traced/compiled once per group instead of once per layer.
        self.scan_layers = scan_layers
        if scan_layers:
            assert depth >= 4, 'scan_layers needs depth >= 4'
            layer_cfg = dict(
                dim=dim, dim_text=dim_text, heads=heads, dim_head=dim_head,
                ff_mult=ff_mult, text_heads=text_heads,
                text_dim_head=text_dim_head, text_ff_mult=text_ff_mult,
                kernel_size=kernel_size, dropout=dropout,
                has_freq_axis=has_freq_axis, freq_heads=freq_heads,
                freq_dim_head=freq_dim_head, cond_on_time=cond_on_time,
                attn_laser=attn_laser,
                attn_laser_softclamp_value=attn_laser_softclamp_value,
                attn_fourier_embed_input=attn_fourier_embed_input,
                attn_fourier_embed_input_frac=attn_fourier_embed_input_frac,
                num_residual_streams=num_residual_streams, **common)

            t = text_depth

            def make_single(ind):
                return TransformerLayer(
                    ind=ind, has_text=ind < t, is_first_block=ind == 0,
                    is_later_half=ind >= depth // 2,
                    is_last_text_layer=ind == t - 1,
                    text_layers_before=min(ind, t), rngs=rngs, **layer_cfg)

            def make_group(a, b):
                has_text_seg = b <= t
                later_half = a >= depth // 2

                @nnx.split_rngs(splits=b - a)
                @nnx.vmap(in_axes=(0, 0), out_axes=0)
                def make(rngs_i, ind):
                    return TransformerLayer(
                        ind=ind, has_text=has_text_seg, is_first_block=False,
                        is_later_half=later_half, is_last_text_layer=False,
                        text_layers_before=jnp.minimum(ind, t),
                        rngs=rngs_i, **layer_cfg)
                return make(rngs, jnp.arange(a, b))

            # the middle inds [1, depth-1) split into homogeneous runs at the
            # points where a per-layer flag changes: the first/later-half
            # boundary (skip push vs pop + skip_proj), the text->speech-only
            # boundary, and the (unique, hence unrolled) last-text layer.
            # text_depth == depth reproduces the original two-group plan.
            bks = sorted({1, depth // 2, depth - 1}
                         | ({t - 1, t} & set(range(2, depth - 1))))
            self.layer_first = make_single(0)
            mods, plan = [], []
            for a, b in zip(bks[:-1], bks[1:]):
                push = b <= depth // 2
                if b - a == 1:
                    mods.append(make_single(a))
                    plan.append(('single', a, 1, push))
                else:
                    mods.append(make_group(a, b))
                    plan.append(('scan', a, b - a, push))
            self.scan_mid = nnx.List(mods)
            self.scan_plan = plan
            self.layer_last = make_single(depth - 1)

            self.final_norm = RMSNorm(dim, param_dtype=param_dtype)
            return

        self.speech_layers = nnx.List([])
        self.text_layers = nnx.List([])
        self.speech_hcs = nnx.List([])   # per layer: [conv, attn, ff, (freq)]
        self.text_hcs = nnx.List([])     # per layer: [conv, attn, ff] or None

        for ind in range(depth):
            is_first_block = ind == 0
            is_later_half = ind >= depth // 2
            has_text = ind < text_depth

            self.speech_layers.append(SpeechLayer(
                dim=dim, heads=heads, dim_head=dim_head, ff_mult=ff_mult,
                kernel_size=kernel_size, dropout=dropout,
                is_first_block=is_first_block, is_later_half=is_later_half,
                has_freq_axis=has_freq_axis, freq_heads=freq_heads,
                freq_dim_head=freq_dim_head, cond_on_time=cond_on_time,
                attn_laser=attn_laser,
                attn_laser_softclamp_value=attn_laser_softclamp_value,
                attn_fourier_embed_input=attn_fourier_embed_input,
                attn_fourier_embed_input_frac=attn_fourier_embed_input_frac,
                rngs=rngs, **common))

            hcs = nnx.List([init_hyper_conn(dim, rngs=rngs, param_dtype=param_dtype)
                            for _ in range(3 + int(has_freq_axis))])
            self.speech_hcs.append(hcs)

            if has_text:
                self.text_layers.append(TextLayer(
                    dim=dim, dim_text=dim_text, heads=text_heads,
                    dim_head=text_dim_head, ff_mult=text_ff_mult,
                    kernel_size=kernel_size, dropout=dropout,
                    is_first_block=is_first_block,
                    is_last_text_layer=ind == text_depth - 1,
                    attn_laser=attn_laser,
                    attn_laser_softclamp_value=attn_laser_softclamp_value,
                    rngs=rngs, **common))
                self.text_hcs.append(nnx.List(
                    [init_hyper_conn(dim_text, rngs=rngs, param_dtype=param_dtype)
                     for _ in range(3)]))
            else:
                self.text_layers.append(None)
                self.text_hcs.append(None)

        self.final_norm = RMSNorm(dim, param_dtype=param_dtype)

    @typecheck
    def __call__(
        self,
        x: Float[jax.Array, 'b n d'] | Float[jax.Array, 'b f n d'],
        times: Num[jax.Array, 'b'] | Num[jax.Array, ''] | None = None,
        mask: Bool[jax.Array, 'b n'] | None = None,
        text_embed: Float[jax.Array, 'b n dt'] | None = None,
        text_cond_gate: Num[jax.Array, 'b'] | None = None,
    ) -> Float[jax.Array, '...']:
        orig_batch = x.shape[0]
        assert xnor(x.ndim == 4, self.has_freq_axis), \
            '`has_freq_axis` must be set iff passing a 4-dim (b f n d) tensor'

        # keep the whole stack in the compute dtype: a wider input would
        # otherwise run the first half in fp32 (1/4 MXU rate) until the
        # bf16 skip_proj flips it mid-network — and break the scan-mode
        # carry dtype invariant
        if exists(self.dtype):
            x = x.astype(self.dtype)
            if exists(text_embed):
                text_embed = text_embed.astype(self.dtype)

        freq_seq_len = 1
        if self.has_freq_axis:
            freq_seq_len = x.shape[1]
            x = x.reshape(orig_batch * freq_seq_len, *x.shape[2:])  # (b f) n d
            if exists(text_embed):
                text_embed = jnp.repeat(text_embed, freq_seq_len, axis=0)
            if exists(mask):
                mask = jnp.repeat(mask, freq_seq_len, axis=0)
            if exists(text_cond_gate):
                text_cond_gate = jnp.repeat(text_cond_gate, freq_seq_len, axis=0)

        # per-sample gate on the text->audio cross-condition adds, shaped for
        # the (s, b, n, d) hyper-connection stream layout
        text_gate = None
        if exists(text_cond_gate):
            text_gate = text_cond_gate[None, :, None, None]

        batch, seq_len = x.shape[0], x.shape[1]

        assert not (exists(times) ^ self.cond_on_time), \
            '`times` must be passed in iff `cond_on_time` is set'

        # absolute positions (before registers, e2_tts.py:760-763)
        if exists(self.abs_pos_emb):
            assert seq_len <= self.max_seq_len, \
                f'{seq_len} exceeds the set `max_seq_len` ({self.max_seq_len})'
            x = x + self.abs_pos_emb(jnp.arange(seq_len))

        # prepend registers, pad mask with True (e2_tts.py:767-771)
        r = self.num_registers
        registers = jnp.broadcast_to(
            self.registers[...].astype(x.dtype)[None], (batch, r, self.dim))
        x = jnp.concatenate((registers, x), axis=1)
        if exists(mask):
            mask = jnp.pad(mask, ((0, 0), (r, 0)), constant_values=True)

        packed_len = x.shape[1]

        # time conditioning (e2_tts.py:778-789)
        norm_kwargs, freq_norm_kwargs = {}, {}
        times_base = None
        if exists(times):
            if times.ndim == 0:
                times = jnp.broadcast_to(times, (orig_batch,))
            times = jax.nn.silu(self.time_mlp(self.time_fourier(times))).astype(x.dtype)
            times_base = times                                        # (b, d)
            if self.has_freq_axis:
                freq_times = jnp.repeat(times, packed_len, axis=0)   # (b*n, d)
                freq_norm_kwargs = dict(condition=freq_times)
            times = jnp.repeat(times, freq_seq_len, axis=0)           # ((b f), d)
            norm_kwargs = dict(condition=times)

        # rotary tables
        rotary = self.rotary_emb.forward_from_seq_len(packed_len)
        text_rotary = freq_rotary = None
        if exists(text_embed):
            text_rotary = self.text_rotary_emb.forward_from_seq_len(packed_len)
            text_registers = jnp.broadcast_to(
                self.text_registers[...].astype(text_embed.dtype)[None],
                (batch, r, self.dim_text))
            text_embed = jnp.concatenate((text_registers, text_embed), axis=1)
        if self.has_freq_axis:
            freq_rotary = self.freq_rotary_emb.forward_from_seq_len(freq_seq_len)

        # expand hyper-connection streams: (s, b, n, d)
        s = self.num_residual_streams
        x = expand_stream(x, s)
        if exists(text_embed):
            text_embed = expand_stream(text_embed, s)

        skips = []
        attn_v = None
        text_v = None
        freq_v = None

        cond = norm_kwargs.get('condition')
        freq_cond = freq_norm_kwargs.get('condition')
        text_rot = text_rotary
        freq_rot = freq_rotary

        # layer-batched time conditioning (unrolled path): all per-layer
        # AdaptiveRMSNorm/AdaLNZero projections share the SAME (b, dim) time
        # embedding, so 4 x depth separate (b,dim)x(dim,dim) GEMMs collapse
        # into ONE (b,dim)x(dim, 4*depth*dim) GEMM whose output is sliced per
        # layer (the dW adjoints batch identically in the backward)
        cond_packs = None
        if exists(times_base) and not self.scan_layers:
            cond_packs = self._batched_time_cond(times_base, freq_seq_len)

        if self.scan_layers:
            x, text_embed = self._run_scan(
                x, text_embed, mask, rotary, text_rot, freq_rot, cond,
                freq_cond, text_gate, orig_batch, freq_seq_len)
            x = x[:, :, r:, :]
            x = reduce_stream(x)
            if self.has_freq_axis:
                x = x.reshape(orig_batch, freq_seq_len, *x.shape[1:])
            return self.final_norm(x)

        for ind in range(self.depth):
            layer = ind + 1
            is_first_half = layer <= self.depth // 2

            layer_fn = _make_layer_fn(orig_batch, freq_seq_len,
                                      push_skip=is_first_half,
                                      has_freq_axis=self.has_freq_axis)
            if self.remat:
                layer_fn = self._remat_wrap(layer_fn)

            skip_in = None if is_first_half else skips.pop()

            layer_cond = cond_packs[ind] if exists(cond_packs) else cond
            layer_freq_cond = None if exists(cond_packs) else freq_cond

            x, text_embed, skip_out, attn_v, text_v, freq_v = layer_fn(
                self.speech_layers[ind], self.text_layers[ind],
                self.text_hcs[ind], self.speech_hcs[ind],
                x, text_embed, skip_in, mask, rotary, text_rot, freq_rot,
                layer_cond, layer_freq_cond, attn_v, text_v, freq_v, text_gate)

            if is_first_half:
                skips.append(skip_out)

        assert len(skips) == 0

        # drop registers, reduce hyper-connection streams (e2_tts.py:941-947)
        x = x[:, :, r:, :]
        x = reduce_stream(x)

        if self.has_freq_axis:
            x = x.reshape(orig_batch, freq_seq_len, *x.shape[1:])

        return self.final_norm(x)

    def _remat_wrap(self, layer_fn):
        """Apply the configured rematerialisation to a layer fn: full
        checkpoint for remat=True, or a named jax.checkpoint_policies
        selective policy for remat='<policy name>'."""
        if isinstance(self.remat, str):
            return nnx.remat(
                layer_fn, policy=getattr(jax.checkpoint_policies, self.remat))
        return nnx.remat(layer_fn)

    def _batched_time_cond(self, cond, freq_seq_len=1):
        """Project the shared time embedding through EVERY layer's
        conditioning heads in one GEMM (see __call__). Params stay per-module
        (checkpoint/EMA/TP layouts unchanged); kernels are concatenated at
        trace time and the (b, total) product sliced back per layer.

        ``cond`` is the PRE-repeat (b, dim) time embedding. Returns a list
        over depth of dicts with keys ``attn_norm / ff_norm / attn_gate /
        ff_gate`` (+ ``freq_norm / freq_gate`` with a frequency axis):
        AdaptiveRMSNorm gammas pre-+1, AdaLNZero logits pre-sigmoid (bias
        included). Speech slices are repeated to the ((b f), dim) batch of
        the folded freq layout; freq slices stay (b, dim) — the layer
        repeats them to its (b n) freq-attention batch."""
        from flax.nnx.nn.dtypes import promote_dtype

        entries = []   # (layer_ind, key, kernel, bias | None)
        for ind, sl in enumerate(self.speech_layers):
            entries.append((ind, 'attn_norm', sl.attn_norm.to_gamma, None))
            entries.append((ind, 'ff_norm', sl.ff_norm.to_gamma, None))
            entries.append((ind, 'attn_gate', sl.attn_adaln_zero.to_gamma,
                            sl.attn_adaln_zero.to_gamma.bias))
            entries.append((ind, 'ff_gate', sl.ff_adaln_zero.to_gamma,
                            sl.ff_adaln_zero.to_gamma.bias))
            if exists(sl.freq_attn_norm):
                entries.append((ind, 'freq_norm', sl.freq_attn_norm.to_gamma,
                                None))
                entries.append((ind, 'freq_gate',
                                sl.freq_attn_adaln_zero.to_gamma,
                                sl.freq_attn_adaln_zero.to_gamma.bias))

        kernels = [lin.kernel[...] for _, _, lin, _ in entries]
        widths = [k.shape[1] for k in kernels]
        w = jnp.concatenate(kernels, axis=1)
        cond, w = promote_dtype((cond, w), dtype=entries[0][2].dtype)
        g = cond @ w   # (b, sum(widths))

        packs = [dict() for _ in range(self.depth)]
        off = 0
        for (ind, key, _, bias), width in zip(entries, widths):
            sl_g = g[:, off:off + width]
            off += width
            if exists(bias):
                sl_g = sl_g + bias[...].astype(sl_g.dtype)
            if freq_seq_len > 1 and not key.startswith('freq'):
                sl_g = jnp.repeat(sl_g, freq_seq_len, axis=0)
            packs[ind][key] = sl_g
        return packs

    def _run_scan(self, x, text_embed, mask, rotary, text_rot, freq_rot,
                  cond, freq_cond, text_gate, orig_batch, freq_seq_len):
        """scan_layers forward: first/last layers unrolled (they are the two
        heterogeneous ones), the homogeneous middle halves under nnx.scan.

        UNet skip routing is LIFO: the first layer's skip feeds the last
        layer directly; the first middle group's stacked skips feed the
        second middle group in reverse."""
        mk = lambda push: _make_layer_fn(orig_batch, freq_seq_len,
                                         push_skip=push,
                                         has_freq_axis=self.has_freq_axis)
        layer_fn_push = mk(True)
        layer_fn_pop = mk(False)
        # the scanned groups ALWAYS remat their body: lax.scan's backward
        # saves every iteration's intermediates with no cross-layer
        # rematerialisation, which at the flagship config needs ~19 GB of
        # temp HBM (measured via compiled.memory_analysis()) vs the 16 GB
        # chip. Body remat keeps only the carry per step.
        scan_fn_push = nnx.remat(layer_fn_push)
        scan_fn_pop = nnx.remat(layer_fn_pop)
        if self.remat:   # first/last unrolled layers follow the user flag
            layer_fn_push = self._remat_wrap(layer_fn_push)
            layer_fn_pop = self._remat_wrap(layer_fn_pop)

        def call(fn, layer, x, te, skip, av, tv, fv):
            return fn(layer.speech, layer.text, layer.text_hcs,
                      layer.speech_hcs, x, te, skip, mask, rotary, text_rot,
                      freq_rot, cond, freq_cond, av, tv, fv, text_gate)

        x, te, skip0, av, tv, fv = call(
            layer_fn_push, self.layer_first, x, text_embed, None,
            None, None, None)
        # UNet skips are LIFO across the WHOLE stack; with text_depth < depth
        # the pop segments don't mirror the push segments, so keep one flat
        # list of per-layer skip arrays (scan segments contribute their
        # stacked output unstacked) and restack what each pop consumes
        skips = [skip0]

        # vmap-created groups keep ONE rng key per stream (flax convention):
        # when dropout is live, split per layer at call time so draws differ
        # across layers; in eval no rng is drawn, so broadcast the RngState
        # (splitting would mutate rng counts, which breaks under plain
        # jax.grad closures and is pointless work)
        attn0 = self.layer_first.speech.attn
        training = attn0.dropout_rate > 0.0 and not attn0.deterministic

        for (kind, _start, count, push), mod in zip(self.scan_plan,
                                                    self.scan_mid):
            if kind == 'single':
                if push:
                    x, te, skip, av, tv, fv = call(
                        layer_fn_push, mod, x, te, None, av, tv, fv)
                    skips.append(skip)
                else:
                    x, te, _, av, tv, fv = call(
                        layer_fn_pop, mod, x, te, skips.pop(), av, tv, fv)
                continue

            if training:
                maybe_split = nnx.split_rngs(splits=count)
                layer_axes = 0
            else:
                maybe_split = lambda f: f
                layer_axes = nnx.StateAxes({nnx.RngState: None, ...: 0})

            if push:
                @maybe_split
                @nnx.scan(in_axes=(nnx.Carry, layer_axes),
                          out_axes=(nnx.Carry, 0))
                def run_push(carry, layers):
                    x, te, av, tv, fv = carry
                    x, te, skip, av, tv, fv = call(scan_fn_push, layers, x,
                                                   te, None, av, tv, fv)
                    return (x, te, av, tv, fv), skip

                (x, te, av, tv, fv), seg_skips = run_push(
                    (x, te, av, tv, fv), mod)
                skips.extend(seg_skips[i] for i in range(count))
            else:
                stacked = jnp.stack([skips.pop() for _ in range(count)])

                @maybe_split
                @nnx.scan(in_axes=(nnx.Carry, layer_axes, 0),
                          out_axes=nnx.Carry)
                def run_pop(carry, layers, skip):
                    x, te, av, tv, fv = carry
                    x, te, _, av, tv, fv = call(scan_fn_pop, layers, x, te,
                                                skip, av, tv, fv)
                    return (x, te, av, tv, fv)

                x, te, av, tv, fv = run_pop((x, te, av, tv, fv), mod, stacked)

        x, te, _, av, tv, fv = call(layer_fn_pop, self.layer_last, x, te,
                                    skips.pop(), av, tv, fv)
        assert not skips
        return x, te
