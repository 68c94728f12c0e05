"""E2TTS — conditional flow-matching TTS (reference: e2_tts.py:1115-1595).

Training: mask-infilling flow matching. Sample noise x0, draw t ~ U(0,1),
form w = (1-t)x0 + t*x1 and a random span of the mel to infill; the
transformer predicts the flow x1 - x0 and the MSE is restricted to the span.

Inference: integrate the learned velocity field from noise over a fixed time
grid (`lax.scan` midpoint/euler/rk4 — ops/ode.py) with classifier-free
guidance, APG parallel-component removal (arXiv 2410.02416) and an optional
autoguidance null model (arXiv 2406.02507).

TPU design notes:
- All shapes under jit are static; raggedness is carried by masks.
- Text-conditioning drop is resolved on the HOST as a per-step bool (the
  reference also draws it host-side, e2_tts.py:1261). Passed through jit as
  a static arg it yields exactly two cached step variants — same semantics,
  no dynamic graph, and the reference's DDP `find_unused_parameters` problem
  disappears by construction.
- The sampler pads the generation length to a static bucket so repeated
  `sample()` calls reuse the compiled ODE loop.
"""

from __future__ import annotations

import importlib.util
from collections import namedtuple
from functools import partial
from random import random as py_random

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from e2_tts_tpu.models.blocks import CharacterEmbed, InterpolatedCharacterEmbed
from e2_tts_tpu.models.duration import DurationPredictor
from e2_tts_tpu.models.transformer import Transformer
from e2_tts_tpu.ops.mel import MelSpec, db_to_amplitude
from e2_tts_tpu.ops.ode import odeint
from e2_tts_tpu.text.tokenizer import resolve_tokenizer
from e2_tts_tpu.utils.helpers import (
    exists, default, set_if_missing_key, round_up_to_multiple,
)
from e2_tts_tpu.utils.masking import lens_to_mask, mask_from_frac_lengths
from e2_tts_tpu.utils.tensor import project
from e2_tts_tpu.utils.typing import Float, Int, typecheck

LossBreakdown = namedtuple('LossBreakdown', ['flow', 'velocity_consistency'])

E2TTSReturn = namedtuple('E2TTS', ['loss', 'cond', 'pred_flow', 'pred_data', 'loss_breakdown'])


@partial(nnx.jit, static_argnames=('steps', 'method', 'cfg_strength',
                                   'remove_parallel_component',
                                   'keep_parallel_frac', 'atol', 'rtol',
                                   'batched_cfg'))
def _sample_ode(model, null_model, cond, cond_mask, mask, text, key, *,
                steps, method, cfg_strength, remove_parallel_component=True,
                keep_parallel_frac=0.0, atol=None, rtol=None,
                batched_cfg=False):
    """Jitted ODE sampling core. Cached across `sample()` calls (keyed on the
    module graph + static args + shapes) — the whole NFE loop is one compiled
    `lax.scan` on device."""
    batch = cond.shape[0]
    y0 = jax.random.normal(key, cond.shape, dtype=cond.dtype)
    t = jnp.linspace(0.0, 1.0, steps)
    step_cond = jnp.where(cond_mask, cond, 0.0)

    def fn(t_scalar, x):
        return model.cfg_transformer_with_pred_head(
            x, step_cond, jnp.broadcast_to(t_scalar, (batch,)),
            text=text, mask=mask,
            cfg_strength=cfg_strength, cfg_null_model=null_model,
            remove_parallel_component=remove_parallel_component,
            keep_parallel_frac=keep_parallel_frac, batched_cfg=batched_cfg)

    sampled = odeint(fn, y0, t, method=method, atol=atol, rtol=rtol)
    return jnp.where(cond_mask, cond, sampled)


def masked_mse(pred, target, span_mask):
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    err = jnp.where(span_mask[..., None], err, 0.0)
    denom = jnp.clip(span_mask.astype(jnp.float32).sum() * pred.shape[-1], min=1.0)
    return err.sum() / denom


class _StaticBox:
    """Opaque holder: keeps an object (e.g. the frozen JAX vocoder) out of
    the surrounding module's nnx graph — not traversed, trained, EMA'd or
    checkpointed with the model."""

    def __init__(self, value):
        self.value = value


class E2TTS(nnx.Module):

    @typecheck
    def __init__(
        self,
        transformer: dict | Transformer | None = None,
        duration_predictor: dict | DurationPredictor | None = None,
        odeint_kwargs: dict = dict(atol=1e-5, rtol=1e-5, method='midpoint'),
        cond_drop_prob: float = 0.25,
        num_channels: int | None = None,
        mel_spec_module: MelSpec | None = None,
        num_freq_tokens: int = 1,
        char_embed_kwargs: dict = dict(),
        mel_spec_kwargs: dict = dict(),
        frac_lengths_mask: tuple[float, float] = (0.7, 1.0),
        concat_cond: bool = False,
        interpolated_text: bool = False,
        text_num_embeds: int | None = None,
        tokenizer='char_utf8',
        use_vocos: bool | None = None,  # None = auto: True iff the torch
                                   # `vocos` package is importable (reference
                                   # defaults True, e2_tts.py:1141, and ships
                                   # audio out of the box; without the
                                   # package we fall back to raw-mel output)
        pretrained_vocos_path: str = 'charactr/vocos-mel-24khz',
        vocos_backend: str = 'torch',   # 'torch' (reference parity, host
                                   # loop) | 'jax' (e2_tts_tpu.vocoder.Vocos:
                                   # batched mel->wave on device; pass
                                   # vocos_weights to load the published
                                   # torch checkpoint's state dict)
        vocos_weights=None,        # None | dict | path to pytorch_model.bin
        sampling_rate: int | None = None,
        velocity_consistency_weight: float = 0.0,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs | None = None,
    ):
        rngs = default(rngs, nnx.Rngs(0))

        assert num_freq_tokens > 0
        self.num_freq_tokens = num_freq_tokens
        self.has_freq_axis = num_freq_tokens > 1

        if isinstance(transformer, dict):
            transformer = dict(transformer)
            set_if_missing_key(transformer, 'has_freq_axis', self.has_freq_axis)
            transformer = Transformer(
                **transformer, cond_on_time=True,
                dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        assert transformer.has_freq_axis == self.has_freq_axis
        self.transformer = transformer

        if isinstance(duration_predictor, dict):
            duration_predictor = DurationPredictor(
                **duration_predictor, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.duration_predictor = duration_predictor

        dim = transformer.dim
        dim_text = transformer.dim_text
        self.dim = dim
        self.dim_text = dim_text

        self.frac_lengths_mask = frac_lengths_mask
        self.odeint_kwargs = dict(odeint_kwargs)

        self.mel_spec = default(mel_spec_module, MelSpec(**mel_spec_kwargs))
        num_channels = default(num_channels, self.mel_spec.n_mel_channels)
        self.num_channels = num_channels
        self.sampling_rate = default(sampling_rate,
                                     getattr(self.mel_spec, 'sampling_rate', None))

        # condition handling: concat+project (voicebox-like) or project both
        # and sum (e2_tts.py:1196-1204)
        self.concat_cond = concat_cond
        linear = lambda i, o: nnx.Linear(i, o, dtype=dtype,
                                         param_dtype=param_dtype, rngs=rngs)
        if concat_cond:
            self.proj_in = linear(num_channels * 2, dim * num_freq_tokens)
            self.cond_proj_in = None
        else:
            self.proj_in = linear(num_channels, dim * num_freq_tokens)
            self.cond_proj_in = linear(num_channels, dim * num_freq_tokens)

        self.to_pred = linear(dim, num_channels)

        self.tokenizer, text_num_embeds = resolve_tokenizer(tokenizer, text_num_embeds)
        self.cond_drop_prob = cond_drop_prob

        text_embed_klass = CharacterEmbed if not interpolated_text else InterpolatedCharacterEmbed
        self.embed_text = text_embed_klass(dim_text, num_embeds=text_num_embeds,
                                           dtype=dtype, param_dtype=param_dtype,
                                           rngs=rngs, **char_embed_kwargs)

        self.velocity_consistency_weight = velocity_consistency_weight

        if not exists(use_vocos):
            # reference parity when possible: default the vocoder ON exactly
            # when the torch `vocos` package can actually provide it
            use_vocos = importlib.util.find_spec('vocos') is not None
        self.use_vocos = use_vocos
        self.pretrained_vocos_path = pretrained_vocos_path
        assert vocos_backend in ('torch', 'jax')
        self.vocos_backend = vocos_backend
        self._vocos = None
        if use_vocos and vocos_backend == 'jax':
            from e2_tts_tpu.vocoder import Vocos as JaxVocos
            jv = JaxVocos(input_channels=num_channels,
                          param_dtype=param_dtype, rngs=nnx.Rngs(0))
            if exists(vocos_weights):
                if isinstance(vocos_weights, (str, bytes)):
                    import torch
                    vocos_weights = torch.load(vocos_weights,
                                               map_location='cpu')
                jv.load_torch_state_dict(vocos_weights)
            # boxed so the (frozen) vocoder stays out of this module's nnx
            # graph: the trainer/EMA/checkpoint track E2TTS params only
            self._vocos = _StaticBox(jv)

        self.rngs = rngs
        self.deterministic = False

    # -- helpers -------------------------------------------------------------

    @property
    def vocos(self):
        if not self.use_vocos:
            return None
        if isinstance(self._vocos, _StaticBox):    # jax backend, pre-built
            return self._vocos.value
        if self._vocos is None:
            from vocos import Vocos  # torch package; host-side decode only
            self._vocos = Vocos.from_pretrained(self.pretrained_vocos_path)
        return self._vocos

    def _maybe_split_freq(self, x):
        if not self.has_freq_axis:
            return x
        b, n, _ = x.shape
        return x.reshape(b, n, self.num_freq_tokens, self.dim).transpose(0, 2, 1, 3)

    def _as_mel(self, inp):
        """Accept (b, n, d) mel or (b, nw) raw wave (e2_tts.py:1482-1485)."""
        if inp.ndim == 2:
            inp = self.mel_spec(inp).transpose(0, 2, 1)
            assert inp.shape[-1] == self.num_channels
        return inp

    def _tokenize(self, text, batch):
        if isinstance(text, list):
            text = jnp.asarray(self.tokenizer(text))
        if exists(text):
            assert text.shape[0] == batch, (
                f'got {text.shape[0]} texts for a batch of {batch} audio samples')
        return text

    # -- prediction heads ----------------------------------------------------

    def transformer_with_pred_head(
        self,
        x: jax.Array,              # (b, n, d)
        cond: jax.Array,           # (b, n, d)
        times: jax.Array,          # (b,)
        mask: jax.Array | None = None,
        text: jax.Array | None = None,
        drop_text_cond: bool | None = None,
        return_drop_text_cond: bool = False,
    ):
        """Core prediction pass (e2_tts.py:1250-1301). ``drop_text_cond`` is a
        host-side (static) bool — defaults to a per-step coin during training,
        matching the reference's python `random()` draw (e2_tts.py:1261)."""
        seq_len = x.shape[-2]
        training = not self.deterministic
        drop_text_cond = default(
            drop_text_cond, training and py_random() < self.cond_drop_prob)

        if self.concat_cond:
            x = jnp.concatenate((cond, x), axis=-1)

        x = self._maybe_split_freq(self.proj_in(x))

        if not self.concat_cond:
            cond = self._maybe_split_freq(self.cond_proj_in(cond))
            x = x + cond

        text_embed = None
        if exists(text) and not drop_text_cond:
            text_embed = self.embed_text(text, seq_len, mask=mask)

        embed = self.transformer(x, times=times, mask=mask, text_embed=text_embed)

        if self.has_freq_axis:
            embed = embed.mean(axis=1)

        pred = self.to_pred(embed)

        if not return_drop_text_cond:
            return pred
        return pred, drop_text_cond

    def _cfg_batched_preds(self, x, cond, times, *, text, mask):
        """Run the CFG cond and null passes as ONE 2x-batched forward.

        The reference runs two sequential full passes (e2_tts.py:1313-1321);
        at sampling batch 1 that leaves the chip half idle. The only path by
        which text affects the audio stream is the text->audio add inside
        TextAudioCrossCondition, so a 2x batch whose null half gates that add
        to zero is exactly equivalent to a pass with no text conditioning —
        while the audio stream rides the MXU at twice the batch."""
        seq_len = x.shape[-2]
        batch = x.shape[0]

        if self.concat_cond:
            x = jnp.concatenate((cond, x), axis=-1)
        x = self._maybe_split_freq(self.proj_in(x))
        if not self.concat_cond:
            x = x + self._maybe_split_freq(self.cond_proj_in(cond))

        text_embed = self.embed_text(text, seq_len, mask=mask)

        dup = lambda t: (jnp.concatenate((t, t), axis=0) if exists(t) else None)
        gate = jnp.concatenate((jnp.ones((batch,), jnp.float32),
                                jnp.zeros((batch,), jnp.float32)))
        embed = self.transformer(dup(x), times=dup(times), mask=dup(mask),
                                 text_embed=dup(text_embed),
                                 text_cond_gate=gate)
        if self.has_freq_axis:
            embed = embed.mean(axis=1)
        pred2 = self.to_pred(embed)
        return pred2[:batch], pred2[batch:]

    def cfg_transformer_with_pred_head(
        self,
        x,
        cond,
        times,
        *,
        text=None,
        mask=None,
        cfg_strength: float = 1.0,
        cfg_null_model: 'E2TTS | None' = None,
        remove_parallel_component: bool = True,
        keep_parallel_frac: float = 0.0,
        batched_cfg: bool = True,
    ):
        """Classifier-free guidance with APG parallel-component removal
        (e2_tts.py:1303-1330) and the autoguidance hook (cfg_null_model).
        With `batched_cfg` the cond+null passes run as one
        2x-batched forward (see _cfg_batched_preds); autoguidance or absent
        text falls back to the sequential two-pass form."""
        if cfg_strength < 1e-5:
            return self.transformer_with_pred_head(
                x, cond, times, mask=mask, text=text, drop_text_cond=False)

        if batched_cfg and not exists(cfg_null_model) and exists(text):
            pred, null_pred = self._cfg_batched_preds(
                x, cond, times, text=text, mask=mask)
        else:
            pred = self.transformer_with_pred_head(
                x, cond, times, mask=mask, text=text, drop_text_cond=False)
            null_drop_text_cond = not exists(cfg_null_model)
            null_model = default(cfg_null_model, self)
            null_pred = null_model.transformer_with_pred_head(
                x, cond, times, mask=mask, text=text,
                drop_text_cond=null_drop_text_cond)

        cfg_update = pred - null_pred

        if remove_parallel_component:
            parallel, orthogonal = project(cfg_update, pred)
            cfg_update = orthogonal + parallel * keep_parallel_frac

        return pred + cfg_update * cfg_strength

    # -- sampling ------------------------------------------------------------

    @typecheck
    def sample(
        self,
        cond: Float[jax.Array, 'b n d'] | Float[jax.Array, 'b nw'],
        *,
        text: Int[jax.Array, 'b nt'] | list[str] | None = None,
        lens: Int[jax.Array, 'b'] | None = None,
        duration: int | Int[jax.Array, 'b'] | None = None,
        steps: int = 32,
        cfg_strength: float = 1.0,
        cfg_null_model: 'E2TTS | None' = None,
        max_duration: int = 4096,
        vocoder=None,
        return_raw_output: bool | None = None,
        save_to_filename: str | None = None,
        key: jax.Array | None = None,
        duration_bucket: int = 128,   # pad gen length to a bucket: jit reuse
        batched_cfg: bool = False,    # one 2x-batched CFG pass vs two
                                      # sequential passes. Measured at B=1
                                      # NFE=32 on v5e: sequential RTF 0.039
                                      # vs batched 0.060 — the sequential
                                      # null pass runs NO text stream at
                                      # all, which beats the batching win
    ):
        """Zero-shot inference (e2_tts.py:1332-1466): prompt mel + text ->
        infilled mel (or waveform when a vocoder is attached)."""
        from e2_tts_tpu.parallel.sp import sp_paused
        was_training = not self.deterministic
        self.eval()
        try:
            # training-time sequence parallelism stays out of inference:
            # sampling lengths (batch-1 prompts, duration buckets) rarely
            # divide the ring's seq axis — pause the routing, restore after
            with sp_paused(self, cfg_null_model):
                return self._sample(
                    cond, text=text, lens=lens, duration=duration, steps=steps,
                    cfg_strength=cfg_strength, cfg_null_model=cfg_null_model,
                    max_duration=max_duration, vocoder=vocoder,
                    return_raw_output=return_raw_output,
                    save_to_filename=save_to_filename, key=key,
                    duration_bucket=duration_bucket, batched_cfg=batched_cfg)
        finally:
            if was_training:
                self.train()

    def _sample(self, cond, *, text, lens, duration, steps, cfg_strength,
                cfg_null_model, max_duration, vocoder, return_raw_output,
                save_to_filename, key, duration_bucket, batched_cfg):
        cond = self._as_mel(cond)
        batch, cond_seq_len = cond.shape[0], cond.shape[1]

        if not exists(lens):
            lens = jnp.full((batch,), cond_seq_len, dtype=jnp.int32)

        text = self._tokenize(text, batch)
        if exists(text):
            text_lens = (text != -1).sum(axis=-1).astype(lens.dtype)
            lens = jnp.maximum(text_lens, lens)   # e2_tts.py:1371-1373

        # duration: given, or predicted (e2_tts.py:1379-1387)
        if exists(duration):
            if isinstance(duration, int):
                duration = jnp.full((batch,), duration, dtype=jnp.int32)
        elif exists(self.duration_predictor):
            duration = self.duration_predictor(
                cond, text=text, lens=lens, return_loss=False).astype(jnp.int32)
        else:
            raise ValueError('`duration` must be given when no duration predictor is attached')

        duration = jnp.maximum(lens + 1, duration)   # generate at least one frame
        duration = jnp.clip(duration, max=max_duration)
        assert duration.shape[0] == batch

        # static padded generation length (bucketed for jit-cache reuse)
        tmax = int(duration.max())
        padded_t = min(round_up_to_multiple(tmax, duration_bucket), max(max_duration, tmax))

        # truncate before padding: the prompt may be longer than the bucketed
        # generation length (the reference's F.pad truncates via negative
        # pads, e2_tts.py:1393; jnp.pad rejects negative widths)
        cond = cond[:, :padded_t]
        cond = jnp.pad(cond, ((0, 0), (0, padded_t - cond.shape[1]), (0, 0)))
        cond_mask = lens_to_mask(lens, length=padded_t)[..., None]
        mask = lens_to_mask(duration, length=padded_t)

        key = default(key, self.rngs.sample())

        out = _sample_ode(
            self, cfg_null_model, cond, cond_mask, mask, text, key,
            steps=steps, method=self.odeint_kwargs.get('method', 'midpoint'),
            atol=self.odeint_kwargs.get('atol'),
            rtol=self.odeint_kwargs.get('rtol'),
            cfg_strength=float(cfg_strength), batched_cfg=batched_cfg)
        out = out[:, :tmax]
        mask = mask[:, :tmax]

        if exists(return_raw_output) and return_raw_output:
            return out

        if exists(vocoder):
            assert not self.use_vocos, \
                '`use_vocos` should not be on when passing a custom `vocoder`'
            out = vocoder(out.transpose(0, 2, 1))    # expects (b, d, n)
        elif self.use_vocos:
            out = self._vocos_decode(out, mask)

        if exists(save_to_filename):
            # saving needs decoded audio, not raw mel (e2_tts.py:1454)
            assert exists(vocoder) or self.use_vocos, (
                '`save_to_filename` requires a vocoder: pass `vocoder=` or '
                'construct with `use_vocos=True`')
            self._save_audio(out, save_to_filename)

        return out

    def _vocos_decode(self, mels, mask):
        """Vocos decode (e2_tts.py:1440-1451), including the reference's
        DB_to_amplitude quirk (treats ln-mel as dB). The 'jax' backend runs
        the whole batch on device in one jit; the 'torch' backend loops per
        sample on host like the reference."""
        if self.vocos_backend == 'jax':
            from e2_tts_tpu.vocoder.vocos import _jit_decode
            amp = db_to_amplitude(mels, 1.0, 0.5)
            # zero frames beyond each sample's length: the batched decode
            # otherwise feeds other samples' padding into ConvNeXt receptive
            # fields / ISTFT overlap-add near shorter samples' tails (the
            # torch path decodes exact-length mels per sample on host)
            amp = jnp.where(mask[..., None], amp, 0.0)
            wav = _jit_decode(self.vocos, amp)     # (b, (n-1)*hop) on device
            hop = self.vocos.head.hop_length
            lens = np.asarray(jnp.sum(mask, axis=-1))
            return [wav[i, : max(int(l) - 1, 0) * hop]
                    for i, l in enumerate(lens)]

        import torch
        audio = []
        mels_np = np.asarray(mels)
        mask_np = np.asarray(mask)
        for mel, m in zip(mels_np, mask_np):
            one = np.asarray(db_to_amplitude(jnp.asarray(mel[m]), 1.0, 0.5))
            # .copy(): jnp->np arrays are read-only; torch.from_numpy warns
            wav = self.vocos.decode(torch.from_numpy(one.T[None].copy()))
            audio.append(jnp.asarray(wav[0].numpy()))
        return audio

    def _save_audio(self, audio_list, filename):
        from pathlib import Path
        from e2_tts_tpu.utils.audio_io import save_wav
        assert exists(self.sampling_rate)
        path = Path(filename)
        path.parents[0].mkdir(exist_ok=True, parents=True)
        for ind, one_audio in enumerate(audio_list):
            save_wav(str(path.parents[0] / f'{ind + 1}.{path.name}'),
                     np.asarray(one_audio), self.sampling_rate)

    # -- training loss -------------------------------------------------------

    def __call__(self, inp, **kwargs):
        return self.forward(inp, **kwargs)

    @typecheck
    def forward(
        self,
        inp: Float[jax.Array, 'b n d'] | Float[jax.Array, 'b nw'],
        *,
        text: Int[jax.Array, 'b nt'] | list[str] | None = None,
        times=None,                 # accepted for API parity; the reference
                                    # overwrites it too (e2_tts.py:1474, 1523)
        lens: Int[jax.Array, 'b'] | None = None,
        velocity_consistency_model: 'E2TTS | None' = None,
        velocity_consistency_delta: float = 1e-5,
        key: jax.Array | None = None,
        drop_text_cond: bool | None = None,
    ):
        need_velocity_loss = (exists(velocity_consistency_model)
                              and self.velocity_consistency_weight > 0.0)

        inp = self._as_mel(inp)
        batch, seq_len = inp.shape[0], inp.shape[1]
        dtype = inp.dtype

        text = self._tokenize(text, batch)

        if not exists(lens):
            lens = jnp.full((batch,), seq_len, dtype=jnp.int32)
        mask = lens_to_mask(lens, length=seq_len)

        key = default(key, self.rngs.flow())
        k_frac, k_span, k_x0, k_time = jax.random.split(key, 4)

        # random infill span (e2_tts.py:1504-1508)
        lo, hi = self.frac_lengths_mask
        frac_lengths = jax.random.uniform(k_frac, (batch,), minval=lo, maxval=hi)
        rand_span_mask = mask_from_frac_lengths(k_span, lens, frac_lengths, seq_len)
        rand_span_mask = rand_span_mask & mask

        # flow matching: x0 noise, x1 data (e2_tts.py:1512-1535)
        x1 = inp
        x0 = jax.random.normal(k_x0, x1.shape, dtype=dtype)
        times = jax.random.uniform(k_time, (batch,), dtype=jnp.float32)
        t = times[:, None, None].astype(dtype)

        if need_velocity_loss:
            t = t * (1.0 - velocity_consistency_delta)

        w = (1.0 - t) * x0 + t * x1
        flow = x1 - x0

        # infill target: zero out the span, keep the rest as conditioning
        cond = jnp.where(rand_span_mask[..., None], jnp.zeros_like(x1), x1)

        pred, did_drop_text_cond = self.transformer_with_pred_head(
            w, cond, times=times, text=text, mask=mask,
            drop_text_cond=drop_text_cond, return_drop_text_cond=True)

        # velocity consistency against an EMA teacher (e2_tts.py:1556-1576)
        velocity_loss = jnp.asarray(0.0, dtype=jnp.float32)
        if need_velocity_loss:
            t_delta = t + velocity_consistency_delta
            w_delta = (1.0 - t_delta) * x0 + t_delta * x1
            ema_pred = velocity_consistency_model.transformer_with_pred_head(
                w_delta, cond, times=times + velocity_consistency_delta,
                text=text, mask=mask, drop_text_cond=did_drop_text_cond)
            ema_pred = jax.lax.stop_gradient(ema_pred)
            velocity_loss = masked_mse(pred, ema_pred, rand_span_mask)

        loss = masked_mse(pred, flow, rand_span_mask)

        total = loss + velocity_loss * self.velocity_consistency_weight
        breakdown = LossBreakdown(loss, velocity_loss)

        return E2TTSReturn(total, cond, pred, x0 + pred, breakdown)
