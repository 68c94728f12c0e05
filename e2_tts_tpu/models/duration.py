"""Duration predictor (reference: e2_tts.py:956-1113).

mel (+ optional text) -> scalar total-frame-count. Trains on a random prefix
(everything at or beyond a uniform random index is masked), pools with a
masked mean, and regresses the full length through an HL-Gauss head
(Softplus regression by default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from e2_tts_tpu.models.blocks import CharacterEmbed
from e2_tts_tpu.models.hl_gauss import HLGaussLayer
from e2_tts_tpu.models.transformer import Transformer
from e2_tts_tpu.ops.mel import MelSpec
from e2_tts_tpu.text.tokenizer import resolve_tokenizer
from e2_tts_tpu.utils.helpers import exists, default, set_if_missing_key
from e2_tts_tpu.utils.masking import lens_to_mask, maybe_masked_mean
from e2_tts_tpu.utils.typing import Float, Int, typecheck


class DurationPredictor(nnx.Module):

    @typecheck
    def __init__(
        self,
        transformer: dict | Transformer,
        num_channels: int | None = None,
        mel_spec_kwargs: dict = dict(),
        char_embed_kwargs: dict = dict(),
        text_num_embeds: int | None = None,
        num_freq_tokens: int = 1,
        hl_gauss_loss: dict | None = None,
        use_regression: bool = True,
        tokenizer='char_utf8',
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs | None = None,
    ):
        rngs = default(rngs, nnx.Rngs(0))

        # freq axis hparams (e2_tts.py:975-989)
        assert num_freq_tokens > 0
        self.num_freq_tokens = num_freq_tokens
        self.has_freq_axis = num_freq_tokens > 1

        if isinstance(transformer, dict):
            transformer = dict(transformer)
            set_if_missing_key(transformer, 'has_freq_axis', self.has_freq_axis)
            transformer = Transformer(
                **transformer, cond_on_time=False,
                dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        assert transformer.has_freq_axis == self.has_freq_axis

        self.mel_spec = MelSpec(**mel_spec_kwargs)
        self.num_channels = default(num_channels, self.mel_spec.n_mel_channels)

        self.transformer = transformer
        dim = transformer.dim
        dim_text = transformer.dim_text
        self.dim = dim

        # input projection; with a freq axis project to f tokens per frame
        # (e2_tts.py:1005-1011)
        self.proj_in = nnx.Linear(self.num_channels, dim * num_freq_tokens,
                                  dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        self.tokenizer, text_num_embeds = resolve_tokenizer(tokenizer, text_num_embeds)
        self.embed_text = CharacterEmbed(dim_text, num_embeds=text_num_embeds,
                                         dtype=dtype, param_dtype=param_dtype,
                                         rngs=rngs, **char_embed_kwargs)

        # HL-Gauss / regression prediction head (arXiv 2403.03950; e2_tts.py:1035-1040)
        self.hl_gauss_layer = HLGaussLayer(
            dim, hl_gauss_loss=hl_gauss_loss, use_regression=use_regression,
            regress_activation=jax.nn.softplus,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        self.rngs = rngs
        self.deterministic = False

    def _maybe_split_freq(self, x):
        if not self.has_freq_axis:
            return x
        b, n, _ = x.shape
        return x.reshape(b, n, self.num_freq_tokens, self.dim).transpose(0, 2, 1, 3)

    def __call__(self, x, *, text=None, lens=None, return_loss=True, key=None):
        return self.forward(x, text=text, lens=lens, return_loss=return_loss, key=key)

    @typecheck
    def forward(
        self,
        x: Float[jax.Array, 'b n d'] | Float[jax.Array, 'b nw'],
        *,
        text: Int[jax.Array, 'b nt'] | list[str] | None = None,
        lens: Int[jax.Array, 'b'] | None = None,
        return_loss: bool = True,
        key: jax.Array | None = None,
    ):
        # raw wave -> mel (e2_tts.py:1052-1055; the reference asserts against
        # self.dim here which is a latent bug — we check num_channels)
        if x.ndim == 2:
            x = self.mel_spec(x).transpose(0, 2, 1)     # b n d
            assert x.shape[-1] == self.num_channels

        batch, seq_len = x.shape[0], x.shape[-2]

        x = self._maybe_split_freq(self.proj_in(x))

        # text
        text_embed = None
        if exists(text):
            if isinstance(text, list):
                text = jnp.asarray(self.tokenizer(text))
            assert text.shape[0] == batch, (
                f'got {text.shape[0]} texts for a batch of {batch} audio samples')
            text_embed = self.embed_text(text, seq_len)

        # lengths
        if not exists(lens):
            lens = jnp.full((batch,), seq_len, dtype=jnp.int32)
        mask = lens_to_mask(lens, length=seq_len)

        # train on a random prefix: model must predict the full duration from
        # a truncated view (e2_tts.py:1081-1087)
        if return_loss:
            key = default(key, self.rngs.duration() if exists(self.rngs) else None)
            rand_frac = jax.random.uniform(key, (batch,))
            rand_index = (rand_frac * lens.astype(rand_frac.dtype)).astype(lens.dtype)
            seq = jnp.arange(seq_len, dtype=lens.dtype)
            mask = mask & (seq[None, :] < rand_index[:, None])

        embed = self.transformer(x, mask=mask, text_embed=text_embed)

        if self.has_freq_axis:
            embed = embed.mean(axis=1)      # reduce freq tokens (e2_tts.py:1030)

        pooled = maybe_masked_mean(embed, mask)

        if not return_loss:
            return self.hl_gauss_layer(pooled)

        return self.hl_gauss_layer(pooled, lens.astype(jnp.float32))
