"""Vocos vocoder (arXiv 2303.00501) natively in JAX — mel -> waveform on
device, so sampling can be vocoder-inclusive without a host round-trip.

The reference decodes through the torch `vocos` package
(/root/reference/e2_tts_pytorch/e2_tts.py:998-1004, 1440-1451); this is the
TPU-native equivalent of the `charactr/vocos-mel-24khz` architecture:

    mel (b, n, 100)
      -> Conv1d embed (k=7) -> LayerNorm
      -> 8 x ConvNeXt blocks (depthwise k=7, LN, 512->1536 GELU 1536->512,
         layer-scale gamma, residual)
      -> final LayerNorm
      -> ISTFT head: Linear 512 -> n_fft+2, split (log-magnitude, phase),
         inverse STFT (hann, n_fft=1024, hop=256, center)

TPU notes: the inverse rFFT is a matmul against precomputed cos/sin bases
(513 x 1024 — MXU work, like ops/mel.py's forward DFT) and the overlap-add
uses n_fft/hop = 4 shifted adds on a strided reshape — no scatter. Everything
is static-shaped and jit-friendly; `decode` processes the whole batch on
device (the torch path loops per sample on host).

Pretrained weights: `load_torch_state_dict` maps the published torch
checkpoint ("charactr/vocos-mel-24khz" `pytorch_model.bin`) onto this
module. No weights ship with this repo; random init is used in tests.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from e2_tts_tpu.utils.helpers import exists


# -- inverse STFT ---------------------------------------------------------------

def _irfft_bases(n_fft: int, dtype=np.float32):
    """Real/imag matmul bases (n_fft//2+1, n_fft) such that
    y = Re @ Br + Im @ Bi equals irfft([Re + i Im], n_fft)."""
    k = np.arange(n_fft // 2 + 1)[:, None]
    t = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    c = np.full((n_fft // 2 + 1, 1), 2.0)
    c[0] = c[-1] = 1.0
    br = (c * np.cos(ang) / n_fft).astype(dtype)
    bi = (-c * np.sin(ang) / n_fft).astype(dtype)
    return br, bi


def istft(real: jax.Array, imag: jax.Array, window: jax.Array,
          n_fft: int, hop_length: int, *, center: bool = True) -> jax.Array:
    """Inverse STFT of a (b, frames, n_fft//2+1) spectrum -> (b, samples).

    Matches `torch.istft(..., center=True)` for hann windows: per-frame
    inverse rFFT (as a matmul on the MXU), windowed overlap-add via
    n_fft/hop shifted adds, window-envelope normalisation, centre trim.
    Output length is (frames - 1) * hop_length when center=True."""
    assert n_fft % hop_length == 0, 'n_fft must be a multiple of hop_length'
    b, nf, _ = real.shape
    r = n_fft // hop_length

    br, bi = _irfft_bases(n_fft)
    frames = (
        jnp.einsum('bfk,kt->bft', real, jnp.asarray(br),
                   preferred_element_type=jnp.float32)
        + jnp.einsum('bfk,kt->bft', imag, jnp.asarray(bi),
                     preferred_element_type=jnp.float32))
    frames = frames * window[None, None, :]

    # overlap-add: chunk each frame into r hops; hop block (i + j) of the
    # output accumulates chunk j of frame i — r static shifted adds
    chunks = frames.reshape(b, nf, r, hop_length)
    total = nf + r - 1
    out = jnp.zeros((b, total, hop_length), frames.dtype)
    wsq = (window.astype(jnp.float32) ** 2).reshape(r, hop_length)
    env = jnp.zeros((total, hop_length), jnp.float32)
    for j in range(r):
        out = out.at[:, j:j + nf].add(chunks[:, :, j])
        env = env.at[j:j + nf].add(wsq[j][None, :])

    y = out.reshape(b, total * hop_length)
    y = y / jnp.clip(env.reshape(-1), min=1e-11)[None, :]

    if center:
        pad = n_fft // 2
        y = y[:, pad: pad + (nf - 1) * hop_length]
    return y


# -- backbone -------------------------------------------------------------------

class _LayerNorm(nnx.Module):
    """LayerNorm over the channel axis with torch's eps (1e-6 in ConvNeXt,
    1e-5 at the embed norm)."""

    def __init__(self, dim: int, eps: float, *, param_dtype=jnp.float32):
        self.scale = nnx.Param(jnp.ones((dim,), param_dtype))
        self.bias = nnx.Param(jnp.zeros((dim,), param_dtype))
        self.eps = eps

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (h * self.scale[...] + self.bias[...]).astype(x.dtype)


class ConvNeXtBlock(nnx.Module):
    """vocos.modules.ConvNeXtBlock: depthwise conv k=7, LN, pointwise MLP
    with GELU, layer-scale gamma, residual."""

    def __init__(self, dim: int, intermediate_dim: int,
                 layer_scale_init: float = 1e-6, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.dwconv = nnx.Conv(dim, dim, kernel_size=(7,), padding='SAME',
                               feature_group_count=dim, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)
        self.norm = _LayerNorm(dim, 1e-6, param_dtype=param_dtype)
        self.pwconv1 = nnx.Linear(dim, intermediate_dim, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)
        self.pwconv2 = nnx.Linear(intermediate_dim, dim, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)
        self.gamma = nnx.Param(jnp.full((dim,), layer_scale_init, param_dtype))

    def __call__(self, x):   # (b, n, d)
        h = self.dwconv(x)
        h = self.norm(h)
        h = self.pwconv1(h)
        h = jax.nn.gelu(h, approximate=False)
        h = self.pwconv2(h)
        return x + self.gamma[...].astype(h.dtype) * h


class VocosBackbone(nnx.Module):
    """vocos.models.VocosBackbone (plain-LN variant used by the mel model)."""

    def __init__(self, input_channels: int = 100, dim: int = 512,
                 intermediate_dim: int = 1536, num_layers: int = 8, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.embed = nnx.Conv(input_channels, dim, kernel_size=(7,),
                              padding='SAME', dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)
        self.norm = _LayerNorm(dim, 1e-6, param_dtype=param_dtype)
        self.blocks = nnx.List([
            ConvNeXtBlock(dim, intermediate_dim,
                          layer_scale_init=1.0 / num_layers, dtype=dtype,
                          param_dtype=param_dtype, rngs=rngs)
            for _ in range(num_layers)])
        self.final_norm = _LayerNorm(dim, 1e-6, param_dtype=param_dtype)

    def __call__(self, mel):   # (b, n, input_channels)
        h = self.embed(mel)
        h = self.norm(h)
        for blk in self.blocks:
            h = blk(h)
        return self.final_norm(h)


class ISTFTHead(nnx.Module):
    """vocos.heads.ISTFTHead: project to n_fft+2, exp the magnitude half
    (clipped at 1e2 like the reference), cos/sin the phase half, ISTFT."""

    def __init__(self, dim: int = 512, n_fft: int = 1024,
                 hop_length: int = 256, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.out = nnx.Linear(dim, n_fft + 2, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)
        self.window = nnx.Param(
            jnp.asarray(np.hanning(n_fft + 1)[:-1], param_dtype))
        self.n_fft = n_fft
        self.hop_length = hop_length

    def __call__(self, h):   # (b, n, dim) -> (b, (n-1)*hop)
        x = self.out(h).astype(jnp.float32)
        half = self.n_fft // 2 + 1
        # clamp AFTER exp like the reference (`torch.clip(torch.exp(x),
        # max=1e2)`): bounds the magnitude itself at 1e2; even an fp32
        # overflow to inf clamps back to 1e2 instead of propagating
        mag = jnp.minimum(jnp.exp(x[..., :half]), 1e2)
        p = x[..., half:]
        return istft(mag * jnp.cos(p), mag * jnp.sin(p), self.window[...],
                     self.n_fft, self.hop_length)


class Vocos(nnx.Module):
    """Full mel -> waveform model (charactr/vocos-mel-24khz geometry)."""

    def __init__(self, input_channels: int = 100, dim: int = 512,
                 intermediate_dim: int = 1536, num_layers: int = 8,
                 n_fft: int = 1024, hop_length: int = 256, *,
                 dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs if exists(rngs) else nnx.Rngs(0)
        self.backbone = VocosBackbone(
            input_channels, dim, intermediate_dim, num_layers, dtype=dtype,
            param_dtype=param_dtype, rngs=rngs)
        self.head = ISTFTHead(dim, n_fft, hop_length, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)

    def __call__(self, mel):   # (b, n, input_channels) -> (b, samples)
        return self.head(self.backbone(mel))

    decode = __call__

    def load_torch_state_dict(self, sd):
        """Load the published torch Vocos checkpoint (state-dict of
        `vocos.Vocos`, e.g. `charactr/vocos-mel-24khz`'s pytorch_model.bin —
        key list + shapes pinned in tests/fixtures/vocos_mel24khz_schema.json).
        Accepts torch tensors or numpy arrays; `feature_extractor.*` keys
        (torchaudio mel buffers) are ignored — this repo's `ops.mel.MelSpec`
        is the frontend. A missing key raises KeyError; a mis-shaped tensor
        (e.g. an un-transposed conv) raises ValueError even when numpy
        broadcasting would silently accept it."""
        g = lambda k: jnp.asarray(np.asarray(sd[k]))

        # torch Conv1d weight (out, in/groups, k) -> flax (k, in/groups, out)
        conv = lambda k: jnp.transpose(g(k), (2, 1, 0))
        lin = lambda k: jnp.transpose(g(k), (1, 0))

        def set_(param, value, key):
            if tuple(param.shape) != tuple(value.shape):
                raise ValueError(
                    f'{key}: checkpoint tensor maps to shape {value.shape}, '
                    f'model parameter is {tuple(param.shape)}')
            param[...] = value

        bb = self.backbone
        set_(bb.embed.kernel, conv('backbone.embed.weight'), 'backbone.embed.weight')
        set_(bb.embed.bias, g('backbone.embed.bias'), 'backbone.embed.bias')
        set_(bb.norm.scale, g('backbone.norm.weight'), 'backbone.norm.weight')
        set_(bb.norm.bias, g('backbone.norm.bias'), 'backbone.norm.bias')
        for i, blk in enumerate(bb.blocks):
            p = f'backbone.convnext.{i}.'
            set_(blk.dwconv.kernel, conv(p + 'dwconv.weight'), p + 'dwconv.weight')
            set_(blk.dwconv.bias, g(p + 'dwconv.bias'), p + 'dwconv.bias')
            set_(blk.norm.scale, g(p + 'norm.weight'), p + 'norm.weight')
            set_(blk.norm.bias, g(p + 'norm.bias'), p + 'norm.bias')
            set_(blk.pwconv1.kernel, lin(p + 'pwconv1.weight'), p + 'pwconv1.weight')
            set_(blk.pwconv1.bias, g(p + 'pwconv1.bias'), p + 'pwconv1.bias')
            set_(blk.pwconv2.kernel, lin(p + 'pwconv2.weight'), p + 'pwconv2.weight')
            set_(blk.pwconv2.bias, g(p + 'pwconv2.bias'), p + 'pwconv2.bias')
            set_(blk.gamma, g(p + 'gamma'), p + 'gamma')
        set_(bb.final_norm.scale, g('backbone.final_layer_norm.weight'),
             'backbone.final_layer_norm.weight')
        set_(bb.final_norm.bias, g('backbone.final_layer_norm.bias'),
             'backbone.final_layer_norm.bias')

        set_(self.head.out.kernel, lin('head.out.weight'), 'head.out.weight')
        set_(self.head.out.bias, g('head.out.bias'), 'head.out.bias')
        if 'head.istft.window' in sd:
            set_(self.head.window, g('head.istft.window'), 'head.istft.window')
        return self


# module-level jitted decode: one compile cache shared by all callers
_jit_decode = nnx.jit(lambda model, mel: model(mel))
