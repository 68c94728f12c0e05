"""Fused Pallas mel-spectrogram kernel.

One VMEM pass per block of frames: framed audio -> (window-folded) DFT via
two MXU matmuls -> magnitude -> mel filterbank matmul -> natural-log clamp.
XLA's matmul-DFT path (ops/mel.py) materialises the (frames, 513) spectrum in
HBM between the DFT and the mel matmul; here it never leaves VMEM.

Weight tables are padded to lane multiples (513 -> 576 freq bins, 100 -> 128
mel bins) with zeros; padding contributes nothing to the results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2_tts_tpu.utils.helpers import round_up_to_multiple

_INTERPRET = False


def _mel_kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref, *, power):
    f = frames_ref[...]                      # (bt, n_fft)

    re = jax.lax.dot_general(f, cos_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    im = jax.lax.dot_general(f, sin_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mag_sq = re * re + im * im               # (bt, n_freq_pad)

    if power == 1.0:
        spec = jnp.sqrt(jnp.clip(mag_sq, min=0.0))
    elif power == 2.0:
        spec = mag_sq
    else:
        spec = jnp.power(jnp.clip(mag_sq, min=0.0), power / 2.0)

    mel = jax.lax.dot_general(spec.astype(fb_ref.dtype), fb_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[...] = jnp.log(jnp.clip(mel, min=1e-5))


def fused_log_mel(
    frames: jax.Array,      # (rows, n_fft) framed (un-windowed) audio
    dft_cos: jax.Array,     # (n_fft, n_freqs) window-folded
    dft_sin: jax.Array,
    fbanks: jax.Array,      # (n_freqs, n_mels)
    power: float = 1.0,
    block_rows: int = 256,
) -> jax.Array:             # (rows, n_mels) fp32 log-mel
    rows, n_fft = frames.shape
    n_freqs, n_mels = fbanks.shape

    rows_pad = round_up_to_multiple(max(rows, 8), block_rows) \
        if rows > block_rows else round_up_to_multiple(max(rows, 8), 8)
    block_rows = min(block_rows, rows_pad)
    freq_pad = round_up_to_multiple(n_freqs, 128)
    mel_pad = round_up_to_multiple(n_mels, 128)

    if rows_pad != rows:
        frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))
    cos = jnp.pad(dft_cos, ((0, 0), (0, freq_pad - n_freqs)))
    sin = jnp.pad(dft_sin, ((0, 0), (0, freq_pad - n_freqs)))
    fb = jnp.pad(fbanks, ((0, freq_pad - n_freqs), (0, mel_pad - n_mels)))

    out = pl.pallas_call(
        functools.partial(_mel_kernel, power=power),
        grid=(rows_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, freq_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, freq_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((freq_pad, mel_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, mel_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, mel_pad), jnp.float32),
        interpret=_INTERPRET,
    )(frames, cos, sin, fb)

    return out[:rows, :n_mels]
