"""Log-mel spectrogram frontend, TPU-native.

Numerical contract matches the reference `MelSpec` (e2_tts.py:248-290), i.e.
torchaudio.transforms.MelSpectrogram with n_fft=1024, win=1024, hop=256,
n_mels=100, sr=24k, power=1 (amplitude), center=True (reflect pad), HTK mel
scale, no filterbank norm — followed by a natural log clamped at 1e-5
(e2_tts.py:170-171, 289). Parity lets pretrained Vocos checkpoints drop in.

TPU-first design: instead of an FFT (reference reaches torchaudio's C++
kernels), the default path computes the spectrum as two real matmuls against
window-folded DFT bases — frames @ (win·cos), frames @ (win·sin). A 1024-pt
DFT per frame is ~2 MFLOP: trivially small, lands on the MXU, and XLA fuses
framing + magnitude + mel-matmul + log into one kernel. An `fft` mode using
jnp.fft.rfft is kept for cross-checking.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from e2_tts_tpu.utils.helpers import exists


def hz_to_mel(freq: np.ndarray, mel_scale: str = 'htk') -> np.ndarray:
    """HTK (default) or slaney mel scale, matching torchaudio.functional."""
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == 'htk':
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz, min_log_mel + np.log(freq / min_log_hz) / logstep, mels)


def mel_to_hz(mels: np.ndarray, mel_scale: str = 'htk') -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == 'htk':
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: str | None = None,
    mel_scale: str = 'htk',
) -> np.ndarray:
    """Triangular mel filterbank (n_freqs, n_mels), matching
    torchaudio.functional.melscale_fbanks defaults used by the reference.
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)

    m_min = hz_to_mel(f_min, mel_scale)
    m_max = hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]         # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.clip(np.minimum(down_slopes, up_slopes), 0.0, None)

    if norm == 'slaney':
        enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]

    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def _frame_signal(x: jax.Array, n_fft: int, hop_length: int, center: bool) -> jax.Array:
    """(b, nw) -> (b, n_frames, n_fft) with reflect padding when centered."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode='reflect')

    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    starts = np.arange(n_frames) * hop_length
    # gather frames: (b, n_frames, n_fft); XLA turns this into a strided slice
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return x[:, idx]


class MelSpec:
    """Waveform -> log-mel. Stateless (no trainable params); safe to embed in
    NNX modules as a plain attribute — its tables compile as constants.

    Call with (b, nw) or (b, 1, nw) waveform; returns (b, n_mels, n_frames)
    to match the reference output layout ('b d n', e2_tts.py:288-290).
    """

    def __init__(
        self,
        filter_length: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        n_mel_channels: int = 100,
        sampling_rate: int = 24_000,
        normalize: bool = False,
        power: float = 1.0,
        norm: str | None = None,
        center: bool = True,
        mode: str = 'dft',   # 'dft' (matmul, MXU) | 'fft' (jnp.fft.rfft)
                             # | 'pallas' (fused VMEM kernel, ops/mel_kernel.py)
        dtype=jnp.float32,
    ):
        assert not normalize, 'spectrogram normalization not used by the reference'
        assert win_length <= filter_length
        self.n_fft = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.power = power
        self.center = center
        self.mode = mode
        self.dtype = dtype

        n_freqs = filter_length // 2 + 1

        window = hann_window(win_length)
        if win_length < filter_length:  # center-pad window to n_fft like torch.stft
            lpad = (filter_length - win_length) // 2
            window = np.pad(window, (lpad, filter_length - win_length - lpad))
        self._window = window

        fb = melscale_fbanks(
            n_freqs, 0.0, float(sampling_rate // 2), n_mel_channels, sampling_rate,
            norm=norm, mel_scale='htk',
        )
        self._fbanks = jnp.asarray(fb, dtype=dtype)  # (n_freqs, n_mels)

        if mode in ('dft', 'pallas'):
            # window-folded real DFT bases: frame @ basis == rfft(window * frame)
            k = np.arange(n_freqs)[None, :]              # (1, n_freqs)
            n = np.arange(filter_length)[:, None]        # (n_fft, 1)
            ang = 2.0 * np.pi * k * n / filter_length
            self._dft_cos = jnp.asarray(np.cos(ang) * window[:, None], dtype=dtype)
            self._dft_sin = jnp.asarray(-np.sin(ang) * window[:, None], dtype=dtype)
        else:
            self._window_j = jnp.asarray(window, dtype=dtype)

    def __call__(self, inp: jax.Array) -> jax.Array:
        return self.forward(inp)

    def forward(self, inp: jax.Array) -> jax.Array:
        squeeze_batch = inp.ndim == 1
        if squeeze_batch:
            inp = inp[None, :]
        if inp.ndim == 3:  # (b, 1, nw)
            inp = inp[:, 0, :]
        assert inp.ndim == 2

        mel = _mel_impl(
            inp.astype(self.dtype),
            self._fbanks,
            self._dft_cos if self.mode in ('dft', 'pallas') else None,
            self._dft_sin if self.mode in ('dft', 'pallas') else None,
            self._window_j if self.mode == 'fft' else None,
            self.n_fft, self.hop_length, self.center, self.power,
            self.mode == 'pallas',
        )
        return mel[0] if squeeze_batch else mel


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _mel_impl(x, fbanks, dft_cos, dft_sin, window, n_fft, hop_length, center,
              power, use_pallas=False):
    frames = _frame_signal(x, n_fft, hop_length, center)     # (b, t, n_fft)

    if use_pallas:
        from e2_tts_tpu.ops.mel_kernel import fused_log_mel
        b, t, _ = frames.shape
        mel = fused_log_mel(frames.reshape(b * t, n_fft), dft_cos, dft_sin,
                            fbanks, power=power)
        return mel.reshape(b, t, -1).transpose(0, 2, 1)       # (b, mels, t)

    if exists(dft_cos):
        re = jnp.einsum('btn,nf->btf', frames, dft_cos, preferred_element_type=jnp.float32)
        im = jnp.einsum('btn,nf->btf', frames, dft_sin, preferred_element_type=jnp.float32)
    else:
        spec = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
        re, im = spec.real.astype(jnp.float32), spec.imag.astype(jnp.float32)

    mag_sq = re * re + im * im
    if power == 1.0:
        spec = jnp.sqrt(jnp.clip(mag_sq, min=0.0))
    elif power == 2.0:
        spec = mag_sq
    else:
        spec = jnp.power(jnp.clip(mag_sq, min=0.0), power / 2.0)

    mel = jnp.einsum('btf,fm->bmt', spec, fbanks, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-5))   # natural log, clamp (e2_tts.py:170-171)


def db_to_amplitude(x: jax.Array, ref: float = 1.0, power: float = 0.5) -> jax.Array:
    """torchaudio.functional.DB_to_amplitude — used on the vocoder decode path
    (e2_tts.py:1444): ref * 10^(power * x / 10).
    """
    return ref * jnp.power(10.0, power * x / 10.0)
