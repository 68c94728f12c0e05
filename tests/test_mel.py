"""Mel frontend parity tests.

Oracle: torch.stft (the exact C++ kernel torchaudio's MelSpectrogram wraps)
plus a numpy re-derivation of torchaudio's melscale_fbanks. This is the
"hard part #1" golden fixture from SURVEY.md §7 — if these pass, pretrained
Vocos checkpoints drop in.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from e2_tts_tpu.ops.mel import MelSpec, melscale_fbanks, hann_window, db_to_amplitude


def torch_mel_oracle(wave_np, n_fft=1024, hop=256, win=1024, n_mels=100, sr=24000, power=1.0):
    """Replicates torchaudio.transforms.MelSpectrogram(power=1, center=True,
    norm=None, mel_scale='htk') using torch.stft + our numpy fbanks."""
    x = torch.from_numpy(wave_np)
    window = torch.from_numpy(hann_window(win))
    spec = torch.stft(
        x, n_fft=n_fft, hop_length=hop, win_length=win, window=window,
        center=True, pad_mode='reflect', normalized=False, onesided=True,
        return_complex=True,
    )
    spec = spec.abs() ** power                       # (b, n_freqs, t)
    fb = torch.from_numpy(melscale_fbanks(n_fft // 2 + 1, 0.0, sr / 2, n_mels, sr))
    mel = torch.matmul(spec.transpose(-1, -2), fb).transpose(-1, -2)  # (b, n_mels, t)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


@pytest.mark.parametrize('mode', ['dft', 'fft'])
def test_melspec_matches_torch_stft(mode):
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, 24000)) * 0.3).astype(np.float32)

    mel_spec = MelSpec(mode=mode)
    ours = np.asarray(mel_spec(jnp.asarray(wave)))
    oracle = torch_mel_oracle(wave)

    assert ours.shape == oracle.shape == (2, 100, 94)   # 1 + nw // hop frames
    np.testing.assert_allclose(ours, oracle, atol=2e-3, rtol=1e-3)


def test_melspec_dft_vs_fft_mode():
    rng = np.random.default_rng(1)
    wave = rng.standard_normal((1, 8000)).astype(np.float32)
    a = np.asarray(MelSpec(mode='dft')(jnp.asarray(wave)))
    b = np.asarray(MelSpec(mode='fft')(jnp.asarray(wave)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_melspec_shapes_and_batching():
    mel_spec = MelSpec()
    wave = jnp.zeros((3, 4096))
    out = mel_spec(wave)
    assert out.shape == (3, 100, 17)
    # (b, 1, nw) squeezed like the reference (e2_tts.py:280-281)
    out3 = mel_spec(wave[:, None, :])
    assert out3.shape == (3, 100, 17)
    # single waveform
    assert mel_spec(jnp.zeros(4096)).shape == (100, 17)
    # silence hits the log clamp exactly
    np.testing.assert_allclose(np.asarray(out[0, :, 0]), np.log(1e-5), rtol=1e-5)


def test_db_to_amplitude():
    x = jnp.asarray([0.0, 20.0, -20.0])
    np.testing.assert_allclose(np.asarray(db_to_amplitude(x)), [1.0, 10.0, 0.1], rtol=1e-6)


def test_melspec_win_shorter_than_nfft():
    """win_length < n_fft: window center-padded like torch.stft."""
    rng = np.random.default_rng(2)
    wave = (rng.standard_normal((1, 12000)) * 0.3).astype(np.float32)

    mel_spec = MelSpec(win_length=800)
    ours = np.asarray(mel_spec(jnp.asarray(wave)))

    import torch
    x = torch.from_numpy(wave)
    window = torch.from_numpy(hann_window(800))
    spec = torch.stft(x, n_fft=1024, hop_length=256, win_length=800,
                      window=window, center=True, pad_mode='reflect',
                      normalized=False, onesided=True, return_complex=True).abs()
    fb = torch.from_numpy(melscale_fbanks(513, 0.0, 12000, 100, 24000))
    oracle = torch.log(torch.clamp(
        torch.matmul(spec.transpose(-1, -2), fb).transpose(-1, -2), min=1e-5)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=2e-3, rtol=1e-3)


def test_melspec_slaney_norm():
    fb = melscale_fbanks(513, 0.0, 12000.0, 100, 24000, norm='slaney')
    assert fb.shape == (513, 100)
    assert np.isfinite(fb).all() and fb.max() < 0.1    # area-normalised
    # narrow low-freq filters get larger weights than wide high-freq ones
    assert fb[:, :10].max() > fb[:, -10:].max()


def test_melspec_power2():
    wave = jnp.asarray(np.random.default_rng(3).standard_normal((1, 8000)).astype(np.float32))
    m1 = MelSpec(power=1.0)(wave)
    m2 = MelSpec(power=2.0)(wave)
    assert m1.shape == m2.shape
    assert not np.allclose(np.asarray(m1), np.asarray(m2))


def test_melspec_pallas_mode_matches_dft():
    import e2_tts_tpu.ops.mel_kernel as mk
    mk._INTERPRET = True
    try:
        rng = np.random.default_rng(4)
        wave = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
        a = np.asarray(MelSpec(mode='pallas')(jnp.asarray(wave)))
        b = np.asarray(MelSpec(mode='dft')(jnp.asarray(wave)))
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)
    finally:
        mk._INTERPRET = False
