"""Native C++ audio-prep library tests (vs scipy oracle)."""

import numpy as np
import pytest

from e2_tts_tpu import native


@pytest.fixture(scope='module')
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip('native library unavailable (no compiler)')
    return lib


def test_resample_matches_scipy(lib):
    from scipy.signal import resample_poly
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 22050, endpoint=False)
    wave = (np.sin(2 * np.pi * 440 * t)
            + 0.3 * rng.standard_normal(len(t))).astype(np.float32)

    ours = native.resample(wave, 22050, 24000)
    ref = resample_poly(wave.astype(np.float64), 160, 147)  # 24000/22050 reduced

    assert ours is not None
    assert abs(len(ours) - len(ref)) <= 1
    n = min(len(ours), len(ref))
    # interior parity (edges differ by boundary handling)
    sl = slice(200, n - 200)
    err = np.abs(ours[sl] - ref[sl].astype(np.float32))
    assert float(err.max()) < 1e-3


def test_resample_identity(lib):
    wave = np.random.default_rng(1).standard_normal(1000).astype(np.float32)
    out = native.resample(wave, 24000, 24000)
    np.testing.assert_array_equal(out, wave)


def test_resample_downsample_preserves_tone(lib):
    sr_in, sr_out, f = 48000, 24000, 1000.0
    t = np.arange(sr_in, dtype=np.float64) / sr_in
    wave = np.sin(2 * np.pi * f * t).astype(np.float32)
    out = native.resample(wave, sr_in, sr_out)
    # dominant DFT bin still at 1 kHz
    spec = np.abs(np.fft.rfft(out[1000:-1000] * np.hanning(len(out) - 2000)))
    peak_hz = np.argmax(spec) * sr_out / (len(out) - 2000)
    assert abs(peak_hz - f) < 5.0


def test_pcm16_to_float(lib):
    pcm = np.array([0, 32767, -32767, 16384], dtype=np.int16)
    out = native.pcm16_to_float(pcm)
    np.testing.assert_allclose(out, [0.0, 1.0, -1.0, 0.5], atol=1e-4)
    # stereo averaging
    stereo = np.array([32767, -32767, 16384, 16384], dtype=np.int16)
    out2 = native.pcm16_to_float(stereo, n_channels=2)
    np.testing.assert_allclose(out2, [0.0, 0.5], atol=1e-4)


def test_data_pipeline_uses_native():
    from e2_tts_tpu.training.data import resample_audio
    wave = np.random.default_rng(2).standard_normal(24000).astype(np.float32)
    out = resample_audio(wave, 48000, 24000)
    assert len(out) == 12000
