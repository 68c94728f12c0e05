"""sample() IO paths: vocoder callable, wav save, determinism, audio_io."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from e2_tts_tpu.models.e2tts import E2TTS
from e2_tts_tpu.utils.audio_io import save_wav, load_wav

SMALL_TF = dict(dim=64, depth=2, heads=2, dim_head=16, ff_mult=2,
                num_registers=2, max_seq_len=128, kernel_size=7, dropout=0.0,
                num_residual_streams=1, attn_backend='xla')


def small_e2tts(**kwargs):
    return E2TTS(transformer=dict(**SMALL_TF), rngs=nnx.Rngs(0), **kwargs)


def test_wav_roundtrip(tmp_path):
    sr = 24000
    t = np.linspace(0, 0.5, sr // 2, endpoint=False)
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / 'tone.wav')
    save_wav(path, wave, sr)
    loaded, sr2 = load_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(loaded, wave, atol=1e-3)


def test_sample_with_vocoder_callable(tmp_path):
    model = small_e2tts(sampling_rate=24000)

    calls = {}
    def fake_vocoder(mel_bdn):
        # receives (b, d, n) like the reference vocoder contract (e2_tts.py:1437)
        calls['shape'] = mel_bdn.shape
        b, d, n = mel_bdn.shape
        return [jnp.zeros(n * 256) for _ in range(b)]

    prompt = jax.random.normal(jax.random.key(0), (2, 8, 100))
    out = model.sample(prompt, text=['a', 'b'], duration=16, steps=2,
                       key=jax.random.key(1), vocoder=fake_vocoder,
                       duration_bucket=16,
                       save_to_filename=str(tmp_path / 'out.wav'))
    assert calls['shape'] == (2, 100, 16)
    assert len(out) == 2
    # per-sample files '1.out.wav', '2.out.wav' (reference e2_tts.py:1463)
    assert os.path.exists(str(tmp_path / '1.out.wav'))
    assert os.path.exists(str(tmp_path / '2.out.wav'))


def test_sample_deterministic_given_key():
    model = small_e2tts()
    prompt = jax.random.normal(jax.random.key(0), (1, 8, 100))
    kwargs = dict(text=['xy'], duration=16, steps=2, return_raw_output=True,
                  duration_bucket=16)
    a = model.sample(prompt, key=jax.random.key(7), **kwargs)
    b = model.sample(prompt, key=jax.random.key(7), **kwargs)
    c = model.sample(prompt, key=jax.random.key(8), **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_forward_deterministic_given_key():
    model = small_e2tts()
    model.eval()
    mel = jax.random.normal(jax.random.key(0), (2, 24, 100))
    kw = dict(text=['ab', 'cd'], drop_text_cond=False)
    l1 = model(mel, key=jax.random.key(3), **kw).loss
    l2 = model(mel, key=jax.random.key(3), **kw).loss
    l3 = model(mel, key=jax.random.key(4), **kw).loss
    assert float(l1) == float(l2)
    assert float(l1) != float(l3)
