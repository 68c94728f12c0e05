"""sample() IO paths: vocoder callable, built-in Vocos decode, wav save,
determinism, audio_io."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from e2_tts_tpu.models.e2tts import E2TTS
from e2_tts_tpu.ops.mel import db_to_amplitude
from e2_tts_tpu.utils.audio_io import save_wav, load_wav

HAVE_VOCOS = importlib.util.find_spec('vocos') is not None

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


class _FakeVocos:
    """Stands in for torch Vocos: decode((1, d, n) torch tensor) -> (1, s)."""

    def __init__(self):
        self.inputs = []

    def decode(self, mel):
        import torch
        assert mel.ndim == 3 and mel.shape[0] == 1
        self.inputs.append(np.asarray(mel[0].numpy()))
        return torch.zeros((1, mel.shape[-1] * 256)) + 0.25


def test_use_vocos_decode_path():
    """Built-in Vocos decode (e2_tts.py:1440-1451): per-sample masked decode
    with the reference's DB_to_amplitude quirk applied to the ln-mel."""
    model = small_e2tts(use_vocos=True, sampling_rate=24000)
    fake = _FakeVocos()
    model._vocos = fake   # injected; the real package is loaded lazily

    prompt = jax.random.normal(jax.random.key(0), (2, 8, 100))
    lens = jnp.array([8, 8], dtype=jnp.int32)
    out = model.sample(prompt, text=['a', 'b'], lens=lens, duration=16,
                       steps=2, key=jax.random.key(1), duration_bucket=16)

    assert len(out) == 2 and all(o.shape[-1] == 16 * 256 for o in out)
    assert len(fake.inputs) == 2
    # decode input is (d, n_i) = DB_to_amplitude(mel[mask]).T
    for got in fake.inputs:
        assert got.shape[0] == 100
    raw = model.sample(prompt, text=['a', 'b'], lens=lens, duration=16,
                       steps=2, key=jax.random.key(1), duration_bucket=16,
                       return_raw_output=True)
    expected = np.asarray(db_to_amplitude(raw[0], 1.0, 0.5)).T
    np.testing.assert_allclose(fake.inputs[0], expected, atol=1e-4, rtol=1e-4)


def test_use_vocos_save_to_filename(tmp_path):
    model = small_e2tts(use_vocos=True, sampling_rate=24000)
    model._vocos = _FakeVocos()
    prompt = jax.random.normal(jax.random.key(0), (2, 8, 100))
    model.sample(prompt, text=['a', 'b'], duration=16, steps=2,
                 key=jax.random.key(1), duration_bucket=16,
                 save_to_filename=str(tmp_path / 'out.wav'))
    for i in (1, 2):
        wav, sr = load_wav(str(tmp_path / f'{i}.out.wav'))
        assert sr == 24000 and wav.size == 16 * 256


def test_save_without_vocoder_raises(tmp_path):
    """The reference asserts a vocoder exists before saving (e2_tts.py:1454);
    saving raw mel as wav would silently write garbage."""
    model = small_e2tts(sampling_rate=24000)
    prompt = jax.random.normal(jax.random.key(0), (1, 8, 100))
    with pytest.raises(AssertionError, match='vocoder'):
        model.sample(prompt, text=['a'], duration=16, steps=2,
                     key=jax.random.key(1), duration_bucket=16,
                     save_to_filename=str(tmp_path / 'out.wav'))


@pytest.mark.skipif(not HAVE_VOCOS, reason='torch vocos package not installed')
def test_use_vocos_real_package(tmp_path):
    model = small_e2tts(use_vocos=True, sampling_rate=24000)
    prompt = jax.random.normal(jax.random.key(0), (1, 8, 100))
    out = model.sample(prompt, text=['a'], duration=16, steps=2,
                       key=jax.random.key(1), duration_bucket=16,
                       save_to_filename=str(tmp_path / 'out.wav'))
    assert len(out) == 1
    assert os.path.exists(str(tmp_path / '1.out.wav'))


def test_use_vocos_jax_backend(tmp_path):
    """vocos_backend='jax': batched on-device decode through sample(),
    including save_to_filename, with the vocoder kept out of the model's
    nnx graph (trainer/EMA/checkpoint state untouched)."""
    model = small_e2tts(sampling_rate=24000, use_vocos=True,
                        vocos_backend='jax')
    prompt = jax.random.normal(jax.random.key(0), (2, 8, 100))
    out = model.sample(prompt, text=['ab', 'cd'], duration=16, steps=2,
                       key=jax.random.key(1), duration_bucket=16,
                       save_to_filename=str(tmp_path / 'v.wav'))
    assert isinstance(out, list) and len(out) == 2
    hop = model.vocos.head.hop_length
    assert out[0].shape[-1] == 15 * hop
    assert all(bool(jnp.isfinite(o).all()) for o in out)
    assert (tmp_path / '1.v.wav').exists() and (tmp_path / '2.v.wav').exists()

    # frozen vocoder params must not leak into the model state
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(nnx.state(model, nnx.Param))[0]]
    assert not any('vocos' in p or 'backbone' in p for p in paths)


def test_use_vocos_jax_weight_loading():
    """A torch-layout state dict round-trips through the constructor arg."""
    from e2_tts_tpu.vocoder import Vocos as JaxVocos
    donor = JaxVocos(input_channels=100, rngs=nnx.Rngs(3))
    import numpy as _np
    sd = {}
    sd['backbone.embed.weight'] = _np.transpose(
        _np.asarray(donor.backbone.embed.kernel[...]), (2, 1, 0))
    sd['backbone.embed.bias'] = _np.asarray(donor.backbone.embed.bias[...])
    model = small_e2tts(use_vocos=True, vocos_backend='jax')
    model.vocos.load_torch_state_dict(
        {**{k: _np.asarray(v) for k, v in sd.items()}} | _full_sd(donor))
    np.testing.assert_allclose(
        np.asarray(model.vocos.backbone.embed.kernel[...]),
        np.asarray(donor.backbone.embed.kernel[...]))


def _full_sd(donor):
    """Torch-layout state dict covering every key, synthesised from a donor
    JAX model (tests the converter's completeness)."""
    import numpy as _np
    t = lambda a, perm: _np.transpose(_np.asarray(a), perm)
    sd = {
        'backbone.embed.weight': t(donor.backbone.embed.kernel[...], (2, 1, 0)),
        'backbone.embed.bias': _np.asarray(donor.backbone.embed.bias[...]),
        'backbone.norm.weight': _np.asarray(donor.backbone.norm.scale[...]),
        'backbone.norm.bias': _np.asarray(donor.backbone.norm.bias[...]),
        'backbone.final_layer_norm.weight': _np.asarray(donor.backbone.final_norm.scale[...]),
        'backbone.final_layer_norm.bias': _np.asarray(donor.backbone.final_norm.bias[...]),
        'head.out.weight': t(donor.head.out.kernel[...], (1, 0)),
        'head.out.bias': _np.asarray(donor.head.out.bias[...]),
    }
    for i, blk in enumerate(donor.backbone.blocks):
        p = f'backbone.convnext.{i}.'
        sd[p + 'dwconv.weight'] = t(blk.dwconv.kernel[...], (2, 1, 0))
        sd[p + 'dwconv.bias'] = _np.asarray(blk.dwconv.bias[...])
        sd[p + 'norm.weight'] = _np.asarray(blk.norm.scale[...])
        sd[p + 'norm.bias'] = _np.asarray(blk.norm.bias[...])
        sd[p + 'pwconv1.weight'] = t(blk.pwconv1.kernel[...], (1, 0))
        sd[p + 'pwconv1.bias'] = _np.asarray(blk.pwconv1.bias[...])
        sd[p + 'pwconv2.weight'] = t(blk.pwconv2.kernel[...], (1, 0))
        sd[p + 'pwconv2.bias'] = _np.asarray(blk.pwconv2.bias[...])
        sd[p + 'gamma'] = _np.asarray(blk.gamma[...])
    return sd


def test_sample_prompt_longer_than_generation():
    """Prompt with more frames than the bucketed generation length must be
    truncated, not crash with a negative pad (the reference's F.pad truncates,
    e2_tts.py:1393; ADVICE r1)."""
    model = small_e2tts()
    prompt = jax.random.normal(jax.random.key(0), (1, 40, 100))
    out = model.sample(prompt, text=['hi'], lens=jnp.array([8], jnp.int32),
                       duration=16, steps=2, key=jax.random.key(1),
                       duration_bucket=16, return_raw_output=True)
    assert out.shape == (1, 16, 100)


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
