"""Tokenizers, HFDataset wrapper, duration-predictor freq tokens."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from e2_tts_tpu.text.tokenizer import (
    list_str_to_ids, pad_id_lists, resolve_tokenizer,
)
from e2_tts_tpu.training.data import HFDataset


def test_list_str_to_ids():
    out = list_str_to_ids(['ab', 'xyz!'])
    assert out.shape == (2, 4)
    np.testing.assert_array_equal(out[0], [97, 98, -1, -1])
    np.testing.assert_array_equal(out[1], [120, 121, 122, 33])
    # utf-8 multibyte chars become multiple ids
    out2 = list_str_to_ids(['é'])
    assert out2.shape == (1, 2)
    # explicit padded length
    out3 = list_str_to_ids(['ab'], length=6)
    assert out3.shape == (1, 6)


def test_pad_id_lists_empty_and_truncate():
    out = pad_id_lists([np.array([1, 2, 3], dtype=np.int32)], length=2)
    np.testing.assert_array_equal(out, [[1, 2]])


def test_resolve_tokenizer():
    enc, vocab = resolve_tokenizer('char_utf8', None)
    assert vocab == 256
    assert enc(['a'])[0, 0] == 97

    custom = lambda texts: np.zeros((len(texts), 3), dtype=np.int32)
    enc2, vocab2 = resolve_tokenizer(custom, 42)
    assert vocab2 == 42
    with pytest.raises(AssertionError):
        resolve_tokenizer(custom, None)   # custom requires text_num_embeds
    with pytest.raises(ValueError):
        resolve_tokenizer('nope', None)


def test_phoneme_tokenizer_gated():
    try:
        import g2p_en  # noqa: F401
        has_g2p = True
    except ImportError:
        has_g2p = False
    if not has_g2p:
        with pytest.raises(ImportError):
            resolve_tokenizer('phoneme_en', None)
    else:
        enc, vocab = resolve_tokenizer('phoneme_en', None)
        ids = enc(['hello'])
        assert (ids[ids != -1] < vocab).all()


class _FakeRows:
    """Duck-typed HF dataset: list of {audio: {array, sampling_rate}, transcript}."""

    def __init__(self, rows):
        self.rows = rows

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return self.rows[i]


def _row(seconds, sr=24000, text='hi'):
    n = int(seconds * sr)
    return dict(audio=dict(array=np.random.default_rng(0).standard_normal(n) * 0.1,
                           sampling_rate=sr), transcript=text)


def test_hfdataset_mel_and_filtering():
    ds = HFDataset(_FakeRows([
        _row(0.1),              # too short: skipped to the next index
        _row(1.0, text='ok'),
        _row(25.0),             # too long
        _row(0.5, sr=48000, text='resampled'),
    ]))
    assert len(ds) == 4

    item = ds[0]     # falls through to index 1
    assert item['text'] == 'ok'
    assert item['mel_spec'].shape[0] == 100
    # 1 s at 24k / hop 256 -> 94 frames
    assert item['mel_spec'].shape[1] == 24000 // 256 + 1

    item3 = ds[3]    # 48k resampled to 24k: 0.5 s -> 47 frames
    assert item3['text'] == 'resampled'
    assert item3['mel_spec'].shape[1] == 12000 // 256 + 1


def test_hfdataset_all_filtered_raises():
    ds = HFDataset(_FakeRows([_row(0.1), _row(0.05)]))
    with pytest.raises(RuntimeError):
        ds[0]


def test_duration_predictor_freq_tokens():
    from e2_tts_tpu.models.duration import DurationPredictor
    dp = DurationPredictor(
        transformer=dict(dim=64, depth=2, heads=2, dim_head=16, ff_mult=2,
                         num_registers=2, max_seq_len=64, kernel_size=7,
                         dropout=0.0, num_residual_streams=1,
                         attn_backend='xla'),
        num_freq_tokens=2,
        rngs=nnx.Rngs(0))
    assert dp.has_freq_axis and dp.transformer.has_freq_axis
    mel = jax.random.normal(jax.random.key(0), (2, 24, 100))
    loss = dp(mel, text=['ab', 'cd'], key=jax.random.key(1))
    assert np.isfinite(float(loss))
    pred = dp(mel, return_loss=False)
    assert pred.shape == (2,)
