"""Datasets and collation (reference: trainer.py:61-131).

TPU-specific design: batches are padded to *bucketed* lengths (next multiple
of `frame_bucket`) so repeated shapes hit the jit cache instead of
recompiling, and raggedness is carried by the length arrays. Text stays as
python strings until collation (host-side tokenization).
"""

from __future__ import annotations

import numpy as np

from e2_tts_tpu.ops.mel import MelSpec
from e2_tts_tpu.utils.helpers import round_up_to_multiple


def resample_audio(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Host-side resampling (reference reaches torchaudio's C++ resampler,
    trainer.py:117). Native C++ polyphase (native/audioprep.cc) when built,
    then scipy, then linear fallback."""
    if orig_sr == target_sr:
        return audio

    from e2_tts_tpu import native
    out = native.resample(audio, orig_sr, target_sr)
    if out is not None:
        return out

    try:
        from scipy.signal import resample_poly
        from math import gcd
        g = gcd(orig_sr, target_sr)
        return resample_poly(audio, target_sr // g, orig_sr // g).astype(np.float32)
    except ImportError:
        n_out = int(round(len(audio) * target_sr / orig_sr))
        x_old = np.linspace(0.0, 1.0, len(audio), endpoint=False)
        x_new = np.linspace(0.0, 1.0, n_out, endpoint=False)
        return np.interp(x_new, x_old, audio).astype(np.float32)


def collate_fn(batch: list[dict], frame_bucket: int = 64) -> dict:
    """Pad per-item mels ('mel_spec', (d, n)) to the bucketed batch max;
    text stays a list[str] (reference: trainer.py:61-82)."""
    mel_specs = [np.asarray(item['mel_spec']) for item in batch]
    mel_lengths = np.asarray([m.shape[-1] for m in mel_specs], dtype=np.int32)
    max_len = round_up_to_multiple(int(mel_lengths.max()), frame_bucket)

    d = mel_specs[0].shape[0]
    mel = np.zeros((len(batch), d, max_len), dtype=np.float32)
    for i, m in enumerate(mel_specs):
        mel[i, :, : m.shape[-1]] = m

    text = [item['text'] for item in batch]
    text_lengths = np.asarray([len(t) for t in text], dtype=np.int32)

    return dict(mel=mel, mel_lengths=mel_lengths, text=text, text_lengths=text_lengths)


class HFDataset:
    """HuggingFace datasets wrapper (reference: trainer.py:86-131): filters
    utterances outside 0.3-20 s, resamples to 24 kHz, computes the log-mel
    per item on the host CPU."""

    def __init__(self, hf_dataset, target_sample_rate: int = 24_000,
                 hop_length: int = 256):
        self.data = hf_dataset
        self.target_sample_rate = target_sample_rate
        self.hop_length = hop_length
        self.mel_spectrogram = MelSpec(sampling_rate=target_sample_rate,
                                       hop_length=hop_length)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index):
        # skip out-of-envelope samples like the reference (trainer.py:110-112),
        # iteratively rather than recursively
        for _ in range(len(self.data)):
            row = self.data[index]
            audio = np.asarray(row['audio']['array'], dtype=np.float32)
            sample_rate = row['audio']['sampling_rate']
            duration = audio.shape[-1] / sample_rate
            if 0.3 <= duration <= 20:
                break
            index = (index + 1) % len(self.data)
        else:
            raise RuntimeError('no sample with duration in [0.3s, 20s] found')

        audio = resample_audio(audio, sample_rate, self.target_sample_rate)

        import jax.numpy as jnp
        mel = np.asarray(self.mel_spectrogram(jnp.asarray(audio)[None])[0])

        return dict(mel_spec=mel, text=row['transcript'])


class ArrayDataset:
    """Minimal in-memory dataset of (mel, text) pairs for tests/examples."""

    def __init__(self, mels: list[np.ndarray], texts: list[str]):
        assert len(mels) == len(texts)
        self.mels = mels
        self.texts = texts

    def __len__(self):
        return len(self.mels)

    def __getitem__(self, i):
        return dict(mel_spec=self.mels[i], text=self.texts[i])


def iter_batches(dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, frame_bucket: int = 64, drop_last: bool = True):
    """Host-side batch iterator (the reference uses a torch DataLoader,
    trainer.py:232). Indices shuffled per epoch; incomplete tails dropped so
    batch shape stays constant for jit."""
    n = len(dataset)
    order = np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
    for start in range(0, n, batch_size):
        idx = order[start: start + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        yield collate_fn([dataset[int(i)] for i in idx], frame_bucket=frame_bucket)


def prefetch(iterator, size: int = 2):
    """Background-thread prefetch: overlaps host-side collation/tokenization
    with device compute (the reference gets this from DataLoader workers,
    trainer.py:232)."""
    import queue
    import threading

    q = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
