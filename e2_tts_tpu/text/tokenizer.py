"""Host-side text tokenizers (reference: e2_tts.py:128-166).

Tokenization is string processing — it stays on the host and produces padded
int32 id arrays (pad value -1) that ship to the device once per batch.
"""

from __future__ import annotations

import numpy as np

from e2_tts_tpu.utils.helpers import exists


def pad_id_lists(id_lists: list[np.ndarray], padding_value: int = -1, length: int | None = None) -> np.ndarray:
    """Right-pad a ragged list of 1-D int arrays into (b, nt)."""
    if not exists(length):
        length = max((len(t) for t in id_lists), default=0)
    out = np.full((len(id_lists), length), padding_value, dtype=np.int32)
    for i, ids in enumerate(id_lists):
        n = min(len(ids), length)
        out[i, :n] = ids[:n]
    return out


def list_str_to_ids(texts: list[str], padding_value: int = -1, length: int | None = None) -> np.ndarray:
    """UTF-8 byte tokenizer, one id per byte, padded with -1
    (reference `list_str_to_tensor`, e2_tts.py:128-135).
    """
    id_lists = [np.frombuffer(t.encode('utf-8'), dtype=np.uint8).astype(np.int32) for t in texts]
    return pad_id_lists(id_lists, padding_value, length)


# alias matching the reference name
list_str_to_tensor = list_str_to_ids


def get_g2p_en_encode():
    """English phoneme tokenizer via g2p_en, with the reference's 17 extended
    punctuation tokens appended after the phoneme vocab (e2_tts.py:139-166).
    Optional dependency — raises a clear error if g2p_en is absent.
    """
    try:
        from g2p_en import G2p
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "the 'phoneme_en' tokenizer requires the optional g2p_en package"
        ) from e

    g2p = G2p()

    phoneme_to_index = g2p.p2idx
    num_phonemes = len(phoneme_to_index)

    extended_chars = [
        ' ', ',', '.', '-', '!', '?', "'", '"', '...', '..', '. .', '. . .',
        '. . . .', '. . . . .', '. ...', '... .', '.. ..',
    ]
    num_extended_chars = len(extended_chars)

    extended_chars_dict = {p: (num_phonemes + i) for i, p in enumerate(extended_chars)}
    vocab = {**phoneme_to_index, **extended_chars_dict}

    def encode(texts: list[str], padding_value: int = -1) -> np.ndarray:
        phonemes = [g2p(t) for t in texts]
        id_lists = [np.array([vocab[p] for p in ph], dtype=np.int32) for ph in phonemes]
        return pad_id_lists(id_lists, padding_value)

    return encode, (num_phonemes + num_extended_chars)


def resolve_tokenizer(tokenizer, text_num_embeds=None):
    """Resolve the reference's tokenizer spec ('char_utf8' | 'phoneme_en' |
    callable) into (encode_fn, vocab_size) (e2_tts.py:1015-1024, 1218-1227).
    """
    if callable(tokenizer):
        assert exists(text_num_embeds), \
            '`text_num_embeds` must be given if supplying your own tokenizer encode function'
        return tokenizer, text_num_embeds
    if tokenizer == 'char_utf8':
        return list_str_to_ids, 256
    if tokenizer == 'phoneme_en':
        return get_g2p_en_encode()
    raise ValueError(f'unknown tokenizer string {tokenizer}')
