"""Small python-level helpers (reference: e2_tts.py:77-109)."""

from __future__ import annotations


def exists(v):
    return v is not None


def default(v, d):
    return v if exists(v) else d


def xnor(x, y):
    return not (x ^ y)


def divisible_by(num, den):
    return (num % den) == 0


def set_if_missing_key(d: dict, key, value):
    """Merge a default into a config dict (reference: e2_tts.py:86-90)."""
    if key in d:
        return
    d.update(**{key: value})


def round_up_to_multiple(x: int, m: int) -> int:
    """Round ``x`` up to the nearest multiple of ``m`` (TPU tiling helper)."""
    return ((x + m - 1) // m) * m
