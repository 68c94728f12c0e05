"""ctypes bindings for the native host-side audio prep library.

Builds `native/libaudioprep.so` on demand (g++, no pybind11 needed) and
falls back gracefully when a compiler is unavailable — `load()` returns None
and callers (training/data.py) use the scipy path instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libaudioprep.so')

_lib = None
_load_attempted = False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True

    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.SubprocessError):
        return None

    lib.audioprep_resample_out_len.restype = ctypes.c_int64
    lib.audioprep_resample_out_len.argtypes = [ctypes.c_int64] * 3
    lib.audioprep_resample.restype = ctypes.c_int64
    lib.audioprep_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    lib.audioprep_pcm16_to_float.restype = ctypes.c_int64
    lib.audioprep_pcm16_to_float.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]

    _lib = lib
    return _lib


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray | None:
    """Native polyphase resample; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, dtype=np.float32)
    n_out = lib.audioprep_resample_out_len(len(x), sr_in, sr_out)
    y = np.empty(n_out, dtype=np.float32)
    written = lib.audioprep_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sr_in, sr_out, y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if written < 0:
        return None
    return y[:written]


def pcm16_to_float(pcm: np.ndarray, n_channels: int = 1) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(pcm, dtype=np.int16)
    frames = len(x) // n_channels
    out = np.empty(frames, dtype=np.float32)
    written = lib.audioprep_pcm16_to_float(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(x), n_channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if written < 0:
        return None
    return out[:written]
