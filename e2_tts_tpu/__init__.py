"""e2_tts_tpu — a TPU-native (JAX / XLA / Pallas) E2-TTS framework.

Re-designed from scratch for TPU with the same capabilities as the PyTorch
reference (lucidrains/e2-tts-pytorch): conditional flow-matching TTS with a
dual-stream (multistream) text/audio transformer, duration predictor, ODE
sampler with classifier-free guidance, and a data-parallel trainer.

Public surface mirrors the reference exports (reference __init__.py:1-9):
`Transformer`, `DurationPredictor`, `E2TTS`, `E2Trainer` (+ `MelSpec`).

Imports are lazy so that model-only use never pulls trainer dependencies.
"""

_EXPORTS = {
    'MelSpec': 'e2_tts_tpu.ops.mel',
    'Transformer': 'e2_tts_tpu.models.transformer',
    'DurationPredictor': 'e2_tts_tpu.models.duration',
    'E2TTS': 'e2_tts_tpu.models.e2tts',
    'E2Trainer': 'e2_tts_tpu.training.trainer',
    'Vocos': 'e2_tts_tpu.vocoder.vocos',
}

__all__ = list(_EXPORTS)

__version__ = '0.1.0'


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
