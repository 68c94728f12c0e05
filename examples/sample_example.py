"""Zero-shot inference example: prompt audio + text -> speech.

Mirrors the reference README usage (README.md:30-64): load a trained
checkpoint, condition on a short mel prompt, synthesise the continuation.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from e2_tts_tpu import E2TTS, DurationPredictor
from e2_tts_tpu.training.checkpointing import load_checkpoint
from e2_tts_tpu.utils.audio_io import load_wav


def main():
    e2tts = E2TTS(
        transformer=dict(dim=512, depth=8),
        duration_predictor=DurationPredictor(transformer=dict(dim=512, depth=8)),
        dtype=jnp.bfloat16,
        rngs=nnx.Rngs(0),
    )
    load_checkpoint('e2tts_ckpt', model=e2tts)

    # prompt: any 24 kHz waveform; the model continues it following the text
    wave, sr = load_wav('prompt.wav')
    assert sr == 24_000
    prompt = jnp.asarray(wave)[None, :]       # (1, nw) raw wave -> mel inside

    out = e2tts.sample(
        prompt,
        text=['This sentence is spoken in the voice of the prompt audio.'],
        steps=32,
        cfg_strength=1.0,
        key=jax.random.key(0),
        return_raw_output=True,               # raw mel; attach a vocoder for audio
    )
    np.save('sampled_mel.npy', np.asarray(out[0]))
    print('sampled mel:', out.shape)


if __name__ == '__main__':
    main()
