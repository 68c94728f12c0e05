"""End-to-end training example (reference: train_example.py:1-39).

Trains E2TTS on the GLOBE dataset from HuggingFace. Requires the `datasets`
package and network access; swap in any dataset of {audio, transcript} rows.
"""

import jax.numpy as jnp
from flax import nnx

from e2_tts_tpu import E2TTS, DurationPredictor, E2Trainer
from e2_tts_tpu.training.data import HFDataset


def main():
    from datasets import load_dataset

    duration_predictor = DurationPredictor(
        transformer=dict(
            dim=512,
            depth=8,
        ),
        rngs=nnx.Rngs(0),
    )

    e2tts = E2TTS(
        duration_predictor=None,
        transformer=dict(
            dim=512,
            depth=12,
        ),
        dtype=jnp.bfloat16,   # TPU compute dtype; params stay fp32
        rngs=nnx.Rngs(0),
    )

    train_dataset = HFDataset(load_dataset('MushanW/GLOBE', split='train'))

    trainer = E2Trainer(
        e2tts,
        duration_predictor=duration_predictor,   # side loss, logged only
        learning_rate=7.5e-5,
        num_warmup_steps=20_000,
        checkpoint_path='e2tts_ckpt',
        use_tensorboard=True,
    )

    trainer.train(
        train_dataset,
        epochs=10,
        batch_size=32,
        save_step=1000,
    )


if __name__ == '__main__':
    main()
