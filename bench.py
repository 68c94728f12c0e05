"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: `sample()` real-time-factor at NFE=32 (driver target from
BASELINE.md: RTF < 0.05 on one v5e chip; vs_baseline = 0.05 / measured, so
>1 beats the target). Extras carry the train-step throughput
(mel-frames/sec/chip) and an analytic comparison against an estimated
reference-on-H100 number (see BENCH_NOTES.md for the estimate's assumptions).

Run from the repo root on the TPU: `python bench.py`.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from flax import nnx  # noqa: E402

from e2_tts_tpu.models.e2tts import E2TTS  # noqa: E402

# flagship config (reference README.md:38-57: dim=512, depth=8)
DIM, DEPTH, HEADS, DIM_HEAD = 512, 8, 8, 64
TRAIN_BATCH, TRAIN_FRAMES = 16, 1024
SAMPLE_FRAMES, NFE_STEPS = 1024, 32
FRAMES_PER_SEC = 24_000 / 256          # 93.75 mel frames per audio second
RTF_TARGET = 0.05


def flagship(dropout=0.0):
    return E2TTS(
        transformer=dict(dim=DIM, depth=DEPTH, heads=HEADS, dim_head=DIM_HEAD,
                         dropout=dropout, attn_backend='auto'),
        rngs=nnx.Rngs(0),
        dtype=jnp.bfloat16,
    )


def analytic_flops_per_frame(n=TRAIN_FRAMES):
    """Matmul-only forward FLOPs per mel frame (MACs x2)."""
    d, dt = DIM, DIM // 2
    inner_s = ((int(d * 4 * 2 / 3) + 63) // 64) * 64
    inner_t = ((int(dt * 4 * 2 / 3) + 63) // 64) * 64
    speech = 4 * d * d + 2 * n * d + (d * inner_s * 2 + inner_s * d) + d * d // 2
    text = 4 * dt * (HEADS * DIM_HEAD) + 2 * n * HEADS * DIM_HEAD \
        + (dt * inner_t * 2 + inner_t * dt)
    return 2 * DEPTH * (speech + text)


def bench_train_step():
    """FAITHFUL reference training config: dropout=0.1 on every attention/FF
    (e2_tts.py:540) with the 25% text-cond-drop mix (e2_tts.py:1127, 1261).
    Attention-prob dropout runs inside the Pallas flash kernel. The step time
    reported is the 0.75/0.25 weighted mix of the two compiled text-drop
    variants — what a real training run pays per step on average."""
    import functools

    import optax
    from e2_tts_tpu.training.adopt import adopt

    model = flagship(dropout=0.1)
    model.train()
    optimizer = nnx.Optimizer(model, optax.chain(
        optax.clip_by_global_norm(1.0), adopt(7.5e-5)), wrt=nnx.Param)

    mel = jax.random.normal(jax.random.key(0),
                            (TRAIN_BATCH, TRAIN_FRAMES, 100), dtype=jnp.bfloat16)
    lens = jnp.full((TRAIN_BATCH,), TRAIN_FRAMES, dtype=jnp.int32)
    text = jnp.asarray(
        np.random.default_rng(0).integers(32, 120, (TRAIN_BATCH, 64)), dtype=jnp.int32)

    @functools.partial(nnx.jit, static_argnames=('drop_text',))
    def step(model, optimizer, key, drop_text: bool):
        def loss_fn(m):
            return m(mel, text=text, lens=lens, key=key,
                     drop_text_cond=drop_text).loss
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    def time_variant(drop_text: bool):
        loss = step(model, optimizer, jax.random.key(1), drop_text)
        loss.block_until_ready()   # compile
        # profiler device self-time: wall-clock through the axon tunnel is
        # NOT reliable (block_until_ready can return before remote execution
        # finishes — see scripts/device_time.py and BENCH_NOTES); fall back
        # to min-of-groups wall only if the xprof converter is unavailable
        try:
            from scripts.device_time import device_time_ms
            ms = device_time_ms(
                lambda: step(model, optimizer, jax.random.key(2), drop_text),
                calls=5)
            return ms / 1e3, loss
        except Exception as e:  # pragma: no cover
            print(f'# device_time unavailable ({e}); wall fallback',
                  file=sys.stderr)
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            for j in range(5):
                loss = step(model, optimizer, jax.random.key(5 * i + j), drop_text)
            loss.block_until_ready()
            times.append((time.perf_counter() - t0) / 5)
        return min(times), loss   # min-of-groups: robust to host/tunnel jitter

    dt_cond, loss = time_variant(False)
    dt_drop, _ = time_variant(True)
    dt = 0.75 * dt_cond + 0.25 * dt_drop   # reference cond_drop_prob = 0.25

    frames_per_sec = TRAIN_BATCH * TRAIN_FRAMES / dt
    return dict(step_ms=dt * 1e3, step_ms_with_text=dt_cond * 1e3,
                step_ms_text_dropped=dt_drop * 1e3,
                frames_per_sec=frames_per_sec, loss=float(loss))


def bench_sample():
    model = flagship(dropout=0.0)

    prompt = jax.random.normal(jax.random.key(0), (1, 256, 100),
                               dtype=jnp.bfloat16) * 0.3
    text = ['the quick brown fox jumps over the lazy dog ' * 3]

    def run(key):
        return model.sample(
            prompt, text=text, duration=SAMPLE_FRAMES, steps=NFE_STEPS,
            key=key, return_raw_output=True, duration_bucket=SAMPLE_FRAMES)

    run(jax.random.key(1)).block_until_ready()   # compile

    times = []
    for i in range(6):
        t0 = time.perf_counter()
        out = run(jax.random.key(i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)   # min-of-N: robust to host/tunnel jitter

    audio_seconds = SAMPLE_FRAMES / FRAMES_PER_SEC
    return dict(sample_s=dt, rtf=dt / audio_seconds)


def main():
    import sys
    train = bench_train_step()
    print(f"# train: {train}", file=sys.stderr, flush=True)
    sample = bench_sample()
    print(f"# sample: {sample}", file=sys.stderr, flush=True)

    # analytic reference-on-H100 estimate (see BENCH_NOTES.md): eager PyTorch
    # at ~12% bf16 MFU on H100 (989 TFLOP/s peak), fwd+bwd = 3x fwd FLOPs
    f_frame = analytic_flops_per_frame() * 3
    h100_ref_frames_per_sec = 0.12 * 989e12 / f_frame

    rtf = sample['rtf']
    result = {
        'metric': 'sample_rtf_nfe32',
        'value': round(rtf, 5),
        'unit': 'rtf (lower is better; target < 0.05)',
        'vs_baseline': round(RTF_TARGET / rtf, 3),
        'extra': {
            'train_mel_frames_per_sec_per_chip': round(train['frames_per_sec'], 1),
            'train_step_ms': round(train['step_ms'], 2),
            'train_step_ms_with_text': round(train['step_ms_with_text'], 2),
            'train_step_ms_text_dropped': round(train['step_ms_text_dropped'], 2),
            'train_loss_finite': bool(np.isfinite(train['loss'])),
            'sample_seconds_per_utterance': round(sample['sample_s'], 3),
            'vs_2x_h100_estimate': round(
                train['frames_per_sec'] / (2 * h100_ref_frames_per_sec), 3),
            'h100_ref_estimate_frames_per_sec': round(h100_ref_frames_per_sec, 1),
            'config': (f'dim={DIM} depth={DEPTH} bf16, '
                       f'batch={TRAIN_BATCH}x{TRAIN_FRAMES}f, dropout=0.1, '
                       f'25% text-drop mix (faithful reference training config)'),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
