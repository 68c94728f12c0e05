"""End-to-end verify drive on the real TPU (small config, see skills/verify)."""
import os
import wave

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp
import numpy as np
from flax import nnx

from e2_tts_tpu import E2TTS, DurationPredictor, E2Trainer

CFG = dict(dim=128, depth=4, heads=4, dim_head=32, num_registers=4,
           max_seq_len=512, kernel_size=15, dropout=0.1)

rng = np.random.default_rng(0)
mel = jnp.asarray(rng.normal(size=(2, 64, 100)), dtype=jnp.float32)
texts = ['hello world', 'tpu verify drive']

# 1. DurationPredictor loss
dp = DurationPredictor(transformer=dict(CFG), rngs=nnx.Rngs(0))
dp_loss = dp(mel, text=texts, key=jax.random.key(0), return_loss=True)
print('dp loss:', float(dp_loss))
assert np.isfinite(float(dp_loss))

# 2. E2TTS loss on mel + raw wave (MelSpec on device)
model = E2TTS(transformer=dict(CFG), rngs=nnx.Rngs(0))
out = model(mel, text=texts, key=jax.random.key(1))
print('e2 loss (mel):', float(out.loss))
assert np.isfinite(float(out.loss))

wave_in = jnp.asarray(rng.normal(size=(2, 256 * 64)), dtype=jnp.float32) * 0.1
out_w = model(wave_in, text=texts, key=jax.random.key(2))
print('e2 loss (wave):', float(out_w.loss))
assert np.isfinite(float(out_w.loss))

# 3. sample() with vocoder callable + save_to_filename
fake_vocoder = lambda m: jnp.zeros((m.shape[0], m.shape[1] * 256))
os.makedirs('/tmp/verify_out', exist_ok=True)
audio = model.sample(mel[:, :32], text=texts, duration=64,
                     steps=4, vocoder=fake_vocoder,
                     save_to_filename='/tmp/verify_out/v.wav')
with wave.open('/tmp/verify_out/1.v.wav') as f:
    print('wav frames:', f.getnframes())
    assert f.getnframes() > 0

# raw-mel output path
mels = model.sample(mel[:, :32], text=texts, duration=64, steps=4)
print('sample mel shape:', mels.shape)

# built-in JAX Vocos decode on device (random-init weights)
vmodel = E2TTS(transformer=dict(CFG), use_vocos=True, vocos_backend='jax',
               sampling_rate=24000, rngs=nnx.Rngs(0))
wavs = vmodel.sample(mel[:, :32], text=texts, duration=64, steps=4,
                     save_to_filename='/tmp/verify_out/jv.wav')
print('jax-vocos wav:', len(wavs), wavs[0].shape)
assert all(np.isfinite(np.asarray(w)).all() for w in wavs)
with wave.open('/tmp/verify_out/1.jv.wav') as f:
    assert f.getnframes() > 0

# 4. probes
try:
    E2TTS(transformer=dict(CFG), tokenizer='bogus_tokenizer', rngs=nnx.Rngs(0))
    raise SystemExit('FAIL: bogus tokenizer accepted')
except (ValueError, AssertionError) as e:
    print('bogus tokenizer raises ok')

try:
    model.sample(mel[:, :32], text=texts, steps=2)
    raise SystemExit('FAIL: sample without duration accepted')
except ValueError:
    print('sample without duration raises ok')

print('VERIFY DRIVE OK')
