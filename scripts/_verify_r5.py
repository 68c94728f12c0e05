"""Round-5 verify drive: small-config e2e through the public API on TPU."""
import os, wave
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
from flax import nnx

from e2_tts_tpu import E2TTS, DurationPredictor, E2Trainer

CFG = dict(dim=128, depth=4, heads=4, dim_head=32, num_registers=4,
           max_seq_len=512, kernel_size=15, dropout=0.0)

# 1. DurationPredictor loss
dp = DurationPredictor(transformer=dict(**CFG), rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
mel = jax.random.normal(jax.random.key(0), (2, 128, 100), dtype=jnp.bfloat16)
dl = dp(mel, text=['hello world', 'ok'], key=jax.random.key(1))
print('duration loss:', float(dl))
assert np.isfinite(float(dl))

# 2. E2TTS loss, mel + raw wave input
model = E2TTS(transformer=dict(**CFG), rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
model.train()
out = model(mel, text=['hello world', 'ok'], key=jax.random.key(2))
print('e2tts mel loss:', float(out.loss))
assert np.isfinite(float(out.loss))
wav_in = jax.random.normal(jax.random.key(3), (2, 256 * 100)) * 0.1
model_w = E2TTS(transformer=dict(**CFG), cond_drop_prob=0.3,
                rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
out_w = model_w(wav_in, text=['a b c', 'd'], key=jax.random.key(4))
print('e2tts wave loss:', float(out_w.loss))
assert np.isfinite(float(out_w.loss))

# 3. Trainer on a toy dataset + checkpoint resume
class ArrayDataset:
    def __init__(self, n=8):
        rng = np.random.default_rng(0)
        self.items = [dict(mel_spec=rng.standard_normal((100, 96)).astype('f4'),
                           text='sample %d' % i) for i in range(n)]
    def __len__(self):
        return len(self.items)
    def __getitem__(self, i):
        return self.items[i]

ckpt_dir = '/tmp/r5_verify_ckpt'
os.system('rm -rf %s' % ckpt_dir)
trainer = E2Trainer(model, learning_rate=1e-4, num_warmup_steps=2,
                    checkpoint_path=ckpt_dir, log_file=None)
trainer.train(ArrayDataset(), epochs=2, batch_size=4, save_step=2)
step = trainer.load_checkpoint()
print('resumed at step:', step)
assert step > 0

# 4. sample(): raw mel + vocoder callable + wav save
model.eval()
prompt = jax.random.normal(jax.random.key(5), (1, 64, 100), dtype=jnp.bfloat16) * 0.3
raw = model.sample(prompt, text=['hello'], duration=128, steps=4,
                   key=jax.random.key(6), return_raw_output=True)
print('sample raw shape:', raw.shape)
assert raw.shape[1] == 128 and np.isfinite(np.asarray(raw, dtype=np.float32)).all()

def toy_vocoder(m):
    b, n, _ = m.shape
    return jnp.tanh(jnp.mean(m, axis=-1, keepdims=True)
                    * jnp.ones((b, n, 256))).reshape(b, -1)

os.system('rm -f /tmp/1.r5v.wav')
model.sample(prompt, text=['hello'], duration=128, steps=4,
             key=jax.random.key(7), vocoder=toy_vocoder,
             save_to_filename='/tmp/r5v.wav')
with wave.open('/tmp/1.r5v.wav') as f:
    print('wav frames:', f.getnframes(), 'ch:', f.getnchannels())
    assert f.getnframes() > 0

# 5. Error probes
try:
    E2TTS(transformer=dict(**CFG), tokenizer='bogus', rngs=nnx.Rngs(0))
    raise AssertionError('bogus tokenizer accepted')
except ValueError as e:
    print('bogus tokenizer ->', type(e).__name__)
try:
    model.sample(prompt, text=['hello'], steps=2, key=jax.random.key(8))
    raise AssertionError('duration-less sample accepted')
except ValueError as e:
    print('no duration ->', type(e).__name__)
long_text = ' '.join(['word'] * 40)
grown = model.sample(prompt, text=[long_text], duration=32, steps=2,
                     key=jax.random.key(9), return_raw_output=True)
print('long-text growth:', grown.shape)
assert grown.shape[1] == len(long_text) + 1

print('VERIFY OK')
