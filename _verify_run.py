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

# DurationPredictor loss
dp = DurationPredictor(transformer=dict(**CFG), rngs=nnx.Rngs(0))
mel = jax.random.normal(jax.random.key(0), (2, 64, 100))
loss = dp(mel, text=['hello world', 'verify run'], lens=jnp.array([60, 64]), return_loss=True)
print('dp loss', float(loss), flush=True)
assert np.isfinite(float(loss))

# E2TTS loss on mel and raw wave
m = E2TTS(transformer=dict(**CFG), rngs=nnx.Rngs(0))
out = m(mel, text=['hello world', 'verify run'], lens=jnp.array([60, 64]), key=jax.random.key(1))
print('e2tts mel loss', float(out.loss), flush=True)
assert np.isfinite(float(out.loss))
wave_in = jax.random.normal(jax.random.key(2), (2, 24000)) * 0.1
out2 = m(wave_in, text=['a b', 'c d'], key=jax.random.key(3))
print('e2tts wave loss', float(out2.loss), flush=True)
assert np.isfinite(float(out2.loss))

# trainer on a toy dataset + checkpoint resume
from e2_tts_tpu.training.data import ArrayDataset
import tempfile
# ArrayDataset items are (channels, frames) — the reference's mel convention
ds = ArrayDataset([np.asarray(jax.random.normal(jax.random.key(i), (100, 48)) * 0.3) for i in range(4)],
                  texts=['one', 'two', 'three', 'four'])
ck = tempfile.mkdtemp(prefix='verify_ck_')
tr = E2Trainer(m, checkpoint_path=ck, log_file=None)
tr.train(ds, epochs=2, batch_size=2, save_step=2)
step, _key = tr.load_checkpoint()
print('resume step', step, flush=True)
assert step > 0

# sampling: raw mel + vocoder callable + save
prompt = jax.random.normal(jax.random.key(5), (1, 24, 100)) * 0.3
raw = m.sample(prompt, text=['the quick brown fox'], duration=96, steps=4,
               key=jax.random.key(6), return_raw_output=True)
print('raw mel sample', raw.shape, flush=True)
assert raw.shape[0] == 1 and raw.shape[2] == 100

voc = lambda mel_bdn: [jnp.zeros((mel_bdn.shape[2] * 256,)) + jnp.mean(mel_bdn)] * mel_bdn.shape[0]
tmpd = tempfile.mkdtemp(prefix='verify_wav_')
outp = os.path.join(tmpd, 'out.wav')
m.sample(prompt, text=['the quick brown fox'], duration=96, steps=4,
         key=jax.random.key(7), vocoder=voc, save_to_filename=outp)
with wave.open(os.path.join(tmpd, '1.out.wav')) as f:
    print('wav frames', f.getnframes(), 'rate', f.getframerate(), flush=True)
    assert f.getnframes() > 0

# probes
try:
    E2TTS(transformer=dict(**CFG), tokenizer='bogus', rngs=nnx.Rngs(0)); raise SystemExit('no raise')
except ValueError as e:
    print('bogus tokenizer ->', type(e).__name__, flush=True)
try:
    m.sample(prompt, text=['x'], steps=2, key=jax.random.key(8)); raise SystemExit('no raise')
except ValueError as e:
    print('no duration ->', type(e).__name__, flush=True)
long_text = 'abcdefghij ' * 20   # 220 chars > duration 96
out3 = m.sample(prompt, text=[long_text.strip()], duration=96, steps=2,
                key=jax.random.key(9), return_raw_output=True)
print('text-longer-than-duration out frames', out3.shape[1], flush=True)
assert out3.shape[1] >= 220

print('VERIFY OK', flush=True)
