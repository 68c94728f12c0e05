import os, wave
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
from flax import nnx

from e2_tts_tpu import E2TTS, DurationPredictor, E2Trainer
from e2_tts_tpu.training.data import ArrayDataset

TF = dict(dim=128, depth=4, heads=4, dim_head=32, num_registers=4,
          max_seq_len=512, kernel_size=15, dropout=0.0)
print('devices:', jax.devices())

dp = DurationPredictor(transformer=dict(**TF), rngs=nnx.Rngs(0))
mel = jax.random.normal(jax.random.key(0), (2, 48, 100)) * 0.3
loss = dp(mel, text=['hello there', 'ok'], key=jax.random.key(1))
print('duration loss:', float(loss)); assert np.isfinite(float(loss))

model = E2TTS(transformer=dict(**TF), rngs=nnx.Rngs(0))
out = model(mel, text=['hello there', 'ok'], key=jax.random.key(1))
print('e2tts mel loss:', float(out.loss)); assert np.isfinite(float(out.loss))

wav = jax.random.normal(jax.random.key(2), (2, 24000)) * 0.05
out2 = model(wav, text=['a', 'b'], key=jax.random.key(3))
print('e2tts raw-wave loss:', float(out2.loss)); assert np.isfinite(float(out2.loss))

# trainer + checkpoint resume
rng = np.random.default_rng(0)
ds = ArrayDataset([rng.normal(size=(100, 32 + 4 * i)).astype(np.float32) * .3
                   for i in range(4)], ['verify %d' % i for i in range(4)])
import shutil, tempfile
ckpt_dir = tempfile.mkdtemp(prefix='verify_ckpt_')   # always fresh: stale
# dirs from older runs may hold pre-migration layouts or partial state
tr = E2Trainer(model, log_file=None, checkpoint_path=ckpt_dir,
               num_warmup_steps=2)
tr.train(ds, epochs=2, batch_size=2, save_step=2, frame_bucket=32)
step, _key = tr.load_checkpoint()
print('resumed step:', step); assert step > 0

# sampling: raw mel + vocoder callable + save
prompt = jax.random.normal(jax.random.key(4), (1, 16, 100)) * 0.3
raw = model.sample(prompt, text=['hello'], duration=32, steps=4,
                   key=jax.random.key(5), return_raw_output=True,
                   duration_bucket=32)
print('sample raw:', raw.shape, bool(jnp.isfinite(raw).all()))
assert raw.shape == (1, 32, 100) and bool(jnp.isfinite(raw).all())

voc = lambda m: jnp.zeros((m.shape[0], m.shape[2] * 256)) + m.mean()
fn = '/tmp/verify_out.wav'
audio = model.sample(prompt, text=['hello'], duration=32, steps=4,
                     key=jax.random.key(5), vocoder=voc,
                     duration_bucket=32, save_to_filename=fn)
with wave.open('/tmp/1.verify_out.wav') as w:
    print('wav:', w.getnchannels(), w.getframerate(), w.getnframes())
    assert w.getnframes() > 0

# probes
try:
    E2TTS(transformer=dict(**TF), tokenizer='bogus', rngs=nnx.Rngs(0))
    raise SystemExit('FAIL: bogus tokenizer accepted')
except ValueError as e:
    print('bogus tokenizer ->', e)
try:
    model.sample(prompt, text=['x'], steps=2, key=jax.random.key(6))
    raise SystemExit('FAIL: sample without duration accepted')
except ValueError as e:
    print('no duration ->', e)
long_text = 'abcdefghij' * 5   # 50 chars > duration 32
g = model.sample(prompt, text=[long_text], duration=32, steps=2,
                 key=jax.random.key(7), return_raw_output=True,
                 duration_bucket=64)
print('text-longer-than-duration output frames:', g.shape[1])
assert g.shape[1] == len(long_text) + 1

# NEW this round: SP-enabled model samples at indivisible lengths
from e2_tts_tpu.parallel.sp import make_seq_mesh, enable_sequence_parallel
if len(jax.devices()) >= 4:
    mesh = make_seq_mesh(seq=4, data=1)
    enable_sequence_parallel(model, mesh)
    r = model.sample(prompt, text=['hi'], duration=17, steps=2,
                     key=jax.random.key(8), return_raw_output=True,
                     duration_bucket=17)
    print('sp_paused sample:', r.shape, bool(jnp.isfinite(r).all()))
else:
    print('single chip: sp_paused leg exercised in CPU-mesh tests instead')
print('VERIFY OK')
