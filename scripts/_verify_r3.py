"""Round-3 verify drive (per .claude/skills/verify): small-config end-to-end
through the public API on the real TPU, plus the geglu-kernel probe at the
exact flagship shapes that killed the first bench attempt."""
import os
import sys
import tempfile
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


def ok(name, cond=True):
    assert cond, name
    print(f'OK {name}', flush=True)


# 0. geglu probe at both flagship shapes (speech 1408-inner pallas, text
# 704-inner must route to XLA — the round-3 hardware lesson)
from e2_tts_tpu.ops.geglu_kernel import (geglu_dropout,
                                         _geglu_dropout_reference, _use_pallas)
seed = jnp.uint32(7)
for shape, want_pallas in [((16, 1056, 2816), True), ((16, 1056, 1408), False)]:
    h2 = jax.random.normal(jax.random.key(0), shape, dtype=jnp.bfloat16)
    assert _use_pallas(h2, 0.1) == want_pallas, (shape, want_pallas)
    o = np.asarray(geglu_dropout(h2, seed, 0.1), np.float32)
    r = np.asarray(_geglu_dropout_reference(h2, seed, 0.1), np.float32)
    assert np.allclose(o, r, atol=3e-2, rtol=3e-2), (shape, np.abs(o - r).max())
    g = jax.grad(lambda a: geglu_dropout(a, seed, 0.1).astype(jnp.float32).sum())(h2)
    assert np.isfinite(np.asarray(g, np.float32)).all(), shape
    ok(f'geglu {shape} pallas={want_pallas}')

# 1. DurationPredictor loss
dp = DurationPredictor(transformer=dict(**CFG), rngs=nnx.Rngs(0),
                       dtype=jnp.bfloat16)
mel = jax.random.normal(jax.random.key(1), (2, 128, 100), dtype=jnp.bfloat16)
loss = dp(mel, text=['hello world', 'ok'], lens=jnp.array([128, 96]),
          key=jax.random.key(2))
ok('duration loss finite', bool(np.isfinite(float(loss))))

# 2. E2TTS loss on mel and raw wave
model = E2TTS(transformer=dict(**CFG), rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
model.train()
out = model(mel, text=['hello world', 'ok'], lens=jnp.array([128, 96]),
            key=jax.random.key(3))
ok('e2tts mel loss finite', bool(np.isfinite(float(out.loss))))
wave_in = jax.random.normal(jax.random.key(4), (2, 256 * 127))
out_w = model(wave_in, text=['a b', 'c'], key=jax.random.key(5))
ok('e2tts raw-wave loss finite', bool(np.isfinite(float(out_w.loss))))

# 3. full flagship-config train step (the thing that crashed pre-fix):
# dim=512 depth=8 dropout=0.1, value_and_grad + ADOPT update, grads consumed
import functools
import optax
from e2_tts_tpu.training.adopt import adopt

flag = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                              dropout=0.1, attn_backend='auto'),
             rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
flag.train()
opt = nnx.Optimizer(flag, optax.chain(optax.clip_by_global_norm(1.0),
                                      adopt(7.5e-5)), wrt=nnx.Param)
fmel = jax.random.normal(jax.random.key(0), (16, 1024, 100), dtype=jnp.bfloat16)
flens = jnp.full((16,), 1024, dtype=jnp.int32)
ftext = jnp.asarray(np.random.default_rng(0).integers(32, 120, (16, 64)),
                    dtype=jnp.int32)


@functools.partial(nnx.jit, static_argnames=('drop_text',))
def step(model, optimizer, key, drop_text: bool):
    def loss_fn(m):
        return m(fmel, text=ftext, lens=flens, key=key,
                 drop_text_cond=drop_text).loss
    l, grads = nnx.value_and_grad(loss_fn)(model)
    optimizer.update(model, grads)
    return l

l = step(flag, opt, jax.random.key(1), False)
ok('flagship with-text train step finite', bool(np.isfinite(float(l))))
l2 = step(flag, opt, jax.random.key(2), True)
ok('flagship text-dropped train step finite', bool(np.isfinite(float(l2))))

# 4. sample() raw mel + vocoder callable + save_to_filename
small = E2TTS(transformer=dict(**{**CFG, 'dropout': 0.0}), rngs=nnx.Rngs(0),
              dtype=jnp.bfloat16)
prompt = jax.random.normal(jax.random.key(6), (1, 64, 100),
                           dtype=jnp.bfloat16) * 0.3
raw = small.sample(prompt, text=['hello there'], duration=256, steps=4,
                   key=jax.random.key(7), return_raw_output=True,
                   duration_bucket=256)
ok('sample raw mel shape', raw.shape == (1, 256, 100))

tmp = tempfile.mkdtemp()
fn = os.path.join(tmp, 'out.wav')
vocoder = lambda m: [jnp.zeros((int(m.shape[-1]) * 256,)) for _ in range(m.shape[0])]
small.sample(prompt, text=['hello there'], duration=256, steps=4,
             key=jax.random.key(8), vocoder=vocoder, save_to_filename=fn,
             duration_bucket=256)
wavfile = os.path.join(tmp, '1.out.wav')
with wave.open(wavfile) as w:
    ok('saved wav nonempty', w.getnframes() > 0)

# 5. error probes
try:
    E2TTS(transformer=dict(**CFG), tokenizer='bogus', rngs=nnx.Rngs(0))
    raise SystemExit('tokenizer probe FAILED: no error')
except (ValueError, AssertionError):
    ok('bogus tokenizer raises')
try:
    small.sample(prompt, text=['x'], key=jax.random.key(9))
    raise SystemExit('duration probe FAILED: no error')
except (ValueError, AssertionError):
    ok('sample without duration raises')

print('VERIFY ALL OK', flush=True)
