"""Profiler device-time of the faithful train step."""
import functools
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx
from e2_tts_tpu.models.e2tts import E2TTS
from e2_tts_tpu.training.adopt import adopt
from scripts.device_time import device_time_ms

B, N = 16, 1024
model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                               dropout=0.1, attn_backend='auto'),
              rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
model.train()
optimizer = nnx.Optimizer(model, optax.chain(
    optax.clip_by_global_norm(1.0), adopt(7.5e-5)), wrt=nnx.Param)
mel = jax.random.normal(jax.random.key(0), (B, N, 100), dtype=jnp.bfloat16)
lens = jnp.full((B,), N, dtype=jnp.int32)
text = jnp.asarray(np.random.default_rng(0).integers(32, 120, (B, 64)), dtype=jnp.int32)

@functools.partial(nnx.jit, static_argnames=())
def step(model, optimizer, key):
    def loss_fn(m):
        return m(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss
    loss, grads = nnx.value_and_grad(loss_fn)(model)
    optimizer.update(model, grads)
    return loss

k = jax.random.key(1)
loss = step(model, optimizer, k)
print('loss:', float(loss))
assert np.isfinite(float(loss))
ms = device_time_ms(lambda: step(model, optimizer, k), calls=5)
print('train step device time: %.2f ms -> %.0f frames/s' % (ms, B * N / ms * 1e3))
