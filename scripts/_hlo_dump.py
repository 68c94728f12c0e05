"""Dump optimized train-step HLO; grep for blocks.py:405 ops (layout diag)."""
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

@nnx.jit
def step(model, optimizer, key):
    def loss_fn(m):
        return m(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss
    loss, grads = nnx.value_and_grad(loss_fn)(model)
    optimizer.update(model, grads)
    return loss

k = jax.random.key(1)
# trace+compile (cache hit) and print the optimized module
c = step.lower(model, optimizer, k).compile()
txt = c.as_text()
open('/tmp/step_hlo.txt', 'w').write(txt)
print('HLO chars:', len(txt))
