"""Throughput at larger batch with scan_layers/remat (temp-HBM headroom).
Usage: python scripts/_b32_probe.py <B> <scan:0|1> [remat]
remat: 0 (off), 1 (full), or a jax.checkpoint_policies name for selective."""
import sys, time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
from flax import nnx
import functools
import optax
from e2_tts_tpu.models.e2tts import E2TTS
from e2_tts_tpu.training.adopt import adopt

B = int(sys.argv[1]); SCAN = bool(int(sys.argv[2])); N = 1024
REMAT = sys.argv[3] if len(sys.argv) > 3 else '0'
REMAT = {'0': False, '1': True}.get(REMAT, REMAT)
model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                               dropout=0.1, attn_backend='auto',
                               scan_layers=SCAN, remat=REMAT),
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
loss = step(model, optimizer, k); jax.block_until_ready(loss)
best = float('inf')
for g in range(4):
    t0 = time.perf_counter()
    for _ in range(5):
        loss = step(model, optimizer, k)
    jax.block_until_ready(loss)
    best = min(best, (time.perf_counter() - t0) / 5)
ms = best * 1e3
print('B=%d scan=%d remat=%s: %.1f ms/step -> %.0f frames/s'
      % (B, SCAN, REMAT, ms, B * N / best))
