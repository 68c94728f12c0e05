"""Flagship E2TTS scan abort triage: separate compile from execute; vary batch
and optimizer. Usage: python scripts/_scan_triage.py <B> <opt:0|1>"""
import sys, time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
from flax import nnx
import optax
from e2_tts_tpu.models.e2tts import E2TTS
from e2_tts_tpu.training.adopt import adopt

B = int(sys.argv[1]); USE_OPT = bool(int(sys.argv[2])); N = 1024
model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                               dropout=0.1, attn_backend='auto',
                               scan_layers=True),
              rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
model.train()
mel = jax.random.normal(jax.random.key(0), (B, N, 100), dtype=jnp.bfloat16)
lens = jnp.full((B,), N, dtype=jnp.int32)
text = jnp.asarray(np.random.default_rng(0).integers(32, 120, (B, 64)), dtype=jnp.int32)

if USE_OPT:
    optimizer = nnx.Optimizer(model, optax.chain(
        optax.clip_by_global_norm(1.0), adopt(7.5e-5)), wrt=nnx.Param)
    graphdef, state = nnx.split((model, optimizer))
else:
    graphdef, state = nnx.split(model)

def pure_step(state, key):
    if USE_OPT:
        model, optimizer = nnx.merge(graphdef, state)
    else:
        model = nnx.merge(graphdef, state)
    def loss_fn(m):
        return m(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss
    loss, grads = nnx.value_and_grad(loss_fn)(model)
    if USE_OPT:
        optimizer.update(model, grads)
        _, new_state = nnx.split((model, optimizer))
    else:
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        loss = loss + gsum * 0.0
        _, new_state = nnx.split(model)
    return loss, new_state

t0 = time.perf_counter()
lowered = jax.jit(pure_step).lower(state, jax.random.key(1))
print('lowered in %.1fs' % (time.perf_counter() - t0), flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print('compiled in %.1fs' % (time.perf_counter() - t0), flush=True)
mem = compiled.memory_analysis()
if mem is not None:
    print('temp %.2f GB, args %.2f GB, out %.2f GB' % (
        mem.temp_size_in_bytes / 2**30, mem.argument_size_in_bytes / 2**30,
        mem.output_size_in_bytes / 2**30), flush=True)
t0 = time.perf_counter()
loss, new_state = compiled(state, jax.random.key(1))
jax.block_until_ready(loss)
print('executed in %.1fs  loss %.4f' % (time.perf_counter() - t0, float(loss)), flush=True)
