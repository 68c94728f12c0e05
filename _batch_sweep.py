import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import optax
from flax import nnx
from e2_tts_tpu.models.e2tts import E2TTS
from e2_tts_tpu.training.adopt import adopt

def bench(B, N=1024):
    model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                                   dropout=0.0, attn_backend='pallas'),
                  rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
    model.eval()
    opt = nnx.Optimizer(model, optax.chain(optax.clip_by_global_norm(1.0), adopt(7.5e-5)), wrt=nnx.Param)
    mel = jax.random.normal(jax.random.key(0), (B, N, 100), dtype=jnp.bfloat16)
    lens = jnp.full((B,), N, dtype=jnp.int32)
    text = jnp.zeros((B, 64), dtype=jnp.int32)
    @nnx.jit
    def step(model, opt, key):
        def loss_fn(m):
            return m(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss
    try:
        step(model, opt, jax.random.key(1)).block_until_ready()
    except Exception as e:
        print(f'B={B}: FAILED {str(e)[:600]}', flush=True); return
    t0 = time.perf_counter()
    for i in range(10): l = step(model, opt, jax.random.key(i))
    l.block_until_ready()
    dt = (time.perf_counter()-t0)/10
    print(f'B={B}: step {dt*1e3:.1f} ms ({B*N/dt/1e3:.0f}k frames/s)', flush=True)

for B in [32]:
    bench(B)
