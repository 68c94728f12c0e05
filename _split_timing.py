import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import optax
from flax import nnx
from e2_tts_tpu.models.e2tts import E2TTS
from e2_tts_tpu.training.adopt import adopt

B, N = 16, 1024
model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                               dropout=0.0, attn_backend='pallas'),
              rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
model.eval()
opt = nnx.Optimizer(model, optax.chain(optax.clip_by_global_norm(1.0), adopt(7.5e-5)), wrt=nnx.Param)
mel = jax.random.normal(jax.random.key(0), (B, N, 100), dtype=jnp.bfloat16)
lens = jnp.full((B,), N, dtype=jnp.int32)
text = jnp.zeros((B, 64), dtype=jnp.int32)

@nnx.jit
def fwd_only(model, key):
    return model(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss

@nnx.jit
def grad_only(model, key):
    def loss_fn(m):
        return m(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss
    return nnx.value_and_grad(loss_fn)(model)[0]

@nnx.jit
def full_step(model, opt, key):
    def loss_fn(m):
        return m(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss
    loss, grads = nnx.value_and_grad(loss_fn)(model)
    opt.update(model, grads)
    return loss

def t(f, *args):
    f(*args, jax.random.key(0))
    jax.block_until_ready(f(*args, jax.random.key(0)))
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        for j in range(8): l = f(*args, jax.random.key(j))
        l.block_until_ready()
        ts.append((time.perf_counter()-t0)/8)
    return min(ts)*1e3

print(f'fwd: {t(fwd_only, model):.1f} ms', flush=True)
print(f'fwd+bwd: {t(grad_only, model):.1f} ms', flush=True)
print(f'full step: {t(full_step, model, opt):.1f} ms', flush=True)
