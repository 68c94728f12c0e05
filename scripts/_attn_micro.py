"""Flash kernel VPU-cost split at flagship shape: softclamp/dropout variants."""
import time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from e2_tts_tpu.ops.flash_attention import flash_attention

B, H, N, DH = 16, 8, 1056, 64
q = jax.random.normal(jax.random.key(0), (B, H, N, DH), dtype=jnp.bfloat16)

def timeit(fn, iters=20, groups=4):
    out = fn(); jax.block_until_ready(out)
    best = float('inf')
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3

variants = {
    'plain           ': dict(softclamp_value=None, dropout_rate=0.0),
    'softclamp       ': dict(softclamp_value=50.0, dropout_rate=0.0),
    'dropout         ': dict(softclamp_value=None, dropout_rate=0.1),
    'softclamp+drop  ': dict(softclamp_value=50.0, dropout_rate=0.1),
}
for name, kw in variants.items():
    seed = 7 if kw['dropout_rate'] else None
    f = jax.jit(lambda q, kw=kw, seed=seed: flash_attention(
        q, q, q, None, dropout_seed=seed, **kw))
    print('%s %7.3f ms' % (name, timeit(lambda: f(q))))

# backward too
for name, kw in variants.items():
    seed = 7 if kw['dropout_rate'] else None
    def loss(q, kw=kw, seed=seed):
        return (flash_attention(q, q, q, None, dropout_seed=seed, **kw)
                .astype(jnp.float32) ** 2).sum()
    g = jax.jit(jax.grad(loss))
    print('%s bwd %7.3f ms' % (name, timeit(lambda: g(q))))
