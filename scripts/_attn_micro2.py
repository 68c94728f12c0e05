"""Flash kernel timing with per-iter distinct inputs + achieved TF/s."""
import time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from e2_tts_tpu.ops.flash_attention import flash_attention

B, H, DH = 16, 8, 64

def bench(N, softclamp, rate):
    q0 = jax.random.normal(jax.random.key(0), (B, H, N, DH), dtype=jnp.bfloat16)
    seed = 7 if rate else None

    @jax.jit
    def f(q, bump):
        q = q + bump   # distinct input per iter
        o = flash_attention(q, q, q, None, softclamp_value=softclamp,
                            dropout_rate=rate, dropout_seed=seed)
        return jnp.sum(o.astype(jnp.float32))
    out = f(q0, 0.0); out.block_until_ready()
    iters, best = 20, float('inf')
    for g in range(4):
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(q0, i * 1e-6)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    flops = 4 * B * H * N * N * DH
    print('N=%4d clamp=%s drop=%.1f: %7.3f ms  %5.1f TF/s' % (
        N, softclamp is not None, rate, best * 1e3, flops / best / 1e12))

for N in (1024, 1056):
    bench(N, 50.0, 0.0)
    bench(N, 50.0, 0.1)
    bench(N, None, 0.0)
