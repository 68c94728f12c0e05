"""Calibration: chained matmul of known FLOP cost vs chip peak (197 TF/s)."""
import time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp

n = 4096
a = jax.random.normal(jax.random.key(0), (n, n), dtype=jnp.bfloat16)

@jax.jit
def f(a):
    return jax.lax.dot_general(a, a, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(jnp.bfloat16) * 1e-3

out = f(a); jax.block_until_ready(out)
for iters in (10, 20):
    x = a
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print('chained matmul %d iters: %.3f ms/iter -> %.1f TF/s' % (
        iters, dt * 1e3, 2 * n**3 / dt / 1e12))

# pallas flash again, same pattern, with the OUTPUT SUMMED to a scalar carried
from e2_tts_tpu.ops.flash_attention import flash_attention
B, H, N, DH = 16, 8, 1056, 64
q0 = jax.random.normal(jax.random.key(1), (B, H, N, DH), dtype=jnp.bfloat16)

@jax.jit
def g(q, c):
    o = flash_attention(q, q, q, None, softclamp_value=50.0)
    return o, c + jnp.sum(o.astype(jnp.float32))

o, c = g(q0, 0.0); jax.block_until_ready(c)
t0 = time.perf_counter()
c = 0.0
for _ in range(20):
    o, c = g(q0, c)
jax.block_until_ready(c)
dt = (time.perf_counter() - t0) / 20
print('flash scalar-carry: %.3f ms/iter -> %.1f TF/s (flops=%.1fG)' % (
    dt * 1e3, 4 * B * H * N * N * DH / dt / 1e12, 4 * B * H * N * N * DH / 1e9))
