"""Decide which timing patterns are valid under the axon tunnel.

Patterns on the SAME flash-attention call (N=1056 flagship shape):
  A) loop, block only on last output        (the repo's timeit pattern)
  B) loop with output chained into next input (cannot be elided/deduped)
  C) block_until_ready every iteration       (includes round-trip latency)
"""
import time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from e2_tts_tpu.ops.flash_attention import flash_attention

B, H, N, DH = 16, 8, 1056, 64
q0 = jax.random.normal(jax.random.key(0), (B, H, N, DH), dtype=jnp.bfloat16)

@jax.jit
def f(q):
    return flash_attention(q, q, q, None, softclamp_value=50.0)

out = f(q0); jax.block_until_ready(out)

for iters in (10, 40):
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(q0)
    jax.block_until_ready(out)
    print('A last-block  iters=%2d: %7.3f ms/iter' % (iters, (time.perf_counter() - t0) / iters * 1e3))

for iters in (10, 40):
    q = q0
    t0 = time.perf_counter()
    for i in range(iters):
        q = f(q)            # chained: every call feeds the next
    jax.block_until_ready(q)
    print('B chained     iters=%2d: %7.3f ms/iter' % (iters, (time.perf_counter() - t0) / iters * 1e3))

for iters in (10,):
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(q0)
        jax.block_until_ready(out)
    print('C per-block   iters=%2d: %7.3f ms/iter' % (iters, (time.perf_counter() - t0) / iters * 1e3))
