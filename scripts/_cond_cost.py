"""Is the ragged-tail lax.cond the 1.2ms overhead? N=1024 has no cond."""
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from e2_tts_tpu.ops import flash_attention as fa
from scripts.device_time import device_time_ms

B, H, DH = 16, 8, 64
for N in (1024, 1056):
    q = jax.random.normal(jax.random.key(0), (B, H, N, DH), dtype=jnp.bfloat16)
    f = jax.jit(lambda q: fa.flash_attention(q, q, q, None, softclamp_value=50.0,
                                             dropout_rate=0.1, dropout_seed=7))
    ms = device_time_ms(f, q, calls=6)
    print('N=%d: fwd %6.3f ms (work ratio vs 1056: %.3f)' % (N, ms, (N/1056)**2), flush=True)
