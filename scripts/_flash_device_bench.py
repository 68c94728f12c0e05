"""Device-time split of the flash kernels at flagship shape."""
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from e2_tts_tpu.ops.flash_attention import flash_attention
from scripts.device_time import device_time_ms

B, H, N, DH = 16, 8, 1056, 64
q = jax.random.normal(jax.random.key(0), (B, H, N, DH), dtype=jnp.bfloat16)

def fwd(softclamp, rate):
    seed = 7 if rate else None
    return jax.jit(lambda q: flash_attention(
        q, q, q, None, softclamp_value=softclamp, dropout_rate=rate,
        dropout_seed=seed))

def bwd(softclamp, rate):
    seed = 7 if rate else None
    def loss(q):
        return (flash_attention(q, q, q, None, softclamp_value=softclamp,
                                dropout_rate=rate, dropout_seed=seed)
                .astype(jnp.float32) ** 2).sum()
    return jax.jit(jax.grad(loss))

for name, sc, rate in (('plain', None, 0.0), ('clamp', 50.0, 0.0),
                       ('drop', None, 0.1), ('clamp+drop', 50.0, 0.1)):
    f = fwd(sc, rate)
    ms = device_time_ms(f, q, calls=6)
    g = bwd(sc, rate)
    msb = device_time_ms(g, q, calls=6)
    print('%-10s fwd %6.3f ms   fwd+bwd %6.3f ms' % (name, ms, msb))
