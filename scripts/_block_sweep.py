"""Device-time sweep of flash block shapes at flagship (16,8,1056,64)."""
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
from e2_tts_tpu.ops import flash_attention as fa
from e2_tts_tpu.ops.attention import _xla_attention
from scripts.device_time import device_time_ms

B, H, N, DH = 16, 8, 1056, 64
q = jax.random.normal(jax.random.key(0), (B, H, N, DH), dtype=jnp.bfloat16)

def mk():
    f = jax.jit(lambda q: fa.flash_attention(q, q, q, None, softclamp_value=50.0,
                                             dropout_rate=0.1, dropout_seed=7))
    def loss(q):
        return (fa.flash_attention(q, q, q, None, softclamp_value=50.0,
                                   dropout_rate=0.1, dropout_seed=7)
                .astype(jnp.float32) ** 2).sum()
    return f, jax.jit(jax.grad(loss))

ref = None
for blocks in [None, (528, 528), (1056, 352), (1056, 528), (528, 1056),
               (1056, 1056), (352, 1056), (264, 1056)]:
    fa._BLOCK_OVERRIDE = blocks
    try:
        f, g = mk()
        out = f(q)
        if ref is None:
            ref = out
        err = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        ms = device_time_ms(f, q, calls=6)
        msb = device_time_ms(g, q, calls=6)
        print('%-12s fwd %6.3f  fwd+bwd %6.3f  (err %.1e)' % (blocks, ms, msb, err), flush=True)
    except Exception as e:
        print('%-12s FAILED: %s' % (blocks, str(e)[:120]), flush=True)
fa._BLOCK_OVERRIDE = None
