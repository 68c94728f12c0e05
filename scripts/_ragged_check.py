"""TPU correctness check: ragged flash (n=1056, cond-gated tails) vs XLA."""
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
from e2_tts_tpu.ops.flash_attention import flash_attention
from e2_tts_tpu.ops.attention import _xla_attention

for N in (1024, 1056, 600):
    B, H, DH = 2, 2, 64
    q = jax.random.normal(jax.random.key(0), (B, H, N, DH), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, H, N, DH), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (B, H, N, DH), dtype=jnp.float32)
    mask = jnp.ones((B, N), dtype=bool).at[1, N - 50:].set(False)
    ours = flash_attention(q, k, v, mask, softclamp_value=50.0)
    ref = _xla_attention(q, k, v, mask, scale=DH ** -0.5, softclamp_value=50.0,
                         dropout_rate=0.0, dropout_rng=None)
    d = float(jnp.abs(ours - ref).max())
    finite = bool(jnp.isfinite(ours).all())
    print('N=%d: max diff %.2e finite=%s' % (N, d, finite))

    def loss_f(q):
        return (flash_attention(q, k, v, mask, softclamp_value=50.0) ** 2).sum()
    def loss_x(q):
        return (_xla_attention(q, k, v, mask, scale=DH ** -0.5,
                               softclamp_value=50.0, dropout_rate=0.0,
                               dropout_rng=None) ** 2).sum()
    gf = jax.jit(jax.grad(loss_f))(q)
    gx = jax.jit(jax.grad(loss_x))(q)
    gd = float(jnp.abs(gf - gx).max())
    print('      grad max diff %.2e finite=%s' % (gd, bool(jnp.isfinite(gf).all())))
