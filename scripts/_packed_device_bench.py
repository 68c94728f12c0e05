"""Device-time A/B: lane-packed (transpose-free) flash kernels vs the
(b, h, n, dh) kernels INCLUDING their surrounding head split/merge
transposes — the end-to-end cost each layout imposes on the model."""
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from e2_tts_tpu.ops.flash_attention import flash_attention, flash_attention_packed
from scripts.device_time import device_time_ms

B, H, N, DH = 16, 8, 1056, 64
D = H * DH
qp = jax.random.normal(jax.random.key(0), (B, N, D), dtype=jnp.bfloat16)


def packed_fwd(rate):
    return jax.jit(lambda q: flash_attention_packed(
        q, q, q, None, heads=H, softclamp_value=50.0, dropout_rate=rate,
        dropout_seed=7 if rate else None))


def packed_bwd(rate):
    def loss(q):
        return (flash_attention_packed(
            q, q, q, None, heads=H, softclamp_value=50.0, dropout_rate=rate,
            dropout_seed=7 if rate else None).astype(jnp.float32) ** 2).sum()
    return jax.jit(jax.grad(loss))


def bhnd_fwd(rate):
    # includes the split/merge transposes the old module paid
    def f(q):
        t = q.reshape(B, N, H, DH).transpose(0, 2, 1, 3)
        o = flash_attention(t, t, t, None, softclamp_value=50.0,
                            dropout_rate=rate, dropout_seed=7 if rate else None)
        return o.transpose(0, 2, 1, 3).reshape(B, N, D)
    return jax.jit(f)


def bhnd_bwd(rate):
    def loss(q):
        t = q.reshape(B, N, H, DH).transpose(0, 2, 1, 3)
        o = flash_attention(t, t, t, None, softclamp_value=50.0,
                            dropout_rate=rate, dropout_seed=7 if rate else None)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
        return (o.astype(jnp.float32) ** 2).sum()
    return jax.jit(jax.grad(loss))


for name, rate in (('clamp', 0.0), ('clamp+drop', 0.1)):
    for label, fwd_f, bwd_f in (('packed', packed_fwd, packed_bwd),
                                ('bhnd+T', bhnd_fwd, bhnd_bwd)):
        ms = device_time_ms(fwd_f(rate), qp, calls=6)
        msb = device_time_ms(bwd_f(rate), qp, calls=6)
        print('%-12s %-8s fwd %6.3f ms   fwd+bwd %6.3f ms'
              % (name, label, ms, msb), flush=True)

# parity on real hardware (not just interpret mode)
out_p = packed_fwd(0.0)(qp)
t = qp.reshape(B, N, H, DH).transpose(0, 2, 1, 3)
out_r = flash_attention(t, t, t, None, softclamp_value=50.0)
out_r = out_r.transpose(0, 2, 1, 3).reshape(B, N, D)
diff = float(jnp.abs(out_p.astype(jnp.float32) - out_r.astype(jnp.float32)).max())
print('TPU fwd parity max diff:', diff)
assert diff < 3e-2, diff
