"""TPU compile+correctness smoke for the HC width kernels (fwd + adjoint),
plain and depth-fused, vs the pure-XLA reference. Small shapes: fast compile.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/_hc_tpu_smoke.py
"""
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np

from e2_tts_tpu.ops import hyper_conn_kernel as hc

s, m, d = 4, 300, 128
key = jax.random.key(0)
ks = jax.random.split(key, 12)
r = (jax.random.normal(ks[0], (s, m, d)) * 0.5).astype(jnp.bfloat16)
sa = jnp.eye(s, s + 1, dtype=jnp.float32)
sb = jnp.ones((s,), jnp.float32)
aw = jax.random.normal(ks[1], (d, s + 1)) * 0.02
bw = jax.random.normal(ks[2], (d,)) * 0.02
asc = jnp.float32(0.25)
bsc = jnp.float32(0.125)

def run(fn, *args):
    def loss(*a):
        b0, car, beta = fn(*a)
        return (jnp.sum(b0.astype(jnp.float32) ** 2)
                + jnp.sum(car.astype(jnp.float32) ** 2)
                + jnp.sum(beta.astype(jnp.float32) * 1.5))
    v, g = jax.jit(jax.value_and_grad(loss, argnums=tuple(range(len(args)))))(*args)
    return v, g

def check(tag, g_k, g_r, g_t):
    """Kernel grads must sit within ~2x of the bf16 reference's own error
    vs the f32-input truth — i.e. the kernel adds no error beyond bf16
    rounding noise (which cancellation amplifies on small-net entries)."""
    for i, (a, b, t) in enumerate(zip(g_k, g_r, g_t)):
        a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
        t = np.asarray(t, np.float32)
        scale = max(np.abs(t).max(), 1.0)
        e_k = np.abs(a - t).max() / scale
        e_r = np.abs(b - t).max() / scale
        print(f'{tag} arg{i}: kernel_err={e_k:.2e} ref_bf16_err={e_r:.2e}')
        assert e_k <= max(2.5 * e_r, 5e-3), (tag, i, e_k, e_r)

args = (r, sa, sb, aw, asc, bw, bsc)
f32args = tuple(a.astype(jnp.float32) if hasattr(a, 'astype') else a
                for a in args)
v_k, g_k = run(hc.width_connection, *args)
v_r, g_r = run(hc._width_reference_split, *args)
_, g_t = run(hc._width_reference_split, *f32args)
print('plain: loss kernel=%.5f ref=%.5f' % (float(v_k), float(v_r)))
np.testing.assert_allclose(float(v_k), float(v_r), rtol=2e-2)
check('plain', g_k, g_r, g_t)
print('plain fwd+bwd OK')

carried = (jax.random.normal(ks[3], (s, m, d)) * 0.5).astype(jnp.bfloat16)
branch = (jax.random.normal(ks[4], (m, d)) * 0.5).astype(jnp.bfloat16)
betaT = (jax.random.normal(ks[5], (m, s)) * 0.5).astype(jnp.bfloat16)
fargs = (carried, branch, betaT, sa, sb, aw, asc, bw, bsc)
f32fargs = tuple(a.astype(jnp.float32) if hasattr(a, 'astype') else a
                 for a in fargs)
v_k, g_k = run(hc.width_connection_fused, *fargs)
v_r, g_r = run(hc._width_fused_reference_split, *fargs)
_, g_t = run(hc._width_fused_reference_split, *f32fargs)
print('fused: loss kernel=%.5f ref=%.5f' % (float(v_k), float(v_r)))
np.testing.assert_allclose(float(v_k), float(v_r), rtol=2e-2)
check('fused', g_k, g_r, g_t)
print('fused fwd+bwd OK')
print('HC TPU SMOKE OK')
