"""Device-time microbench of the hyper-connection width kernels at flagship
shape, vs their HBM-traffic floor."""
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from e2_tts_tpu.ops import hyper_conn_kernel as hck
from scripts.device_time import device_time_ms

S, M, D = 4, 16 * 1056, 512
dt = jnp.bfloat16
key = jax.random.key(0)
carried = jax.random.normal(key, (S, M, D), dtype=dt)
branch = jax.random.normal(jax.random.key(1), (M, D), dtype=dt)
betaT = jnp.ones((M, S), dtype=dt)
sa = jnp.concatenate([jnp.zeros((S, 1)), jnp.eye(S)], axis=1)
sb = jnp.ones((S,))
aw = jnp.zeros((D, S + 1))
bw = jnp.zeros((D,))
args = (carried, branch, betaT, sa, sb, aw, jnp.asarray(1e-2), bw,
        jnp.asarray(1e-2))

GBps = 819.0
mb = lambda *ts: sum(t.size * t.dtype.itemsize for t in ts) / 1e6

fwd = jax.jit(lambda *a: hck.width_connection_fused(*a))
out = fwd(*args)
ms = device_time_ms(fwd, *args, calls=8)
floor = (mb(carried, branch, betaT) + mb(*out)) / GBps
print('fused fwd : %.3f ms (floor %.3f, %.1fx)' % (ms, floor, ms / floor))

def loss(*a):
    b, c, beta = hck.width_connection_fused(*a)
    return ((b.astype(jnp.float32) ** 2).sum() + (c.astype(jnp.float32) ** 2).sum()
            + (beta.astype(jnp.float32) ** 2).sum())
grad = jax.jit(jax.grad(loss, argnums=tuple(range(9))))
g = grad(*args)
ms_g = device_time_ms(grad, *args, calls=8)
# bwd reads carried+branch+betaT+gm+gb, writes gc+gbr+gbT (+ params, tiny)
gm_b = (S + 1) * M * D * 2 / 1e6
gb_b = S * M * 2 / 1e6
floor_b = floor + (mb(carried, branch, betaT) + gm_b + gb_b
                   + mb(carried, branch) + M * S * 2 / 1e6) / GBps
print('fwd+bwd   : %.3f ms (floor %.3f, %.1fx)' % (ms_g, floor_b, ms_g / floor_b))

# plain (non-fused) variant
r = jax.random.normal(key, (S, M, D), dtype=dt)
pargs = (r, sa, sb, aw, jnp.asarray(1e-2), bw, jnp.asarray(1e-2))
pfwd = jax.jit(lambda *a: hck.width_connection(*a))
pout = pfwd(*pargs)
pms = device_time_ms(pfwd, *pargs, calls=8)
pfloor = (mb(r) + mb(*pout)) / GBps
print('plain fwd : %.3f ms (floor %.3f, %.1fx)' % (pms, pfloor, pms / pfloor))

def ploss(*a):
    b, c, beta = hck.width_connection(*a)
    return ((b.astype(jnp.float32) ** 2).sum() + (c.astype(jnp.float32) ** 2).sum()
            + (beta.astype(jnp.float32) ** 2).sum())
pgrad = jax.jit(jax.grad(ploss, argnums=tuple(range(7))))
pg = pgrad(*pargs)
pms_g = device_time_ms(pgrad, *pargs, calls=8)
pfloor_b = pfloor + (mb(r) * 2 + gm_b + gb_b) / GBps
print('p fwd+bwd : %.3f ms (floor %.3f, %.1fx)' % (pms_g, pfloor_b, pms_g / pfloor_b))
