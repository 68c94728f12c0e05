"""Cost floor of the flash fwd structure: strip the kernel to isolate
matmul vs softmax-VPU vs bookkeeping costs at flagship shape."""
import functools
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scripts.device_time import device_time_ms

B, H, N, DH = 16, 8, 1056, 64
G, BQ, BK = 8, 384, 384
NQ = -(-N // BQ)
NK = -(-N // BK)

def kern(q_ref, k_ref, v_ref, o_ref, acc, *, mode):
    kb = pl.program_id(2)
    @pl.when(kb == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    for g in range(G):
        q = q_ref[g]; k = k_ref[g]; v = v_ref[g]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if mode >= 1:
            s = jnp.exp(s)
        if mode >= 2:
            m = jnp.max(s, axis=-1)
            l = jnp.sum(s, axis=-1)
            s = s - (m + l)[:, None]
        acc[g] += jax.lax.dot_general(s.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        for g in range(G):
            o_ref[g] = acc[g].astype(o_ref.dtype)

def build(mode):
    def f(q):
        qf = q.reshape(B * H, N, DH)
        return pl.pallas_call(
            functools.partial(kern, mode=mode),
            grid=(B * H // G, NQ, NK),
            in_specs=[pl.BlockSpec((G, BQ, DH), lambda i, j, kb: (i, j, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((G, BK, DH), lambda i, j, kb: (i, kb, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((G, BK, DH), lambda i, j, kb: (i, kb, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, BQ, DH), lambda i, j, kb: (i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, N, DH), q.dtype),
            scratch_shapes=[pltpu.VMEM((G, BQ, DH), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        )(qf, qf, qf)
    return jax.jit(f)

q = jax.random.normal(jax.random.key(0), (B, H, N, DH), dtype=jnp.bfloat16)
for mode, name in ((0, 'matmuls only'), (1, '+exp'), (2, '+max/sum/sub')):
    print('%-14s %6.3f ms' % (name, device_time_ms(build(mode), q, calls=6)), flush=True)

# fp32 MXU comparison: matmuls-only with fp32 q
qf32 = q.astype(jnp.float32)
print('%-14s %6.3f ms' % ('mm f32', device_time_ms(build(0), qf32, calls=6)))
