import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
from e2_tts_tpu.ops.flash_attention import flash_attention
from e2_tts_tpu.ops.attention import _xla_attention

for n in [1024, 2048, 4096]:
    b, h, dh = 8, 8, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (b,h,n,dh), dtype=jnp.bfloat16)
    k = jax.random.normal(ks[1], (b,h,n,dh), dtype=jnp.bfloat16)
    v = jax.random.normal(ks[2], (b,h,n,dh), dtype=jnp.bfloat16)
    mask = jnp.ones((b,n), dtype=bool)
    f_flash = jax.jit(lambda q,k,v: flash_attention(q,k,v,mask,softclamp_value=50.0))
    f_xla = jax.jit(lambda q,k,v: _xla_attention(q,k,v,mask,scale=dh**-0.5,softclamp_value=50.0,dropout_rate=0.,dropout_rng=None).astype(q.dtype))
    o1 = f_flash(q,k,v); o2 = f_xla(q,k,v)
    print(f'n={n} max diff:', float(jnp.abs(o1.astype(jnp.float32)-o2.astype(jnp.float32)).max()), flush=True)
    for name, f in [('flash', f_flash), ('xla', f_xla)]:
        f(q,k,v).block_until_ready()
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters): o = f(q,k,v)
        o.block_until_ready()
        dt = (time.perf_counter()-t0)/iters
        flops = 4*b*h*n*n*dh
        print(f'  n={n} {name}: {dt*1e3:.3f} ms, {flops/dt/1e12:.2f} TFLOP/s', flush=True)
