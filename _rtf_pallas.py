import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
from flax import nnx
from e2_tts_tpu.models.e2tts import E2TTS

def rtf(backend):
    model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                                   dropout=0.0, attn_backend=backend),
                  rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
    prompt = jax.random.normal(jax.random.key(0), (1, 256, 100), dtype=jnp.bfloat16) * 0.3
    text = ['the quick brown fox jumps over the lazy dog ' * 3]
    run = lambda key: model.sample(prompt, text=text, duration=1024, steps=32,
                                   key=key, return_raw_output=True, duration_bucket=1024)
    run(jax.random.key(1)).block_until_ready()
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        run(jax.random.key(i)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    r = min(ts) / (1024 / 93.75)
    print(f'{backend}: rtf {r:.4f} ({min(ts):.3f}s)', flush=True)

rtf('pallas')
rtf('auto')
