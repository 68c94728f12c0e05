"""RTF A/B: batched CFG vs sequential, wall + device time."""
import time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from flax import nnx
from e2_tts_tpu.models.e2tts import E2TTS
from scripts.device_time import device_time_ms

model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                               dropout=0.1, attn_backend='auto'),
              rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
model.eval()
N = 1024
prompt = jax.random.normal(jax.random.key(0), (1, 256, 100))
text = ['the quick brown fox jumps over the lazy dog, and again the fox']
audio_s = N * 256 / 24000

for batched in (True, False):
    def run(key):
        return model.sample(prompt, text=text, duration=N, steps=32,
                            cfg_strength=1.0, key=key, return_raw_output=True,
                            duration_bucket=N, batched_cfg=batched)
    out = run(jax.random.key(1)); out.block_until_ready()
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(jax.random.key(i)); out.block_until_ready()
        walls.append(time.perf_counter() - t0)
    dev = device_time_ms(run, jax.random.key(9), calls=3) / 1e3
    print('batched_cfg=%s: wall %.3fs (rtf %.4f)  device %.3fs (rtf %.4f)' % (
        batched, min(walls), min(walls) / audio_s, dev, dev / audio_s), flush=True)
