"""One-shot round-3 checkpoint: verify the full train step executes on the
real TPU after the HC-split / lane-expand commits, measure device step time,
and print the top-source attribution table. Run alone on the chip."""
import collections
import glob
import json
import re
import tempfile

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx
from e2_tts_tpu.models.e2tts import E2TTS
from e2_tts_tpu.training.adopt import adopt

B, N = 16, 1024
model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                               dropout=0.1, attn_backend='auto'),
              rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
model.train()
optimizer = nnx.Optimizer(model, optax.chain(
    optax.clip_by_global_norm(1.0), adopt(7.5e-5)), wrt=nnx.Param)
mel = jax.random.normal(jax.random.key(0), (B, N, 100), dtype=jnp.bfloat16)
lens = jnp.full((B,), N, dtype=jnp.int32)
text = jnp.asarray(np.random.default_rng(0).integers(32, 120, (B, 64)), dtype=jnp.int32)

@nnx.jit
def step(model, optimizer, key):
    def loss_fn(m):
        return m(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss
    loss, grads = nnx.value_and_grad(loss_fn)(model)
    optimizer.update(model, grads)
    return loss

k = jax.random.key(1)
loss = step(model, optimizer, k)
print('STEP OK, loss:', float(loss), flush=True)
assert np.isfinite(float(loss))

CALLS = 5
trace_dir = tempfile.mkdtemp(prefix='r3check_')
with jax.profiler.trace(trace_dir):
    out = None
    for _ in range(CALLS):
        out = step(model, optimizer, k)
    jax.block_until_ready(out)

from xprof.convert import raw_to_tool_data
xs = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
data, _ = raw_to_tool_data.xspace_to_tool_data(xs, 'hlo_stats', {})
if isinstance(data, bytes):
    data = data.decode()
d = json.loads(data)
cols = [c['id'] for c in d['cols']]
idx = {c: i for i, c in enumerate(cols)}
rows = [[(c['v'] if isinstance(c, dict) else c) for c in r['c']] for r in d['rows']]
prog = collections.Counter()
for r in rows:
    prog[r[idx['program_id']]] += r[idx['total_self_time']] or 0
main, total_us = prog.most_common(1)[0]
print('WITH-TEXT STEP DEVICE: %.2f ms -> %.0f frames/s' % (
    total_us / 1e3 / CALLS, B * N / (total_us / 1e3 / CALLS) * 1e3), flush=True)

agg = collections.Counter()
for r in rows:
    if r[idx['program_id']] != main:
        continue
    t = (r[idx['total_self_time']] or 0) / 1e3 / CALLS
    src = re.sub(r'<[^>]*>', '', r[idx['source_info']] or '?').strip()
    src = src.replace('/opt/venv/lib/python3.12/site-packages/', 'SP/')
    src = src.replace('/root/repo/e2_tts_tpu/', '')
    agg[(r[idx['category']], src)] += t
for (cat, src), t in agg.most_common(25):
    print('%8.3f ms  [%-18s] %s' % (t, cat[:18], src[:70]))
