"""Cold-compile wall time: unrolled vs scan_layers backbone on the live backend.

Compiles the full faithful train step (loss+grad+ADOPT update) at the
flagship config with the persistent cache DISABLED, so the number is the real
fresh-workspace cost. Run one mode per process (XLA caches subcomputations
in-process): `python scripts/compile_time.py unrolled|scan`.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else 'unrolled'

from flax import nnx  # noqa: E402
import functools  # noqa: E402
import optax  # noqa: E402

from e2_tts_tpu.models.e2tts import E2TTS  # noqa: E402
from e2_tts_tpu.training.adopt import adopt  # noqa: E402

B, N = 16, 1024

t0 = time.perf_counter()
model = E2TTS(transformer=dict(dim=512, depth=8, heads=8, dim_head=64,
                               dropout=0.1, attn_backend='auto',
                               scan_layers=MODE == 'scan'),
              rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
model.train()
optimizer = nnx.Optimizer(model, optax.chain(
    optax.clip_by_global_norm(1.0), adopt(7.5e-5)), wrt=nnx.Param)
t_init = time.perf_counter() - t0

mel = jax.random.normal(jax.random.key(0), (B, N, 100), dtype=jnp.bfloat16)
lens = jnp.full((B,), N, dtype=jnp.int32)
text = jnp.asarray(np.random.default_rng(0).integers(32, 120, (B, 64)),
                   dtype=jnp.int32)


@functools.partial(nnx.jit, static_argnames=())
def step(model, optimizer, key):
    def loss_fn(m):
        return m(mel, text=text, lens=lens, key=key, drop_text_cond=False).loss
    loss, grads = nnx.value_and_grad(loss_fn)(model)
    optimizer.update(model, grads)
    return loss

t0 = time.perf_counter()
loss = step(model, optimizer, jax.random.key(1))
loss.block_until_ready()
t_compile = time.perf_counter() - t0

t0 = time.perf_counter()
loss = step(model, optimizer, jax.random.key(2))
loss.block_until_ready()
t_warm = time.perf_counter() - t0

print(f'{MODE}: init {t_init:.1f}s  first-call (trace+compile) {t_compile:.1f}s  '
      f'warm step {t_warm * 1e3:.1f}ms  loss {float(loss):.4f}')
