#!/bin/bash
# Run when the axon TPU tunnel recovers (it went down ~18:00 on 2026-08-17,
# mid round 3). Verifies the post-outage commits on hardware, measures the
# step, and warms the bench compile cache for the driver. Run from /root/repo.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0. health: a tiny fresh compile (~1 min when healthy)
timeout 300 python -c "
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
a = jax.random.normal(jax.random.key(1), (257, 129), dtype=jnp.bfloat16)
print('health ok:', float((jnp.sin(a) @ a.T).sum()))" || exit 1

# 0b. standalone Mosaic probe for the newest kernel (geglu fwd+bwd) — a
# lowering rejection should surface here in ~2 min with a clear error, not
# an hour into the bench. If THIS fails: set the kernel off by default
# (geglu_kernel._use_pallas -> return False) and re-commit before the
# driver bench runs.
timeout 600 python -c "
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from e2_tts_tpu.ops.geglu_kernel import geglu_dropout, _geglu_dropout_reference
import numpy as np
seed = jnp.uint32(7)
# BOTH full-model shapes: speech FF (inner=1408, pallas) and text FF
# (inner=704, must take the XLA fallback — round-3 lesson: the first probe
# only tested 1408 and the text shape killed the bench train phase)
for shape in [(16, 1056, 2816), (16, 1056, 1408)]:
    h2 = jax.random.normal(jax.random.key(0), shape, dtype=jnp.bfloat16)
    f = jax.jit(lambda a: geglu_dropout(a, seed, 0.1))
    g = jax.jit(jax.grad(lambda a: geglu_dropout(a, seed, 0.1).astype(jnp.float32).sum()))
    ok = np.asarray(f(h2), np.float32); rk = np.asarray(_geglu_dropout_reference(h2, seed, 0.1), np.float32)
    assert np.allclose(ok, rk, atol=3e-2, rtol=3e-2), (shape, np.abs(ok-rk).max())
    assert np.isfinite(np.asarray(g(h2), np.float32)).all(), shape
    print('geglu probe OK', shape)" || exit 1

# 1. PRIORITY: warm the driver's bench cache end to end (train both
# variants + sample). The home cache went stale when the model changed
# post-outage; a cold driver bench would blow its 840 s deadline. This also
# implicitly verifies the train step executes after the HC commits.
BENCH_DEADLINE_S=3600 timeout 3700 python bench.py || {
  echo 'BENCH FAILED — bisect the step: newest kernel first (FF), then HC';
  E2TTS_FF_BACKEND=xla timeout 1800 python scripts/_r3_check.py || \
  E2TTS_FF_BACKEND=xla E2TTS_HC_BACKEND=xla timeout 1800 python scripts/_r3_check.py;
  exit 1; }

# 2. step device measurement + top-source attribution (warm cache -> fast)
timeout 1800 python scripts/_r3_check.py

# 3. confirm the warm bench lands inside the driver budget
timeout 900 python bench.py
