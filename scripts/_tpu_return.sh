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

# 1. PRIORITY: warm the driver's bench cache end to end (train both
# variants + sample). The home cache went stale when the model changed
# post-outage; a cold driver bench would blow its 840 s deadline. This also
# implicitly verifies the train step executes after the HC commits.
BENCH_DEADLINE_S=3600 timeout 3700 python bench.py || {
  echo 'BENCH FAILED — bisect the step: HC reference path first';
  E2TTS_HC_BACKEND=xla timeout 1800 python scripts/_r3_check.py;
  exit 1; }

# 2. step device measurement + top-source attribution (warm cache -> fast)
timeout 1800 python scripts/_r3_check.py

# 3. confirm the warm bench lands inside the driver budget
timeout 900 python bench.py
