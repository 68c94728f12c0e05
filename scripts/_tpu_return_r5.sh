#!/bin/bash
# Round-5 recovery runbook: run when the axon TPU tunnel comes back
# (it went down ~17:30 UTC 2026-08-19, after the tall-HC measurement and
# before the round-5 e2e verify drive could run). Re-validates HEAD on
# hardware, warms the driver's bench cache, and re-measures the step.
# Run from /root/repo.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0. health: a tiny fresh compile (~1 min when healthy)
timeout 300 python -c "
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
a = jax.random.normal(jax.random.key(5), (257, 129), dtype=jnp.bfloat16)
print('health ok:', float((jnp.sin(a * 5) @ a.T).sum()))" || exit 1

# 1. e2e public-API drive (small config; also re-warms the small-shape
# cache). The tall HC core is already hardware-proven (158.06 ms session),
# so a failure here is an e2e wiring issue, not a Mosaic lowering one.
timeout 3600 python scripts/_verify_r5.py || exit 1

# 2. PRIORITY: warm the driver's bench cache end to end (train both text
# variants + sampling phases). A cold driver bench would blow its deadline.
BENCH_DEADLINE_S=3600 timeout 3700 python bench.py || {
  echo 'BENCH FAILED — bisect: tall HC core first (E2TTS_HC_TALL=0)';
  E2TTS_HC_TALL=0 BENCH_DEADLINE_S=3600 timeout 3700 python bench.py;
  exit 1; }

# 3. confirm the warm bench lands inside the driver budget
timeout 900 python bench.py || exit 1

# 4. A/B the Pallas delta pre-kernel (E2TTS_FLASH_DELTA, default xla —
# unmeasured on hardware as of 2026-08-20). Results land in
# BENCH_DELTA_AB.txt for the next session to act on; failures here must
# not fail the runbook (the knob is off by default).
{
  echo "== delta A/B $(date -u) ==";
  echo "-- xla (default) --";
  timeout 1800 python scripts/_step_device.py;
  echo "-- pallas --";
  E2TTS_FLASH_DELTA=pallas timeout 1800 python scripts/_step_device.py;
} >> BENCH_DELTA_AB.txt 2>&1 || true
