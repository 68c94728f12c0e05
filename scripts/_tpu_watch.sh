#!/bin/bash
# Background watcher: probe the axon TPU tunnel every ~5 min; when a tiny
# fresh compile succeeds, run the full recovery runbook (_tpu_return.sh).
# Writes state to /tmp/tpu_watch.log and flags /tmp/tpu_runbook_running
# while the runbook is active (avoid heavy host CPU work during that window).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_watch.log
for i in $(seq 1 140); do
  echo "$(date -u) probe $i" >> "$LOG"
  if timeout 240 python -c "
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
a = jax.random.normal(jax.random.key($i), (257, 129), dtype=jnp.bfloat16)
print('health ok:', float((jnp.sin(a * $i) @ a.T).sum()))" >> "$LOG" 2>&1; then
    echo "$(date -u) TPU BACK — running runbook" >> "$LOG"
    touch /tmp/tpu_runbook_running
    bash scripts/_tpu_return_r5.sh >> /tmp/tpu_runbook.log 2>&1
    rc=$?
    rm -f /tmp/tpu_runbook_running
    echo "$(date -u) runbook exit rc=$rc" >> "$LOG"
    exit $rc
  fi
  echo "$(date -u) still down" >> "$LOG"
  sleep 240
done
echo "$(date -u) watcher exhausted probes, TPU never returned" >> "$LOG"
exit 2
