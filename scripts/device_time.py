"""Profiler-based device timing — the ONLY reliable microbenchmark on the
axon tunnel (wall-clock patterns are invalid: block_until_ready returns
before remote execution completes; a chained 137-GFLOP matmul 'measures'
6500 TF/s — see BENCH_NOTES).

Usage as a library:

    from scripts.device_time import device_time_ms
    ms_per_call = device_time_ms(fn, *args, calls=8)

Runs `fn(*args)` `calls` times under jax.profiler.trace, converts the trace
with xprof's hlo_stats, and returns total device self-time divided by
`calls` (plus the per-op table if wanted). The conversion runs in THIS
process: import order matters — xprof before heavy jax work is fine.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import shutil
import tempfile

import jax


def _hlo_stats(trace_dir):
    from xprof.convert import raw_to_tool_data
    xs = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(xs, 'hlo_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    cols = [c['id'] for c in d['cols']]
    idx = {c: i for i, c in enumerate(cols)}
    rows = [[(c['v'] if isinstance(c, dict) else c) for c in r['c']]
            for r in d['rows']]
    return idx, rows


def device_time_ms(fn, *args, calls: int = 8, per_op: bool = False,
                   warmup: bool = True):
    """Total device self-time in ms for ONE call of fn(*args)."""
    if warmup:
        jax.block_until_ready(fn(*args))
    trace_dir = tempfile.mkdtemp(prefix='devtime_')
    try:
        with jax.profiler.trace(trace_dir):
            out = None
            for _ in range(calls):
                out = fn(*args)
            jax.block_until_ready(out)
        idx, rows = _hlo_stats(trace_dir)
        # use the busiest program (the traced fn); ignore warmup leftovers
        prog = collections.Counter()
        for r in rows:
            prog[r[idx['program_id']]] += r[idx['total_self_time']] or 0
        main, total_us = prog.most_common(1)[0]
        if not per_op:
            return total_us / 1e3 / calls
        ops = collections.Counter()
        for r in rows:
            if r[idx['program_id']] != main:
                continue
            ops[r[idx['hlo_op_name']]] += (r[idx['total_self_time']] or 0) / 1e3 / calls
        return total_us / 1e3 / calls, ops
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == '__main__':
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    n = 4096
    a = jax.random.normal(jax.random.key(0), (n, n), dtype=jnp.bfloat16)
    f = jax.jit(lambda a: jax.lax.dot_general(
        a, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    ms = device_time_ms(f, a)
    print('4096^3 matmul: %.3f ms -> %.1f TF/s (sanity: <= ~197)' % (
        ms, 2 * n ** 3 / (ms * 1e-3) / 1e12))
