"""Multi-host (multi-process) coverage for parallel/multihost.py.

The reference's multi-node story is `accelerate launch` + torch.distributed
DDP (SURVEY.md §2d, trainer.py:155-162); ours is `jax.distributed` over a
global mesh. This test actually RUNS it: two subprocesses, 4 virtual CPU
devices each, form one 8-device global mesh and take a lockstep train step
(grad all-reduce crosses the process boundary) that must match the
single-process oracle. See tests/_multihost_worker.py for the worker body.
"""

import os
import pathlib
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _launch_workers(port, worker, repo, env):
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo, env=env) for pid in range(2)]

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_distributed_train_step():
    worker = pathlib.Path(__file__).parent / '_multihost_worker.py'
    repo = str(pathlib.Path(__file__).parent.parent)

    env = dict(os.environ)
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    # the workers pick their own platform/devices; scrub the parent's test
    # configuration so it doesn't leak through
    env.pop('XLA_FLAGS', None)

    # _free_port closes the socket before the coordinator binds it (TOCTOU);
    # retry with a fresh port if another process stole it in the gap.
    for attempt in range(3):
        port = _free_port()
        procs, outs = _launch_workers(port, worker, repo, env)
        bind_failed = any(p.returncode != 0 and (
            'already in use' in out or 'Failed to bind' in out)
            for p, out in zip(procs, outs))
        if not bind_failed or attempt == 2:
            break

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out}'
        assert f'MULTIHOST INIT OK pid={pid}' in out, out
        assert f'MULTIHOST STEP OK pid={pid}' in out, out
        assert f'MULTIHOST PSUM OK pid={pid}' in out, out

    # the replicated result must agree across processes (same loss printed)
    l0 = [l for l in outs[0].splitlines() if 'STEP OK' in l][0].split('loss=')[1]
    l1 = [l for l in outs[1].splitlines() if 'STEP OK' in l][0].split('loss=')[1]
    assert l0 == l1
