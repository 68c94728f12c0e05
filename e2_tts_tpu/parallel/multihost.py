"""Multi-host (multi-slice) initialisation.

Single-host multi-chip needs nothing: `make_mesh()` sees all local devices.
For multi-host pods / multi-slice DCN deployments, call
`maybe_initialize_distributed()` once per process before creating the mesh —
it wires `jax.distributed` from the standard TPU environment variables and
makes `jax.devices()` global. Data stays sharded over the global `data`
axis; XLA routes intra-slice collectives over ICI and inter-slice over DCN.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed(coordinator_address: str | None = None,
                                 num_processes: int | None = None,
                                 process_id: int | None = None) -> bool:
    """Initialise jax.distributed when running under a multi-process launch
    (detected via JAX/TPU env vars or explicit args). Returns True if the
    distributed runtime is active. Safe to call multiple times."""
    global _initialized
    if _initialized:
        return True

    explicit = coordinator_address is not None
    env_hint = any(os.environ.get(k) for k in (
        'COORDINATOR_ADDRESS', 'JAX_COORDINATOR_ADDRESS',
        'MEGASCALE_COORDINATOR_ADDRESS'))

    if not (explicit or env_hint):
        return False   # single-process: nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return True


def is_main_process() -> bool:
    """Reference-parity helper (accelerator.is_main_process, trainer.py:200)."""
    return jax.process_index() == 0
