"""Device-mesh and sharding utilities.

The reference's entire distributed story is DDP through HF Accelerate with
NCCL all-reduce (SURVEY.md §2d, trainer.py:155-162, 270). The TPU-native
equivalent: a `jax.sharding.Mesh` over ICI/DCN with the batch sharded on a
`data` axis and model/optimizer/EMA state replicated (optionally
FSDP-sharded). Under jit, XLA inserts the gradient all-reduce over ICI
automatically — and the reference's `find_unused_parameters` problem
disappears because text-drop is a static step variant, not a dynamic graph.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from e2_tts_tpu.utils.helpers import default, exists

DATA_AXIS = 'data'


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) local devices."""
    devices = default(devices, jax.devices())
    if exists(n_devices):
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in `batch` with axis-0 sharded over `data`."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_module(module, mesh: Mesh):
    """Replicate all module state across the mesh (in place)."""
    import flax.nnx as nnx
    state = nnx.state(module)
    state = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), state)
    nnx.update(module, state)
    return module
