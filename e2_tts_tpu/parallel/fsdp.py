"""Fully-sharded (ZeRO-3-style) parameter placement.

The reference is DP-only (SURVEY.md §2d); this goes beyond it: model,
optimizer and EMA state can be sharded across the `data` axis instead of
replicated — XLA inserts all-gathers for the forward/backward and
reduce-scatters for the gradients over ICI. For E2-TTS-sized models this is
about capability headroom (bigger dims / optimizer state), not a latency win.

Mechanism: for each parameter, shard the largest axis divisible by the mesh
size; everything else stays replicated. Pure NamedSharding placement — no
code changes in the model.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from e2_tts_tpu.parallel.mesh import DATA_AXIS


def fsdp_sharding_for(shape: tuple[int, ...], mesh: Mesh,
                      axis: str = DATA_AXIS) -> NamedSharding:
    """NamedSharding that shards the largest divisible axis of `shape`."""
    n = mesh.shape[axis]
    best = None
    for i, dim in enumerate(shape):
        if dim % n == 0 and (best is None or dim > shape[best]):
            best = i
    if best is None:
        return NamedSharding(mesh, P())
    spec = [None] * len(shape)
    spec[best] = axis
    return NamedSharding(mesh, P(*spec))


def shard_module_fsdp(module, mesh: Mesh, min_size: int = 1024):
    """Place every array of `module`'s state with FSDP sharding (in place).

    Arrays smaller than `min_size` elements stay replicated — sharding tiny
    tensors costs more in collective latency than it saves.
    """
    from flax import nnx

    state = nnx.state(module)

    def place(x):
        if not hasattr(x, 'shape') or x.size < min_size:
            return x
        return jax.device_put(x, fsdp_sharding_for(x.shape, mesh))

    nnx.update(module, jax.tree.map(place, state))
    return module
