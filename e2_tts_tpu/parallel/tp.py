"""Tensor-parallel (Megatron-style) parameter sharding over a `model` axis.

The reference is DP-only (SURVEY.md §2d). For larger dims this shards each
transformer layer's inner computation across chips: attention QKV / FF-up
kernels split on the output (head/hidden) axis, attention-out / FF-down
kernels on the input axis — GSPMD propagates the activation shardings and
inserts the pair of all-reduces per layer over ICI.

Pure NamedSharding placement keyed on parameter paths; composes with the
`data` axis into a 2-D (data, model) mesh. At E2-TTS's dim=512 this is
capability headroom, not a speedup — ICI latency dominates at small dims.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = 'model'

# param-path substrings -> which axis of the kernel to shard.
# 'out' = split the output features (column parallel), 'in' = input features
# (row parallel). Biases of column-parallel layers split on their only axis.
_COLUMN = ('to_q', 'to_k', 'to_v', 'proj_in')
_ROW = ('to_out', 'proj_out')


def make_2d_mesh(data: int, model: int, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= data * model
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ('data', MODEL_AXIS))


def _spec_for(path: str, shape: tuple[int, ...], n_model: int):
    if len(shape) == 2:
        if any(k in path for k in _COLUMN) and shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if any(k in path for k in _ROW) and shape[0] % n_model == 0:
            return P(MODEL_AXIS, None)
    if len(shape) == 1 and any(k in path for k in _COLUMN) \
            and shape[0] % n_model == 0 and 'bias' in path:
        return P(MODEL_AXIS)
    return P()


def shard_module_tp(module, mesh: Mesh):
    """Apply tensor-parallel placement to every matching kernel (in place).
    Non-matching params are replicated across `model` (and across `data`)."""
    from flax import nnx

    n_model = mesh.shape[MODEL_AXIS]
    state = nnx.state(module)
    pure = nnx.to_pure_dict(state)

    def place(path, x):
        if not hasattr(x, 'shape'):
            return x
        path_str = '/'.join(str(getattr(k, "key", k)) for k in path)
        spec = _spec_for(path_str, x.shape, n_model)
        return jax.device_put(x, NamedSharding(mesh, spec))

    pure = jax.tree_util.tree_map_with_path(place, pure)
    nnx.replace_by_pure_dict(state, pure)
    nnx.update(module, state)
    return module
