"""Tensor-parallel (Megatron-style) parameter sharding over a `model` axis.

The reference is DP-only (SURVEY.md §2d). For larger dims this shards each
transformer layer's inner computation across chips: attention QKV / FF-up
kernels split on the output (head/hidden) axis, attention-out / FF-down
kernels on the input axis — GSPMD propagates the activation shardings and
inserts the pair of all-reduces per layer over ICI.

Pure NamedSharding placement keyed on parameter paths; composes with the
`data` axis into a 2-D (data, model) mesh. At E2-TTS's dim=512 this is
capability headroom, not a speedup — ICI latency dominates at small dims.

Addressing is an explicit module-anchored rule table (not substring
matching): only kernels inside a layer's ``attn`` / ``freq_attn`` / ``ff``
modules shard, so e.g. the model-level mel input projection (also named
``proj_in``) is untouched. A rule that matches a parameter whose dimension
is not divisible by the mesh raises instead of silently replicating.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = 'model'

# (path regex, kind): 'col' splits output features (column parallel),
# 'row' splits input features, 'col_bias' the bias of a column layer.
# The fused attention qkv kernel is (dim, 3, inner) — 'qkv_col' shards its
# trailing `inner` axis, so every q/k/v segment splits by heads and the
# static slices of the (b, n, 3, inner) projection stay shard-aligned.
# Attention qkv is bias-free; FF proj_in carries one.
_RULES = (
    (re.compile(r'(^|/)(attn|freq_attn)/to_qkv/kernel$'), 'qkv_col'),
    (re.compile(r'(^|/)ff/proj_in/kernel$'), 'col'),
    (re.compile(r'(^|/)ff/proj_in/bias$'), 'col_bias'),
    (re.compile(r'(^|/)(attn|freq_attn)/to_out/kernel$'), 'row'),
    (re.compile(r'(^|/)ff/proj_out/kernel$'), 'row'),
)


def make_2d_mesh(data: int, model: int, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= data * model
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ('data', MODEL_AXIS))


def _spec_for(path: str, shape: tuple[int, ...], n_model: int):
    """Returns (spec | None, matched). ``None`` spec with ``matched`` means
    a rule hit a parameter the mesh cannot divide — the caller raises.

    Handles both the unrolled layout (2-D kernels, 1-D biases) and
    `scan_layers=True`'s stacked mid-group params, which carry a leading
    layer axis: (L, in, out) kernels and (L, out) biases — the layer axis
    is never sharded (it is scanned over), features shard as usual."""
    for rx, kind in _RULES:
        if rx.search(path):
            stacked = (len(shape) == 3 if kind in ('col', 'row')
                       else len(shape) == 4 if kind == 'qkv_col'
                       else len(shape) == 2)
            lead = (None,) if stacked else ()
            if kind == 'qkv_col' and len(shape) in (3, 4):
                ok = shape[-1] % n_model == 0
                return (P(*lead, None, None, MODEL_AXIS) if ok else None), True
            if kind == 'col' and len(shape) in (2, 3):
                ok = shape[-1] % n_model == 0
                return (P(*lead, None, MODEL_AXIS) if ok else None), True
            if kind == 'row' and len(shape) in (2, 3):
                ok = shape[-2] % n_model == 0
                return (P(*lead, MODEL_AXIS, None) if ok else None), True
            if kind == 'col_bias' and len(shape) in (1, 2):
                ok = shape[-1] % n_model == 0
                return (P(*lead, MODEL_AXIS) if ok else None), True
    return P(), False


def shard_module_tp(module, mesh: Mesh):
    """Apply tensor-parallel placement to every rule-matched kernel (in
    place); everything else is replicated. Fails loudly (ValueError) if a
    matched kernel cannot be divided by the mesh, or if nothing matched at
    all (a module with no transformer layers is almost certainly a caller
    bug). Returns the module; `module._tp_sharded_paths` (a sorted list)
    records what was actually sharded for tests/inspection."""
    from flax import nnx

    n_model = mesh.shape[MODEL_AXIS]
    state = nnx.state(module)
    pure = nnx.to_pure_dict(state)
    sharded, indivisible = [], []

    def place(path, x):
        if not hasattr(x, 'shape'):
            return x
        path_str = '/'.join(str(getattr(k, "key", k)) for k in path)
        spec, matched = _spec_for(path_str, x.shape, n_model)
        if matched:
            if spec is None:
                indivisible.append((path_str, x.shape))
                spec = P()
            else:
                sharded.append(path_str)
        return jax.device_put(x, NamedSharding(mesh, spec))

    pure = jax.tree_util.tree_map_with_path(place, pure)
    if indivisible:
        raise ValueError(
            f'tensor-parallel rules matched parameters the {n_model}-way '
            f'`model` mesh cannot divide (refusing to silently replicate): '
            f'{indivisible[:8]}')
    if not sharded:
        raise ValueError(
            'tensor-parallel sharding matched NO parameters — the module '
            'has no transformer attn/ff layers under the expected paths.')
    nnx.replace_by_pure_dict(state, pure)
    nnx.update(module, state)
    module._tp_sharded_paths = sorted(sharded)
    return module
