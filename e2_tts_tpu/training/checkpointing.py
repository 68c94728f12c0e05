"""Checkpoint / resume via orbax (reference: single torch.save dict of
{model, optimizer, ema_model, scheduler, step} with auto-resume at train
start, trainer.py:202-228, 241).

Here the checkpoint is one pytree: {model, opt, ema, step} plus, when
present, {duration_predictor, dp_opt} (the trainable duration predictor the
reference logs but never optimises, trainer.py:255-257) and the train loop's
PRNG key for exact resume. The schedule needs no state — it is a pure
function of `step`. Saves are atomic (orbax) and auto-resume restores into
the live NNX modules in place.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import orbax.checkpoint as ocp

from e2_tts_tpu.utils.helpers import exists


# PRNG streams are excluded: typed key arrays don't serialise and the
# streams are reconstructible — everything learnable/stateful is saved.
_SAVED = nnx.Not(nnx.RngState)


def _pure(state) -> dict:
    return jax.tree.map(lambda x: np.asarray(x), nnx.to_pure_dict(state))


def migrate_qkv_layout(tree):
    """Convert checkpoints from before the fused attention qkv parameter:
    sibling ``to_q/to_k/to_v`` subtrees (kernels (..., d, inner), plus any
    mirrored optimizer moments) merge into ``to_qkv`` with leaves stacked on
    a new axis -2 — exactly the (d, 3, inner) layout `nnx.LinearGeneral`
    stores (models/blocks.py). New-layout trees pass through unchanged."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    keys = set(tree)
    if {'to_q', 'to_k', 'to_v'} <= keys and 'to_qkv' not in keys:
        q, k, v = (migrate_qkv_layout(tree[n])
                   for n in ('to_q', 'to_k', 'to_v'))
        out['to_qkv'] = jax.tree.map(
            lambda a, b, c: np.stack([np.asarray(a), np.asarray(b),
                                      np.asarray(c)], axis=-2), q, k, v)
        keys -= {'to_q', 'to_k', 'to_v'}
    for k in keys:
        out[k] = migrate_qkv_layout(tree[k])
    return out


def save_checkpoint(path: str, *, model, optimizer=None, ema=None, step: int = 0,
                    duration_predictor=None, dp_optimizer=None, key=None):
    """Write {model, opt, ema, [duration_predictor, dp_opt, key], step} to
    `path` (a directory), atomically replacing any previous checkpoint."""
    path = os.path.abspath(path)
    item = dict(model=_pure(nnx.state(model, _SAVED)), step=np.asarray(step, dtype=np.int64))
    if exists(optimizer):
        item['opt'] = _pure(nnx.state(optimizer, _SAVED))
    if exists(ema):
        item['ema'] = _pure(nnx.state(ema, _SAVED))
    if exists(duration_predictor):
        item['duration_predictor'] = _pure(nnx.state(duration_predictor, _SAVED))
    if exists(dp_optimizer):
        item['dp_opt'] = _pure(nnx.state(dp_optimizer, _SAVED))
    if exists(key):
        # typed PRNG keys don't serialise; store the raw key data
        item['key'] = np.asarray(jax.random.key_data(key))

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, item, force=True)
    ckptr.close()


def load_checkpoint(path: str, *, model, optimizer=None, ema=None,
                    duration_predictor=None, dp_optimizer=None):
    """Restore in place; returns (step, key) — (0, None) if no checkpoint,
    key None if the checkpoint predates key saving."""
    path = os.path.abspath(path)
    # an existing-but-EMPTY directory (e.g. freshly mkdir'd by the user) is
    # "no checkpoint yet", not a corrupt checkpoint — auto-resume at train
    # start must not crash on it. A non-empty dir without valid orbax
    # structure still raises (possible partial/corrupt state).
    if not os.path.exists(path) or not os.listdir(path):
        return 0, None

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    ckptr.close()

    def _update(module, pure):
        state = nnx.state(module, _SAVED)
        nnx.replace_by_pure_dict(state, migrate_qkv_layout(pure))
        nnx.update(module, state)

    _update(model, restored['model'])
    if exists(optimizer) and 'opt' in restored:
        _update(optimizer, restored['opt'])
    if exists(ema) and 'ema' in restored:
        _update(ema, restored['ema'])
    if exists(duration_predictor) and 'duration_predictor' in restored:
        _update(duration_predictor, restored['duration_predictor'])
    if exists(dp_optimizer) and 'dp_opt' in restored:
        _update(dp_optimizer, restored['dp_opt'])

    key = None
    if 'key' in restored and restored['key'] is not None:
        key = jax.random.wrap_key_data(jnp.asarray(restored['key']))

    return int(restored['step']), key
