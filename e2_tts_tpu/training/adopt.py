"""ADOPT optimizer as an optax GradientTransformation.

The reference trainer's default optimizer (trainer.py:23, 182-183) is the
`Adopt` from lucidrains' adam-atan2-pytorch — ADOPT (arXiv 2411.02853: Adam
with the second moment decoupled from the current gradient, provably
convergent with any beta2) with the atan2 stabilisation (arXiv 2407.05872)
replacing the eps-division.

Update rule (step t, decay b1/b2):
    t = 1:  v <- g^2                      (initialise second moment; no update)
    t > 1:  u <- atan2(g, sqrt(v_prev))   (or g / max(sqrt(v_prev), eps))
            m <- b1 * m + (1-b1) * u
            theta <- theta - lr * m
            v <- b2 * v_prev + (1-b2) * g^2
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class AdoptState(NamedTuple):
    count: chex.Array   # step counter
    m: optax.Updates    # first moment of normalised grads
    v: optax.Updates    # second moment of raw grads


def scale_by_adopt(
    b1: float = 0.9,
    b2: float = 0.9999,
    eps: float = 1e-6,
    use_atan2: bool = True,
) -> optax.GradientTransformation:

    def init_fn(params):
        return AdoptState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params),
            v=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        is_first = count == 1

        def normalise(g, v_prev):
            if use_atan2:
                # atan2(g, sqrt(v)): scale-invariant, bounded, eps-free
                return jnp.arctan2(g, jnp.sqrt(jnp.clip(v_prev, min=0.0)))
            return g / jnp.maximum(jnp.sqrt(jnp.clip(v_prev, min=0.0)), eps)

        u = jax.tree.map(normalise, updates, state.v)
        new_m = jax.tree.map(lambda m, u_: b1 * m + (1 - b1) * u_, state.m, u)
        new_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.v, updates)

        # first step only primes v; no parameter update
        out = jax.tree.map(
            lambda m: jnp.where(is_first, jnp.zeros_like(m), -m), new_m)
        new_m = jax.tree.map(
            lambda m_old, m_new: jnp.where(is_first, m_old, m_new), state.m, new_m)
        first_v = jax.tree.map(lambda g: g * g, updates)
        new_v = jax.tree.map(
            lambda v_first, v_new: jnp.where(is_first, v_first, v_new), first_v, new_v)

        return out, AdoptState(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def adopt(
    learning_rate: optax.ScalarOrSchedule = 7.5e-5,
    b1: float = 0.9,
    b2: float = 0.9999,
    eps: float = 1e-6,
    use_atan2: bool = True,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """ADOPT with optional decoupled weight decay. Note: `scale_by_adopt`
    already emits the signed update, so learning-rate scaling composes with
    `optax.scale_by_learning_rate` (which negates again — hence the chain
    order below keeps the sign right)."""
    tx = [scale_by_adopt(b1=b1, b2=b2, eps=eps, use_atan2=use_atan2)]
    if weight_decay > 0.0:
        tx.append(optax.add_decayed_weights(-weight_decay))
    # scale_by_learning_rate multiplies by -lr; our update is already negated,
    # so undo the double negation with a plain schedule scale
    if callable(learning_rate):
        tx.append(optax.scale_by_schedule(learning_rate))
    else:
        tx.append(optax.scale(learning_rate))
    return optax.chain(*tx)
