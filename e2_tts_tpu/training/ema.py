"""Exponential moving average of model weights + Switch-EMA.

Capability imported by the reference from `ema-pytorch` (trainer.py:25,
170-176, 279, 301-302): per-step EMA with a warmup ramp, an `initted` gate,
and Switch-EMA (arXiv 2402.09240) which copies the EMA weights back into the
online model at the end of training. The EMA model doubles as the
velocity-consistency teacher (trainer.py:259-261).

Implemented as an NNX module holding a full copy of the model so the teacher
can be called directly; the smoothing update is pure jnp (jit-safe, runs
inside the train step — no host sync).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from e2_tts_tpu.models.blocks import Buffer


def _copy_module(model: nnx.Module) -> nnx.Module:
    graphdef, state = nnx.split(model)
    return nnx.merge(graphdef, jax.tree.map(lambda x: x, state))


class EMA(nnx.Module):
    """Semantics follow ema-pytorch defaults: beta=0.9999, copy for the first
    `update_after_step` steps, update every `update_every` calls, decay ramp
    1 - (1 + epoch/inv_gamma)^(-power) clamped to [min_value, beta]."""

    def __init__(
        self,
        model: nnx.Module,
        beta: float = 0.9999,
        update_after_step: int = 100,
        update_every: int = 10,
        inv_gamma: float = 1.0,
        power: float = 2.0 / 3.0,
        min_value: float = 0.0,
        include_online_model: bool = False,   # API parity; copies either way
    ):
        self.beta = beta
        self.update_after_step = update_after_step
        self.update_every = update_every
        self.inv_gamma = inv_gamma
        self.power = power
        self.min_value = min_value

        self.ema_model = _copy_module(model)
        if hasattr(self.ema_model, 'eval'):
            self.ema_model.eval()   # the teacher never uses dropout

        self.step = Buffer(jnp.zeros((), dtype=jnp.int32))
        self.step_initted = Buffer(jnp.zeros((), dtype=jnp.bool_))

    @property
    def initted(self) -> jax.Array:
        return self.step_initted[...]

    def _decay_at(self, step) -> jax.Array:
        epoch = jnp.clip(step.astype(jnp.float32) - self.update_after_step - 1, min=0.0)
        value = 1.0 - (1.0 + epoch / self.inv_gamma) ** (-self.power)
        value = jnp.clip(value, self.min_value, self.beta)
        return jnp.where(epoch <= 0.0, 0.0, value)

    def current_decay(self) -> jax.Array:
        """Decay the ramp yields at the current counter value (ema-pytorch
        `get_current_decay`; the counter there counts COMPLETED update calls,
        as ours does after `update()` returns)."""
        return self._decay_at(self.step[...])

    def update(self, model: nnx.Module):
        """One EMA tick (call once per optimizer step, like trainer.py:279)."""
        step = self.step[...]
        should_tick = (step % self.update_every) == 0
        warm = step <= self.update_after_step
        # ema-pytorch increments the counter BEFORE computing the decay, so
        # the blend at pre-increment step k uses the ramp value at k+1
        # (verified against the torch mirror in tests/test_oracles.py)
        decay = self._decay_at(step + 1)

        online = nnx.state(model, nnx.Param)
        ema = nnx.state(self.ema_model, nnx.Param)

        def blend(e, o):
            d = jnp.where(warm, 0.0, decay).astype(jnp.float32)
            new = e.astype(jnp.float32) * d + o.astype(jnp.float32) * (1.0 - d)
            return jnp.where(should_tick, new, e.astype(jnp.float32)).astype(e.dtype)

        new_ema = jax.tree.map(blend, ema, online)
        nnx.update(self.ema_model, new_ema)

        self.step[...] = step + 1
        self.step_initted[...] = self.step_initted[...] | should_tick

    def update_model_with_ema(self, model: nnx.Module):
        """Switch-EMA: copy EMA weights into the online model (trainer.py:301-302)."""
        nnx.update(model, nnx.state(self.ema_model, nnx.Param))
