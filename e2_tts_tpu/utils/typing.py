"""Runtime shape/dtype contracts for public entry points.

The reference enforces jaxtyping annotations with always-on @beartype on
every public entry point (e2_tts.py:58-67, 519, 957, 1117) — its de-facto
assertion layer (SURVEY.md §4). Here the same contracts are jaxtyping
annotations checked by typeguard (beartype is not in the image); wrong-rank
/ wrong-dtype / inconsistent-batch calls raise TypeCheckError up front
instead of failing deep inside XLA.

Checks run per Python call — i.e. at trace time under jit — so the hot
compiled paths pay nothing.
"""

from __future__ import annotations

import typeguard
from jaxtyping import Bool, Float, Int, Num, jaxtyped  # re-exported
from jaxtyping import TypeCheckError


def typecheck(fn):
    """Enforce the function's jaxtyping annotations at call time."""
    return jaxtyped(typechecker=typeguard.typechecked)(fn)


__all__ = ['typecheck', 'jaxtyped', 'Float', 'Int', 'Bool', 'Num',
           'TypeCheckError']
