"""Neural-ODE integrators — fully on device.

The reference integrates the flow ODE with torchdiffeq's `odeint` on a fixed
linspace(0, 1, steps) grid with method='midpoint' (e2_tts.py:33, 1122-1126,
1421). The TPU-native equivalent is a `lax.scan` over the time grid: one
compiled loop, no host round-trips, 2 f-evals per interval for midpoint
(NFE parity).

torchdiffeq's `odeint_kwargs` also accept adaptive methods (the reference
passes kwargs straight through, e2_tts.py:1122-1126); those are provided as
embedded Runge-Kutta pairs ('dopri5', 'bosh3', 'fehlberg2',
'adaptive_heun') driven by a `lax.while_loop` PI step controller with
atol/rtol error control — data-dependent step counts stay on device, shapes
stay static.

`odeint(fn, y0, t, method=...)` mirrors the torchdiffeq call signature the
reference uses; atol/rtol apply to the adaptive methods and are ignored by
the fixed-grid ones (as in torchdiffeq).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _euler_step(fn, t0, t1, y):
    h = t1 - t0
    return y + h * fn(t0, y)


def _midpoint_step(fn, t0, t1, y):
    h = t1 - t0
    half = y + 0.5 * h * fn(t0, y)
    return y + h * fn(t0 + 0.5 * h, half)


def _rk4_step(fn, t0, t1, y):
    h = t1 - t0
    k1 = fn(t0, y)
    k2 = fn(t0 + 0.5 * h, y + 0.5 * h * k1)
    k3 = fn(t0 + 0.5 * h, y + 0.5 * h * k2)
    k4 = fn(t1, y + h * k3)
    return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

_STEPPERS = {
    'euler': _euler_step,
    'midpoint': _midpoint_step,
    'rk4': _rk4_step,
}


# -- adaptive embedded Runge-Kutta pairs ---------------------------------------

class _Tableau:
    """Explicit embedded RK pair: c (nodes), a (strictly lower-triangular
    stage weights), b (high-order solution), b_err (b_high - b_low, the
    embedded error estimator), order of the propagated solution."""

    def __init__(self, c, a, b, b_err, order):
        self.c = np.asarray(c, dtype=np.float64)
        self.a = [np.asarray(row, dtype=np.float64) for row in a]
        self.b = np.asarray(b, dtype=np.float64)
        self.b_err = np.asarray(b_err, dtype=np.float64)
        self.order = order
        self.stages = len(self.c)


def _dopri5_tableau():
    c = [0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1, 1]
    a = [
        [],
        [1 / 5],
        [3 / 40, 9 / 40],
        [44 / 45, -56 / 15, 32 / 9],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
        [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
    ]
    b = [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0]
    b_low = [5179 / 57600, 0, 7571 / 16695, 393 / 640, -92097 / 339200,
             187 / 2100, 1 / 40]
    b_err = [bh - bl for bh, bl in zip(b, b_low)]
    return _Tableau(c, a, b, b_err, order=5)


def _bosh3_tableau():
    c = [0, 1 / 2, 3 / 4, 1]
    a = [[], [1 / 2], [0, 3 / 4], [2 / 9, 1 / 3, 4 / 9]]
    b = [2 / 9, 1 / 3, 4 / 9, 0]
    b_low = [7 / 24, 1 / 4, 1 / 3, 1 / 8]
    b_err = [bh - bl for bh, bl in zip(b, b_low)]
    return _Tableau(c, a, b, b_err, order=3)


def _fehlberg2_tableau():
    c = [0, 1 / 2, 1]
    a = [[], [1 / 2], [1 / 256, 255 / 256]]
    b = [1 / 512, 255 / 256, 1 / 512]
    b_low = [1 / 256, 255 / 256, 0]
    b_err = [bh - bl for bh, bl in zip(b, b_low)]
    return _Tableau(c, a, b, b_err, order=2)


def _adaptive_heun_tableau():
    c = [0, 1]
    a = [[], [1]]
    b = [1 / 2, 1 / 2]
    b_low = [1, 0]
    b_err = [bh - bl for bh, bl in zip(b, b_low)]
    return _Tableau(c, a, b, b_err, order=2)


_ADAPTIVE_TABLEAUS = {
    'dopri5': _dopri5_tableau,
    'bosh3': _bosh3_tableau,
    'fehlberg2': _fehlberg2_tableau,
    'adaptive_heun': _adaptive_heun_tableau,
}

_MAX_ADAPTIVE_STEPS = 10_000


def _adaptive_interval(fn, t0, t1, y0, tab: _Tableau, atol, rtol):
    """Integrate one interval [t0, t1] with an embedded RK pair under a
    `lax.while_loop` (data-dependent step count, static shapes). Error
    norm and controller follow torchdiffeq's rms_norm + 0.9 safety /
    exponent 1/(order+1), factors clamped to [0.2, 10]."""
    yf32 = y0.astype(jnp.float32)

    def err_norm(err, y_a, y_b):
        tol = atol + rtol * jnp.maximum(jnp.abs(y_a), jnp.abs(y_b))
        r = err / tol
        return jnp.sqrt(jnp.mean(r * r))

    def rk_step(t, y, h):
        ks = []
        for i in range(tab.stages):
            yi = y
            for j, aij in enumerate(tab.a[i]):
                if aij != 0.0:
                    yi = yi + (h * float(aij)) * ks[j]
            ks.append(fn(t + float(tab.c[i]) * h, yi).astype(jnp.float32))
        y_new = y
        for i, bi in enumerate(tab.b):
            if bi != 0.0:
                y_new = y_new + (h * float(bi)) * ks[i]
        err = jnp.zeros_like(y)
        for i, ei in enumerate(tab.b_err):
            if ei != 0.0:
                err = err + (h * float(ei)) * ks[i]
        return y_new, err

    span = t1 - t0
    h0 = span / 10.0   # simple initial step; the controller adapts fast

    def cond(state):
        t, y, h, n = state
        return (t < t1 - 1e-9) & (n < _MAX_ADAPTIVE_STEPS)

    def body(state):
        t, y, h, n = state
        h = jnp.minimum(h, t1 - t)
        y_new, err = rk_step(t, y, h)
        ratio = err_norm(err, y, y_new)
        # a NaN/inf error estimate (fn blew up) must reject the step AND
        # keep the controller state finite — otherwise h goes NaN and every
        # later step is silently rejected until the cap
        finite = jnp.isfinite(ratio)
        accept = finite & (ratio <= 1.0)

        factor = jnp.where(
            ratio <= 1e-10, 10.0,
            jnp.clip(0.9 * ratio ** (-1.0 / (tab.order + 1.0)), 0.2, 10.0))
        factor = jnp.where(finite, factor, 0.2)
        h_next = h * factor

        t = jnp.where(accept, t + h, t)
        y = jnp.where(accept, y_new, y)
        return t, y, h_next, n + 1

    t_fin, y_fin, _, n_fin = jax.lax.while_loop(
        cond, body, (t0.astype(jnp.float32), yf32, h0.astype(jnp.float32),
                     jnp.zeros((), jnp.int32)))
    # torchdiffeq raises on max-steps/underflow; under jit the traced
    # equivalent is NaN-filling the result so truncation is visible to the
    # caller instead of returning a silently partial solution
    saturated = (n_fin >= _MAX_ADAPTIVE_STEPS) & (t_fin < t1 - 1e-9)
    y_fin = jnp.where(saturated, jnp.nan, y_fin)
    return y_fin.astype(y0.dtype)


def _odeint_adaptive(fn, y0, t, *, tableau, atol, rtol, return_trajectory):
    atol = 1e-5 if atol is None else float(atol)
    rtol = 1e-5 if rtol is None else float(rtol)
    tab = _ADAPTIVE_TABLEAUS[tableau]()

    t = t.astype(jnp.float32)
    # integrate grid-interval by grid-interval so the solution is available
    # at every requested t (torchdiffeq uses dense-output interpolation; a
    # forced step at grid points is equivalent up to solver tolerance).
    # One `lax.scan` over the intervals (while_loop inside the body): the
    # interval integrator traces ONCE regardless of grid size — a 32-point
    # grid previously traced 31 separate while_loops
    t_pairs = jnp.stack((t[:-1], t[1:]), axis=-1)   # (steps-1, 2)

    def scan_body(y, t01):
        y_next = _adaptive_interval(fn, t01[0], t01[1], y, tab, atol, rtol)
        return y_next, (y_next if return_trajectory else None)

    y_final, ys = jax.lax.scan(scan_body, y0, t_pairs)
    if return_trajectory:
        return jnp.concatenate((y0[None], ys), axis=0)
    return y_final


def odeint(
    fn,
    y0: jax.Array,
    t: jax.Array,
    *,
    method: str = 'midpoint',
    atol: float | None = None,   # accepted for API parity, unused (fixed grid)
    rtol: float | None = None,
    return_trajectory: bool = False,
):
    """Integrate dy/dt = fn(t, y) across the grid ``t`` (shape (steps,)).

    Returns the final state ``y(t[-1])``; with ``return_trajectory=True``
    returns the full (steps, *y0.shape) trajectory like torchdiffeq.
    """
    if method in _ADAPTIVE_TABLEAUS:
        return _odeint_adaptive(fn, y0, t, tableau=method, atol=atol, rtol=rtol,
                                return_trajectory=return_trajectory)
    if method not in _STEPPERS:
        raise ValueError(
            f'unknown ODE method {method!r}; choose from '
            f'{sorted(_STEPPERS) + sorted(_ADAPTIVE_TABLEAUS)}')
    stepper = _STEPPERS[method]

    t = t.astype(jnp.float32)
    t_pairs = jnp.stack((t[:-1], t[1:]), axis=-1)   # (steps-1, 2)

    def scan_body(y, t01):
        # time arithmetic stays fp32; cast back so the scan carry dtype is
        # stable when integrating bf16 states
        y_next = stepper(fn, t01[0], t01[1], y).astype(y.dtype)
        return y_next, (y_next if return_trajectory else None)

    y_final, ys = jax.lax.scan(scan_body, y0, t_pairs)

    if return_trajectory:
        return jnp.concatenate((y0[None], ys), axis=0)
    return y_final
