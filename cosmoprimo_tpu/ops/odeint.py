"""Fixed-grid Runge-Kutta integration on ``lax.scan``.

Fixed grids keep shapes static so the whole integration vmaps over
parameter batches (the reference makes the same choice,
cosmoprimo/jax.py:672-716).
"""

import jax
import jax.numpy as jnp


def odeint(fun, y0, t, args=(), method='rk4'):
    """Integrate dy/dt = fun(y, t, *args) on the fixed grid ``t`` (1D,
    increasing or decreasing), returning y at every grid point (y(t[0]) = y0).
    ``y0`` may be a scalar or an array; returned shape is t.shape + y0.shape.
    """
    t = jnp.asarray(t)
    func = lambda y, tt: fun(y, tt, *args)

    if method == 'rk1':
        def step(y, t_last, h):
            return y + h * func(y, t_last)
    elif method == 'rk2':
        def step(y, t_last, h):
            k1 = func(y, t_last)
            k2 = func(y + h * k1 / 2, t_last + h / 2)
            return y + h * k2
    elif method == 'rk4':
        def step(y, t_last, h):
            k1 = func(y, t_last)
            k2 = func(y + h * k1 / 2, t_last + h / 2)
            k3 = func(y + h * k2 / 2, t_last + h / 2)
            k4 = func(y + h * k3, t_last + h)
            return y + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    else:
        raise ValueError(f'unknown method {method}')

    y0 = jnp.asarray(y0, dtype=jnp.result_type(float, t.dtype))

    def scan_fn(carry, tnext):
        y, tlast = carry
        ynext = step(y, tlast, tnext - tlast)
        return (ynext, tnext), ynext

    # First output corresponds to t[0] with zero step (y0 itself).
    (_, _), ys = jax.lax.scan(scan_fn, (y0, t[0]), t)
    return ys


def cumquad_rk4(fun, y0, t, args=()):
    """Cumulative integral y(t) = y0 + int fun(t') dt' on the fixed grid
    ``t``, for integrands that do NOT depend on y.

    Numerically identical to ``odeint(fun, y0, t, method='rk4')`` for
    y-independent ``fun`` (RK4 on a quadrature problem collapses to the
    Simpson rule with midpoint evaluation per interval), but the sequential
    lax.scan becomes a vectorized evaluation + one cumsum — no per-step
    kernel launches inside jit/vmap megagraphs (this is the hot path of the
    batched distance/time tables).
    """
    t = jnp.asarray(t)
    func = lambda tt: fun(None, tt, *args)
    mid = (t[:-1] + t[1:]) / 2.0
    f_ends = func(t)
    f_mid = func(mid)
    h = jnp.diff(t)
    inc = h / 6.0 * (f_ends[:-1] + 4.0 * f_mid + f_ends[1:])
    y0 = jnp.asarray(y0, dtype=jnp.result_type(float, t.dtype))
    zero = jnp.zeros((1,) + inc.shape[1:], dtype=inc.dtype)
    return y0 + jnp.concatenate([zero, jnp.cumsum(inc, axis=0)], axis=0)
