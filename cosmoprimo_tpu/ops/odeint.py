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
