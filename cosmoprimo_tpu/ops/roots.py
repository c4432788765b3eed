"""Trace-safe scalar root finding: bracket expansion + Ridders/bisection.

Used by ``Cosmology.solve`` and the neutrino-mass inversions. Loops are
``fori_loop`` + ``cond`` (fixed max iterations) so they jit; a sign-check
failure poisons the result with NaN (cosmoprimo/jax.py:719-924 behavior).
"""

import jax
import jax.numpy as jnp

from .misc import exception_or_nan


def for_cond_loop(lower, upper, cond_fun, body_fun, init_val):
    """fori_loop whose body is skipped once ``cond_fun`` turns False."""

    def body(i, val):
        return jax.lax.cond(cond_fun(i, val), body_fun, lambda i, v: v, i, val)

    return jax.lax.fori_loop(lower, upper, body, init_val)


def bracket(f, init, maxiter=15, maxtries=None):
    """Expand from ``init`` to find a sign change of ``f``.

    ``init`` is (x1, dx) or (x1, dx, f1). Returns sorted (2,) array [lo, hi].
    ``maxtries`` (eager error-retry count in the reference, jax.py:719) is
    accepted for signature parity and ignored: traced evaluation cannot
    retry on exceptions.
    """
    if len(init) == 2:
        x1, dx = init
        f1 = f(x1)
    else:
        x1, dx, f1 = init
    dx = 1.5 * dx

    def body_fun(i, state):
        (x1, f1), cond, _ = state
        x2 = x1 - dx
        f2 = f(x2)
        cond = f1 * f2 > 0
        x1n = jnp.where(cond, x2, x1)
        f1n = jnp.where(cond, f2, f1)
        return (x1n, f1n), cond, (x1, x2)

    def cond_fun(i, state):
        return state[1]

    state = for_cond_loop(0, maxiter, cond_fun, body_fun, ((x1, f1), f1**2 > 0, (x1, x1 - dx)))
    xs = jnp.sort(jnp.array(state[-1]))
    return xs


def bisect(f, limits, flimits=None, xtol=1e-6, maxiter=100, method='ridders'):
    """Find a root of ``f`` in ``limits`` = (a, b); Ridders' method by default.

    If f(a), f(b) do not have opposite signs the result is NaN under trace
    (raises eagerly).
    """
    a, b = limits
    fa, fb = (flimits if flimits is not None else (f(a), f(b)))

    def error(*args):
        raise ValueError('f(a), f(b) are not of different signs')

    sign = jnp.where((fa < 0) & (fb > 0), 1, jnp.where((fa > 0) & (fb < 0), -1, 0))
    # an endpoint sitting exactly on the root is a degenerate (but valid)
    # bracket: the iterations assume strict signs, so short-circuit it
    endpoint_root = jnp.where(fa == 0, a, jnp.where(fb == 0, b, jnp.nan))
    has_endpoint_root = (fa == 0) | (fb == 0)

    if method == 'ridders':

        def body_fun(i, state):
            (xflow, xfhigh), _, _ = state
            mid = 0.5 * (xflow[0] + xfhigh[0])
            xfmid = jnp.array([mid, f(mid)])
            s = jnp.sqrt(xfmid[1] * xfmid[1] - xflow[1] * xfhigh[1])
            sgn = jnp.where(xflow[1] >= 0.0, 1.0, -1.0)
            # s == 0 means an iterate hit the root exactly (f(mid) == 0 and
            # an endpoint f == 0): the Ridders step is 0/0 — keep mid instead
            # of poisoning the bracket with NaN
            step = jnp.where(s > 0, (xfmid[0] - xflow[0]) * sgn * xfmid[1] / jnp.where(s > 0, s, 1.0), 0.0)
            new = xfmid[0] + step
            xfnew = jnp.array([new, f(new)])
            xf = jnp.where(xfmid[1] * xfnew[1] <= 0, jnp.array([xfmid, xfnew]),
                           jnp.where(xflow[1] * xfnew[1] < 0, jnp.array([xflow, xfnew]),
                                     jnp.array([xfnew, xfhigh])))
            return (xf, xfhigh[0] - xflow[0], new)

        state = jnp.array([[a, fa], [b, fb]], dtype=jnp.result_type(float, jnp.asarray(fa).dtype))

    else:

        def body_fun(i, state):
            (low, high, sg), _, x = state
            value = f(x)
            too_large = sg * value > 0
            high = jnp.where(too_large, x, high)
            low = jnp.where(too_large, low, x)
            new = 0.5 * (low + high)
            return ((low, high, sg), high - low, new)

        state = (a, b, sign)

    def cond_fun(i, st):
        return jnp.abs(st[1]) > xtol

    new = for_cond_loop(0, maxiter, cond_fun, body_fun, (state, 1.0 + xtol, (a + b) / 2.0))[-1]
    new = jnp.where(has_endpoint_root, endpoint_root, new)
    return exception_or_nan(new, (sign == 0) & jnp.logical_not(has_endpoint_root), error)
