"""Fixed-order quadrature rules, fully traced.

The reference relies on vendored scipy Simpson, a trace-safe Romberg and
Gauss-Laguerre sums (cosmoprimo/jax.py:365-669, cosmology.py:130-133). Here
every rule has a static evaluation count, so vmap over parameters batches
cleanly and XLA sees fixed shapes.
"""

import functools

import jax.numpy as jnp
import numpy as np


def simpson(y, x=None, dx=1.0, axis=-1, even='avg'):
    """Composite Simpson integration of sampled values, matching
    scipy.integrate.simpson semantics (including the 'avg' handling of an
    even number of samples)."""
    y = jnp.asarray(y)
    N = y.shape[axis]
    y = jnp.moveaxis(y, axis, 0)
    if x is not None:
        x = jnp.asarray(x)
        if x.ndim == 1:
            xb = x.reshape((N,) + (1,) * (y.ndim - 1))
        else:
            xb = jnp.moveaxis(x, axis, 0)
    else:
        xb = None

    def basic(ys, xs, start, stop):
        # Simpson over [start, stop) in steps of 2 (stop exclusive of +2 terms)
        y0 = ys[start:stop:2]
        y1 = ys[start + 1:stop + 1:2]
        y2 = ys[start + 2:stop + 2:2]
        if xs is None:
            return jnp.sum(dx / 3.0 * (y0 + 4 * y1 + y2), axis=0)
        h = jnp.diff(xs, axis=0)
        h0 = h[start:stop:2]
        h1 = h[start + 1:stop + 1:2]
        hsum = h0 + h1
        hprod = h0 * h1
        h0divh1 = h0 / h1
        tmp = hsum / 6.0 * (y0 * (2 - 1.0 / h0divh1) + y1 * hsum * hsum / hprod + y2 * (2 - h0divh1))
        return jnp.sum(tmp, axis=0)

    if N % 2 == 0:
        val = 0.0
        result = 0.0
        if even in ('avg', 'first'):
            hlast = (xb[-1] - xb[-2]) if xb is not None else dx
            val = val + 0.5 * hlast * (y[-1] + y[-2])
            result = result + basic(y, xb, 0, N - 3)
        if even in ('avg', 'last'):
            hfirst = (xb[1] - xb[0]) if xb is not None else dx
            val = val + 0.5 * hfirst * (y[1] + y[0])
            result = result + basic(y, xb, 1, N - 2)
        if even == 'avg':
            val = val / 2.0
            result = result / 2.0
        return result + val
    return basic(y, xb, 0, N - 2)


def romberg(function, a, b, args=(), epsabs=1e-8, epsrel=1e-8, divmax=10, return_error=False):
    """Romberg integration with a fixed number of refinements (``divmax``),
    trace-safe: precision failure poisons the result with NaN instead of
    raising (the reference's jit-safe idiom, cosmoprimo/jax.py:519-669)."""
    from .misc import exception_or_nan

    vfunc = lambda x: function(x, *args)
    interval_size = b - a
    ordsum = 0.5 * (vfunc(a) + vfunc(b))
    result = interval_size * ordsum
    last_row = [result]
    n = 1
    for i in range(1, divmax + 1):
        n *= 2
        h = interval_size / (n // 2)
        points = a + (jnp.arange(n // 2) + 0.5) * h
        ordsum = ordsum + jnp.sum(vfunc(points), axis=0)
        row = [interval_size * ordsum / n]
        for k in range(1, i + 1):
            pow4 = 4.0**k
            row.append((pow4 * row[k - 1] - last_row[k - 1]) / (pow4 - 1.0))
        err = jnp.abs(last_row[i - 1] - row[i])
        last_row = row
    result = last_row[divmax]

    def error(*eargs):
        raise ValueError('romberg precision not achieved')

    cond = (err < epsabs) & (err < jnp.abs(result) * epsrel)
    result = exception_or_nan(result, ~cond, error)
    if return_error:
        return result, err
    return result


@functools.lru_cache(maxsize=32)
def _leggauss(n):
    xi, wi = np.polynomial.legendre.leggauss(n)
    return xi, wi


@functools.lru_cache(maxsize=8)
def gauss_laguerre_nodes(n):
    """Gauss-Laguerre nodes/weights (host-computed once, static)."""
    ti, wi = np.polynomial.laguerre.laggauss(n)
    return ti, wi


def gauss_legendre(fun, a, b, n=128):
    """Fixed-order Gauss-Legendre integral of ``fun`` over [a, b]; ``a``/``b``
    may be traced. ``fun`` is evaluated on an (n,)-batch of points, and may
    return trailing axes (integrated along axis 0)."""
    xi, wi = _leggauss(n)
    xi = jnp.asarray(xi)
    wi = jnp.asarray(wi)
    half = (b - a) / 2.0
    mid = (b + a) / 2.0
    x = half * xi + mid
    y = fun(x)
    w = wi.reshape((n,) + (1,) * (jnp.ndim(y) - 1))
    return half * jnp.sum(y * w, axis=0)


fixed_quad_legendre = gauss_legendre


def trapezoid_weights(x):
    """Composite-trapezoid weights over the (1D, increasing) grid ``x``:
    int f dx ~= sum w_i f(x_i). Shared by the sigma^2 / sigma_v^2 matmul
    integrals (models/halofit.py, models/hmcode.py)."""
    import jax.numpy as jnp
    dx = jnp.diff(jnp.asarray(x))
    return jnp.concatenate([dx[:1] / 2, (dx[:-1] + dx[1:]) / 2, dx[-1:] / 2])
