"""Shape/dtype policy helpers and jit-safe error handling.

Mirrors the behavior of the reference's ``utils.flatarray`` decorator
(cosmoprimo/utils.py:88-138) and its error-or-NaN validation idiom
(cosmoprimo/jax.py:64-73, 510-516), re-implemented JAX-first.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bcast_dtype(*args):
    """Result dtype policy: float32 in -> float32 out, anything with float64
    (or python floats / float64 arrays) -> float64."""
    dtypes = []
    for a in args:
        if a is None:
            continue
        dt = getattr(a, 'dtype', None)
        if dt is None:
            dtypes.append(np.float64)
        elif jnp.issubdtype(dt, jnp.floating):
            dtypes.append(dt)
    if not dtypes:
        return jnp.float64
    if any(np.dtype(dt) == np.float64 for dt in dtypes):
        return jnp.float64
    return dtypes[0]


def flatarray(iargs=(0,), dtype=None):
    """Decorator for methods taking array arguments at positions ``iargs``
    (after ``self``): inputs are raveled to 1D for the computation, and the
    output is reshaped back, with scalar in -> scalar out. The output dtype
    follows :func:`bcast_dtype` of the inputs.
    """
    def decorator(func):

        @functools.wraps(func)
        def wrapper(self, *args, **kwargs):
            args = list(args)
            shapes = []
            out_dtype = dtype or bcast_dtype(*[args[i] for i in iargs])
            for i in iargs:
                array = jnp.asarray(args[i], dtype=jnp.float64)
                shapes.append(array.shape)
                args[i] = array.ravel()
            shape = shapes[0]
            toret = func(self, *args, **kwargs)
            toret = jnp.asarray(toret, dtype=out_dtype)
            # Trailing function-dependent axes (e.g. species) lead; the
            # input shape replaces the flattened axis.
            return toret.reshape(toret.shape[:-1] + shape)

        return wrapper

    return decorator


def exception(func, *args):
    """Call ``func(*args)`` on the host for its side effects (warnings,
    raising in eager contexts); under trace this becomes a debug callback."""
    return jax.debug.callback(func, *args)


def exception_or_nan(value, cond, error):
    """jit-safe validation: where ``cond`` holds, poison ``value`` with NaN.

    In eager (non-traced) usage with a concrete ``cond``, raise via
    ``error(value)`` instead, mirroring the reference's dual behavior
    (cosmoprimo/jax.py:510-516).
    """
    if isinstance(cond, jax.core.Tracer) or isinstance(value, jax.core.Tracer):
        return jnp.where(cond, jnp.nan, value)
    if np.any(np.asarray(cond)):
        error(value)
    return value
