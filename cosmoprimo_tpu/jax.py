"""Drop-in compatibility surface for the reference's ``cosmoprimo.jax``
module (reference jax.py:31-864).

The reference maintains a dual numpy/jax dispatch layer; this package is
JAX-native, so most of that layer dissolves (SURVEY §7 delta 1): the jnp
paths ARE the implementation (ops/), and the ``*_numpy`` variants here are
eager conveniences kept so downstream code written against the reference
(e.g. desilike) imports and runs unchanged.
"""

import numpy as np

import jax as _jax
import jax.numpy as jnp

from .ops.misc import bcast_dtype, exception, exception_or_nan
from .ops.odeint import odeint
from .ops.quadrature import romberg, simpson
from .ops.roots import bisect, bracket, for_cond_loop as for_cond_loop_jax
from .ops.spline import Interpolator1D, Interpolator2D

__all__ = ['jit', 'use_jax', 'numpy_jax', 'exception_numpy', 'exception_jax',
           'Interpolator1D', 'Interpolator2D', 'scan_numpy',
           'for_cond_loop_numpy', 'for_cond_loop_jax', 'switch_numpy', 'switch',
           'select_numpy', 'select', 'cond_numpy', 'cond', 'opmask',
           'simpson', 'romberg', 'odeint', 'bracket', 'bisect',
           'exception_or_nan', 'bcast_dtype']

#: array types that trigger the jnp path in :func:`use_jax`; the tracer type
#: is last so ``tracer_only`` can slice it (reference jax.py:13-24)
array_types = (jnp.ndarray, _jax.core.Tracer)


def jit(*args, **kwargs):
    """``jax.jit`` as a decorator factory: ``@jit``, ``@jit(static_argnums=...)``."""
    def wrap(func):
        return _jax.jit(func, **kwargs)
    if kwargs or not args:
        return wrap
    if len(args) != 1:
        raise ValueError(f'unexpected args: {args}')
    return wrap(args[0])


def use_jax(*arrays, tracer_only=False):
    """Whether any input is a jax array (or, with ``tracer_only``, a tracer)."""
    types = array_types[-1:] if tracer_only else array_types
    return any(isinstance(array, types) for array in arrays)


def numpy_jax(*args, return_use_jax=False):
    """Return ``jax.numpy`` if any arg is a jax array else ``numpy``."""
    uj = use_jax(*args)
    mod = jnp if uj else np
    if return_use_jax:
        return mod, uj
    return mod


def exception_numpy(fun, *args):
    """Eagerly raise through ``fun`` (numpy path of :func:`exception`)."""
    return fun(*args)


def exception_jax(fun, *args):
    """Raise through a debug callback so the check survives jit."""
    return exception(fun, *args)


def scan_numpy(f, init, xs, length=None):
    """Eager ``lax.scan`` semantics on host values."""
    if xs is None:
        xs = [None] * length
    carry = init
    ys = []
    for x in xs:
        carry, y = f(carry, x)
        ys.append(y)
    return carry, np.stack(ys)


def for_cond_loop_numpy(lower, upper, cond_fun, body_fun, init_val):
    """Eager fori-loop with an early-exit condition."""
    val = init_val
    for i in range(lower, upper):
        if not cond_fun(i, val):
            break
        val = body_fun(i, val)
    return val


def switch_numpy(index, branches, *operands):
    return branches[index](*operands)


def switch(index, branches, *operands):
    if use_jax(index):
        return _jax.lax.switch(index, branches, *operands)
    return switch_numpy(index, branches, *operands)


def select_numpy(pred, on_true, on_false):
    return on_true if pred else on_false


def select(pred, on_true, on_false):
    if use_jax(pred):
        return _jax.lax.select(pred, on_true, on_false)
    return select_numpy(pred, on_true, on_false)


def cond_numpy(pred, true_fun, false_fun, *operands):
    return true_fun(*operands) if pred else false_fun(*operands)


def cond(pred, true_fun, false_fun, *operands):
    if use_jax(pred):
        return _jax.lax.cond(pred, true_fun, false_fun, *operands)
    return cond_numpy(pred, true_fun, false_fun, *operands)


def opmask(array, mask, value, op='set'):
    """Masked set/add that works on both numpy (in-place) and jax (.at) arrays."""
    if use_jax(array):
        if op == 'set':
            return array.at[mask].set(value)
        if op == 'add':
            return array.at[mask].add(value)
        raise ValueError(f'unknown op {op!r}')
    if op == 'set':
        array[mask] = value
    elif op == 'add':
        array[mask] += value
    else:
        raise ValueError(f'unknown op {op!r}')
    return array
