"""The cosmoprimo_tpu.jax compatibility surface mirrors the reference's
cosmoprimo.jax public names (reference jax.py:31-864) so downstream code
(e.g. desilike) imports unchanged."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosmoprimo_tpu import jax as cjax


def test_public_names():
    for name in ['jit', 'use_jax', 'numpy_jax', 'exception_numpy', 'exception_jax',
                 'Interpolator1D', 'Interpolator2D', 'scan_numpy',
                 'for_cond_loop_numpy', 'for_cond_loop_jax', 'switch_numpy', 'switch',
                 'select_numpy', 'select', 'cond_numpy', 'cond', 'opmask',
                 'simpson', 'romberg', 'odeint', 'bracket', 'bisect', 'exception_or_nan']:
        assert hasattr(cjax, name), name


def test_jit_decorator_forms():
    @cjax.jit
    def f(x):
        return x * 2

    @cjax.jit(static_argnums=(1,))
    def g(x, n):
        return x ** n

    assert float(f(jnp.float64(3.0))) == 6.0
    assert float(g(jnp.float64(2.0), 3)) == 8.0


def test_use_jax_and_numpy_jax():
    assert not cjax.use_jax(np.ones(3))
    assert cjax.use_jax(jnp.ones(3))
    assert cjax.numpy_jax(np.ones(3)) is np
    assert cjax.numpy_jax(jnp.ones(3)) is jnp
    mod, uj = cjax.numpy_jax(jnp.ones(3), return_use_jax=True)
    assert mod is jnp and uj
    # tracer detection
    seen = []
    def probe(x):
        seen.append(cjax.use_jax(x, tracer_only=True))
        return x
    jax.jit(probe)(jnp.ones(3))
    assert seen == [True]
    assert not cjax.use_jax(jnp.ones(3), tracer_only=True)


def test_control_flow_shims():
    carry, ys = cjax.scan_numpy(lambda c, x: (c + x, c), 0.0, np.arange(4.0))
    assert carry == 6.0 and np.allclose(ys, [0, 0, 1, 3])
    val = cjax.for_cond_loop_numpy(0, 10, lambda i, v: v < 5, lambda i, v: v + 2, 0)
    assert val == 6
    val = cjax.for_cond_loop_jax(0, 10, lambda i, v: v < 5, lambda i, v: v + 2, jnp.float64(0.0))
    assert float(val) == 6
    assert cjax.switch_numpy(1, [lambda: 'a', lambda: 'b']) == 'b'
    assert float(cjax.switch(jnp.int32(0), [lambda x: x + 1, lambda x: x - 1], jnp.float64(1.0))) == 2.0
    assert cjax.select_numpy(True, 1, 2) == 1
    assert float(cjax.select(jnp.asarray(True), jnp.float64(1.0), jnp.float64(2.0))) == 1.0
    assert cjax.cond_numpy(False, lambda: 1, lambda: 2) == 2
    assert float(cjax.cond(jnp.asarray(True), lambda x: x, lambda x: -x, jnp.float64(5.0))) == 5.0


def test_opmask():
    a = np.zeros(4)
    out = cjax.opmask(a, np.array([True, False, True, False]), 1.0)
    assert out is a and np.allclose(a, [1, 0, 1, 0])
    ja = jnp.zeros(4)
    out = cjax.opmask(ja, jnp.array([True, False, True, False]), 1.0)
    assert np.allclose(np.asarray(out), [1, 0, 1, 0])
    out = cjax.opmask(out, jnp.array([True, False, False, False]), 1.0, op='add')
    assert np.allclose(np.asarray(out), [2, 0, 1, 0])
    with pytest.raises(ValueError):
        cjax.opmask(ja, jnp.array([True] * 4), 1.0, op='mul')


def test_numerics_reexports():
    x = np.linspace(0, np.pi, 101)
    assert abs(float(cjax.simpson(jnp.sin(jnp.asarray(x)), x=x)) - 2.0) < 1e-6
    val = cjax.romberg(lambda t: jnp.exp(-t * t), 0.0, 1.0)
    assert abs(float(val) - 0.7468241328) < 1e-8
    roots = cjax.bracket(lambda t: t * t - 2.0, (1.0, 0.5))
    root = cjax.bisect(lambda t: t * t - 2.0, tuple(np.asarray(roots)), xtol=1e-12)
    assert abs(abs(float(root)) - np.sqrt(2)) < 1e-10  # bracket expands downward: -sqrt(2)
    # bracket accepts the reference's maxtries kwarg
    cjax.bracket(lambda t: t * t - 2.0, (1.0, 0.5), maxtries=3)


def test_interpolator_reexport():
    x = np.linspace(0.1, 10.0, 64)
    interp = cjax.Interpolator1D(x, np.log(x), interp_x='log')
    assert abs(float(interp(np.e)) - 1.0) < 1e-6
