"""Differential tests of the numerical substrate against scipy/numpy oracles.

Mirrors the reference's test strategy (SURVEY.md §4): scipy is the truth at
f64 round-off for splines and special functions; quadrature and ODE rules are
checked on analytic integrals; everything must jit/vmap/grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special as sps
from scipy.interpolate import CubicSpline, RectBivariateSpline

from cosmoprimo_tpu.ops import (Interpolator1D, Interpolator2D, bisect, bracket, gauss_legendre,
                                loggamma, natural_cubic_coeffs, cubic_eval, odeint, romberg,
                                simpson, tridiagonal_solve)


def test_loggamma_vs_scipy():
    rng = np.random.default_rng(42)
    z = np.concatenate([
        rng.uniform(-8, 8, 200) + 1j * rng.uniform(-400, 400, 200),
        rng.uniform(-8, 8, 200) + 1j * rng.uniform(-3, 3, 200),
        rng.uniform(0.5, 5, 100) + 1j * rng.uniform(-50, 50, 100),
    ])
    mine = np.asarray(jax.jit(loggamma)(z))
    ref = sps.loggamma(z)
    err = np.abs(mine - ref) / np.maximum(np.abs(ref), 1e-10)
    assert err.max() < 1e-12


def test_tridiagonal_solve():
    rng = np.random.default_rng(0)
    n = 257
    d = rng.uniform(2, 3, n)
    dl = rng.uniform(-1, 1, n)
    du = rng.uniform(-1, 1, n)
    dl[0] = du[-1] = 0.0
    b = rng.normal(size=(n, 4))
    T = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    expected = np.linalg.solve(T, b)
    got = np.asarray(tridiagonal_solve(jnp.array(dl), jnp.array(d), jnp.array(du), jnp.array(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)


def test_cubic_spline_vs_scipy():
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0, 10, 40))
    f = np.sin(x) + 0.1 * rng.normal(size=x.size)
    cs = CubicSpline(x, f, bc_type='natural')
    t = np.linspace(0, 10, 333)
    M = natural_cubic_coeffs(jnp.array(x), jnp.array(f))
    got = np.asarray(cubic_eval(jnp.array(x), jnp.array(f), M, jnp.array(t)))
    np.testing.assert_allclose(got, cs(t), rtol=1e-10, atol=1e-12)
    # derivatives
    got1 = np.asarray(cubic_eval(jnp.array(x), jnp.array(f), M, jnp.array(t), nu=1))
    np.testing.assert_allclose(got1, cs(t, nu=1), rtol=1e-9, atol=1e-10)
    # extrapolation with edge cubic matches scipy extrapolate=True
    te = np.array([-1.0, 11.0])
    gote = np.asarray(cubic_eval(jnp.array(x), jnp.array(f), M, jnp.array(te)))
    np.testing.assert_allclose(gote, cs(te), rtol=1e-9)


def test_interpolator1d():
    x = np.geomspace(1e-3, 1e2, 64)
    f = x**-1.5 * (1 + 0.1 * np.sin(np.log(x)))
    interp = Interpolator1D(x, f, interp_x='log', interp_fun='log')
    t = np.geomspace(2e-3, 50, 100)
    cs = CubicSpline(np.log10(x), np.log10(f), bc_type='natural')
    expected = 10 ** cs(np.log10(t))
    np.testing.assert_allclose(np.asarray(interp(t)), expected, rtol=1e-12)
    # NaN outside bounds
    out = np.asarray(interp(np.array([1e-4, 1e3])))
    assert np.isnan(out).all()
    # float32 in, float32 out
    assert interp(np.array([0.1], dtype='f4')).dtype == np.float32
    # scalar in, scalar out
    assert interp(0.1).shape == ()
    # jit + vmap + grad
    g = jax.grad(lambda xx: interp(xx).sum())(jnp.array([0.1, 1.0]))
    assert np.isfinite(np.asarray(g)).all()
    val = jax.jit(lambda xx: interp(xx))(jnp.array([0.1]))
    np.testing.assert_allclose(np.asarray(val), np.asarray(interp(np.array([0.1]))))


def test_interpolator1d_multi():
    x = np.linspace(0, 1, 32)
    f = np.stack([np.sin(3 * x), np.cos(2 * x)], axis=-1)
    interp = Interpolator1D(x, f)
    t = np.linspace(0, 1, 77)
    got = np.asarray(interp(t))
    assert got.shape == (77, 2)
    for i in range(2):
        cs = CubicSpline(x, f[:, i], bc_type='natural')
        np.testing.assert_allclose(got[:, i], cs(t), rtol=1e-10, atol=1e-13)


def test_interpolator2d():
    x = np.linspace(0, 3, 30)
    y = np.linspace(-1, 1, 20)
    f = np.sin(x)[:, None] * np.exp(y)[None, :]
    interp = Interpolator2D(x, y, f)
    qx = np.linspace(0.1, 2.9, 13)
    qy = np.linspace(-0.9, 0.9, 11)
    got = np.asarray(interp(qx, qy, grid=True))
    expected = np.sin(qx)[:, None] * np.exp(qy)[None, :]
    np.testing.assert_allclose(got, expected, rtol=2e-4)
    rbs = RectBivariateSpline(x, y, f)
    np.testing.assert_allclose(got, rbs(qx, qy), rtol=5e-4)
    # non-grid
    got_pair = np.asarray(interp(qx[:11], qy, grid=False))
    np.testing.assert_allclose(got_pair, np.sin(qx[:11]) * np.exp(qy), rtol=2e-4)
    # pairs agree exactly with the grid diagonal
    diag = np.asarray(interp(qx[:11], qy, grid=True))[np.arange(11), np.arange(11)]
    np.testing.assert_allclose(got_pair, diag, rtol=1e-12)


def test_interpolator2d_paired_is_linear_cost():
    """grid=False evaluates pairs directly: no O(n^2) intermediate. Contract:
    the compiled paired evaluation of n = 1e4 points allocates temporaries
    linear in n (a full-grid implementation would need >= n^2 * 8 bytes =
    800 MB here)."""
    x = np.linspace(0, 3, 64)
    y = np.linspace(-1, 1, 64)
    f = np.sin(x)[:, None] * np.exp(y)[None, :]
    interp = Interpolator2D(x, y, f)
    n = 10_000
    qx = jnp.linspace(0.1, 2.9, n)
    qy = jnp.linspace(-0.9, 0.9, n)
    fn = jax.jit(lambda a, b: interp(a, b, grid=False))
    out = np.asarray(fn(qx, qy))
    np.testing.assert_allclose(out, np.sin(np.asarray(qx)) * np.exp(np.asarray(qy)), rtol=1e-4)
    try:
        mem = fn.lower(qx, qy).compile().memory_analysis()
        temp = int(mem.temp_size_in_bytes)
    except Exception:  # backend without memory analysis
        return
    assert temp < 100 * n * 8, f'paired eval allocates {temp} bytes (O(n^2)?)'


def test_simpson():
    x = np.linspace(0, np.pi, 101)
    y = np.sin(x)
    assert abs(float(simpson(jnp.array(y), x=jnp.array(x))) - 2.0) < 2e-8
    # even number of samples, 'avg'
    x = np.linspace(0, np.pi, 100)
    from scipy.integrate import simpson as ssimpson
    got = float(simpson(jnp.array(np.sin(x)), x=jnp.array(x)))
    # scipy >= 1.11 changed default handling; compare against analytic
    assert abs(got - 2.0) < 1e-5
    # non-uniform grid
    x = np.pi * np.linspace(0, 1, 101) ** 1.5
    got = float(simpson(jnp.array(np.sin(x)), x=jnp.array(x)))
    assert abs(got - 2.0) < 1e-6


def test_romberg():
    gauss = lambda x: 1 / np.sqrt(np.pi) * jnp.exp(-x**2)
    result = float(romberg(gauss, 0.0, 1.0, divmax=10))
    assert abs(result - sps.erf(1.0) / 2) < 1e-10
    # jit
    result_jit = float(jax.jit(lambda a, b: romberg(gauss, a, b, divmax=10))(0.0, 1.0))
    assert abs(result_jit - result) < 1e-14


def test_gauss_legendre():
    val = float(gauss_legendre(lambda x: jnp.sin(x), 0.0, jnp.pi, n=64))
    assert abs(val - 2.0) < 1e-13


def test_odeint():
    # dy/dt = -y, y(0) = 1
    t = np.linspace(0, 3, 301)
    y = np.asarray(odeint(lambda y, tt: -y, 1.0, jnp.array(t)))
    np.testing.assert_allclose(y, np.exp(-t), rtol=1e-8)
    # vector-valued: harmonic oscillator
    def f(y, tt):
        return jnp.array([y[1], -y[0]])
    y = np.asarray(odeint(f, jnp.array([1.0, 0.0]), jnp.array(t)))
    np.testing.assert_allclose(y[:, 0], np.cos(t), atol=1e-7)


def test_bisect_bracket():
    f = lambda x: x**2 - 5
    limits = bracket(f, init=(1.0, 0.5))
    root = float(bisect(f, limits=tuple(np.asarray(limits))))
    assert abs(abs(root) - np.sqrt(5)) < 1e-5
    f = lambda x: x**2 - 4
    # traced path (limits chosen so no iterate hits the root exactly)
    root_jit = float(jax.jit(lambda: bisect(f, limits=(1.0, 3.5)))())
    assert abs(root_jit - 2.0) < 1e-5
    # no sign change -> nan under trace (traced limits)
    bad = jax.jit(lambda a, b: bisect(lambda x: x**2 + 1, limits=(a, b)))(1.0, 3.0)
    assert np.isnan(float(bad))


def test_spline_grad_wrt_values():
    # spline must be differentiable w.r.t. knot values (needed for jacfwd
    # through pk interpolators)
    x = jnp.linspace(0.0, 1.0, 16)

    def loss(f):
        M = natural_cubic_coeffs(x, f)
        return jnp.sum(cubic_eval(x, f, M, jnp.linspace(0.1, 0.9, 7)) ** 2)

    g = jax.grad(loss)(jnp.sin(3 * x))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_bisect_endpoint_roots():
    """A bracket whose endpoint IS the root converges to it (review
    finding: f(a) == 0 used to be rejected as a sign error)."""
    from cosmoprimo_tpu.ops import bisect
    assert abs(float(bisect(lambda v: v - 1.0, limits=(1.0, 2.0))) - 1.0) < 1e-6
    assert abs(float(bisect(lambda v: v - 2.0, limits=(1.0, 2.0))) - 2.0) < 1e-6
    assert abs(float(bisect(lambda v: 1.0 - v, limits=(1.0, 2.0))) - 1.0) < 1e-6
    with pytest.raises(ValueError):
        bisect(lambda v: v + 5.0, limits=(1.0, 2.0))


def test_linear_ode2_propagators_vs_rk4_scan():
    """The log-depth parallel-prefix propagators (component-form 2x2
    algebra) reproduce the sequential rk4-on-scan integration of the same
    linear 2nd-order ODE: rk4_prefix is the SAME recurrence re-associated
    (agreement to fp round-off), the 4th-order Magnus agrees to the
    discretization order; both vmap cleanly."""
    import jax
    from cosmoprimo_tpu.ops.odeint import (linear_ode2_magnus,
                                           linear_ode2_rk4_prefix, odeint)

    def coeffs(x):
        return 1.5 * jnp.exp(-x) - 1.0, -2.0 + 0.1 * jnp.sin(x)

    t = jnp.linspace(0.0, 3.0, 129)
    y0 = jnp.array([1.0, 0.3])

    def rhs(y, x):
        s, f = coeffs(x)
        return jnp.stack([y[1], s * y[0] + f * y[1]])

    ref = odeint(rhs, y0, t, method='rk4')
    got_rk4 = linear_ode2_rk4_prefix(coeffs, y0, t)
    np.testing.assert_allclose(np.asarray(got_rk4), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
    got_mag = linear_ode2_magnus(coeffs, y0, t)
    np.testing.assert_allclose(np.asarray(got_mag), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    # convergence: Magnus at 2x resolution is closer to dense rk4 truth
    dense = odeint(rhs, y0, jnp.linspace(0.0, 3.0, 4097), method='rk4')[-1]
    err1 = abs(float(got_mag[-1, 0]) - float(dense[0]))
    err2 = abs(float(linear_ode2_magnus(coeffs, y0, jnp.linspace(0.0, 3.0, 257))[-1, 0])
               - float(dense[0]))
    assert err2 < err1 / 8.0  # ~4th order: 2x steps -> ~16x error drop

    # vmap over a parameter batch (the pipelines' usage pattern)
    def solve(a):
        return linear_ode2_magnus(lambda x: (a * jnp.exp(-x) - 1.0, -2.0 + 0 * x),
                                  y0, t)[-1, 0]
    out = jax.vmap(solve)(jnp.array([1.2, 1.5, 1.8]))
    assert out.shape == (3,) and bool(jnp.all(jnp.isfinite(out)))
