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


def linear_ode2_magnus(coeffs_fun, y0, t):
    """Solve the LINEAR 2nd-order ODE y'' = s(t) y + f(t) y' on the fixed
    grid ``t`` in O(log n) depth, returning (n, 2) with columns (y, y').

    ``coeffs_fun(t) -> (s, f)`` must accept array arguments.

    TPU-first design: as a first-order linear system Y' = A(t) Y with
    A = [[0, 1], [s, f]], the exact propagator over each grid interval is a
    2x2 matrix; a 4th-order two-point Gauss-Legendre Magnus expansion gives
    Omega_i = h/2 (A1 + A2) + sqrt(3) h^2 / 12 [A2, A1] and
    P_i = expm(Omega_i), all evaluated VECTORIZED over the n-1 intervals.
    The cumulative solution is then a parallel prefix of matrix products
    (jax.lax.associative_scan) — log-depth instead of the n sequential
    steps of rk4-on-scan, which dominated the growth-table latency inside
    the batched pipelines. Same 4th-order accuracy as rk4.
    """
    t = jnp.asarray(t)
    h = jnp.diff(t)                                       # (n-1,)
    mid = (t[:-1] + t[1:]) / 2.0
    off = h * (jnp.sqrt(3.0) / 6.0)
    s1, f1 = coeffs_fun(mid - off)
    s2, f2 = coeffs_fun(mid + off)
    zeros = jnp.zeros_like(s1)
    ones = jnp.ones_like(s1)

    def amat(s, f):
        return jnp.stack([jnp.stack([zeros, ones], -1),
                          jnp.stack([s, f], -1)], -2)     # (n-1, 2, 2)

    A1, A2 = amat(s1, f1), amat(s2, f2)
    comm = A2 @ A1 - A1 @ A2
    Omega = (h[:, None, None] / 2.0) * (A1 + A2) \
        + (jnp.sqrt(3.0) * h[:, None, None] ** 2 / 12.0) * comm

    # closed-form expm of a 2x2 matrix: with B = Omega - (tr/2) I traceless,
    # B^2 = -det(B) I = q^2 I, so expm = e^{tr/2} (c0 I + c1 B) where
    # (c0, c1) = (cosh q, sinh(q)/q) for q^2 > 0 and (cos p, sin(p)/p) for
    # q^2 = -p^2 < 0 — both branches via even power series in q^2 near 0
    tr2 = (Omega[..., 0, 0] + Omega[..., 1, 1]) / 2.0
    eye = jnp.eye(2, dtype=Omega.dtype)
    B = Omega - tr2[..., None, None] * eye
    q2 = B[..., 0, 1] * B[..., 1, 0] + B[..., 0, 0] ** 2  # = -det(B)
    q = jnp.sqrt(jnp.abs(q2))
    qs = jnp.where(q > 1e-8, q, 1.0)
    c0 = jnp.where(q2 >= 0, jnp.cosh(q), jnp.cos(q))
    c1 = jnp.where(q > 1e-8,
                   jnp.where(q2 >= 0, jnp.sinh(qs) / qs, jnp.sin(qs) / qs),
                   1.0 + q2 / 6.0)
    P = jnp.exp(tr2)[..., None, None] * (c0[..., None, None] * eye
                                         + c1[..., None, None] * B)

    # prefix products: cum_i = P_i @ ... @ P_1 (combine(a, b) = b @ a)
    cum = jax.lax.associative_scan(lambda a, b: b @ a, P)
    y0 = jnp.asarray(y0, dtype=P.dtype)
    ys = cum @ y0
    return jnp.concatenate([y0[None, :], ys], axis=0)


def linear_ode2_rk4_prefix(coeffs_fun, y0, t):
    """Fixed-grid rk4 for the LINEAR 2nd-order ODE y'' = s(t) y + f(t) y',
    with the n sequential scan steps replaced by a log-depth parallel
    prefix — numerically the SAME rk4 recurrence (to fp re-association,
    ~1e-13), so results stay bit-compatible with ``odeint(..., 'rk4')``
    and with the reference's growth integration (reference jax.py:672-716,
    cosmology.py:2073-2079) at the 1e-9 parity bar.

    On a linear system Y' = A(t) Y (A = [[0, 1], [s, f]]), one rk4 step is
    itself a linear map R_i = I + h/6 (K1 + 2 K2 + 2 K3 + K4) with
    K1 = A1, K2 = A2 (I + h/2 K1), K3 = A2 (I + h/2 K2),
    K4 = A3 (I + h K3); all R_i are built VECTORIZED over the intervals and
    composed with jax.lax.associative_scan.  Returns (n, 2): (y, y').
    """
    t = jnp.asarray(t)
    h = jnp.diff(t)[:, None, None]                        # (n-1, 1, 1)
    s_end, f_end = coeffs_fun(t)
    s_mid, f_mid = coeffs_fun((t[:-1] + t[1:]) / 2.0)

    def amat(s, f):
        zeros, ones = jnp.zeros_like(s), jnp.ones_like(s)
        return jnp.stack([jnp.stack([zeros, ones], -1),
                          jnp.stack([s, f], -1)], -2)

    A1 = amat(s_end[:-1], f_end[:-1])
    A2 = amat(s_mid, f_mid)
    A3 = amat(s_end[1:], f_end[1:])
    eye = jnp.eye(2, dtype=A1.dtype)
    K1 = A1
    K2 = A2 @ (eye + h / 2.0 * K1)
    K3 = A2 @ (eye + h / 2.0 * K2)
    K4 = A3 @ (eye + h * K3)
    R = eye + h / 6.0 * (K1 + 2.0 * K2 + 2.0 * K3 + K4)

    cum = jax.lax.associative_scan(lambda a, b: b @ a, R)
    y0 = jnp.asarray(y0, dtype=R.dtype)
    return jnp.concatenate([y0[None, :], cum @ y0], axis=0)
