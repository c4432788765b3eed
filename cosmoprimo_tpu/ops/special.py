"""Special functions evaluated natively in JAX or numpy (no scipy).

The reference implementation routes complex ``loggamma``/``gamma`` through
``jax.pure_callback`` to scipy (cosmoprimo/fftlog.py:16-27), a host
round-trip per call. Here the Lanczos approximation is evaluated directly —
in ``jnp`` when tracing (so FFTLog Mellin coefficients stay differentiable
on CPU backends), or in ``numpy`` complex128 on the host for static setup
(TPU has no complex128 type, so FFTLog precomputes coefficients host-side
and ships them as float64 pairs).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['loggamma', 'gamma']

# Lanczos coefficients, g = 607/128, n = 15 (Boost / Godfrey). Relative error
# below ~1e-15 over the right half-plane.
_LANCZOS_G = 607.0 / 128.0
_LANCZOS_COEFFS = np.array([
    0.99999999999999709182,
    57.156235665862923517,
    -59.597960355475491248,
    14.136097974741747174,
    -0.49191381609762019978,
    0.33994649984811888699e-4,
    0.46523628927048575665e-4,
    -0.98374475304879564677e-4,
    0.15808870322491248884e-3,
    -0.21026444172410488319e-3,
    0.21743961811521264320e-3,
    -0.16431810653676389022e-3,
    0.84418223983852743293e-4,
    -0.26190838401581408670e-4,
    0.36899182659531622704e-5,
])

_LOG_SQRT_2PI = 0.5 * np.log(2.0 * np.pi)


def _loggamma_right(xp, z):
    """Lanczos log-gamma, valid for Re(z) > 0.5 (z complex)."""
    zm1 = z - 1.0
    series = xp.full(np.shape(z), _LANCZOS_COEFFS[0], dtype=z.dtype)
    for i in range(1, len(_LANCZOS_COEFFS)):
        series = series + _LANCZOS_COEFFS[i] / (zm1 + i)
    t = zm1 + _LANCZOS_G + 0.5
    return _LOG_SQRT_2PI + (zm1 + 0.5) * xp.log(t) - t + xp.log(series)


def _logsinpi(xp, z):
    """log(sin(pi z)) continued so that the loggamma reflection matches
    scipy's principal-branch convention (continuous off the real axis)."""
    # Compute via complex log of sin for moderate |Im(z)| and switch to the
    # asymptotic form for large |Im(z)| to avoid overflow of sin(pi z).
    x = xp.real(z)
    y = xp.imag(z)
    # Reduce x to [0, 1): sin(pi z) = (-1)^n sin(pi (z - n)) with n = floor(x)
    n = xp.floor(x)
    zr = z - n
    small = xp.abs(y) < 20.0
    # direct evaluation (safe for |y| < ~700 in f64, we switch far earlier);
    # for xr in (0, 1) the principal log of sin(pi zr) is continuous.
    direct = xp.log(xp.sin(xp.pi * xp.where(small, zr, 0.5 + 0.0j)))
    # large |Im|: for y > 0, sin(pi zr) ~ (i/2) exp(-i pi zr); conjugate for y < 0
    sgn = xp.where(y >= 0, 1.0, -1.0)
    asym = -1j * xp.pi * zr * sgn - xp.log(2.0 + 0j) + 1j * sgn * (xp.pi / 2)
    logsin_r = xp.where(small, direct, asym)
    # (-1)^n factor, unwound so the continuation is continuous in x off the
    # real axis (matches scipy's loggamma branch; conjugate-symmetric in y).
    branch = -1j * xp.pi * n * sgn
    return logsin_r + branch


def _loggamma_impl(xp, z):
    reflect = xp.real(z) < 0.5
    z_safe_right = xp.where(reflect, 1.0 - z, z)   # Re >= 0.5 always
    lg_right = _loggamma_right(xp, z_safe_right)
    zr = xp.where(reflect, z, 0.25 + 0.0j)  # safe dummy where unused
    lg_reflect = xp.log(xp.pi) - _logsinpi(xp, zr) - lg_right
    return xp.where(reflect, lg_reflect, lg_right)


def _pick_backend(z):
    """numpy for concrete host arrays/scalars, jnp for traced values."""
    if isinstance(z, jax.core.Tracer) or isinstance(z, jnp.ndarray):
        return jnp
    return np


def loggamma(z):
    r"""Principal branch of :math:`\log \Gamma(z)` for complex ``z``;
    matches ``scipy.special.loggamma`` to ~1e-13 away from the poles."""
    xp = _pick_backend(z)
    z = xp.asarray(z)
    if not np.issubdtype(z.dtype, np.complexfloating):
        z = z.astype(np.complex128 if xp is np else jnp.complex128)
    return _loggamma_impl(xp, z)


def gamma(z):
    r""":math:`\Gamma(z)` for complex or real ``z`` via :func:`loggamma`."""
    xp = _pick_backend(z)
    z = xp.asarray(z)
    if np.issubdtype(z.dtype, np.complexfloating):
        return xp.exp(loggamma(z))
    return xp.real(xp.exp(_loggamma_impl(xp, z.astype(np.complex128))))


# ----------------------------------------------------------------------------
# Sine / cosine integrals (for the NFW Fourier profile in models/hmcode.py)
# ----------------------------------------------------------------------------

_EULER_GAMMA = 0.5772156649015328606


def _sici_series(x, nterms=20):
    """Power series for Si and Ci - (gamma + ln x), accurate for x <= 4:
    Si(x) = sum (-1)^k x^(2k+1) / ((2k+1)(2k+1)!),
    Cin(x) = sum (-1)^(k+1) x^(2k) / (2k (2k)!) with Ci = gamma + ln x + Cin.
    """
    x2 = x * x
    si = jnp.zeros_like(x)
    cin = jnp.zeros_like(x)
    # term_k for Si: (-1)^k x^(2k+1) / ((2k+1)(2k+1)!) built by recurrence
    term = x  # k = 0: x / (1 * 1!)
    si = term
    cterm = jnp.ones_like(x)  # running (-1)^k x^(2k) / (2k)! (k = 0 -> 1)
    for k in range(1, nterms):
        # Si: t_k = t_{k-1} * (-x^2) * (2k-1) / ((2k)(2k+1)^2) ... derive:
        # a_k = (-1)^k x^(2k+1)/((2k+1)(2k+1)!) ; a_k/a_{k-1} =
        #   -x^2 (2k-1) / ((2k+1)^2 (2k))
        term = term * (-x2) * (2 * k - 1) / ((2 * k + 1) ** 2 * (2 * k))
        si = si + term
        # Ci: c_k = (-1)^k x^(2k)/(2k)! ; contribution c_k/(2k)
        cterm = cterm * (-x2) / ((2 * k - 1) * (2 * k))
        cin = cin + cterm / (2 * k)
    return si, cin


def _sici_cf(x, niter=32):
    """Large-x branch via the continued fraction for E1(i x)
    (Lentz algorithm, fixed depth): Ci = -Re E1(ix), Si = pi/2 + Im E1(ix).
    Accurate to ~3e-14 for x >= 4 at the default depth. Written in explicit (re, im) pairs —
    TPUs have no complex128, and all arithmetic here is f64."""

    def cdiv(ar, ai, br, bi):
        den = br * br + bi * bi
        return (ar * br + ai * bi) / den, (ai * br - ar * bi) / den

    # modified Lentz for E1(z) = e^{-z}/(z + 1/(1 + 1/(z + 2/(1 + 2/(z + ...)))))
    # even steps: b = z + (2j+1), a = -j^2 pattern folded into the standard
    # b_i = z + 2i form used below (Numerical Recipes expint)
    br, bi = jnp.ones_like(x), x  # b = z + 1
    cr, ci_ = jnp.full_like(x, 1e30), jnp.zeros_like(x)
    dr, di = cdiv(jnp.ones_like(x), jnp.zeros_like(x), br, bi)
    fr, fi = dr, di
    for i in range(1, niter):
        a = -1.0 * i * i
        br = br + 2.0
        dr, di = cdiv(jnp.ones_like(x), jnp.zeros_like(x), a * dr + br, a * di + bi)
        # c = b + a / c
        qr, qi = cdiv(jnp.full_like(x, a), jnp.zeros_like(x), cr, ci_)
        cr, ci_ = br + qr, bi + qi
        # f *= c * d
        tr = cr * dr - ci_ * di
        ti = cr * di + ci_ * dr
        fr, fi = fr * tr - fi * ti, fr * ti + fi * tr
    # e1 = exp(-i x) * f
    cx, sx = jnp.cos(x), jnp.sin(x)
    e1r = cx * fr + sx * fi
    e1i = -sx * fr + cx * fi
    return jnp.pi / 2 + e1i, -e1r


def sici(x):
    r"""Sine and cosine integrals Si(x), Ci(x) for real x > 0, fully traced
    (series for x <= 4, continued fraction of E1(ix) above); matches
    ``scipy.special.sici`` to ~1e-13. Vectorized and differentiable."""
    x = jnp.asarray(x, dtype=jnp.float64)
    small = x <= 4.0
    xs = jnp.where(small, x, 1.0)          # keep the series argument bounded
    xl = jnp.where(small, 8.0, x)          # keep the CF argument large
    si_s, cin_s = _sici_series(xs)
    ci_s = _EULER_GAMMA + jnp.log(jnp.where(xs > 0, xs, 1.0)) + cin_s
    si_l, ci_l = _sici_cf(xl)
    return jnp.where(small, si_s, si_l), jnp.where(small, ci_s, ci_l)
