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
