"""Special functions evaluated natively in JAX (on device, traceable).

The reference implementation routes complex ``loggamma``/``gamma`` through
``jax.pure_callback`` to scipy (cosmoprimo/fftlog.py:16-27), a host round-trip
per call. Here we evaluate the Lanczos approximation directly in ``jnp`` so
FFTLog Mellin coefficients are computed on device and remain traceable /
differentiable.
"""

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


def _loggamma_right(z):
    """Lanczos log-gamma, valid for Re(z) > 0.5 (z complex)."""
    zm1 = z - 1.0
    series = jnp.full(jnp.shape(z), _LANCZOS_COEFFS[0], dtype=z.dtype)
    for i in range(1, len(_LANCZOS_COEFFS)):
        series = series + _LANCZOS_COEFFS[i] / (zm1 + i)
    t = zm1 + _LANCZOS_G + 0.5
    return _LOG_SQRT_2PI + (zm1 + 0.5) * jnp.log(t) - t + jnp.log(series)


def loggamma(z):
    r"""Principal branch of :math:`\log \Gamma(z)` for complex ``z``.

    Uses the Lanczos approximation for :math:`\mathrm{Re}(z) > 0.5` and the
    reflection formula otherwise. Matches ``scipy.special.loggamma`` to
    ~1e-13 relative accuracy away from the negative-real-axis poles.
    """
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        z = z.astype(jnp.complex128)
    reflect = jnp.real(z) < 0.5
    # Evaluate both branches on safe arguments, select afterwards.
    z_safe_right = jnp.where(reflect, 1.0 - z, z)   # Re >= 0.5 always
    lg_right = _loggamma_right(z_safe_right)

    # Reflection: loggamma(z) = log(pi) - log(sin(pi z)) - loggamma(1 - z)
    # with log(sin(pi z)) unwound to stay on the principal branch:
    # for Im(z) large, sin(pi z) overflows; use log-sin expansion.
    zr = jnp.where(reflect, z, 0.25 + 0.0j)  # safe dummy where unused
    logsin = _logsinpi(zr)
    lg_reflect = jnp.log(jnp.pi) - logsin - lg_right
    return jnp.where(reflect, lg_reflect, lg_right)


def _logsinpi(z):
    """log(sin(pi z)) continued so that loggamma reflection matches scipy's
    principal-branch convention (continuous off the real axis)."""
    # Compute via complex log of sin for moderate |Im(z)| and switch to the
    # asymptotic form for large |Im(z)| to avoid overflow of sin(pi z).
    x = jnp.real(z)
    y = jnp.imag(z)
    # Reduce x to [0, 1): sin(pi z) = (-1)^n sin(pi (z - n)) with n = floor(x)
    n = jnp.floor(x)
    zr = z - n
    small = jnp.abs(y) < 20.0
    # direct evaluation (safe for |y| < ~700 in f64, we switch far earlier);
    # for xr in (0, 1) the principal log of sin(pi zr) is continuous.
    direct = jnp.log(jnp.sin(jnp.pi * jnp.where(small, zr, 0.5 + 0.0j)))
    # large |Im|: for y > 0, sin(pi zr) ~ (i/2) exp(-i pi zr); conjugate for y < 0
    sgn = jnp.where(y >= 0, 1.0, -1.0)
    asym = -1j * jnp.pi * zr * sgn - jnp.log(2.0 + 0j) + 1j * sgn * (jnp.pi / 2)
    logsin_r = jnp.where(small, direct, asym)
    # (-1)^n factor, unwound so the continuation is continuous in x off the
    # real axis (matches scipy's loggamma branch; conjugate-symmetric in y).
    branch = -1j * jnp.pi * n * sgn
    return logsin_r + branch


def gamma(z):
    r""":math:`\Gamma(z)` for complex or real ``z`` via :func:`loggamma`."""
    z = jnp.asarray(z)
    if jnp.iscomplexobj(z):
        return jnp.exp(loggamma(z))
    # Real path: handle negative reals by reflection with real arithmetic.
    return jnp.real(jnp.exp(loggamma(z.astype(jnp.complex128))))
