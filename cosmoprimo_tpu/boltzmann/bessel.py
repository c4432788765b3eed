"""Spherical Bessel function tables for the CMB line-of-sight projection.

j_l(x) and j_l'(x) are cosmology-INDEPENDENT: they depend only on the
multipole list and the argument range x = k (tau0 - tau) <= k_max tau0.
They are therefore precomputed once on the host (scipy's AMOS Bessel via
jv(l+1/2, x), ~10x faster than scipy.special.spherical_jn's order
recurrence and identical to 4e-16), cached on disk next to the XLA compile
cache, and shipped to the device as two (n_ell, n_x) tables on a uniform
x-grid. On device, values are reconstructed by cubic HERMITE interpolation
(j from (j, j') nodes; j' from (j', j'') with j'' closed-form from the
spherical Bessel ODE), giving ~6e-7 relative accuracy at dx = 0.125 -
comfortably below the solver's fidelity.

The reference has no counterpart: it imports integrated Cls from CLASS/CAMB
(cosmoprimo/classy.py Harmonic), whose Fortran/C cores hold equivalent
hyperspherical Bessel tables internally.
"""

import hashlib
import os

import numpy as np


_CACHE_DIR = os.environ.get(
    'COSMOPRIMO_BESSEL_CACHE',
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), '.jax_cache'))

DX = 0.125  # uniform x-grid spacing (cubic-Hermite rel. error ~ dx^4/384)


def default_ells(lmax, dense_until=48, step_frac=0.085, step_max=72):
    """Multipole sample: every integer l <= ``dense_until`` (resolves the
    reionization bump and the low-l ISW slope), then geometric ~8.5% steps
    CAPPED at ``step_max`` (the acoustic oscillation keeps a fixed period
    ~300 in l, so an uncapped geometric grid undersamples it beyond
    l ~ step_max/step_frac and the D_l-vs-ln-l cubic spline rings at the
    few-percent level; 72 keeps >4 samples per period everywhere)."""
    ells = list(range(2, min(dense_until, lmax) + 1))
    ell = float(dense_until)
    while ell < lmax:
        ell = ell + min(max(4.0, ell * step_frac), float(step_max))
        ells.append(int(min(round(ell), lmax)))
    return np.unique(np.asarray(ells, dtype=np.int32))


def bessel_tables(ells, x_max, dx=DX):
    """(x_grid, j, jp) tables: ``j``/``jp`` of shape (n_ell, n_x), float64,
    on ``x_grid = arange(0, x_max + 4 dx, dx)``. Host numpy; disk-cached."""
    from scipy.special import jv

    ells = np.asarray(ells, dtype=np.int64)
    n_x = int(np.floor((x_max + 4 * dx) / dx)) + 1
    key = hashlib.sha1(repr((ells.tolist(), n_x, float(dx))).encode()).hexdigest()[:16]
    path = os.path.join(_CACHE_DIR, f'bessel_{key}.npz')
    if os.path.exists(path):
        with np.load(path) as f:
            return f['x'], f['j'], f['jp']

    x = np.arange(n_x, dtype=np.float64) * dx
    z = x[1:]
    pref = np.sqrt(np.pi / (2.0 * z))
    j = np.zeros((len(ells), n_x))
    jp = np.zeros((len(ells), n_x))
    for i, ell in enumerate(ells):
        with np.errstate(under='ignore'):
            jl = pref * jv(ell + 0.5, z)
            jlm1 = pref * jv(ell - 0.5, z)
        j[i, 1:] = jl
        # j_l'(x) = j_{l-1}(x) - (l+1)/x j_l(x)
        jp[i, 1:] = jlm1 - (ell + 1.0) / z * jl
        if ell == 1:
            jp[i, 0] = 1.0 / 3.0
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = path[:-4] + f'.tmp{os.getpid()}.npz'
    np.savez(tmp, x=x, j=j, jp=jp)
    os.replace(tmp, path)
    return x, j, jp
