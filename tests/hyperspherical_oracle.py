"""Exact hyperspherical Bessel functions Phi_l^nu(chi) — host oracle.

Independent of every repo JAX module: plain numpy, fixed-step RK4 on the
exact radial equation in curvature units (chi = sqrt|K| * comoving chi),

  open   (K<0): u'' + [nu^2 - l(l+1)/sinh^2 chi] u = 0,  Phi = u/(nu A sinh chi)
  closed (K>0): u'' + [nu^2 - l(l+1)/sin^2  chi] u = 0,  Phi = u/(nu A sin  chi)

normalized by the WKB adiabatic invariant A^2 = (u^2 p + u'^2/p)/nu
measured where the centrifugal potential is smallest, which reproduces the
standard normalization Phi_0^nu = sin(nu chi)/(nu sinh chi) [Abbott &
Schaefer 1986; Kosowsky astro-ph/9805173].  The forward integration starts
inside the centrifugal barrier with the regular-solution log-derivative
(l+1) cot(chi); any irregular-solution admixture decays by the e^-14 WKB
suppression built into the start-point choice.

Used by tests/test_curved_harmonic.py to certify the geodesic projection
j_l(q S_K(chi)) served by cosmoprimo_tpu/boltzmann/harmonic.py for
|Omega_k| <= 0.12.  Oracle accuracy is itself asserted there against the
l = 0, 1 closed forms and the flat limit (scipy spherical_jn).
"""

import numpy as np


def phi_exact_batch(ell, nus, chi_eval, closed=False, steps_per_period=48):
    """Exact normalized Phi_l^nu(chi_eval) for an array of nu.

    Parameters
    ----------
    ell : int
    nus : (n_nu,) array of radial eigenvalues (curvature units)
    chi_eval : (n_chi,) sorted array of evaluation points (curvature units)
    closed : bool — closed (sin) vs open (sinh) geometry
    Returns (n_nu, n_chi) array.
    """
    nus = np.asarray(nus, dtype=float)
    chi_eval = np.atleast_1d(np.asarray(chi_eval, dtype=float))
    lam = ell * (ell + 1.0)
    fn = np.sin if closed else np.sinh
    cot = (lambda x: np.cos(x) / np.sin(x)) if closed else (lambda x: np.cosh(x) / np.sinh(x))

    # turning points
    arg = np.sqrt(lam) / nus
    if closed:
        if np.any(arg >= 1.0):
            raise ValueError('closed modes require nu > sqrt(l(l+1))')
        chi_t = np.arcsin(arg)
    else:
        chi_t = np.arcsinh(arg)

    # per-nu start point: WKB barrier suppression >= e^-14
    chi0 = np.empty_like(nus)
    for i, (nu, ct) in enumerate(zip(nus, chi_t)):
        c = ct
        acc = 0.0
        d = max(ct / 400.0, 1e-6)
        while acc < 14.0 and c > 8 * d:
            c -= d
            acc += d * np.sqrt(max(lam / fn(c) ** 2 - nu ** 2, 0.0))
        chi0[i] = c
    # no (or shallow) barrier — e.g. l = 0: start at a small positive chi
    # where the regular-solution log-derivative (l+1) cot(chi) is exact to
    # O((nu chi)^2 / (2l+3))
    chi0 = np.maximum(chi0, 1e-3 / np.maximum(nus, 1.0))

    if closed:
        chi_norm = np.pi / 2.0            # potential minimum: p' = 0 there
        chi_end = min(max(chi_eval[-1] + 1e-9, chi_norm + 1e-9), np.pi - 1e-4)
    else:
        chi_norm = float(np.max(chi_t)) + 4.0
        chi_end = max(chi_eval[-1] + 1e-9, chi_norm)

    # fixed-step RK4, all nus at once; grid hits chi_eval and chi_norm exactly
    h_target = 2.0 * np.pi / (steps_per_period * float(np.max(nus)))
    knots = np.unique(np.concatenate([[float(np.min(chi0))], chi_eval,
                                      [chi_norm, chi_end]]))
    knots = knots[knots >= float(np.min(chi0)) - 1e-12]
    segs = []
    for a, b in zip(knots[:-1], knots[1:]):
        n = max(1, int(np.ceil((b - a) / h_target)))
        segs.append(np.linspace(a, b, n + 1)[:-1])
    grid = np.concatenate(segs + [knots[-1:]])

    u = np.ones_like(nus)
    up = (ell + 1.0) * cot(np.maximum(grid[0], chi0))
    out = np.empty((len(nus), len(chi_eval)))
    i_eval = 0
    norm_state = None

    def V(chi):
        return lam / fn(chi) ** 2 - nus ** 2

    for j in range(len(grid)):
        chi = grid[j]
        active = chi >= chi0
        if i_eval < len(chi_eval) and abs(chi - chi_eval[i_eval]) < 1e-12:
            out[:, i_eval] = np.where(active, u, 0.0)
            i_eval += 1
        if abs(chi - chi_norm) < 1e-12:
            norm_state = (u.copy(), up.copy())
        if j == len(grid) - 1:
            break
        h = grid[j + 1] - chi
        # RK4 on y = (u, u'), u'' = V u
        k1u, k1p = up, V(chi) * u
        k2u, k2p = up + 0.5 * h * k1p, V(chi + 0.5 * h) * (u + 0.5 * h * k1u)
        k3u, k3p = up + 0.5 * h * k2p, V(chi + 0.5 * h) * (u + 0.5 * h * k2u)
        k4u, k4p = up + h * k3p, V(chi + h) * (u + h * k3u)
        un = u + h / 6.0 * (k1u + 2 * k2u + 2 * k3u + k4u)
        upn = up + h / 6.0 * (k1p + 2 * k2p + 2 * k3p + k4p)
        # inactive nus track the regular-solution IC at the current chi
        nxt = grid[j + 1]
        u = np.where(active, un, 1.0)
        up = np.where(active, upn, (ell + 1.0) * cot(np.maximum(nxt, chi0)))

    un, upn = norm_state
    p = np.sqrt(nus ** 2 - lam / fn(chi_norm) ** 2)
    A = np.sqrt((un ** 2 * p + upn ** 2 / p) / nus)
    return out / (nus * A)[:, None] / fn(chi_eval)[None, :]


def cl_proxy_ratio(ell, chi_star, closed=False, n_nu=None, weight=None):
    """Cl-proxy integral ratio for a source shell at chi_star:

        R = int dnu w(nu) j_l(nu S)^2 / int dnu w(nu) Phi_l^nu(chi*)^2 - 1,
        S = sinh/sin(chi_star),  w default 1/nu (scale-invariant-like).

    This is the error the geodesic projection imprints on a C_l built from
    a recombination-localized source — the quantity the approximation is
    actually used for (phase differences average out; envelope and
    turning-point placement are what survive the k integral)."""
    from scipy.special import spherical_jn

    fn = np.sin if closed else np.sinh
    s = fn(chi_star)
    x_lo = max(ell - 4.0 * max(ell, 20) ** (1.0 / 3.0), 1.0)
    x_hi = ell + 14.0 * max(ell, 20) ** (1.0 / 3.0) + 3.0 * ell
    if n_nu is None:
        # Phi^2 and j_l^2 oscillate with period ~pi in x = nu S: resolve it
        n_nu = max(240, int(24.0 * (x_hi - x_lo) / np.pi))
    nus = np.linspace(x_lo / s, x_hi / s, n_nu)
    if closed:
        # only nu > sqrt(l(l+1)) propagates on the 3-sphere (the oracle's
        # turning point exists only there); open geometries keep every nu
        nus = nus[nus > np.sqrt(ell * (ell + 1.0)) + 0.5]
    w = (1.0 / nus) if weight is None else weight(nus)
    exact = phi_exact_batch(ell, nus, np.array([chi_star]), closed=closed)[:, 0]
    approx = spherical_jn(ell, nus * s)
    return float(np.trapezoid(w * approx ** 2, nus) / np.trapezoid(w * exact ** 2, nus) - 1.0)
