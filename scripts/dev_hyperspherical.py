"""Measure the geodesic-projection error against an exact hyperspherical
Bessel oracle.

The native curved Cl path (boltzmann/harmonic.py) approximates the exact
radial functions Phi_l^nu(chi) by j_l(q S_K(chi)).  This script integrates
the exact radial ODE (host scipy, independent of all repo JAX code) and
measures, at the recombination shell chi = chi_star:

  (a) the pointwise error near the WKB turning point (the peak region that
      sets the acoustic structure),
  (b) the Cl-proxy integral ratio
        R(l) = int dnu f(nu) j_l(nu sinh chi*)^2
             / int dnu f(nu) Phi_l^nu(chi*)^2  - 1
      with f ~ 1/nu (scale-invariant-like weight), i.e. the error on a
      Cl built from a source localized at recombination.

Exact radial equation in curvature units (chi~ = sqrt|K| chi):
  open   (K<0): u'' + [nu^2 - l(l+1)/sinh^2 chi] u = 0, Phi = u/(nu A sinh chi)
  closed (K>0): u'' + [nu^2 - l(l+1)/sin^2  chi] u = 0, Phi = u/(nu A sin  chi)
with A the asymptotic (WKB adiabatic-invariant) amplitude, matching the
standard normalization Phi_0^nu = sin(nu chi)/(nu sinh chi)  [Abbott &
Schaefer 1986; Kosowsky astro-ph/9805173].
"""

import numpy as np
from scipy.integrate import solve_ivp
from scipy.special import spherical_jn


def phi_exact(ell, nu, chi_eval, closed=False, rtol=1e-10):
    """Exact normalized hyperspherical Bessel Phi_l^nu at chi_eval (array,
    curvature units). Forward ODE integration from inside the centrifugal
    barrier (the regular solution grows; irregular admixture dies), then
    normalization by the WKB adiabatic invariant measured where the
    potential is smallest."""
    fn = np.sin if closed else np.sinh
    cot = (lambda x: np.cos(x) / np.sin(x)) if closed else (lambda x: np.cosh(x) / np.sinh(x))
    lam = ell * (ell + 1.0)

    def rhs(chi, y):
        return [y[1], (lam / fn(chi) ** 2 - nu ** 2) * y[0]]

    # turning point: nu sinh/sin(chi_t) = sqrt(l(l+1))
    arg = np.sqrt(lam) / nu
    if closed:
        if arg >= 1.0:
            return np.zeros_like(chi_eval)
        chi_t = np.arcsin(arg)
    else:
        chi_t = np.arcsinh(arg)
    # start deep enough that the WKB-exponent suppression of the irregular
    # admixture is > e^-12, but avoid overflow of the growing solution
    chi0 = chi_t
    kappa_int = 0.0
    dchi = chi_t / 400.0
    while kappa_int < 14.0 and chi0 > 8 * dchi:
        chi0 -= dchi
        kappa_int += dchi * np.sqrt(max(lam / fn(chi0) ** 2 - nu ** 2, 0.0))
    # regular solution near 0: u ~ fn(chi)^(l+1) => u'/u = (l+1) cot(chi);
    # deeper in, WKB log-derivative; take the larger-barrier expression
    logd = (ell + 1.0) * cot(chi0)
    y0 = [1.0, logd]

    if closed:
        chi_norm = np.pi / 2.0       # potential minimum: WKB error -> 0
        chi_end = max(np.max(chi_eval) + 1e-9, chi_norm + 1e-9)
        chi_end = min(chi_end, np.pi - 1e-6)
    else:
        chi_norm = chi_t + 6.0       # potential suppressed by sinh^2
        chi_end = max(np.max(chi_eval) + 1e-9, chi_norm)

    t_eval = np.unique(np.concatenate([np.atleast_1d(chi_eval), [chi_norm]]))
    t_eval = t_eval[t_eval >= chi0]
    sol = solve_ivp(rhs, (chi0, chi_end), y0, t_eval=t_eval, rtol=rtol,
                    atol=1e-300, max_step=min(0.5, np.pi / (6.0 * nu)),
                    method='DOP853', dense_output=False)
    u = dict(zip(sol.t, sol.y[0]))
    up = dict(zip(sol.t, sol.y[1]))
    # adiabatic-invariant amplitude at chi_norm: A^2 = (u^2 p + u'^2/p)/nu
    p = np.sqrt(nu ** 2 - lam / fn(chi_norm) ** 2)
    A2 = (u[chi_norm] ** 2 * p + up[chi_norm] ** 2 / p) / nu
    A = np.sqrt(A2)
    out = np.zeros_like(np.atleast_1d(chi_eval), dtype=float)
    for i, chi in enumerate(np.atleast_1d(chi_eval)):
        if chi < chi0:
            out[i] = 0.0  # deep in the barrier: exponentially small
        else:
            out[i] = u[chi] / (nu * A * fn(chi))
    return out


def check_oracle():
    """Closed forms: Phi_0 = sin(nu chi)/(nu sinh chi);
    Phi_1 = [sin(nu chi) coth(chi)/nu - cos(nu chi)]/(sinh chi sqrt(nu^2+1));
    closed analogs with sin/cot and sqrt(nu^2-1).  Flat limit: small chi,
    large nu -> j_l(nu chi)."""
    chi = np.linspace(0.3, 2.0, 12)
    nu = 17.3
    exact1 = phi_exact(1, nu, chi, closed=False)
    form1 = (np.sin(nu * chi) * np.cosh(chi) / np.sinh(chi) / nu - np.cos(nu * chi)) \
        / (np.sinh(chi) * np.sqrt(nu ** 2 + 1.0))
    print('open  l=1 closed-form max rel err:',
          np.max(np.abs(exact1 / form1 - 1.0)[np.abs(form1) > 1e-3]))
    chic = np.linspace(0.3, 2.4, 12)
    nuc = 18
    exact1c = phi_exact(1, nuc, chic, closed=True)
    form1c = (np.sin(nuc * chic) * np.cos(chic) / np.sin(chic) / nuc - np.cos(nuc * chic)) \
        / (np.sin(chic) * np.sqrt(nuc ** 2 - 1.0))
    print('closed l=1 closed-form max rel err:',
          np.max(np.abs(exact1c / form1c - 1.0)[np.abs(form1c) > 1e-3]))
    # flat limit: l=10, nu=4000, chi ~ l/nu
    ell = 10
    nuf = 4000.0
    chif = np.linspace(8, 40, 9) / nuf
    exactf = phi_exact(ell, nuf, chif, closed=False)
    flat = spherical_jn(ell, nuf * chif)
    print('flat-limit l=10 max abs err (scale ~%.1e):' % np.max(np.abs(flat)),
          np.max(np.abs(exactf - flat)))


def integral_metric(ell, chi_star, closed=False, n_nu=220):
    """R(l): Cl-proxy integral ratio approx/exact - 1 at source shell chi*."""
    fn = np.sin if closed else np.sinh
    s = fn(chi_star)
    # support: nu s in [max(l-|l,20|^(2/3) band below turning), ...]
    x_lo = max(ell - 4.0 * max(ell, 20) ** (1.0 / 3.0), 1.0)
    x_hi = ell + 14.0 * max(ell, 20) ** (1.0 / 3.0) + 3.0 * ell
    nus = np.linspace(x_lo / s, x_hi / s, n_nu)
    if closed:
        nus = nus[nus >= ell + 1.5]
        nus = nus[nus * s <= (ell + 300.0)]
    w = 1.0 / nus  # scale-invariant-like weight
    exact = np.array([phi_exact(ell, nu, np.array([chi_star]), closed=closed)[0]
                      for nu in nus])
    approx = spherical_jn(ell, nus * s)
    Ie = np.trapezoid(w * exact ** 2, nus)
    Ia = np.trapezoid(w * approx ** 2, nus)
    return Ia / Ie - 1.0


if __name__ == '__main__':
    check_oracle()
    # chi~* for DESI-like chi* ~ 14000 Mpc:
    #   Omega_k = 0.05 -> 0.70; 0.12 -> 1.09 (open);  closed mirrors
    for closed, omk_tag, chi_star in [(False, '+0.05', 0.70), (False, '+0.12', 1.09),
                                      (True, '-0.05', 0.70), (True, '-0.12', 1.09)]:
        for ell in (3, 5, 10, 20, 50, 100, 250):
            R = integral_metric(ell, chi_star, closed=closed)
            print(f'Omega_k {omk_tag}  chi*~ {chi_star}  l={ell:4d}  R = {R:+.4f}')
