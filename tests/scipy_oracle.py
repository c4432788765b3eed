"""Independent numpy/scipy re-implementations of the non-linear transforms,
used as oracles by tests/test_independent_oracle.py.

Purpose (VERDICT round 2, "anchor the non-linear stack"): the JAX halofit
(cosmoprimo_tpu/models/halofit.py) and HMcode-2020
(cosmoprimo_tpu/models/hmcode.py) were validated mostly against themselves.
No external oracle exists in this zero-egress image — the reference library
has no native halofit (it forwards ``non_linear`` to CLASS/CAMB internals,
reference classy.py:44-48 / camb.py:124-147) and neither CAMB, CLASS nor
pyccl is installed.  What CAN be built here is a *structurally independent*
second path: adaptive quadrature (scipy.integrate.quad) instead of static
trapezoid matmuls, bracketing root-finders (brentq) instead of fixed-depth
Newton on splines, scipy.solve_ivp growth instead of rk4-on-scan,
scipy.ndimage Gaussian smoothing instead of a smoothing matmul, and plain
Python loops instead of vmap/einsum.  Agreement between the two paths rules
out implementation bugs (windows, splines, root-finds, broadcasting,
integration measures); it cannot rule out a shared mis-transcription of the
published fitted coefficients, which is why test_independent_oracle.py also
asserts order-of-magnitude literature bands (non-linear scale, effective
index, boost factors) that any single-coefficient sign error would break.

Everything here is deliberately slow, eager numpy — test-only code.
"""

import numpy as np
from scipy import integrate, interpolate, ndimage, optimize
from scipy import special as sps


# ---------------------------------------------------------------- halofit

def _sigma_gauss2_quad(lnpk, R, lo, hi):
    """sigma^2(R) = int dlnk Delta^2_L(k) e^{-k^2 R^2} by adaptive quad."""
    def f(lnk):
        kk = np.exp(lnk)
        return kk ** 3 * np.exp(lnpk(lnk)) / (2 * np.pi ** 2) * np.exp(-(kk * R) ** 2)
    return integrate.quad(f, lo, hi, limit=400)[0]


def halofit_scipy(k, pk, Omega_m, Omega_de, w, fnu=0.0, Omega_m0=None):
    """Takahashi-2012 halofit (+ Bird-2012 nu-corrections) for ONE redshift:
    ``k`` (nk,) [h/Mpc], ``pk`` (nk,) linear [(Mpc/h)^3], scalars
    Omega_m(z), Omega_de(z), w(z).  Returns pk_nl (nk,)."""
    k = np.asarray(k, dtype=float)
    pk = np.asarray(pk, dtype=float)
    if Omega_m0 is None:
        Omega_m0 = Omega_m
    lnpk = interpolate.CubicSpline(np.log(k), np.log(pk))
    lo, hi = np.log(k[0]), np.log(k[-1])

    lnsig2 = lambda lnR: np.log(_sigma_gauss2_quad(lnpk, np.exp(lnR), lo, hi))
    # non-linear scale sigma(R_sigma) = 1 by bracketing root-find
    lnR_sigma = optimize.brentq(lnsig2, np.log(1e-3), np.log(1e3), xtol=1e-10)
    ksigma = np.exp(-lnR_sigma)
    # slope/curvature by high-order central differences (independent of the
    # JAX path's spline derivatives)
    h = 1e-3
    y = np.array([lnsig2(lnR_sigma + i * h) for i in (-2, -1, 0, 1, 2)])
    d1 = (y[0] - 8 * y[1] + 8 * y[3] - y[4]) / (12 * h)
    d2 = (-y[0] + 16 * y[1] - 30 * y[2] + 16 * y[3] - y[4]) / (12 * h ** 2)
    neff = -3.0 - d1
    C = -d2

    n, n2, n3, n4 = neff, neff ** 2, neff ** 3, neff ** 4
    w1 = 1.0 + w
    an = 10 ** (1.5222 + 2.8553 * n + 2.3706 * n2 + 0.9903 * n3 + 0.2250 * n4
                - 0.6038 * C + 0.1749 * Omega_de * w1)
    bn = 10 ** (-0.5642 + 0.5864 * n + 0.5716 * n2 - 1.5474 * C + 0.2279 * Omega_de * w1)
    cn = 10 ** (0.3698 + 2.0404 * n + 0.8161 * n2 + 0.5869 * C)
    gamma = 0.1971 - 0.0843 * n + 0.8460 * C
    alpha = abs(6.0835 + 1.3373 * n - 0.1959 * n2 - 5.5274 * C)
    beta = (2.0379 - 0.7354 * n + 0.3157 * n2 + 1.2490 * n3 + 0.3980 * n4 - 0.1682 * C
            + fnu * (1.081 + 0.395 * n2))
    nu_h = 10 ** (5.2105 + 3.6902 * n)
    f1 = Omega_m ** -0.0307
    f2 = Omega_m ** -0.0585
    f3 = Omega_m ** 0.0743

    delta2_lin = k ** 3 * pk / (2 * np.pi ** 2)
    y_ = k / ksigma
    fy = y_ / 4.0 + y_ ** 2 / 8.0
    delta2_q_lin = delta2_lin * (1.0 + fnu * 47.48 * k ** 2 / (1.0 + 1.5 * k ** 2))
    delta2_q = delta2_lin * ((1.0 + delta2_q_lin) ** beta / (1.0 + alpha * delta2_q_lin)) * np.exp(-fy)
    delta2_hp = an * y_ ** (3.0 * f1) / (1.0 + bn * y_ ** f2 + (cn * f3 * y_) ** (3.0 - gamma))
    delta2_h = delta2_hp / (1.0 + nu_h / y_ ** 2)
    delta2_h = delta2_h * (1.0 + fnu * (0.977 - 18.015 * (Omega_m0 - 0.3)))
    return (delta2_q + delta2_h) * (2 * np.pi ** 2) / k ** 3


def halofit_scales_scipy(k, pk):
    """(ksigma, neff, C) only — the derived quantities with clean published
    meanings, for band tests."""
    lnpk = interpolate.CubicSpline(np.log(k), np.log(pk))
    lo, hi = np.log(k[0]), np.log(k[-1])
    lnsig2 = lambda lnR: np.log(_sigma_gauss2_quad(lnpk, np.exp(lnR), lo, hi))
    lnR_sigma = optimize.brentq(lnsig2, np.log(1e-3), np.log(1e3), xtol=1e-10)
    h = 1e-3
    y = np.array([lnsig2(lnR_sigma + i * h) for i in (-2, -1, 0, 1, 2)])
    d1 = (y[0] - 8 * y[1] + 8 * y[3] - y[4]) / (12 * h)
    d2 = (-y[0] + 16 * y[1] - 30 * y[2] + 16 * y[3] - y[4]) / (12 * h ** 2)
    return np.exp(-lnR_sigma), -3.0 - d1, -d2


# ------------------------------------------------------------- HMcode-2020

def growth_scipy(Omega_m0, w0=-1.0, wa=0.0, a_init=1e-4):
    """Radiation-free growth g(a) (g -> a early) and its accumulated
    integral G(a), via scipy.solve_ivp (RK45, adaptive) — independent of the
    rk4-on-scan path.  Returns callables g(a), G(a)."""
    Ode0 = 1.0 - Omega_m0

    def rhs(lna, Y):
        a = np.exp(lna)
        de = a ** (-3 * (1 + w0 + wa)) * np.exp(-3 * wa * (1 - a))
        Esq = Omega_m0 * a ** -3 + Ode0 * de
        Om = Omega_m0 * a ** -3 / Esq
        Ode = Ode0 * de / Esq
        w = w0 + wa * (1 - a)
        addot = -0.5 * (1 - 0.0 + 3 * w * Ode)
        f = -1.0 - addot
        D, Dp, G = Y
        return [Dp, 1.5 * Om * D + f * Dp, D]  # dG/dlna = g = D (early-normed)

    lna = np.linspace(np.log(a_init), 0.0, 257)
    sol = integrate.solve_ivp(rhs, (lna[0], 0.0), [a_init, a_init, a_init],
                              t_eval=lna, rtol=1e-10, atol=1e-12)
    a_tab = np.exp(sol.t)
    g_tab, G_tab = sol.y[0], sol.y[2]
    g = interpolate.CubicSpline(a_tab, g_tab)
    G = interpolate.CubicSpline(a_tab, G_tab)
    return g, G


def hmcode_scipy(k, pk, z, Omega_m0, omega_m, omega_b, h, theta_cmb, ns,
                 fnu=0.0, logT_AGN=None):
    """HMcode-2020 non-linear P(k) for ONE redshift, all ingredients by
    adaptive scipy numerics: quad sigma^2, brentq formation redshift,
    solve_ivp growth, gaussian_filter1d de-wiggling, simpson one-halo
    integral over a dense lnR grid.  Returns pk_nl (nk,)."""
    k = np.asarray(k, dtype=float)
    pk = np.asarray(pk, dtype=float)
    a = 1.0 / (1.0 + z)
    g_fn, G_fn = growth_scipy(Omega_m0)
    # Omega_m(z) radiation-free
    Esq = Omega_m0 * a ** -3 + (1 - Omega_m0)
    Omega_mz = Omega_m0 * a ** -3 / Esq

    lnpk = interpolate.CubicSpline(np.log(k), np.log(pk))
    lo, hi = np.log(k[0]), np.log(k[-1])

    def sigma2_tophat(R):
        def f(lnk):
            kk = np.exp(lnk)
            x = kk * R
            w = 3 * (np.sin(x) - x * np.cos(x)) / x ** 3
            return kk ** 3 * np.exp(lnpk(lnk)) / (2 * np.pi ** 2) * w ** 2
        return integrate.quad(f, lo, hi, limit=400)[0]

    # Mead (2017) collapse thresholds
    xg = g_fn(a) / a
    yG = G_fn(a) / a
    lg = np.log10(Omega_mz)
    f1 = -0.0069 - 0.0208 * (1 - xg) + 0.0312 * (1 - xg) ** 2 + 0.0021 * (1 - yG)
    f2 = 0.0001 - 0.0647 * (1 - xg) - 0.0417 * (1 - xg) ** 2 + 0.0646 * (1 - yG)
    dc0 = (3.0 / 20.0) * (12.0 * np.pi) ** (2.0 / 3.0)
    dc = dc0 * (1 + f1 * lg + f2) * (1 + 0.262 * fnu)
    f1v = -0.79 - 10.17 * (1 - xg) + 2.51 * (1 - xg) ** 2 + 6.51 * (1 - yG)
    f2v = -1.89 + 0.38 * (1 - xg) + 18.8 * (1 - xg) ** 2 - 15.87 * (1 - yG)
    Dv = 18 * np.pi ** 2 * (1 + f1v * lg + f2v * lg ** 2) * (1 + 0.916 * fnu)

    # sigma(R) spline on a dense grid
    R = np.geomspace(5e-4, 5e1, 257)
    sig = np.sqrt([sigma2_tophat(r) for r in R])
    lnsig2_spl = interpolate.CubicSpline(np.log(R), 2 * np.log(sig))
    sigma8 = np.sqrt(sigma2_tophat(8.0))

    # fitted parameters
    kstar = 0.05618 * sigma8 ** -1.013
    f2h = 0.2696 * sigma8 ** 0.9403
    kd = 0.05699 * sigma8 ** -1.089
    nd = 2.853
    eta = 0.1281 * sigma8 ** -0.3644 if logT_AGN is None else 0.0
    # neff at the collapse scale: sigma(R) = dc
    lnR_c = optimize.brentq(lambda l: lnsig2_spl(l) - 2 * np.log(dc),
                            np.log(R[0]), np.log(R[-1]), xtol=1e-12)
    neff = -3.0 - lnsig2_spl(lnR_c, 1)
    alpha = 1.875 * 1.603 ** neff

    # two-halo: de-wiggle by smoothing P/P_EHnw in ln k (sigma 0.25, on the
    # native log-spaced grid -> pixel sigma), sigma_v damping
    frac_b = omega_b / omega_m
    s_eh = 44.5 * np.log(9.83 / omega_m) / np.sqrt(1 + 10 * omega_b ** 0.75)
    alpha_g = (1 - 0.328 * np.log(431 * omega_m) * frac_b
               + 0.38 * np.log(22.3 * omega_m) * frac_b ** 2)
    kMpc = k * h
    gamma_eff = omega_m * (alpha_g + (1 - alpha_g) / (1 + (0.43 * kMpc * s_eh) ** 4))
    q = kMpc * theta_cmb ** 2 / gamma_eff
    L0 = np.log(2 * np.e + 1.8 * q)
    C0 = 14.2 + 731.0 / (1 + 62.5 * q)
    pk_eh = (L0 / (L0 + C0 * q ** 2)) ** 2 * k ** ns
    dlnk = np.log(k[1] / k[0])
    ratio = ndimage.gaussian_filter1d(pk / pk_eh, 0.25 / dlnk, mode='nearest')
    pk_dw_base = ratio * pk_eh
    sv2 = integrate.quad(
        lambda lnk: np.exp(lnk) ** 3 * np.exp(lnpk(lnk)) / (2 * np.pi ** 2)
        / np.exp(lnk) ** 2, lo, hi, limit=400)[0] / 3.0
    pk_dw = pk_dw_base + np.exp(-k ** 2 * sv2) * (pk - pk_dw_base)
    kkd = (k / kd) ** nd
    delta2_2h = k ** 3 / (2 * np.pi ** 2) * pk_dw * (1 - f2h * kkd / (1 + kkd))

    # one-halo: dense lnR simpson
    lnRg = np.log(np.geomspace(5e-4, 5e1, 513))
    Rg = np.exp(lnRg)
    sigg = np.exp(0.5 * lnsig2_spl(lnRg))
    nu = dc / sigg
    dnu_dlnR = -0.5 * nu * lnsig2_spl(lnRg, 1)
    p, q_st, A_st = 0.3, 0.707, 0.21615998645
    qnu2 = q_st * nu ** 2
    f_st = A_st * (1 + qnu2 ** -p) * np.sqrt(2 * q_st / np.pi) * np.exp(-qnu2 / 2)
    # Bullock formation condition g(a_f) = g(a) dc / sigma(f^{1/3} R)
    sigf = np.exp(0.5 * lnsig2_spl(lnRg + np.log(0.01) / 3.0))
    target = g_fn(a) * dc / sigf
    af = np.empty_like(Rg)
    for i, t in enumerate(target):
        if g_fn(1e-4) >= t:
            af[i] = 1e-4
        elif g_fn(a) <= t:
            af[i] = a
        else:
            af[i] = optimize.brentq(lambda aa: g_fn(aa) - t, 1e-4, a, xtol=1e-12)
    if logT_AGN is None:
        B = 5.196
    else:
        theta = logT_AGN - 7.8
        B = (3.44 - 0.496 * theta) * 10.0 ** (z * (-0.0671 - 0.0371 * theta))
    conc = B * a / af
    rv = Rg / Dv ** (1.0 / 3.0)
    rs = rv / conc
    norm = np.log(1 + conc) - conc / (1 + conc)

    if logT_AGN is None:
        amp = np.full_like(Rg, 1.0 - fnu)
        fstar = 0.0
    else:
        fb = omega_b / omega_m
        fstar = min((2.01e-2 - 0.30e-2 * theta) * 10.0 ** (z * (0.409 + 0.0224 * theta)), fb)
        Mbar = 10.0 ** (13.87 + 1.81 * theta + z * (-0.108 + 0.195 * theta))
        rho = 2.77536627e11 * omega_m / h ** 2  # Msun/h / (Mpc/h)^3
        M = 4 * np.pi / 3 * rho * Rg ** 3
        fg = (fb - fstar) / (1 + (Mbar / M) ** 2)
        amp = (1 - fb - fnu) + fg

    pk_1h = np.empty_like(k)
    for j, kk in enumerate(k):
        y = np.maximum(kk * nu ** eta * rs, 1e-8)
        si_y, ci_y = sps.sici(y)
        si_cy, ci_cy = sps.sici((1 + conc) * y)
        u = (np.sin(y) * (si_cy - si_y) - np.sin(conc * y) / ((1 + conc) * y)
             + np.cos(y) * (ci_cy - ci_y)) / norm
        win = amp * u + fstar
        integ = dnu_dlnR * f_st * (4 * np.pi / 3) * Rg ** 3 * win ** 2
        pk_1h[j] = integrate.simpson(integ, x=lnRg)
    kks = (k / kstar) ** 4
    delta2_1h = k ** 3 / (2 * np.pi ** 2) * pk_1h * kks / (1 + kks)

    delta2 = (np.maximum(delta2_2h, 0.0) ** alpha + delta2_1h ** alpha) ** (1 / alpha)
    return delta2 * (2 * np.pi ** 2) / k ** 3
