"""Independent stiff-BDF oracle for the linear Einstein-Boltzmann system.

Integrates the full Ma-Bertschinger 1995 conformal-Newtonian-gauge system
(metric eq 23, fluids eqs 29-30, photon temperature + polarization
hierarchies eqs 63-64, massless neutrinos, massive-neutrino momentum
hierarchy eqs 56-58) for a single k-mode with scipy.integrate.solve_ivp
(BDF, analytic-free dense Jacobian by finite differences) - structurally
independent of the production solver (cosmoprimo_tpu/boltzmann/
perturbations.py): no tight-coupling approximation (the stiff Thomson drag
is integrated implicitly), no radiation-streaming switch, no Poisson
projection, no ETD splitting, and an independent hand-derived RHS.

Spatial curvature is carried exactly (Hu & Eisenstein 1998 curved
longitudinal-gauge constraints: G2 = Hc^2 + K gravitational normalization,
(k^2 - 3K) Poisson/anisotropic-stress factors, s_l hierarchy couplings) —
UNCLAMPED, unlike the production solver's closed-model saturation, so it
is an independent anchor for the curved transfer path too
(tests/test_curved.py::test_curved_transfers_vs_bdf_oracle).

Used by the dev harnesses (scripts/dev_oracle_*.py, dev_highk_*.py) and by
tests/test_curved.py to pin the production LOS sources (visibility-
weighted monopole, Doppler, polarization, ISW) and transfer functions at
the sub-percent level, k by k.

The background/thermodynamics tables are taken from the production
build_tables (those are separately validated against the CLASS v3.1.1
background table archived by the reference at
tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_background.dat).
"""

import numpy as np
from scipy.integrate import solve_ivp


def oracle_rhs_factory(tabs_np, k, lmax_g=40, lmax_pol=40, lmax_ur=40,
                       nq_ncdm=5, lmax_ncdm=8, q=None, w_fd=None, dlnf0=None):
    """Build the RHS f(eta, y) for one k [1/Mpc].

    State layout: [phi, dc, tc, db, tb,
                   F_g0..F_g{lmax_g}, G_0..G_{lmax_pol}, F_ur0..,
                   Psi_{q,l} (nq*(lmax_ncdm+1))].
    Note the photon temperature hierarchy here keeps F_g0/F_g1 directly
    (delta_g = F_g0, theta_g = 3 k F_g1 / 4), unlike the production state.
    """
    lneta = tabs_np['lneta']
    interp = {n: tabs_np[n] for n in ('lna', 'Hc', 'kp', 'cb2', 'fg', 'fur',
                                      'fc', 'fb', 'fnc', 'fde', 'w_nc', 'w_de')}
    am = float(np.asarray(tabs_np["am"]).reshape(-1)[0])
    # spatial curvature [1/Mpc^2] (Hu & Eisenstein 1998 curved
    # longitudinal-gauge system; K = 0 reduces every factor to MB95):
    # G2 = Hc^2 + K normalizes gravity (4 pi G a^2 rho_i = 1.5 G2 f_i),
    # s2sq = 1 - 3K/k^2 enters the Poisson/anisotropic-stress constraints,
    # s_l = sqrt(1 - (l^2-1) K/k^2) couples the free-streaming hierarchies.
    # UNCLAMPED (unlike the production _curv/_s_l saturation) — this oracle
    # only runs at k well above the curvature scale.
    K = float(np.asarray(tabs_np.get('K', 0.0)).reshape(-1)[0])
    s2sq = 1.0 - 3.0 * K / k ** 2
    s_l = np.sqrt(np.maximum(1.0 - (np.arange(0, 64) ** 2 - 1.0) * K / k ** 2, 0.0))

    i_g = 5
    i_p = i_g + (lmax_g + 1)
    i_u = i_p + (lmax_pol + 1)
    i_n = i_u + (lmax_ur + 1)
    n_state = i_n + nq_ncdm * (lmax_ncdm + 1)

    def coeffs(eta):
        x = np.log(eta)
        return {n: np.interp(x, lneta, v) for n, v in interp.items()}

    def rhs(eta, y):
        c = coeffs(eta)
        Hc, kp, cb2 = c['Hc'], c['kp'], c['cb2']
        fg, fur, fc, fb, fnc = c['fg'], c['fur'], c['fc'], c['fb'], c['fnc']
        a = np.exp(c['lna'])

        phi, dc, tc, db, tb = y[:5]
        Fg = y[i_g:i_g + lmax_g + 1]
        G = y[i_p:i_p + lmax_pol + 1]
        Fur = y[i_u:i_u + lmax_ur + 1]
        psi_nc = y[i_n:].reshape(nq_ncdm, lmax_ncdm + 1)

        tg = 0.75 * k * Fg[1]
        eps = np.sqrt(q ** 2 + (a * am) ** 2)
        I_rho = np.sum(w_fd * q ** 2 * eps)
        nc_delta = np.sum(w_fd * q ** 2 * eps * psi_nc[:, 0]) / I_rho
        nc_opw_th_k = np.sum(w_fd * q ** 3 * psi_nc[:, 1]) / I_rho
        nc_opw_sig = (2.0 / 3.0) * np.sum(w_fd * q ** 4 / eps * psi_nc[:, 2]) / I_rho

        # metric constraints (MB95 eq 23, curved per Hu & Eisenstein 1998):
        # psi from anisotropic stress, phi' from the momentum constraint
        G2k2 = (Hc ** 2 + K) / k ** 2
        stress = (2.0 / 3.0) * (fg * Fg[2] + fur * Fur[2]) + fnc * nc_opw_sig
        psi = phi - 4.5 * (G2k2 / s2sq) * stress
        tur = 0.75 * k * Fur[1]
        Stheta = fc * tc + fb * tb + (4.0 / 3.0) * (fg * tg + fur * tur) + fnc * k * nc_opw_th_k
        phip = -Hc * psi + 1.5 * G2k2 * Stheta

        k2psi = k ** 2 * psi
        dy = np.zeros(n_state)
        dy[0] = phip
        dy[1] = -tc + 3.0 * phip                      # delta_cdm
        dy[2] = -Hc * tc + k2psi                      # theta_cdm
        dy[3] = -tb + 3.0 * phip                      # delta_b
        R = (4.0 / 3.0) * fg / fb
        dy[4] = (-Hc * tb + cb2 * k ** 2 * db + k2psi
                 + kp * R * (tg - tb))                # theta_b with full drag

        # photon temperature hierarchy (MB95 eq 63 with the non-flat s_l
        # couplings: l F_{l-1} -> l s_l F_{l-1}, (l+1) F_{l+1} ->
        # (l+1) s_{l+1} F_{l+1}), F_g0 = delta_g
        PI = Fg[2] + G[0] + G[2]
        dFg = np.zeros(lmax_g + 1)
        dFg[0] = -k * Fg[1] + 4.0 * phip
        dFg[1] = k / 3.0 * (Fg[0] - 2.0 * s_l[2] * Fg[2]) + (4.0 / 3.0) * k * psi \
            + kp * (4.0 * tb / (3.0 * k) - Fg[1])
        dFg[2] = k / 5.0 * (2.0 * s_l[2] * Fg[1] - 3.0 * s_l[3] * Fg[3]) \
            + kp * (0.1 * PI - Fg[2])
        for l in range(3, lmax_g + 1):
            Fp = Fg[l + 1] if l < lmax_g else (
                (2.0 * lmax_g + 1.0) / (k * eta) * Fg[lmax_g] - Fg[lmax_g - 1])
            dFg[l] = k / (2.0 * l + 1.0) * (l * s_l[l] * Fg[l - 1]
                                            - (l + 1.0) * s_l[l + 1] * Fp) - kp * Fg[l]

        # polarization hierarchy (MB95 eq 64; scalar s_l factors stand in
        # for the curved spin-2 couplings, as in the production solver —
        # the difference is O(K/k^2) on a Silk-damping feedback term)
        dG = np.zeros(lmax_pol + 1)
        for l in range(lmax_pol + 1):
            Gm = G[l - 1] if l > 0 else 0.0
            Gp = G[l + 1] if l < lmax_pol else (
                (2.0 * lmax_pol + 1.0) / (k * eta) * G[lmax_pol] - G[lmax_pol - 1])
            src = 0.5 * PI if l == 0 else (0.1 * PI if l == 2 else 0.0)
            dG[l] = k / (2.0 * l + 1.0) * (l * s_l[l] * Gm
                                           - (l + 1.0) * s_l[l + 1] * Gp) + kp * (src - G[l])

        # massless neutrinos
        dU = np.zeros(lmax_ur + 1)
        dU[0] = -k * Fur[1] + 4.0 * phip
        dU[1] = k / 3.0 * (Fur[0] - 2.0 * s_l[2] * Fur[2]) + (4.0 / 3.0) * k * psi
        for l in range(2, lmax_ur + 1):
            Fp = Fur[l + 1] if l < lmax_ur else (
                (2.0 * lmax_ur + 1.0) / (k * eta) * Fur[lmax_ur] - Fur[lmax_ur - 1])
            dU[l] = k / (2.0 * l + 1.0) * (l * s_l[l] * Fur[l - 1]
                                           - (l + 1.0) * s_l[l + 1] * Fp)

        # massive neutrinos (MB95 eqs 56-58, same s_l couplings)
        dN = np.zeros((nq_ncdm, lmax_ncdm + 1))
        for j in range(nq_ncdm):
            qe = q[j] * k / eps[j]
            dN[j, 0] = -qe * psi_nc[j, 1] - phip * dlnf0[j]
            dN[j, 1] = qe / 3.0 * (psi_nc[j, 0] - 2.0 * s_l[2] * psi_nc[j, 2]) \
                - (eps[j] * k / (3.0 * q[j])) * psi * dlnf0[j]
            for l in range(2, lmax_ncdm + 1):
                Pp = psi_nc[j, l + 1] if l < lmax_ncdm else (
                    (2.0 * lmax_ncdm + 1.0) * eps[j] / (q[j] * k * eta) * psi_nc[j, lmax_ncdm]
                    - psi_nc[j, lmax_ncdm - 1])
                dN[j, l] = qe / (2.0 * l + 1.0) * (l * s_l[l] * psi_nc[j, l - 1]
                                                   - (l + 1.0) * s_l[l + 1] * Pp)

        dy[i_g:i_g + lmax_g + 1] = dFg
        dy[i_p:i_p + lmax_pol + 1] = dG
        dy[i_u:i_u + lmax_ur + 1] = dU
        dy[i_n:] = dN.ravel()
        return dy

    meta = dict(i_g=i_g, i_p=i_p, i_u=i_u, i_n=i_n, n_state=n_state,
                lmax_g=lmax_g, lmax_pol=lmax_pol, lmax_ur=lmax_ur,
                nq_ncdm=nq_ncdm, lmax_ncdm=lmax_ncdm)
    return rhs, coeffs, meta


def oracle_ics(coeffs, meta, k, eta_ini, q, dlnf0, am, lna_of=None):
    """MB95 eq 98 adiabatic initial conditions, C = 1/2 (R = 1)."""
    c = coeffs(eta_ini)
    frad = c['fg'] + c['fur'] + c['fnc']
    Rnu = (c['fur'] + c['fnc']) / frad
    psi = 20.0 * 0.5 / (15.0 + 4.0 * Rnu)
    phi = (1.0 + 0.4 * Rnu) * psi
    dg = -2.0 * psi
    eta_rd = 1.0 / c['Hc']
    th = 0.5 * k ** 2 * eta_rd * psi
    sig_nu = (k * eta_rd) ** 2 / 15.0 * psi

    y = np.zeros(meta['n_state'])
    y[0] = phi
    y[1] = 0.75 * dg
    y[2] = th
    y[3] = 0.75 * dg
    y[4] = th
    y[meta['i_g'] + 0] = dg
    y[meta['i_g'] + 1] = 4.0 * th / (3.0 * k)
    y[meta['i_g'] + 2] = 0.0          # photon shear suppressed by scattering
    y[meta['i_u'] + 0] = dg
    y[meta['i_u'] + 1] = 4.0 * th / (3.0 * k)
    y[meta['i_u'] + 2] = 2.0 * sig_nu
    a_ini = np.exp(np.interp(np.log(eta_ini), lna_of[0], lna_of[1]))
    eps = np.sqrt(q ** 2 + (a_ini * am) ** 2)
    for j in range(meta['nq_ncdm']):
        base = meta['i_n'] + j * (meta['lmax_ncdm'] + 1)
        y[base + 0] = -0.25 * dg * dlnf0[j]
        y[base + 1] = -(eps[j] / (3.0 * q[j] * k)) * th * dlnf0[j]
        y[base + 2] = -0.5 * sig_nu * dlnf0[j]
    return y


def run_oracle(params, thermo, k, eta_eval, lmax_g=40, lmax_pol=40, lmax_ur=40,
               rtol=1e-8, atol=1e-12):
    """Integrate one k-mode [1/Mpc]; return dict of LOS source rows and
    fluid variables at each eta in ``eta_eval`` (must be sorted).

    Sources match perturbations._los_emitters: mono = Theta0 + psi + Pi/4,
    dopp = theta_b / k, pol = Pi = (F_g2 + G_0 + G_2)/4 (temperature
    units), isw = phi' + psi' (by finite difference of the dense output on
    a fine local grid), weyl = (phi + psi)/2.
    """
    from cosmoprimo_tpu.boltzmann import perturbations as P

    tabs = P.build_tables(params, thermo)
    tabs_np = {n: np.asarray(v) for n, v in tabs.items() if n != 'stack'}
    qj, w_fd, dlnf0 = (np.asarray(v) for v in P._ncdm_q())
    rhs, coeffs, meta = oracle_rhs_factory(
        tabs_np, k, lmax_g=lmax_g, lmax_pol=lmax_pol, lmax_ur=lmax_ur,
        q=qj, w_fd=w_fd, dlnf0=dlnf0)

    lneta = tabs_np['lneta']
    lna = tabs_np['lna']
    eta_ini = float(np.clip(0.03 / k, tabs_np['eta_ini_min'], tabs_np['eta_rd']))
    y0 = oracle_ics(coeffs, meta, k, eta_ini, qj, dlnf0, float(np.asarray(tabs_np["am"]).reshape(-1)[0]),
                    lna_of=(lneta, lna))

    eta_eval = np.asarray(eta_eval, dtype=np.float64)
    sol = solve_ivp(rhs, (eta_ini, float(eta_eval[-1])), y0, method='BDF',
                    rtol=rtol, atol=atol, dense_output=True)
    assert sol.success, sol.message

    def observables(eta):
        y = sol.sol(eta)
        c = coeffs(eta)
        Fg = y[meta['i_g']:meta['i_g'] + meta['lmax_g'] + 1]
        G = y[meta['i_p']:meta['i_p'] + meta['lmax_pol'] + 1]
        Fur = y[meta['i_u']:meta['i_u'] + meta['lmax_ur'] + 1]
        psi_nc = y[meta['i_n']:].reshape(meta['nq_ncdm'], meta['lmax_ncdm'] + 1)
        a = np.exp(c['lna'])
        eps = np.sqrt(qj ** 2 + (a * float(np.asarray(tabs_np["am"]).reshape(-1)[0])) ** 2)
        I_rho = np.sum(w_fd * qj ** 2 * eps)
        nc_sig = (2.0 / 3.0) * np.sum(w_fd * qj ** 4 / eps * psi_nc[:, 2]) / I_rho
        K = float(np.asarray(tabs_np.get('K', 0.0)).reshape(-1)[0])
        G2k2s = (c['Hc'] ** 2 + K) / (k ** 2 - 3.0 * K)
        stress = (2.0 / 3.0) * (c['fg'] * Fg[2] + c['fur'] * Fur[2]) + c['fnc'] * nc_sig
        psi = y[0] - 4.5 * G2k2s * stress
        # Pi in temperature units (Theta_l = F_gl/4), as _los_emitters
        PI = 0.25 * (Fg[2] + G[0] + G[2])
        return dict(phi=y[0], psi=psi, dc=y[1], tc=y[2], db=y[3], tb=y[4],
                    dg=Fg[0], tg=0.75 * k * Fg[1], PI=PI,
                    mono=0.25 * Fg[0] + psi + 0.25 * PI, dopp=y[4] / k,
                    weyl=0.5 * (y[0] + psi))

    rows = {n: np.empty(len(eta_eval)) for n in
            ('phi', 'psi', 'dc', 'tc', 'db', 'tb', 'dg', 'tg', 'PI',
             'mono', 'dopp', 'weyl', 'isw')}
    for i, e in enumerate(eta_eval):
        o = observables(e)
        for n, v in o.items():
            rows[n][i] = v
        de = 1e-3 * e
        lo, hi = (observables(e - de), observables(e + de))
        rows['isw'][i] = ((hi['phi'] + hi['psi']) - (lo['phi'] + lo['psi'])) / (2 * de)
    rows['eta'] = eta_eval
    return rows
