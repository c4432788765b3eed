"""Exact numerical verification of the tensor-mode Thomson scattering
source (the Polnarev Psi combination and the polarization angular
structures) from the polarized Thomson kernel alone.

Physics input: the exact coherence-matrix scattering law
    C_ab(n) = (3/8pi) int dOmega' (e_a.e'_c)(e_b.e'_d) C'_cd(n')
(amplitude mapping E_a = (e_a.e'_c) E'_c; normalization fixed by photon
conservation for isotropic unpolarized light - verified below).

The evolution system claims, for the m=2 (tensor, + polarization) mode
with patterns
    I(n)      = DT(mu) (1-mu^2) cos 2phi
    Q(n)      = DP(mu) (1+mu^2) cos 2phi
    U(n)      = -2 DP(mu) mu sin 2phi          [s_U = -1 convention]
that one Thomson scattering maps the field to
    I_s = +Psi (1-mu^2) cos 2phi,  (Q_s, U_s) = -Psi (patterns)
with  Psi = DT0/10 + DT2/7 + 3 DT4/70 - 3 DP0/5 + 6 DP2/7 - 3 DP4/70
(moment convention f(mu) = sum_l (-i)^l (2l+1) f_l P_l(mu); for the real
even moments probed here the patterns are real).

This script feeds pure moments through the exact kernel and prints the
measured coefficients and pattern shapes.
"""

import numpy as np
from numpy.polynomial.legendre import legval

NTH, NPH = 400, 400


def basis(theta, phi):
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    n = np.stack([st * cp, st * sp, ct])
    e1 = np.stack([ct * cp, ct * sp, -st])   # theta-hat
    e2 = np.stack([-sp, cp, 0.0 * sp])       # phi-hat
    return n, e1, e2


def scatter(I_fun, Q_fun, U_fun, theta_o, phi_o):
    """Exact scattered (I, Q, U) towards (theta_o, phi_o)."""
    # incident grid
    th = (np.arange(NTH) + 0.5) * np.pi / NTH
    ph = (np.arange(NPH) + 0.5) * 2 * np.pi / NPH
    TH, PH = np.meshgrid(th, ph, indexing='ij')
    w = (np.pi / NTH) * (2 * np.pi / NPH) * np.sin(TH)
    npr, e1p, e2p = basis(TH.ravel(), PH.ravel())
    Ii = I_fun(TH, PH).ravel()
    Qi = Q_fun(TH, PH).ravel()
    Ui = U_fun(TH, PH).ravel()
    # incident coherence matrix in (e1', e2') basis
    C11 = 0.5 * (Ii + Qi)
    C22 = 0.5 * (Ii - Qi)
    C12 = 0.5 * Ui
    no, e1o, e2o = basis(np.atleast_1d(theta_o), np.atleast_1d(phi_o))
    out = []
    for a_vec, b_vec in ((e1o, e1o), (e2o, e2o), (e1o, e2o)):
        # (e_a.e'_c)(e_b.e'_d) C'_cd summed over c,d in {1,2}
        a1 = a_vec[:, 0] @ e1p if False else np.einsum('i,ij->j', a_vec[:, 0], e1p)
        a2 = np.einsum('i,ij->j', a_vec[:, 0], e2p)
        b1 = np.einsum('i,ij->j', b_vec[:, 0], e1p)
        b2 = np.einsum('i,ij->j', b_vec[:, 0], e2p)
        val = (a1 * b1 * C11 + a2 * b2 * C22 + (a1 * b2 + a2 * b1) * C12)
        out.append((3.0 / (8.0 * np.pi)) * np.sum(val * w.ravel()))
    Iab = np.array([[out[0], out[2]], [out[2], out[1]]])
    return Iab[0, 0] + Iab[1, 1], Iab[0, 0] - Iab[1, 1], 2 * Iab[0, 1]


def moments_pattern(l, kind):
    """Pure-moment incident fields: DT(mu) = c_l P_l(mu) with the
    (-i)^l (2l+1) convention factored so the MOMENT value is 1.
    For the real parts probed (even l) (-i)^l = (-1)^{l/2}."""
    coef = np.zeros(l + 1)
    coef[l] = (2 * l + 1) * {0: 1.0, 2: -1.0, 4: 1.0}[l]

    def DT(mu):
        return legval(mu, coef)

    if kind == 'T':
        return (lambda TH, PH: DT(np.cos(TH)) * (1 - np.cos(TH) ** 2) * np.cos(2 * PH),
                lambda TH, PH: 0.0 * TH, lambda TH, PH: 0.0 * TH)
    return (lambda TH, PH: 0.0 * TH,
            lambda TH, PH: DT(np.cos(TH)) * (1 + np.cos(TH) ** 2) * np.cos(2 * PH),
            lambda TH, PH: -2.0 * DT(np.cos(TH)) * np.cos(TH) * np.sin(2 * PH))


# sanity: isotropic unpolarized is preserved
I0, Q0, U0 = scatter(lambda TH, PH: 1.0 + 0 * TH, lambda TH, PH: 0 * TH,
                     lambda TH, PH: 0 * TH, 1.0, 0.7)
print(f'isotropic check: I={I0:.6f} (want 1), Q={Q0:.2e}, U={U0:.2e}')

# probe direction set
probes = [(0.7, 0.3), (1.2, 1.1), (2.0, 2.4)]
print('\nclaimed Psi coefficients: T0 +1/10, T2 +1/7, T4 +3/70, '
      'P0 -3/5, P2 +6/7, P4 -3/70')
for kind in ('T', 'P'):
    for l in (0, 2, 4):
        Ifun, Qfun, Ufun = moments_pattern(l, kind)
        rows = []
        for (to, po) in probes:
            Is, Qs, Us = scatter(Ifun, Qfun, Ufun, to, po)
            mu, c2, s2 = np.cos(to), np.cos(2 * po), np.sin(2 * po)
            # Psi read from each of the three patterns
            psi_I = Is / ((1 - mu ** 2) * c2)
            psi_Q = -Qs / ((1 + mu ** 2) * c2)
            psi_U = -Us / (-2 * mu * s2)
            rows.append((psi_I, psi_Q, psi_U))
        rows = np.array(rows)
        print(f'{kind}{l}: psi from I = {rows[:,0]}, from Q = {rows[:,1]}, '
              f'from U = {rows[:,2]}')
