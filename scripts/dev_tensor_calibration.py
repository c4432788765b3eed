"""Numerically calibrate the tensor-mode CMB projection kernels.

The tensor line-of-sight integrals need three angular identities:

T:  the multipoles of (1-mu^2)cos(2phi) e^{-ix mu}  (temperature structure)
E/B: the spin-2 E/B multipoles of the Thomson polarization structure
     Q = (1+mu^2)cos(2phi) e^{-ix mu}, U = s_U 2 mu sin(2phi) e^{-ix mu}

This script verifies, with no analytic input beyond Wigner-d matrices
(built from Jacobi polynomials) and brute-force 2D quadrature:

1. the temperature radial identity
   integral dmu P_l^2(mu)(1-mu^2) e^{-ix mu}
       = 2 (-i)^l (-1) * (l+2)!/(l-2)! * j_l(x)/x^2         [phase checked]
2. the sign s_U of the U structure for which the numerical E/B multipoles
   match single radial kernels for ALL (l, x):
       K_E(x) = cE [ -j_l + j_l'' + 2 j_l/x^2 + 4 j_l'/x ]
       K_B(x) = cB [ 2 j_l' + 4 j_l/x ]
   (Zaldarriaga & Seljak 1997 forms); the constants cE, cB and the phase
   relative to the T multipole.
3. the scalar control: Q = (1-mu^2) e^{-ix mu}, U = 0 must give B = 0
   through the same machinery (validates the spin-2 decomposition code).

Conventions used (self-consistent; E/B signs fixed by them):
  sYlm = (-1)^m sqrt((2l+1)/4pi) d^l_{-m,s}(theta) e^{i m phi}
  a_{+-2,lm} = int dOmega (Q +- iU) conj(+-2 Y_lm)
  aE = -(a2 + am2)/2, aB = 1j*(a2 - am2)/2
"""

import numpy as np
from scipy.special import eval_jacobi, spherical_jn, factorial

NTH, NPH = 2048, 256


def wigner_d(l, mp, m, theta):
    """d^l_{mp,m}(theta) via the Jacobi-polynomial formula."""
    k = min(l + m, l - m, l + mp, l - mp)
    if k == l + m:
        a, lam = mp - m, mp - m
    elif k == l - m:
        a, lam = m - mp, 0
    elif k == l + mp:
        a, lam = m - mp, 0
    else:
        a, lam = mp - m, mp - m
    b = 2 * (l - k) - a
    norm = np.sqrt(factorial(k) * factorial(k + a + b)
                   / (factorial(k + a) * factorial(k + b)))
    s, c = np.sin(theta / 2.0), np.cos(theta / 2.0)
    return ((-1.0) ** lam * norm * s ** a * c ** b
            * eval_jacobi(k, a, b, np.cos(theta)))


def sylm(s, l, m, theta, phi):
    return ((-1.0) ** m * np.sqrt((2 * l + 1) / (4.0 * np.pi))
            * wigner_d(l, -m, s, theta)[:, None] * np.exp(1j * m * phi)[None, :])


def ylm(l, m, theta, phi):
    return sylm(0, l, m, theta, phi)


theta = (np.arange(NTH) + 0.5) * np.pi / NTH
phi = (np.arange(NPH) + 0.5) * 2.0 * np.pi / NPH
mu = np.cos(theta)
dA = (np.pi / NTH) * (2.0 * np.pi / NPH) * np.sin(theta)[:, None]


def project(field, s, l, m):
    return np.sum(field * np.conj(sylm(s, l, m, theta, phi)) * dA)


def jl(l, x):
    return spherical_jn(l, x)


def jlp(l, x):
    return spherical_jn(l, x, derivative=True)


def jlpp(l, x):
    return (l * (l + 1.0) / x ** 2 - 1.0) * jl(l, x) - 2.0 / x * jlp(l, x)


print('=== 1. temperature radial identity ===')
for l in (2, 3, 5, 10):
    for x in (0.7, 3.0, 12.0):
        ph = np.exp(-1j * x * mu)
        T = (1.0 - mu ** 2)[:, None] * np.cos(2.0 * phi)[None, :] * ph[:, None]
        aT = project(T, 0, l, 2)
        pref = factorial(l + 2) / factorial(l - 2)
        # predicted: pi * N_l2 * J_l with J_l = 2 eps (-i)^l (l+2)!/(l-2)! j/x^2
        Nl2 = np.sqrt((2 * l + 1) / (4 * np.pi) / pref)
        pred_mag = np.pi * Nl2 * 2 * pref * abs(jl(l, x)) / x ** 2
        phase = aT / (np.pi * Nl2 * 2 * pref * jl(l, x) / x ** 2)
        print(f'l={l} x={x}: |num|/|pred|={abs(aT)/pred_mag:.6f} phase={phase:.4f}')

print('=== 2. scalar control: pure E ===')
for l in (2, 5):
    for x in (3.0,):
        ph = np.exp(-1j * x * mu)
        Q = (1.0 - mu ** 2)[:, None] * np.ones(NPH)[None, :] * ph[:, None]
        U = np.zeros_like(Q)
        a2 = project(Q + 1j * U, 2, l, 0)
        am2 = project(Q - 1j * U, -2, l, 0)
        aE = -(a2 + am2) / 2.0
        aB = 1j * (a2 - am2) / 2.0
        print(f'l={l} x={x}: |aE|={abs(aE):.4e} |aB|={abs(aB):.4e} (B must be ~0)')

print('=== 3. tensor E/B kernels, both U signs ===')
for sU in (+1.0, -1.0):
    print(f'--- s_U = {sU:+.0f}')
    for l in (2, 3, 5, 10):
        for x in (0.7, 3.0, 12.0):
            ph = np.exp(-1j * x * mu)
            Q = (1.0 + mu ** 2)[:, None] * np.cos(2.0 * phi)[None, :] * ph[:, None]
            U = sU * 2.0 * mu[:, None] * np.sin(2.0 * phi)[None, :] * ph[:, None]
            a2 = project(Q + 1j * U, 2, l, 2)
            am2 = project(Q - 1j * U, -2, l, 2)
            aE = -(a2 + am2) / 2.0
            aB = 1j * (a2 - am2) / 2.0
            KE = (-jl(l, x) + jlpp(l, x) + 2.0 * jl(l, x) / x ** 2 + 4.0 * jlp(l, x) / x)
            KB = (2.0 * jlp(l, x) + 4.0 * jl(l, x) / x)
            rE = aE / KE
            rB = aB / KB
            print(f'  l={l:2d} x={x:5.1f}: aE/KE={rE:.5f}  aB/KB={rB:.5f}')
