"""Early-time high-k discriminator: production vs stiff-BDF oracle at
k = 0.5/1.0 Mpc^-1 for eta where k*eta <= 60 (oracle hierarchy valid).

Agreement (<0.3%) -> the +4% transfer excess develops LATER (RSA/poisson
regime or shared late physics). Disagreement -> TCA/ETD/entry machinery.
"""

import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')
from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import perturbations as P
from boltzmann_oracle import run_oracle

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
pp = cosmo.engine._perturbation_params()

tabs = P.build_tables(pp, th)

for kk in [0.5, 1.0, 2.0]:
    etas = np.array([10.0, 20.0, 35.0, 50.0]) / kk * 1.0  # k*eta = 10..50
    # production: harvest phi, delta_c, delta_g, theta_g at these etas via
    # compute_los_sources-like tap — easier: use integrate path? linear_pk
    # only outputs at z. Instead run the rk4 scan directly with an emit.
    k = jnp.asarray([kk])
    eta_A, eta_B, eta_ini = P.build_time_grids(tabs, k)
    y0 = P.adiabatic_ics(tabs, k, eta_ini)
    dummy = jnp.full((1,), tabs['eta0'] * 2.0)
    am = tabs['am']

    def projectA(y_start, y_end, kk_, d, e1, cm, c1):
        y_end = P._drag_etd(y_start, y_end, kk_, d, cm, c1)
        y_end = P._tca_project(y_end, kk_, c1)
        y_end = P._poisson_project(y_end, kk_, e1, c1, am)
        return P._ur_rsa_project(y_end, kk_, e1, c1, am)

    def emit(y, e1, c1):
        return jnp.stack([y[P._I_PHI], y[P._I_DC], y[P._I_DG], y[P._I_TG], y[P._I_DB]])

    yA, _, srcA = P._rk4_scan(P.deriv_full, y0, eta_A, dummy, tabs, k, am,
                              project=projectA, emit=emit)
    # srcA: (n_steps, 5, nk); eta_A: (nk, n_steps+1)
    eAs = np.asarray(eta_A[0, 1:])
    prod = np.asarray(srcA[:, :, 0])  # (n_steps, 5)

    t0 = time.time()
    o = run_oracle(pp, th, kk, etas, lmax_g=60, lmax_pol=40, lmax_ur=60,
                   rtol=1e-9, atol=1e-13)
    print(f'k={kk} oracle {time.time()-t0:.0f}s; production n_steps to keta=50: '
          f'{np.searchsorted(eAs, etas[-1])}', flush=True)
    print(f"{'k*eta':>6} {'phi rel':>9} {'dc rel':>9} {'dg rel':>9} {'tg rel':>9} {'db rel':>9}")
    for i, e in enumerate(etas):
        j = np.searchsorted(eAs, e)
        # linear interp production between steps j-1, j
        w = (e - eAs[j - 1]) / (eAs[j] - eAs[j - 1])
        pv = prod[j - 1] * (1 - w) + prod[j] * w
        ov = np.array([o['phi'][i], o['dc'][i], o['dg'][i], o['tg'][i], o['db'][i]])
        rel = pv / ov - 1.0
        print(f'{kk*e:6.1f} ' + ' '.join(f'{x:+9.5f}' for x in rel), flush=True)
