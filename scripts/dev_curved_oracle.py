"""Curved transfers: production solver vs the independent stiff-BDF oracle
(now carrying the exact curved constraints). Measures delta_cdm/delta_b
parity at z = 0 for open and closed models."""

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

K_H = np.array([0.01, 0.05, 0.2, 0.5])

for omk in (0.05, -0.05):
    cosmo = DESI(engine='native', Omega_k=omk)
    th = cosmo.get_thermodynamics().table
    pp = cosmo.engine._perturbation_params()
    h = float(cosmo['h'])
    kMpc = K_H * h
    tabs = P.build_tables(pp, th)
    print('Omega_k =', omk, ' K =', float(np.asarray(tabs['K'])), '1/Mpc^2')
    eta0 = float(np.exp(np.interp(0.0, np.asarray(tabs['lna']), np.asarray(tabs['lneta']))))
    out = P.linear_pk(pp, th, jnp.asarray(K_H), [0.0])
    tr = {k: np.asarray(v) for k, v in out['transfers'].items()}
    from cosmoprimo_tpu.boltzmann.perturbations import _fetch
    c0 = _fetch(tabs, jnp.asarray([eta0]))
    Hc0 = float(np.asarray(c0['Hc'])[0])
    for i, kk in enumerate(kMpc):
        t0 = time.time()
        o = run_oracle(pp, th, float(kk), np.array([eta0 * (1 - 1e-9)]),
                       lmax_g=24, lmax_pol=24, lmax_ur=24, rtol=1e-8, atol=1e-12)
        tc = float(o['tc'][0])
        o_dc = float(o['dc'][0]) + 3.0 * Hc0 * tc / kk ** 2
        o_db = float(o['db'][0]) + 3.0 * Hc0 * tc / kk ** 2
        p_dc = tr['delta_cdm'][0, i]
        p_db = tr['delta_b'][0, i]
        print(f'  k={K_H[i]:5.2f} h/Mpc  prod/oracle-1: cdm {p_dc/o_dc-1:+.4f}  b {p_db/o_db-1:+.4f}'
              f'   ({time.time()-t0:.0f}s)')
