"""High-k transfer discriminator: stiff-BDF full-hierarchy oracle vs
production vs CLASS at z=49 for k where production shows a smooth excess.

oracle == production != CLASS  -> shared assumption (ICs/background/thermo)
oracle == CLASS               -> production integration defect
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

BASE = '/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_'

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
pp = cosmo.engine._perturbation_params()
h = float(cosmo['h'])

Z = 49.0
tabs = P.build_tables(pp, th)
eta_z = float(np.exp(np.interp(-np.log1p(Z), np.asarray(tabs['lna']), np.asarray(tabs['lneta']))))
print(f'eta(z=49) = {eta_z:.2f} Mpc', flush=True)

K_H = np.array([0.1, 0.3, 0.5, 1.0, 2.0])
kMpc = K_H * h

# production at these k
out = P.linear_pk(pp, th, jnp.asarray(K_H), [Z])
tr = {k: np.asarray(v) for k, v in out['transfers'].items()}
prod_dc = -tr['delta_cdm'][0] / kMpc ** 2
prod_db = -tr['delta_b'][0] / kMpc ** 2

g = np.loadtxt(BASE + 'z5_tk.dat')
gold_dc = np.interp(np.log(K_H), np.log(g[:, 0]), g[:, 1])
gold_db = np.interp(np.log(K_H), np.log(g[:, 0]), g[:, 2])

print(f"{'k_h':>6} {'prod/CLASS-1':>13} {'oracle/CLASS-1':>15} {'oracle/prod-1':>14}  (cdm | b)")
for i, kk in enumerate(kMpc):
    t0 = time.time()
    o = run_oracle(pp, th, float(kk), np.array([eta_z]), lmax_g=24, lmax_pol=24,
                   lmax_ur=24, rtol=1e-8, atol=1e-12)
    # oracle dc is Newtonian-gauge delta_cdm; convert to the CDM-comoving
    # (synchronous) value exactly as the production harvest does:
    # delta^syn = delta^N + 3 aH (1+w) theta_c / k^2
    lna_z = -np.log1p(Z)
    Hc = np.interp(lna_z, np.asarray(tabs['lna']),
                   np.asarray(tabs['stack'][list(P._STACK_NAMES).index('Hc')])
                   if 'stack' in tabs and hasattr(P, '_STACK_NAMES') else np.nan)
    o_dc = float(o['dc'][0]) + 3.0 * 0.0  # theta_c correction applied below
    o_db = float(o['db'][0])
    tc = float(o['tc'][0])
    tb = float(o['tb'][0])
    # conformal Hubble at z
    from cosmoprimo_tpu.boltzmann.perturbations import _fetch
    c = _fetch(tabs, jnp.asarray([eta_z]))
    Hc = float(np.asarray(c['Hc'])[0])
    o_dc_syn = o_dc + 3.0 * Hc * tc / kk ** 2
    o_db_syn = o_db + 3.0 * Hc * tc / kk ** 2
    odc = -o_dc_syn / kk ** 2
    odb = -o_db_syn / kk ** 2
    print(f'{K_H[i]:6.2f} {prod_dc[i]/gold_dc[i]-1:+8.4f} {prod_db[i]/gold_db[i]-1:+8.4f} | '
          f'{odc/gold_dc[i]-1:+8.4f} {odb/gold_db[i]-1:+8.4f} | '
          f'{odc/prod_dc[i]-1:+8.4f} {odb/prod_db[i]-1:+8.4f}   ({time.time()-t0:.0f}s)', flush=True)
