"""Toggle the production-only projection machinery against the archived
CLASS z=0 pk table: which mechanism carries the smooth high-k excess
(+1.7% @ k=0.5 -> +7.7% @ k=1 h/Mpc, saturating ~+5% on delta_cdm)?

Appends to /tmp/pk_toggles.txt.
"""

import importlib
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
from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import perturbations as P

K_H = np.array([0.1, 0.2, 0.3, 0.5, 1.0, 2.0, 5.0])
gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_z1_tk.dat')
# truth: delta_cdm transfer at z=0 (column 1 = -T_cdm/k^2)
T_CDM = np.interp(np.log(K_H), np.log(gold[:, 0]), gold[:, 1])

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
pp = cosmo.engine._perturbation_params()
h = float(cosmo['h'])

OUT = open('/tmp/pk_toggles.txt', 'a')


def log(s):
    print(s, flush=True)
    OUT.write(s + '\n')
    OUT.flush()


def run(tag, **kw):
    importlib.reload(P)
    for k, v in kw.items():
        setattr(P, k, v)
    t0 = time.time()
    out = P.linear_pk(pp, th, jnp.asarray(K_H), [0.0])
    dc = np.asarray(out['transfers']['delta_cdm'][0])
    ours = -dc / (K_H * h) ** 2
    rel = ours / T_CDM - 1.0
    log(f'--- {tag}  ({time.time()-t0:.0f}s)')
    log('  k:     ' + ' '.join(f'{k:7.2f}' for k in K_H))
    log('  dcdm:  ' + ' '.join(f'{x:+7.4f}' for x in rel))
    return rel


run('baseline')
run('poisson off', POISSON_KAH=1e30)
run('poisson 100', POISSON_KAH=100.0)
run('poisson 400', POISSON_KAH=400.0)
run('tca 500', TCA_TRIGGER=500.0)
OUT.close()
