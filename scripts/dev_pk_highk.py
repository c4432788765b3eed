"""Localize the smooth high-k P(k) excess: per-species transfer errors vs
the archived CLASS tk tables at z = 0, 1, 49, and the cb-vs-m split."""

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
from cosmoprimo_tpu.boltzmann.perturbations import linear_pk

BASE = '/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_'
K_H = np.array([0.01, 0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 1.0, 2.0, 5.0])

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
pp = cosmo.engine._perturbation_params()
h = float(cosmo['h'])

t0 = time.time()
out = linear_pk(pp, th, jnp.asarray(K_H), [0.0, 1.0, 49.0])
tr = {k: np.asarray(v) for k, v in out['transfers'].items()}
print(f'solve: {time.time()-t0:.0f}s', flush=True)

cols = {'cdm': 1, 'b': 2, 'g': 3, 'ur': 4, 'ncdm': 5, 'm': 6}
for zi, fn in [(0, 'z1_tk.dat'), (1, 'z2_tk.dat'), (2, 'z5_tk.dat')]:
    g = np.loadtxt(BASE + fn)
    print(f'--- z index {zi} ({fn}): rel err of -T_i/k^2 vs CLASS')
    print('  k:     ' + ' '.join(f'{k:7.2f}' for k in K_H))
    for name, c in cols.items():
        gold = np.interp(np.log(K_H), np.log(g[:, 0]), g[:, c])
        key = 'delta_m' if name == 'm' else 'delta_' + name
        if key not in tr:
            continue
        ours = -tr[key][zi] / (K_H * h) ** 2
        rel = ours / gold - 1.0
        print(f'  {name:>5}: ' + ' '.join(f'{x:+7.4f}' for x in rel), flush=True)

# cb vs m pk errors at z=0
g0 = np.loadtxt(BASE + 'z1_pk.dat')
g0cb = np.loadtxt(BASE + 'z1_pk_cb.dat')
pk_m = np.asarray(out['pk_m'])[0]
pk_cb = np.asarray(out['pk_cb'])[0]
gm = np.exp(np.interp(np.log(K_H), np.log(g0[:, 0]), np.log(g0[:, 1])))
gcb = np.exp(np.interp(np.log(K_H), np.log(g0cb[:, 0]), np.log(g0cb[:, 1])))
print('--- P(k) rel err z=0:')
print('   m:  ' + ' '.join(f'{x:+7.4f}' for x in pk_m / gm - 1.0))
print('  cb:  ' + ' '.join(f'{x:+7.4f}' for x in pk_cb / gcb - 1.0))
