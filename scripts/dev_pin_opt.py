"""Optimize POISSON_KAH: full k-grid (1e-3..5 h/Mpc) delta_cdm/delta_b/phi
errors + sigma8 vs archived CLASS. Appends to /tmp/pin_opt.txt."""
import importlib, sys, time
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import numpy as np, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import perturbations as P

K_H = np.array([1e-3, 3e-3, 1e-2, 0.03, 0.1, 0.2, 0.3, 0.5, 1.0, 2.0, 5.0])
B = '/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_'
g = np.loadtxt(B + 'z1_tk.dat')
T_CDM = np.interp(np.log(K_H), np.log(g[:, 0]), g[:, 1])
T_B = np.interp(np.log(K_H), np.log(g[:, 0]), g[:, 2])
gp = np.loadtxt(B + 'z1_pk.dat')
PK0 = np.exp(np.interp(np.log(K_H), np.log(gp[:, 0]), np.log(gp[:, 1])))
cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
pp = cosmo.engine._perturbation_params()
h = float(cosmo['h'])
OUT = open('/tmp/pin_opt.txt', 'a')
def log(s):
    print(s, flush=True); OUT.write(s + '\n'); OUT.flush()
log('  k:     ' + ' '.join(f'{k:7.3f}' for k in K_H))
for pin in [2.0, 3.0, 4.0, 5.0, 8.0]:
    importlib.reload(P)
    P.POISSON_KAH = pin
    t0 = time.time()
    out = P.linear_pk(pp, th, jnp.asarray(K_H), [0.0])
    tr = out['transfers']
    dc = (-np.asarray(tr['delta_cdm'][0]) / (K_H * h) ** 2) / T_CDM - 1.0
    db = (-np.asarray(tr['delta_b'][0]) / (K_H * h) ** 2) / T_B - 1.0
    pk = np.asarray(out['pk_m'][0]) / PK0 - 1.0
    log(f'--- pin {pin}  ({time.time()-t0:.0f}s)')
    log('  dcdm:  ' + ' '.join(f'{x:+7.4f}' for x in dc))
    log('  db:    ' + ' '.join(f'{x:+7.4f}' for x in db))
    log('  pk_m:  ' + ' '.join(f'{x:+7.4f}' for x in pk))
OUT.close()
