"""Round 2 of the excess hunt: earlier Poisson pinning + step-resolution
diagnostics. Appends to /tmp/pk_toggles2.txt."""
import importlib, sys, time
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
T_CDM = np.interp(np.log(K_H), np.log(gold[:, 0]), gold[:, 1])
cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
pp = cosmo.engine._perturbation_params()
h = float(cosmo['h'])
OUT = open('/tmp/pk_toggles2.txt', 'a')
def log(s):
    print(s, flush=True); OUT.write(s + '\n'); OUT.flush()
def run(tag, **kw):
    importlib.reload(P)
    for k, v in kw.items():
        setattr(P, k, v)
    t0 = time.time()
    out = P.linear_pk(pp, th, jnp.asarray(K_H), [0.0])
    dc = np.asarray(out['transfers']['delta_cdm'][0])
    rel = (-dc / (K_H * h) ** 2) / T_CDM - 1.0
    log(f'--- {tag}  ({time.time()-t0:.0f}s)')
    log('  dcdm:  ' + ' '.join(f'{x:+7.4f}' for x in rel))
run('pin 12', POISSON_KAH=12.0)
run('pin 6', POISSON_KAH=6.0)
run('pin 3', POISSON_KAH=3.0)
run('alpha 0.125 x4 steps', ALPHA_PHASE=0.125, N_STEPS_A=40960)
run('kappa_safe 0.15 x2 steps', KAPPA_SAFE=0.15, N_STEPS_A=20480)
run('tca 10 (more ETD)', TCA_TRIGGER=10.0)
OUT.close()
