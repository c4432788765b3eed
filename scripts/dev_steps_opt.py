"""Post-pin step-count optimization: the Poisson pin removed the phi-ODE
pump; how low can N_STEPS_A/B and M_TAB go while holding the CI bars
(transfers 5e-3, pk 8e-3 on 1e-3..0.5 h/Mpc; <= 0.5% to k = 5)?
Appends to /tmp/steps_opt.txt."""
import importlib, sys, time
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import numpy as np, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import perturbations as P

K_H = np.array([1e-3, 0.01, 0.05, 0.1, 0.2, 0.3, 0.5, 1.0, 2.0, 5.0])
B = '/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_'
g = np.loadtxt(B + 'z1_tk.dat')
T_CDM = np.interp(np.log(K_H), np.log(g[:, 0]), g[:, 1])
gp = np.loadtxt(B + 'z1_pk.dat')
PK0 = np.exp(np.interp(np.log(K_H), np.log(gp[:, 0]), np.log(gp[:, 1])))
cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
pp = cosmo.engine._perturbation_params()
h = float(cosmo['h'])
OUT = open('/tmp/steps_opt.txt', 'a')
def log(s):
    print(s, flush=True); OUT.write(s + '\n'); OUT.flush()
for tag, nsa, nsb, mtab in [('base 10240/6144/8192', 10240, 6144, 8192),
                            ('8192/4096/8192', 8192, 4096, 8192),
                            ('6144/3072/4096', 6144, 3072, 4096),
                            ('4096/2048/4096', 4096, 2048, 4096),
                            ('3072/1536/2048', 3072, 1536, 2048)]:
    importlib.reload(P)
    P.N_STEPS_A, P.N_STEPS_B, P.M_TAB = nsa, nsb, mtab
    t0 = time.time()
    out = P.linear_pk(pp, th, jnp.asarray(K_H), [0.0])
    dc = (-np.asarray(out['transfers']['delta_cdm'][0]) / (K_H * h) ** 2) / T_CDM - 1.0
    pk = np.asarray(out['pk_m'][0]) / PK0 - 1.0
    log(f'--- {tag}  ({time.time()-t0:.0f}s)')
    log('  dcdm: ' + ' '.join(f'{x:+7.4f}' for x in dc))
    log('  pk:   ' + ' '.join(f'{x:+7.4f}' for x in pk))
OUT.close()
