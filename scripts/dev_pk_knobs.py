"""Sweep the native solver's truncation/step knobs against the archived
CLASS z=0/z=1 pk tables: which knob buys high-k accuracy?

Writes incremental results to /tmp/pk_knobs.txt.
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

# archived CLASS truth (pk at z=0 and z=1), on this k grid [h/Mpc]
K_H = np.array([0.01, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.5, 0.7, 1.0])
gold0 = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_z1_pk.dat')
gold1 = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_z2_pk.dat')
PK0 = np.exp(np.interp(np.log(K_H), np.log(gold0[:, 0]), np.log(gold0[:, 1])))
PK1 = np.exp(np.interp(np.log(K_H), np.log(gold1[:, 0]), np.log(gold1[:, 1])))

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
pp = cosmo.engine._perturbation_params()

OUT = open('/tmp/pk_knobs.txt', 'a')


def log(s):
    print(s, flush=True)
    OUT.write(s + '\n')
    OUT.flush()


def reload_with(**kw):
    importlib.reload(P)
    for k, v in kw.items():
        setattr(P, k, v)
    P._I_GP = P._I_FG + (P.LMAX_G - 1)
    P._I_UR = P._I_GP + (P.LMAX_POL + 1)
    P._I_NC = P._I_UR + (P.LMAX_UR + 1)
    P.N_STATE = P._I_NC + P.NQ_NCDM * (P.LMAX_NCDM + 1)
    return P


def run(tag, **kw):
    M = reload_with(**kw)
    t0 = time.time()
    out = M.linear_pk(pp, th, jnp.asarray(K_H), [0.0, 1.0])
    pk = np.asarray(out['pk_m'])
    dt = time.time() - t0
    r0 = pk[0] / PK0 - 1.0
    r1 = pk[1] / PK1 - 1.0
    log(f'--- {tag}  ({dt:.0f}s)')
    log('  k:    ' + ' '.join(f'{k:7.2f}' for k in K_H))
    log('  z=0:  ' + ' '.join(f'{x:+7.4f}' for x in r0))
    log('  z=1:  ' + ' '.join(f'{x:+7.4f}' for x in r1))
    return r0, r1


run('baseline (current knobs)')
run('LMAX_G=POL=17', LMAX_G=17, LMAX_POL=17)
run('LMAX_UR=25', LMAX_UR=25)
run('NQ=7,LNC=10', NQ_NCDM=7, LMAX_NCDM=10)
run('RSA_KETA=90', RSA_KETA=90.0)
run('TCA_TRIGGER=120', TCA_TRIGGER=120.0)
run('ALPHA=0.35', ALPHA_PHASE=0.35)
run('NSTEPS_A=16384', N_STEPS_A=16384)
run('all-up', LMAX_G=17, LMAX_POL=17, LMAX_UR=25, NQ_NCDM=7, LMAX_NCDM=10,
    RSA_KETA=90.0, TCA_TRIGGER=120.0, ALPHA_PHASE=0.35, N_STEPS_A=16384)
OUT.close()
