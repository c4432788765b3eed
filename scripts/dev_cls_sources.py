"""Source-fidelity study of the TT trough excess: vary perturbation-solver
knobs (hierarchy depths, RSA trigger, TCA trigger) and compare TT at the
trough multipoles against CLASS. Knobs are patched via module globals
BEFORE tracing, so each variant recompiles."""

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
from cosmoprimo_tpu.boltzmann import harmonic, bessel
from cosmoprimo_tpu.boltzmann import perturbations as pert

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

lmax = 700
kmax = max(0.12, 2.4 * lmax / 13000.0)
ells = np.asarray([150, 220, 300, 360, 416, 470, 540, 600, 675], dtype=np.int64)
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

BASE = dict(LMAX_G=pert.LMAX_G, LMAX_POL=pert.LMAX_POL, LMAX_UR=pert.LMAX_UR,
            RSA_KETA=pert.RSA_KETA, TCA_TRIGGER=pert.TCA_TRIGGER)


def _relayout():
    """Recompute the state-layout indices after changing hierarchy depths."""
    pert._I_GP = pert._I_FG + (pert.LMAX_G - 1)
    pert._I_UR = pert._I_GP + (pert.LMAX_POL + 1)
    pert._I_NC = pert._I_UR + (pert.LMAX_UR + 1)
    pert.N_STATE = pert._I_NC + pert.NQ_NCDM * (pert.LMAX_NCDM + 1)


def run(name, **kw):
    for k, v in BASE.items():
        setattr(pert, k, v)
    for k, v in kw.items():
        setattr(pert, k, v)
    _relayout()
    t0 = time.time()
    src = pert.compute_los_sources(p, th, k_c)
    src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
    tt = np.asarray(harmonic.project_sources(src, ells, tables)['tt'])
    print(f'{name}: {time.time()-t0:.1f}s', flush=True)
    return tt


variants = {
    'base': dict(),
    'lg19': dict(LMAX_G=19, LMAX_POL=19),
    'rsa90': dict(RSA_KETA=90.0),
    'lg19+rsa90': dict(LMAX_G=19, LMAX_POL=19, RSA_KETA=90.0),
}
if len(sys.argv) > 1:
    variants = {k: variants[k] for k in sys.argv[1:]}

res = {name: run(name, **kw) for name, kw in variants.items()}
print(f"{'l':>5} " + ' '.join(f'{n:>12}' for n in res))
for i, l in enumerate(ells):
    print(f'{l:5d} ' + ' '.join(f'{res[n][i]/gv[i]-1:+12.4f}' for n in res))
