"""Which tau range drives the TT excess? Kill source rows beyond tau cuts
(and the isw row separately) and re-project. If the ell>300 excess
collapses when tau>2000 sources are removed, the late-time (reionization
era) sources - never verified by the stiff oracle - are the defect."""

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
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources

cosmo = DESI(engine='native')
th = cosmo.engine.get_section('thermodynamics')._th
p = cosmo.engine._perturbation_params()

lmax = 1250
kmax = max(0.12, 2.4 * lmax / 13000.0)
ells = np.asarray([190, 220, 270, 340, 410, 470, 540, 610, 674, 750, 813,
                   880, 950, 1016, 1080, 1129, 1190], dtype=np.int64)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)
k_c = np.asarray(harmonic.coarse_k_grid(kmax))
t0 = time.time()
src = compute_los_sources(p, th, jnp.asarray(k_c))
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
print(f'sources: {time.time()-t0:.1f}s', flush=True)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
fac = ells * (ells + 1.0) / (2 * np.pi)
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / fac / T2
gv_te = np.interp(ells, gold[:, 0], gold[:, 4]) / fac / T2

tau_h = np.asarray(src['tau'])
s0 = np.asarray(src['src'])

def run(tau_cut=None, rows=(0, 1, 2, 3), t_parts=(1., 1., 1., 1.)):
    s = s0.copy()
    if tau_cut is not None:
        mask = tau_h > tau_cut
        for r in rows:
            s[:, r, mask] = 0.0
    sv = dict(src)
    sv['src'] = jnp.asarray(s)
    out = harmonic.project_sources(sv, ells, tables, t_parts=t_parts)
    return np.asarray(out['tt']), np.asarray(out['te'])

tt0, te0 = run()
variants = {
    'cut800_all': run(tau_cut=800.0),
    'cut2000_all': run(tau_cut=2000.0),
    'cut2000_dopp': run(tau_cut=2000.0, rows=(1,)),
    'cut2000_isw': run(tau_cut=2000.0, rows=(3,)),
    'noisw': run(t_parts=(1., 1., 1., 0.)),
}
print(f"{'l':>5} {'base/gold':>10} " + ' '.join(f'{n:>13}' for n in variants))
for i, l in enumerate(ells):
    print(f'{l:5d} {tt0[i]/gv[i]-1:+10.4f} '
          + ' '.join(f'{variants[n][0][i]/gv[i]-1:+13.4f}' for n in variants), flush=True)
print('\nTE  (D_l muK^2): gold, base, cut2000_all, cut2000_dopp')
for i, l in enumerate(ells):
    c = fac[i] * T2
    print(f'{l:5d} {gv_te[i]*c:+9.2f} {te0[i]*c:+9.2f} '
          f'{variants["cut2000_all"][1][i]*c:+9.2f} {variants["cut2000_dopp"][1][i]*c:+9.2f}')
