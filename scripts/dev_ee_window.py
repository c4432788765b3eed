"""Where does the EE l ~ 20-40 excess come from? Split the E source by tau
window (recombination tau < 2000 vs reionization tau > 2000) and compare
each piece + the total against the archived CLASS golden."""

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
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

kmax = 0.12
ells = np.asarray(sorted(set(list(range(4, 80, 4)) + [90, 110, 140])), dtype=np.int64)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))
t0 = time.time()
src = compute_los_sources(p, th, k_c)
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
src['K'] = 0.0
print(f'sources: {time.time() - t0:.1f}s', flush=True)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv_ee = np.interp(ells, gold[:, 0], gold[:, 2]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

tau_h = np.asarray(src['tau'])
s_full = np.asarray(src['src'])

results = {}
for name, mask in [('full', None),
                   ('rec (tau<2000)', tau_h < 2000.0),
                   ('reio (tau>2000)', tau_h >= 2000.0)]:
    s = s_full.copy()
    if mask is not None:
        s[:, 2, :] = np.where(mask[None, :], s[:, 2, :], 0.0)  # pol row only
    src2 = dict(src)
    src2['src'] = jnp.asarray(s)
    raw = harmonic.project_sources(src2, ells, tables)
    results[name] = np.asarray(raw['ee'])
    print(f'{name}: done at {time.time() - t0:.1f}s', flush=True)

print(f'{"l":>5s} {"gold":>11s} {"full":>11s} {"rel":>8s} {"rec":>11s} {"reio":>11s} {"rec+reio/full":>8s}')
for i, l in enumerate(ells):
    f, r, o = results['full'][i], results['rec (tau<2000)'][i], results['reio (tau>2000)'][i]
    print(f'{l:5d} {gv_ee[i]:11.4e} {f:11.4e} {f / gv_ee[i] - 1:+8.1%} {r:11.4e} {o:11.4e}')
