"""Decompose the native TT spectrum into source components around the
first trough, where the spectrum shows a +12% excess vs CLASS."""

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

lmax = 700
kmax = max(0.12, 2.4 * lmax / 13000.0)
ells = np.asarray([150, 220, 300, 340, 380, 420, 470, 520, 570, 620, 675], dtype=np.int64)

k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))
t0 = time.time()
src = compute_los_sources(p, th, k_c)
src['P_R'] = p['A_s'] * (jnp.asarray(harmonic.fine_k_grid(kmax)) / p['k_pivot']) ** (p['n_s'] - 1.0)
jax.block_until_ready(src['src'])
print(f'sources: {time.time()-t0:.1f}s')

tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

runs = {
    'all': (1.0, 1.0, 1.0, 1.0),
    'mono': (1.0, 0.0, 0.0, 0.0),
    'dopp': (0.0, 1.0, 0.0, 0.0),
    'isw': (0.0, 0.0, 0.0, 1.0),
    'pol': (0.0, 0.0, 1.0, 0.0),
    'mono+dopp': (1.0, 1.0, 0.0, 0.0),
}
res = {}
for name, wts in runs.items():
    t0 = time.time()
    res[name] = np.asarray(harmonic.project_sources(src, ells, tables, t_parts=wts)['tt'])
    print(f'{name}: {time.time()-t0:.1f}s')

print(f"{'l':>5} {'class':>11} {'all':>11} {'rel':>8} | " + ' '.join(f'{n:>10}' for n in runs if n != 'all'))
for i, l in enumerate(ells):
    row = ' '.join(f'{res[n][i]/res["all"][i]:10.4f}' for n in runs if n != 'all')
    print(f'{l:5d} {gv[i]:11.4e} {res["all"][i]:11.4e} {res["all"][i]/gv[i]-1:+8.4f} | {row}')
