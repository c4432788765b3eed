"""Component decomposition of the TT error: project with each source
component toggled, quantifying ISW/Doppler/pol contributions to the
trough excess and apparent peak shift."""

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

lmax = 700
kmax = max(0.12, 2.4 * lmax / 13000.0)
ells = np.asarray([150, 220, 300, 340, 380, 420, 470, 520, 570, 620, 675], dtype=np.int64)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))

t0 = time.time()
src = compute_los_sources(p, th, k_c)
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
print(f'sources: {time.time()-t0:.1f}s', flush=True)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

# t_parts = (mono, dopp, pol, isw)
variants = [
    ('full', (1, 1, 1, 1)),
    ('no_isw', (1, 1, 1, 0)),
    ('isw_only', (0, 0, 0, 1)),
    ('no_dopp', (1, 0, 1, 1)),
    ('mono_only', (1, 0, 0, 0)),
]
res = {}
for name, tp in variants:
    out = harmonic.project_sources(src, ells, tables, t_parts=tuple(float(x) for x in tp))
    res[name] = np.asarray(out['tt'])
    print(f'{name} done', flush=True)

names = [n for n, _ in variants]
print(f"{'l':>5} {'full/gold-1':>12} {'no_isw/gold':>12} {'isw_only/full':>14} {'no_dopp/full':>13} {'mono_only/full':>15}")
for i, l in enumerate(ells):
    print(f'{l:5d} {res["full"][i]/gv[i]-1:+12.4f} {res["no_isw"][i]/gv[i]-1:+12.4f} '
          f'{res["isw_only"][i]/res["full"][i]:14.4f} {res["no_dopp"][i]/res["full"][i]:13.4f} '
          f'{res["mono_only"][i]/res["full"][i]:15.4f}')
