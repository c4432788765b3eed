"""Quadrature-resolution study of the TT trough excess: project the same
sources at several (dk_fine, n_quad_late) settings and compare to CLASS."""

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
ells = np.asarray([150, 220, 300, 360, 416, 470, 540, 600, 675], dtype=np.int64)

k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))
t0 = time.time()
src = compute_los_sources(p, th, k_c)
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
jax.block_until_ready(src['src'])
print(f'sources: {time.time()-t0:.1f}s', flush=True)

tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

runs = {
    'default': dict(),
    'dk/2': dict(dk_fine=harmonic.DK_FINE / 2),
    'dk/4': dict(dk_fine=harmonic.DK_FINE / 4),
    'tau x2': dict(n_quad_late=2 * harmonic.N_QUAD_LATE),
    'dk/2+tau x2': dict(dk_fine=harmonic.DK_FINE / 2, n_quad_late=2 * harmonic.N_QUAD_LATE),
}
res = {}
for name, kw in runs.items():
    t0 = time.time()
    res[name] = np.asarray(harmonic.project_sources(src, ells, tables, **kw)['tt'])
    print(f'{name}: {time.time()-t0:.1f}s', flush=True)

hdr = f"{'l':>5} " + ' '.join(f'{n:>12}' for n in runs)
print(hdr)
for i, l in enumerate(ells):
    row = ' '.join(f'{res[n][i]/gv[i]-1:+12.4f}' for n in runs)
    print(f'{l:5d} {row}')
