"""Projection-quadrature convergence: sweep dk_fine and n_quad_late at
fixed sources. If C_l moves, the trough excess/peak shift is quadrature
aliasing in the fine-k integral, not solver physics."""

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

cosmo = DESI(engine='native')
th = cosmo.engine.get_section('thermodynamics')._th
p = cosmo.engine._perturbation_params()

lmax = 700
kmax = max(0.12, 2.4 * lmax / 13000.0)
ells = np.asarray([150, 220, 300, 340, 380, 420, 470, 520, 570, 620, 675], dtype=np.int64)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))

t0 = time.time()
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources
src = compute_los_sources(p, th, k_c)
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
print(f'sources: {time.time()-t0:.1f}s', flush=True)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2
gv_ee = np.interp(ells, gold[:, 0], gold[:, 2]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

variants = [
    ('default', dict()),
    ('dk/2', dict(dk_fine=5.5e-5)),
    ('dk/4', dict(dk_fine=2.75e-5)),
    ('late2x', dict(n_quad_late=2304)),
    ('dk/4+late2x', dict(dk_fine=2.75e-5, n_quad_late=2304)),
]
res = {}
for name, kw in variants:
    t0 = time.time()
    out = harmonic.project_sources(src, ells, tables, **kw)
    res[name] = {n: np.asarray(out[n]) for n in ('tt', 'ee')}
    print(f'{name}: {time.time()-t0:.1f}s', flush=True)

names = [n for n, _ in variants]
print(f"{'l':>5} " + ' '.join(f'{n:>12}' for n in names) + '  |ee ' + ' '.join(f'{n:>9}' for n in names))
for i, l in enumerate(ells):
    row = ' '.join(f'{res[n]["tt"][i]/gv[i]-1:+12.4f}' for n in names)
    row2 = ' '.join(f'{res[n]["ee"][i]/gv_ee[i]-1:+9.4f}' for n in names)
    print(f'{l:5d} {row}  | {row2}')
