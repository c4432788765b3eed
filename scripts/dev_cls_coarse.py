"""Source-grid convergence of the TT trough excess: solve the hierarchy on
a finer COARSE k grid (and denser tau harvest) and re-project."""

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
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources, _los_z_nodes

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

lmax = 700
kmax = max(0.12, 2.4 * lmax / 13000.0)
ells = np.asarray([150, 220, 300, 340, 380, 420, 470, 520, 570, 620, 675], dtype=np.int64)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2
gv_ee = np.interp(ells, gold[:, 0], gold[:, 2]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

runs = {
    'default': dict(dk=harmonic.DK_COARSE, zn=None),
    'dkc/2': dict(dk=harmonic.DK_COARSE / 2, zn=None),
    'zrec x2': dict(dk=harmonic.DK_COARSE, zn=_los_z_nodes(n_rec=1024)),
}
res = {}
for name, kw in runs.items():
    k_c = jnp.asarray(harmonic.coarse_k_grid(kmax, dk=kw['dk']))
    t0 = time.time()
    src = compute_los_sources(p, th, k_c, z_nodes=kw['zn'])
    src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
    out = harmonic.project_sources(src, ells, tables)
    res[name] = {n: np.asarray(out[n]) for n in ('tt', 'ee')}
    print(f'{name} (nk={len(k_c)}): {time.time()-t0:.1f}s', flush=True)

print(f"{'l':>5} " + ' '.join(f'{n:>12}' for n in runs) + '   | ee: ' + ' '.join(f'{n:>9}' for n in runs))
for i, l in enumerate(ells):
    row = ' '.join(f'{res[n]["tt"][i]/gv[i]-1:+12.4f}' for n in runs)
    row2 = ' '.join(f'{res[n]["ee"][i]/gv_ee[i]-1:+9.4f}' for n in runs)
    print(f'{l:5d} {row}   | {row2}')
