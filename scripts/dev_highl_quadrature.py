"""Convergence of the high-lmax Cl tail vs fine-k spacing and late-time
tau-quadrature density (the measurement behind the lmax-scaled
n_quad_late in harmonic.compute_cls: at lmax 5000 the 1152-node
geometric grid left a +15..110%% TT aliasing floor at l >= 4000;
4096 nodes is converged - identical to 6144).
"""

import sys, time, jax
jax.config.update('jax_platforms', 'cpu'); jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import numpy as np, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import harmonic, bessel
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()
lmax = 5000
kmax = max(0.12, 2.4 * lmax / 13000.0)
ells = np.asarray([2500, 3000, 3500, 4000, 4500, 5000])
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))
src = compute_los_sources(p, th, k_c)
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot']); src['K'] = 0.0
gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gl = gold[:, 0].astype(int)
gv = {n: np.interp(ells, gl, gold[:, c]) / (ells*(ells+1.0)/(2*np.pi)) / T2
      for n, c in [('tt',1), ('ee',2)]}
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)
for dkf, nq in [(1.1e-4, 1152), (1.1e-4, 2304), (1.1e-4, 4096), (1.1e-4, 6144)]:
    t0 = time.time()
    raw = harmonic.project_sources(src, ells, tables, dk_fine=dkf, n_quad_late=nq)
    msg = ' '.join(f'{l}:{float(raw["tt"][i])/gv["tt"][i]-1:+.3f}/{float(raw["ee"][i])/gv["ee"][i]-1:+.3f}'
                   for i, l in enumerate(ells))
    print(f'dk={dkf:.1e} nq={nq}: {msg} ({time.time()-t0:.0f}s)', flush=True)
