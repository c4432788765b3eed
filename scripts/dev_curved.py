"""Dev harness: curved-geometry native P(k) sanity checks.

1. Flat continuity: Omega_k = 1e-9 reproduces the flat solve.
2. Open/closed growth: P(k, z=1)/P(k, z=0) at sub-horizon k matches the
   background growth-factor ODE (independent route: Magnus propagators on
   Omega_m/Omega_k/Omega_de, cosmology.py _growth_tables).
3. Poisson consistency at z=0 (internal, exercised by the pinned phi).
"""

import sys
import time

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np

sys.path.insert(0, '/root/repo')

from cosmoprimo_tpu import Cosmology
from cosmoprimo_tpu.fiducial import DESI

kw = dict(engine='native', kmax_pk=0.6, extra_params={'nk_pk': 48})
k = np.geomspace(1e-3, 0.5, 24)

t0 = time.time()
flat = DESI(**kw)
pk_flat = np.asarray(flat.get_fourier().pk_interpolator()(k, z=0.0))
print(f'flat P(k): {time.time()-t0:.1f}s')

eps = DESI(Omega_k=1e-9, **kw)
pk_eps = np.asarray(eps.get_fourier().pk_interpolator()(k, z=0.0))
rel = np.abs(pk_eps / pk_flat - 1.0)
print(f'continuity |Omega_k|=1e-9: max rel = {rel.max():.2e}')

for ok in (0.05, -0.05, 0.1):
    t0 = time.time()
    cur = DESI(Omega_k=ok, **kw)
    fo = cur.get_fourier()
    pk0 = np.asarray(fo.pk_interpolator()(k, z=0.0))
    pk1 = np.asarray(fo.pk_interpolator()(k, z=1.0))
    ba = cur.get_background()
    D = np.asarray(ba.growth_factor(1.0))
    ksub = (k > 0.05) & (k < 0.3)
    ratio = np.sqrt(pk1 / pk0)[ksub]
    print(f'Omega_k={ok:+.2f}: solver D(z=1) = {ratio.mean():.5f} +- {ratio.std():.1e}, '
          f'background ODE D = {float(D):.5f}, rel = {ratio.mean()/float(D)-1.0:+.2e} '
          f'({time.time()-t0:.1f}s)')
    s8 = float(fo.sigma8_m)
    print(f'  sigma8 = {s8:.5f} (flat {float(flat.get_fourier().sigma8_m):.5f})')
