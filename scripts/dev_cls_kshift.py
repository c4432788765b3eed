"""Which source modification repairs TT? Resample selected source rows in
k as S(k (1+s)) [scale] or S(k + d) [offset] and re-project. A pure scale
fix implies an rs-like stretch in the monopole; a pure offset fix implies
a missing constant acoustic phase. EE must stay put in all cases."""

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
ells = np.arange(150, 1201, 10)
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

s0 = np.asarray(src['src'])  # (nk, 5, n_h)


def resample(rows, mode, amt):
    """Rows of src resampled at k' = k(1+amt) [scale] or k+amt [offset]."""
    kq = k_c * (1.0 + amt) if mode == 'scale' else k_c + amt
    out = s0.copy()
    for r in rows:
        for it in range(s0.shape[2]):
            out[:, r, it] = np.interp(kq, k_c, s0[:, r, it])
    return out


def tt_of(s):
    src2 = dict(src)
    src2['src'] = jnp.asarray(s)
    return np.asarray(harmonic.project_sources(src2, ells, tables)['tt'])


def rms(tt):
    return np.sqrt(np.mean((tt / gv - 1.0) ** 2))


print(f'default rms: {rms(tt_of(s0)):.4f}', flush=True)
# mono row = 0; dopp = 1; pol = 2; isw = 3
for mode, amts in [('scale', [0.01, 0.022, 0.03]), ('offset', [0.0005, 0.001, 0.0015])]:
    for amt in amts:
        r_m = rms(tt_of(resample([0], mode, amt)))
        r_mi = rms(tt_of(resample([0, 3], mode, amt)))
        r_all = rms(tt_of(resample([0, 1, 2, 3], mode, amt)))
        print(f'{mode} {amt:+.4f}: mono-only rms={r_m:.4f}  mono+isw={r_mi:.4f}  all={r_all:.4f}', flush=True)
