"""Extract the TT quadratic form C_l = sum_ab w_a w_b M_ab(l) over the four
source components (mono, dopp, pol, isw) via 10 projection runs, then
least-squares the component weights against the CLASS gold TT.

If a constant weight vector reproduces CLASS to ~1%, a component is
mis-normalized (the fitted value says which and by how much); if not, the
defect is k- or tau-dependent (phase/damping structure)."""

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
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))
t0 = time.time()
src = compute_los_sources(p, th, k_c)
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
print(f'sources: {time.time()-t0:.1f}s', flush=True)

# one-hot and pairwise runs (order: mono, dopp, pol, isw)
runs = {}
units = [(1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (0, 0, 0, 1)]
for i, u in enumerate(units):
    runs[(i, i)] = np.asarray(harmonic.project_sources(src, ells, tables,
                                                       t_parts=tuple(map(float, u)))['tt'])
    print(f'single {i}: done', flush=True)
for i in range(4):
    for j in range(i + 1, 4):
        u = tuple(float(a + b) for a, b in zip(units[i], units[j]))
        tot = np.asarray(harmonic.project_sources(src, ells, tables, t_parts=u)['tt'])
        runs[(i, j)] = 0.5 * (tot - runs[(i, i)] - runs[(j, j)])
        print(f'pair {i}{j}: done', flush=True)

M = np.zeros((len(ells), 4, 4))
for i in range(4):
    for j in range(4):
        M[:, i, j] = runs[(min(i, j), max(i, j))]

np.savez('/tmp/quadform.npz', M=M, ells=ells)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
fac = ells * (ells + 1.0) / (2 * np.pi)
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / fac / T2


def cl_of(w):
    return np.einsum('a,lab,b->l', w, M, w)


def resid(w):
    return cl_of(w) / gv - 1.0


from scipy.optimize import least_squares
w0 = np.ones(4)
print('default resid: rms', np.sqrt(np.mean(resid(w0) ** 2)))
sol = least_squares(resid, w0)
print('fitted weights [mono, dopp, pol, isw]:', np.array2string(sol.x, precision=4))
print('fitted resid rms:', np.sqrt(np.mean(sol.fun ** 2)), ' max:', np.abs(sol.fun).max())
r = resid(sol.x)
for i in range(0, len(ells), 5):
    print(f'{ells[i]:5d} {resid(w0)[i]:+8.4f} -> {r[i]:+8.4f}')
