"""Brute-force C_l oracle: pure scipy/numpy projection of the production
LOS sources — exact spherical Bessel (no tables), scipy CubicSpline in k
and tau, dense uniform late-time tau grid. Fully independent of
harmonic.project_sources' numerics.

Outcome logic at a trough ell (production TT ~ +12% vs CLASS):
  brute == production  -> projection exonerated; the SOURCES (shared with
                          the stiff-BDF oracle by formula/thermo) are wrong.
  brute == CLASS       -> projection numerics convicted.
"""

import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np
import jax.numpy as jnp
from scipy.interpolate import CubicSpline
from scipy.special import spherical_jn

sys.path.insert(0, '/root/repo')
from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import harmonic, bessel
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources

cosmo = DESI(engine='native')
th = cosmo.engine.get_section('thermodynamics')._th
p = cosmo.engine._perturbation_params()

ELLS = np.asarray([220, 340, 420, 540, 680, 810], dtype=np.int64)
lmax = 900
kmax = max(0.12, 2.4 * lmax / 13000.0)
k_c = np.asarray(harmonic.coarse_k_grid(kmax))
t0 = time.time()
src = compute_los_sources(p, th, jnp.asarray(k_c))
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
print(f'sources: {time.time()-t0:.1f}s', flush=True)

tau_h = np.asarray(src['tau'])
eta0 = float(src['eta0'])
g = np.asarray(src['g'])
emk = np.asarray(src['emk'])
s = np.asarray(src['src'])  # (nk, 5, n_h): mono, dopp, pol, isw, weyl

# physical source rows on the harvest grid, per k
ST0 = g[None, :] * s[:, 0, :] + emk[None, :] * s[:, 3, :]
ST1 = g[None, :] * s[:, 1, :]
ST2 = 0.75 * g[None, :] * s[:, 2, :]

# --- independent tau grid: harvest nodes through z>=500, then uniform 4 Mpc
n_rec = harmonic.N_REC
tau_dense = np.concatenate([tau_h[:n_rec],
                            np.arange(tau_h[n_rec], eta0 - 1e-3, 4.0)])
w_tau = np.zeros_like(tau_dense)
dt = np.diff(tau_dense)
w_tau[0] = dt[0] / 2
w_tau[-1] = dt[-1] / 2
w_tau[1:-1] = (dt[1:] + dt[:-1]) / 2

# cubic-spline resample of each source row in tau (vs production's linear)
def resample_tau(A):
    return CubicSpline(tau_h, A, axis=1)(tau_dense)

ST0d, ST1d, ST2d = map(resample_tau, (ST0, ST1, ST2))
chi = eta0 - tau_dense

# --- independent fine k grid
k_f = np.concatenate([np.geomspace(k_c[0], 0.012, 140, endpoint=False),
                      np.arange(0.012, kmax, 1.0e-4)])
w_k = np.zeros_like(k_f)
dk = np.diff(k_f)
w_k[0] = dk[0] / 2
w_k[-1] = dk[-1] / 2
w_k[1:-1] = (dk[1:] + dk[:-1]) / 2
ns, As, kp = p['n_s'], p['A_s'], p['k_pivot']
P_R = As * (k_f / kp) ** (ns - 1.0)
pr = w_k / k_f * 4.0 * np.pi * P_R

ST0f = CubicSpline(k_c, ST0d, axis=0)(k_f)
ST1f = CubicSpline(k_c, ST1d, axis=0)(k_f)
ST2f = CubicSpline(k_c, ST2d, axis=0)(k_f)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
fac = ELLS * (ELLS + 1.0) / (2 * np.pi)
gv = np.interp(ELLS, gold[:, 0], gold[:, 1]) / fac / T2

# production projection at the same ells (table path)
tables = bessel.bessel_tables(ELLS, float(kmax) * 1.05 * 16000.0)
prod = np.asarray(harmonic.project_sources(src, ELLS, tables)['tt'])

print(f"{'l':>5} {'prod/gold-1':>12} {'brute/gold-1':>13} {'brute/prod-1':>13}", flush=True)
for i, ell in enumerate(ELLS):
    t0 = time.time()
    cl = 0.0
    # process in k blocks to bound memory
    blk = 256
    dT = np.zeros(len(k_f))
    for a in range(0, len(k_f), blk):
        b = min(a + blk, len(k_f))
        x = k_f[a:b, None] * chi[None, :]
        jl = spherical_jn(int(ell), x)
        jlp = spherical_jn(int(ell), x, derivative=True)
        xs = np.maximum(x, 1e-8)
        jlpp = (ell * (ell + 1.0) / xs ** 2 - 1.0) * jl - 2.0 / xs * jlp
        integ = ST0f[a:b] * jl + ST1f[a:b] * jlp + ST2f[a:b] * jlpp
        dT[a:b] = integ @ w_tau
    cl = pr @ (dT * dT)
    print(f'{ell:5d} {prod[i]/gv[i]-1:+12.4f} {cl/gv[i]-1:+13.4f} {cl/prod[i]-1:+13.4f}'
          f'   ({time.time()-t0:.0f}s)', flush=True)
