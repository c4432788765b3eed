"""Isolate 'our physics vs CLASS' for the EE l ~ 12-72 band: replace the
production pol source row by the scipy-BDF oracle's Pi for EVERY coarse-k
lane (k <= 0.012), re-project, and compare both EE curves to the golden.

If EE(oracle-pol) still exceeds the golden, the excess is shared physics
(thermodynamics / source conventions), not the production solver."""

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
sys.path.insert(0, '/root/repo/tests')
from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import harmonic, bessel
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources
from boltzmann_oracle import run_oracle

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

kmax = 0.12
ells = np.asarray(sorted(set(list(range(8, 80, 4)) + [90, 110, 140])), dtype=np.int64)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))
k_np = np.asarray(k_c)

t0 = time.time()
src = compute_los_sources(p, th, k_c)
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
src['K'] = 0.0
tau = np.asarray(src['tau'])
print(f'production sources ({len(k_np)} k): {time.time() - t0:.1f}s', flush=True)

# oracle Pi on the tau<2600 window for every k lane up to 0.012 (the band
# feeding l <~ 100); keep the production row beyond
sel = tau < 2600.0
tau_s = tau[sel]
sub = np.unique(np.linspace(0, len(tau_s) - 1, 160).astype(int))
tau_sub = tau_s[sub]

s_new = np.asarray(src['src']).copy()
n_swap = 0
for i, kk in enumerate(k_np):
    if kk > 0.012:
        break
    orc = run_oracle(p, th, float(kk), tau_sub)
    pi_o = np.interp(tau_s, tau_sub, np.asarray(orc['PI']))
    s_new[i, 2, sel] = pi_o
    n_swap += 1
    if i % 10 == 0:
        print(f'  swapped {i + 1} lanes ({time.time() - t0:.1f}s)', flush=True)
print(f'oracle pol in {n_swap} lanes: {time.time() - t0:.1f}s', flush=True)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv_ee = np.interp(ells, gold[:, 0], gold[:, 2]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

raw_prod = harmonic.project_sources(src, ells, tables)
src2 = dict(src)
src2['src'] = jnp.asarray(s_new)
raw_orc = harmonic.project_sources(src2, ells, tables)

print(f'{"l":>5s} {"prod/gold-1":>12s} {"oraclePi/gold-1":>16s}')
for i, l in enumerate(ells):
    rp = float(raw_prod['ee'][i]) / gv_ee[i] - 1
    ro = float(raw_orc['ee'][i]) / gv_ee[i] - 1
    print(f'{l:5d} {rp:+12.1%} {ro:+16.1%}')
