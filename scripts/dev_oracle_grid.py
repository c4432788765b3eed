"""Run the stiff-BDF oracle over the FULL coarse k-grid, splice its LOS
sources into the production projection, and compare TT/EE vs CLASS.

Separates solver-source error from projection error at every k: if the
oracle-sourced TT matches CLASS, the production solver is the culprit and
the per-(k, tau) source differences localize the defect.

Saves incremental results to /tmp/oracle_grid.npz (resumable).
"""

import os
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

TAU_MAX = 2000.0
OUT = '/tmp/oracle_grid.npz'

cosmo = DESI(engine='native')
th = cosmo.engine.get_section('thermodynamics')._th
p = cosmo.engine._perturbation_params()

lmax = 700
kmax = max(0.12, 2.4 * lmax / 13000.0)
k_c = np.asarray(harmonic.coarse_k_grid(kmax))
print(f'{len(k_c)} coarse k modes', flush=True)

t0 = time.time()
src = compute_los_sources(p, th, jnp.asarray(k_c))
src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
tau_h = np.asarray(src['tau'])
print(f'production sources: {time.time()-t0:.1f}s', flush=True)

sel = tau_h <= TAU_MAX
tau_o = tau_h[sel]
n_sel = int(sel.sum())

names = ['mono', 'dopp', 'PI', 'isw', 'weyl']
if os.path.exists(OUT):
    with np.load(OUT) as f:
        osrc = f['osrc']
        done = f['done']
    assert osrc.shape == (len(k_c), 5, n_sel)
else:
    osrc = np.zeros((len(k_c), 5, n_sel))
    done = np.zeros(len(k_c), dtype=bool)

for i, kk in enumerate(k_c):
    if done[i]:
        continue
    t0 = time.time()
    o = run_oracle(p, th, float(kk), tau_o, lmax_g=24, lmax_pol=24, lmax_ur=24,
                   rtol=1e-7, atol=1e-11)
    for j, n in enumerate(names):
        osrc[i, j] = o[n]
    done[i] = True
    if i % 10 == 0 or i == len(k_c) - 1:
        np.savez(OUT, osrc=osrc, done=done, k=k_c, tau=tau_o)
    print(f'k[{i}]={kk:.5f}: {time.time()-t0:.1f}s', flush=True)
np.savez(OUT, osrc=osrc, done=done, k=k_c, tau=tau_o)

# ---- splice oracle sources into the production src and project
src_mix = dict(src)
s = np.asarray(src['src']).copy()
s_prod = s.copy()
s[:, :, sel] = osrc
src_mix['src'] = jnp.asarray(s)

ells = np.asarray([220, 300, 340, 380, 420, 470, 520, 570, 620, 675], dtype=np.int64)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
fac = ells * (ells + 1.0) / (2 * np.pi)
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / fac / T2
gv_ee = np.interp(ells, gold[:, 0], gold[:, 2]) / fac / T2

out_o = harmonic.project_sources(src_mix, ells, tables)
out_p = harmonic.project_sources(src, ells, tables)
print(f"{'l':>5} {'prod/gold-1':>12} {'oracle/gold-1':>14} | {'ee prod':>9} {'ee oracle':>10}")
for i, l in enumerate(ells):
    print(f'{l:5d} {float(out_p["tt"][i])/gv[i]-1:+12.4f} {float(out_o["tt"][i])/gv[i]-1:+14.4f} | '
          f'{float(out_p["ee"][i])/gv_ee[i]-1:+9.4f} {float(out_o["ee"][i])/gv_ee[i]-1:+10.4f}')

# ---- per-component g-weighted error summary vs k
g = np.asarray(src['g'])[sel]
print('\nper-k g-weighted rms source error (prod vs oracle), and isw plain rms:')
print(f"{'k':>9} " + ' '.join(f'{n:>8}' for n in names))
for i in range(0, len(k_c), 8):
    row = []
    for j, n in enumerate(names):
        w = g if n in ('mono', 'dopp', 'PI') else np.ones_like(g)
        o = osrc[i, j]
        scale = np.sqrt(np.mean((w * o) ** 2))
        row.append(np.sqrt(np.mean((w * (s_prod[i, j][sel] - o)) ** 2)) / scale)
    print(f'{k_c[i]:9.5f} ' + ' '.join(f'{r:8.4f}' for r in row))
