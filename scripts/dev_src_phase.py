"""Measure the acoustic phase of the LOS monopole source in k at tau*,
and compare the implied sound horizon with CLASS's rs*(z=1089)."""

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
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources, build_tables

cosmo = DESI(engine='native')
th = cosmo.engine.get_section('thermodynamics')._th
p = cosmo.engine._perturbation_params()

# --- check R = 3 rho_b / 4 rho_g against the CLASS background columns
tabs = build_tables(p, th)
gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_background.dat')
zg = gold[:, 0]
lnag = np.log(1.0 / (1.0 + zg))
rho_g, rho_b = gold[:, 8], gold[:, 9]
lna = np.asarray(tabs['lna'])
fb = np.exp(np.interp(lna, lna, np.log(np.asarray(tabs['fb']))))
fg = np.asarray(tabs['fg'])
for z in [5000.0, 2000.0, 1090.0, 800.0]:
    x = np.log(1.0 / (1.0 + z))
    R_o = 0.75 * np.interp(x, lna, np.asarray(tabs['fb'])) / np.interp(x, lna, fg)
    R_g = 0.75 * np.interp(x, lnag, rho_b) / np.interp(x, lnag, rho_g)
    print(f'z={z:7.0f}  R ours={R_o:.6f}  CLASS={R_g:.6f}  rel={(R_o/R_g-1):+.5f}')

# --- dense-k monopole source at the visibility peak
k = jnp.asarray(np.linspace(0.02, 0.30, 1401))
t0 = time.time()
src = compute_los_sources(p, th, k)
print(f'sources on {len(k)} k: {time.time()-t0:.1f}s', flush=True)
tau = np.asarray(src['tau'])
g = np.asarray(src['g'][0] if np.asarray(src['g']).ndim > 1 else src['g'])
i_star = int(np.argmax(g))
tau_star = tau[i_star]
print(f'tau(vis max) = {tau_star:.3f}  tau_star attr = {float(src["tau_star"]):.3f}')

mono = np.asarray(src['src'][:, 0, i_star])
kk = np.asarray(k)

# extrema of mono(k): quadratic fit around sign changes of derivative
d = np.diff(mono)
ext = np.where(d[:-1] * d[1:] < 0)[0] + 1
kext = []
for i in ext:
    c = np.polyfit(kk[i-3:i+4], mono[i-3:i+4], 2)
    kext.append(-c[1] / (2 * c[0]))
kext = np.array(kext)
dk = np.diff(kext)
print('extrema k:', np.array2string(kext, precision=5))
print('spacing  :', np.array2string(dk, precision=5))
# mean spacing = pi / rs_eff  (extrema of cos(k rs) every pi/rs)
rs_eff = np.pi / dk.mean()
print(f'rs_eff from source phase = {rs_eff:.3f} Mpc')

# CLASS rs at tau*: interpolate comov.snd.hrz. at the same z
etag = gold[:, 2]
rsg = gold[:, 7]
z_star = 1.0 / np.interp(np.log(tau_star), np.log(etag[::-1]), np.exp(lnag)[::-1]) - 1.0
rs_g = np.interp(np.log(tau_star), np.log(etag[::-1]), rsg[::-1])
print(f'z(tau*)={z_star:.1f}  CLASS rs(tau*)={rs_g:.3f} Mpc  ratio rs_eff/rs_CLASS={rs_eff/rs_g:.5f}')
