"""Inspect the C_l k-integrand at trough multipoles: component transfers
Delta_l(k) and the cumulative C_l(<k), to localize the excess power."""

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
from cosmoprimo_tpu.boltzmann.harmonic import (_trapz_weights, _hermite_gather,
                                               fine_k_grid, N_REC, N_QUAD_LATE, DK_FINE)
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources
from cosmoprimo_tpu.ops.spline import cubic_eval, linear_eval, natural_cubic_coeffs

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

kmax = 0.13
ells = np.asarray([220, 380, 470], dtype=np.int64)
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))
src = compute_los_sources(p, th, k_c)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)

# replicate project_sources internals, returning per-k transfers
k_f = jnp.asarray(fine_k_grid(kmax))
tau_h, eta0 = src['tau'], src['eta0']
g, emk = src['g'], src['emk']
tau_rec = tau_h[:N_REC]
tau_late = jnp.geomspace(tau_h[N_REC], eta0 * (1.0 - 1e-9), N_QUAD_LATE + 1)[1:]
tau_q = jnp.concatenate([tau_rec, tau_late])
mono, dopp, pol, isw, weyl = (src['src'][:, i, :] for i in range(5))
ST0 = g * mono + emk * isw
ST0_noisw = g * mono
ST1 = g * dopp
ST2 = 0.75 * g * pol
S = jnp.stack([ST0, ST1, ST2, ST0_noisw], axis=1)
S_q = linear_eval(tau_h, jnp.moveaxis(S, -1, 0), tau_q)
Sk = jnp.moveaxis(S_q, 1, 0)
M = natural_cubic_coeffs(k_c, Sk)
S_f = cubic_eval(k_c, Sk, M, k_f)
ST0f, ST1f, ST2f, ST0nf = (S_f[..., i] for i in range(4))

x_grid, j_tab, jp_tab = tables
dx = float(x_grid[1] - x_grid[0])
j_tab = jnp.asarray(j_tab)
jp_scaled = jnp.asarray(jp_tab) * dx
jp_raw = jnp.asarray(jp_tab)
chi_q = eta0 - tau_q
x = k_f[:, None] * chi_q[None, :]
u = x / dx
w_q = _trapz_weights(tau_q)
xinv2 = (1.0 / jnp.maximum(x, dx)) ** 2

ns, As, kp = p['n_s'], p['A_s'], p['k_pivot']
P_R = As * (k_f / kp) ** (ns - 1.0)
w_k = _trapz_weights(k_f) / k_f
pr = w_k * 4.0 * jnp.pi * P_R

out = {}
for i, ell in enumerate(ells):
    l2 = float(ell) * (ell + 1.0)
    jl = _hermite_gather(j_tab[i], jp_scaled[i], u)
    xn = jnp.maximum(jnp.asarray(x_grid), dx)
    jpp_nodes = (l2 / xn ** 2 - 1.0) * j_tab[i] - (2.0 / xn) * jp_raw[i]
    jlp = _hermite_gather(jp_raw[i], jpp_nodes * dx, u)
    jlpp = (l2 * xinv2 - 1.0) * jl - 2.0 * jnp.sqrt(xinv2) * jlp
    dmono = (ST0nf * jl) @ w_q
    disw = ((ST0f - ST0nf) * jl) @ w_q
    ddopp = (ST1f * jlp) @ w_q
    dpol = (ST2f * jlpp) @ w_q
    out[int(ell)] = dict(mono=np.asarray(dmono), isw=np.asarray(disw),
                         dopp=np.asarray(ddopp), pol=np.asarray(dpol))
    dT = dmono + disw + ddopp + dpol
    ctot = float(pr @ (dT * dT))
    # cumulative in k
    cum = np.cumsum(np.asarray(pr * dT * dT))
    kq = [float(np.interp(f, cum / cum[-1], np.asarray(k_f))) for f in (0.25, 0.5, 0.75, 0.9, 0.99)]
    print(f'l={ell}: C={ctot:.4e}  k-quartiles(25/50/75/90/99%)={np.round(kq, 4)}')
    frac_above = 1.0 - np.interp(0.95 * kmax, np.asarray(k_f), cum / cum[-1])
    print(f'   fraction from k > {0.95*kmax:.3f}: {frac_above:.4f}')

np.savez('/tmp/integrand.npz', k=np.asarray(k_f), pr=np.asarray(pr),
         **{f'{n}_{l}': out[l][n] for l in out for n in out[l]})
print('saved /tmp/integrand.npz')
