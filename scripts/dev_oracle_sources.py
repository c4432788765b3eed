"""Compare production LOS sources against the independent scipy-BDF oracle
for a few trough-band k-modes, over the recombination visibility window."""

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
import os

from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import perturbations
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources
from boltzmann_oracle import run_oracle

if os.environ.get('DEV_TCA_TRIGGER'):  # sets BOTH branches
    perturbations.TCA_TRIGGER_AH = float(os.environ['DEV_TCA_TRIGGER'])
    perturbations.TCA_TRIGGER_K = float(os.environ['DEV_TCA_TRIGGER'])
    print(f'TCA_TRIGGER={perturbations.TCA_TRIGGER_AH}', flush=True)

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

ks = [float(x) for x in (sys.argv[1:] or [0.035, 0.05, 0.065])]
k = jnp.asarray(ks)

t0 = time.time()
src = compute_los_sources(p, th, k)
tau = np.asarray(src['tau'])
g = np.asarray(src['g'])
print(f'production sources: {time.time()-t0:.1f}s', flush=True)

# visibility window: tau where g > 1e-4 * gmax within recombination band
sel = (g > g.max() * 5e-4) & (tau < 1200.0)
tau_w = tau[sel]
print(f'window: tau in [{tau_w[0]:.1f}, {tau_w[-1]:.1f}], {sel.sum()} nodes')
sub = np.linspace(0, len(tau_w) - 1, 40).astype(int)
tau_s = tau_w[sub]

names = ['mono', 'dopp', 'PI', 'isw', 'weyl']
for i, kk in enumerate(ks):
    t0 = time.time()
    orc = run_oracle(p, th, kk, tau_s)
    print(f'k={kk}: oracle {time.time()-t0:.1f}s', flush=True)
    prod = {
        'mono': np.asarray(src['src'][i, 0, :])[sel][sub],
        'dopp': np.asarray(src['src'][i, 1, :])[sel][sub],
        'PI': np.asarray(src['src'][i, 2, :])[sel][sub],
        'isw': np.asarray(src['src'][i, 3, :])[sel][sub],
        'weyl': np.asarray(src['src'][i, 4, :])[sel][sub],
    }
    gsub = g[sel][sub]
    for n in names:
        o = orc[n]
        pr = prod[n]
        # g-weighted rms scale for mono/dopp/PI; plain for isw/weyl
        w = gsub if n in ('mono', 'dopp', 'PI') else np.ones_like(gsub)
        scale = np.sqrt(np.sum((w * o) ** 2) / len(o))
        err = w * (pr - o)
        rms = np.sqrt(np.mean(err ** 2)) / scale
        i_worst = int(np.argmax(np.abs(err)))
        print(f'  {n:5s}: g-wt rms rel = {rms:.4f}   worst tau={tau_s[i_worst]:.1f} '
              f'prod={pr[i_worst]:+.4e} oracle={o[i_worst]:+.4e}')
    np.savez(f'/tmp/oracle_k{kk}.npz', tau=tau_s, g=gsub,
             **{f'o_{n}': orc[n] for n in names}, **{f'p_{n}': prod[n] for n in names})
