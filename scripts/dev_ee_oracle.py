"""EE l ~ 28 excess: compare the E-mode source integrand g * Pi and its
projected integral against the independent scipy-BDF oracle (no TCA, no
RSA, lmax 40) at the trough-band wavenumbers k ~ 0.002/Mpc.

For each k: Delta_E-proxy = int g(tau) (3/4) Pi(tau) j_l(x)/x^2 dtau at the
l closest to k*chi_star, evaluated with BOTH the production Pi and the
oracle Pi on the same tau grid -> the ratio isolates whether the +15%
C_l^EE excess is a production-solver artifact or shared physics."""

import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np
import jax.numpy as jnp
from scipy.special import spherical_jn

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')
import os

from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import perturbations
from cosmoprimo_tpu.boltzmann.perturbations import compute_los_sources
from boltzmann_oracle import run_oracle

if os.environ.get('DEV_KAPPA_SAFE'):
    perturbations.KAPPA_SAFE = float(os.environ['DEV_KAPPA_SAFE'])
    print(f'KAPPA_SAFE={perturbations.KAPPA_SAFE}', flush=True)
if os.environ.get('DEV_TCA_TRIGGER'):  # sets BOTH branches
    perturbations.TCA_TRIGGER_AH = float(os.environ['DEV_TCA_TRIGGER'])
    perturbations.TCA_TRIGGER_K = float(os.environ['DEV_TCA_TRIGGER'])
    print(f'TCA_TRIGGER={perturbations.TCA_TRIGGER_AH}', flush=True)

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

ks = [float(x) for x in (sys.argv[1:] or [0.0015, 0.002, 0.003, 0.005])]
k = jnp.asarray(ks)

t0 = time.time()
src = compute_los_sources(p, th, k)
tau = np.asarray(src['tau'])
g = np.asarray(src['g'])
eta0 = float(src['eta0'])
print(f'production sources: {time.time() - t0:.1f}s', flush=True)

# tau window where the E source can matter: through recombination and the
# free-streaming tail out to tau = 2500 (the dev_ee_window rec cut)
sel = (tau > 260.0) & (tau < 2500.0)
tau_w = tau[sel]
sub = np.unique(np.linspace(0, len(tau_w) - 1, 120).astype(int))
tau_s = tau_w[sub]
g_s = g[sel][sub]

for i, kk in enumerate(ks):
    t0 = time.time()
    orc = run_oracle(p, th, kk, tau_s)
    pi_o = np.asarray(orc['PI'])
    pi_p = np.asarray(src['src'][i, 2, :])[sel][sub]
    ell = max(4, int(round(kk * (eta0 - 285.0))))
    x = np.maximum(kk * (eta0 - tau_s), 1e-3)
    w_l = spherical_jn(ell, x) / x ** 2
    # trapezoid over the shared tau subgrid
    integ_p = np.trapz(g_s * pi_p * w_l, tau_s)
    integ_o = np.trapz(g_s * pi_o * w_l, tau_s)
    # where does the difference accumulate? split at tau=1200
    lo = tau_s < 1200.0
    d_lo = np.trapz((g_s * (pi_p - pi_o) * w_l)[lo], tau_s[lo])
    d_hi = np.trapz((g_s * (pi_p - pi_o) * w_l)[~lo], tau_s[~lo])
    print(f'k={kk:8.5f} l~{ell:4d}: dE_prod/dE_oracle = {integ_p / integ_o:+.4f} '
          f'(Cl ratio {(integ_p / integ_o) ** 2:+.4f}); '
          f'diff split lo/hi tau: {d_lo / integ_o:+.3f} / {d_hi / integ_o:+.3f}; '
          f'oracle {time.time() - t0:.1f}s', flush=True)
