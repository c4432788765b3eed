"""Compare build_tables conformal time eta(z) against the archived CLASS
v3.1.1 background table (col 3: conf. time [Mpc]) for the abacus_cosm000
cosmology — root-causing the ~2.1% acoustic-peak ell shift."""

import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np

sys.path.insert(0, '/root/repo')
from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import perturbations

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics()
p = cosmo.engine._perturbation_params()
tabs = perturbations.build_tables(p, th._th if hasattr(th, '_th') else cosmo.engine.get_section('thermodynamics')._th)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_background.dat')
zg, etag, rsg = gold[:, 0], gold[:, 2], gold[:, 7]
lnag = np.log(1.0 / (1.0 + zg))   # zg descending -> this is ascending
etag_s = etag
rsg_s = rsg

lna = np.asarray(tabs['lna'])
eta = np.exp(np.asarray(tabs['lneta']))

print(f"eta0 ours={eta[-1]:.4f}  CLASS={etag_s[-1]:.4f}  rel={(eta[-1]/etag_s[-1]-1):+.5f}")
for z in [1e6, 1e4, 3000.0, 1090.0, 600.0, 100.0, 10.0, 3.0, 1.0, 0.1, 0.0]:
    x = np.log(1.0 / (1.0 + z))
    e_o = np.interp(x, lna, eta)
    e_g = np.interp(x, lnag, etag_s)
    print(f"z={z:10.1f}  eta ours={e_o:12.4f}  CLASS={e_g:12.4f}  rel={(e_o/e_g-1):+.5f}")

# acoustic scale: chi*/rs* using CLASS z* ~ 1089.8 (from parameters file)
zstar = 1089.0
x = np.log(1.0 / (1.0 + zstar))
eta_star_o = np.interp(x, lna, eta)
eta_star_g = np.interp(x, lnag, etag_s)
rs_star_g = np.interp(x, lnag, rsg_s)
chi_o = eta[-1] - eta_star_o
chi_g = etag_s[-1] - eta_star_g
print(f"\nchi* ours={chi_o:.3f} CLASS={chi_g:.3f} rel={(chi_o/chi_g-1):+.5f}")
print(f"CLASS rs*={rs_star_g:.4f}; thermo rs_star (Mpc/h)/h={float(np.asarray(th.rs_star))/p['h']:.4f}" if hasattr(th, 'rs_star') else '')

# Hubble comparison at a few z
Hg = gold[:, 3]
Hc = np.asarray(tabs['Hc'])
for z in [1e6, 1e4, 1090.0, 100.0, 1.0, 0.0]:
    x = np.log(1.0 / (1.0 + z))
    a = np.exp(x)
    H_o = np.interp(x, lna, Hc) / a
    H_g = np.interp(x, lnag, Hg)
    print(f"z={z:10.1f}  H ours={H_o:.6e}  CLASS={H_g:.6e}  rel={(H_o/H_g-1):+.5f}")
