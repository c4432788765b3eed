"""Knob experiments for the l ~ 25-60 Cl error cluster vs the CLASS golden.

Env knobs (set per run; each config is a fresh process):
  NATIVE_LMAX_G / NATIVE_LMAX_POL - hierarchy truncation (import-time)
  DEV_K_LOG_SWITCH - harmonic.K_LOG_SWITCH override (fine-grid aliasing)
  DEV_LMAX - comparison lmax (default 150)

Usage: DEV_K_LOG_SWITCH=0.0035 python scripts/dev_cls_knobs2.py
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

sys.path.insert(0, '/root/repo')

from cosmoprimo_tpu.fiducial import DESI
from cosmoprimo_tpu.boltzmann import harmonic, bessel, perturbations

GOLD = '/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat'

lmax = int(os.environ.get('DEV_LMAX', '150'))
if os.environ.get('DEV_K_LOG_SWITCH'):
    harmonic.K_LOG_SWITCH = float(os.environ['DEV_K_LOG_SWITCH'])

print(f'config: LMAX_G={perturbations.LMAX_G} LMAX_POL={perturbations.LMAX_POL} '
      f'K_LOG_SWITCH={harmonic.K_LOG_SWITCH} lmax={lmax}', flush=True)

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

ells = np.unique(np.concatenate([bessel.default_ells(lmax),
                                 np.arange(20, min(71, lmax + 1), 2)]))
t0 = time.time()
cls = harmonic.compute_cls(p, th, lmax=lmax, ells=ells)
print(f'compute_cls: {time.time() - t0:.1f}s', flush=True)

gold = np.loadtxt(GOLD)
TCMB = float(cosmo['T_cmb']) * 1e6
raw = cls['raw_sampled']
els = cls['ells_sampled']
for name, c in (('tt', 1), ('ee', 2), ('te', 4)):
    gv = np.interp(els, gold[:, 0], gold[:, c]) / (els * (els + 1.0) / (2 * np.pi)) / TCMB ** 2
    ov = np.asarray(raw[name])
    rel = (ov - gv) / np.maximum(np.abs(gv), np.abs(gv).max() * 1e-3)
    print(f'--- {name}:')
    for lo, hi in [(2, 20), (20, 32), (32, 50), (50, 72), (72, 200)]:
        m = (els >= lo) & (els < hi)
        if m.any():
            worst = np.argmax(np.abs(rel[m]))
            print(f'  l in [{lo},{hi}): max|rel|={np.abs(rel[m]).max():.4f} '
                  f'(at l={els[m][worst]}) mean={rel[m].mean():+.4f}')
