"""Dev harness: native unlensed Cls vs the archived CLASS v3.1.1 golden.

Usage: python scripts/dev_cls_check.py [lmax] [kmax]
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
from cosmoprimo_tpu.boltzmann import harmonic

GOLD = '/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat'

lmax = int(sys.argv[1]) if len(sys.argv) > 1 else 600
kmax = float(sys.argv[2]) if len(sys.argv) > 2 else None

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()
print('params:', {k: (float(v) if np.ndim(v) == 0 else v) for k, v in p.items()})

from cosmoprimo_tpu.boltzmann import bessel
ells = np.unique(np.concatenate([bessel.default_ells(lmax),
                                 np.arange(300, min(421, lmax + 1), 4)]))
t0 = time.time()
cls = harmonic.compute_cls(p, th, lmax=lmax, kmax=kmax, ells=ells)
tt = np.asarray(cls['tt'])
print(f'compute_cls lmax={lmax}: {time.time()-t0:.1f}s')

# --- comparison at the SAMPLED ells (no ell-spline error)
gold = np.loadtxt(GOLD)
TCMB_MUK_ = float(cosmo['T_cmb']) * 1e6
gcl = {'tt': 1, 'ee': 2, 'te': 4}
raw = cls['raw_sampled']
els = cls['ells_sampled']
print('=== sampled-ell comparison (raw, no spline) ===')
gv_tt = np.interp(els, gold[:, 0], gold[:, 1]) / (els * (els + 1.0) / (2 * np.pi)) / TCMB_MUK_ ** 2
gv_ee = np.interp(els, gold[:, 0], gold[:, 2]) / (els * (els + 1.0) / (2 * np.pi)) / TCMB_MUK_ ** 2
for name, c in gcl.items():
    gv = np.interp(els, gold[:, 0], gold[:, c]) / (els * (els + 1.0) / (2 * np.pi)) / TCMB_MUK_ ** 2
    ov = np.asarray(raw[name])
    # local normalization: |gold| for tt/ee (no zeros); te against its
    # geometric-mean envelope sqrt(tt*ee) so zero crossings don't blow up
    norm = np.sqrt(gv_tt * gv_ee) if name == 'te' else np.abs(gv)
    rel = (ov - gv) / norm
    order = np.argsort(-np.abs(rel))
    print(f'  {name}: max|rel|={np.abs(rel).max():.4f} median={np.median(np.abs(rel)):.4f} '
          f'worst at l={els[order[:6]]}, rel={np.round(rel[order[:6]], 4)}')
    for lo, hi in [(2, 30), (30, 100), (100, 250), (250, 450), (450, 10000)]:
        m = (els >= lo) & (els < hi)
        if m.any():
            print(f'    l in [{lo},{hi}): max|rel|={np.abs(rel[m]).max():.4f}')

gold = np.loadtxt(GOLD)  # l, TT, EE, BB, TE, dd, dT, dE  (l(l+1)/2pi, muK^2)
gl = gold[:, 0].astype(int)
TCMB_MUK = float(cosmo['T_cmb']) * 1e6

ell = np.arange(lmax + 1)
fac = ell * (ell + 1) / (2 * np.pi)
ours = {
    'TT': fac * np.asarray(cls['tt']) * TCMB_MUK ** 2,
    'EE': fac * np.asarray(cls['ee']) * TCMB_MUK ** 2,
    'TE': fac * np.asarray(cls['te']) * TCMB_MUK ** 2,
    'dd': fac * ell * (ell + 1) * np.asarray(cls['pp']),
    'dT': fac * np.sqrt(ell * (ell + 1)) * np.asarray(cls['tp']) * TCMB_MUK,
    'dE': fac * np.sqrt(ell * (ell + 1)) * np.asarray(cls['ep']) * TCMB_MUK,
}
cols = {'TT': 1, 'EE': 2, 'TE': 4, 'dd': 5, 'dT': 6, 'dE': 7}

sel = gl <= lmax
report_l = [2, 5, 10, 20, 40, 80, 150, 220, 350, 500, 600, 800, 1000, 1500, 2000, 2500]
report_l = [l for l in report_l if l <= lmax]
for name, c in cols.items():
    gv = gold[sel, c]
    ov = ours[name][gl[sel]]
    denom = np.maximum(np.abs(gv), np.abs(gv).max() * 1e-3)
    relerr = (ov - gv) / denom
    print(f'--- {name}: max|rel| (l<=lmax) = {np.abs(relerr).max():.3f}, '
          f'median|rel| = {np.median(np.abs(relerr)):.4f}')
    for l in report_l:
        i = np.where(gl[sel] == l)[0]
        if len(i):
            i = i[0]
            print(f'    l={l:5d}  ours={ov[i]:12.5e}  class={gv[i]:12.5e}  rel={relerr[i]:+.4f}')

np.savez('/tmp/cls_dev.npz', **{k: np.asarray(v) for k, v in cls.items() if k != 'raw_sampled'},
         **{f'raw_{n}': np.asarray(v) for n, v in cls['raw_sampled'].items()},
         **{f'g_{n}': ours[n] for n in ours})
print('saved /tmp/cls_dev.npz')
