"""Validate lensing.lensed_cls alone: lens the ARCHIVED CLASS unlensed
spectra and compare against the archived CLASS lensed spectra."""

import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np

sys.path.insert(0, '/root/repo')
from cosmoprimo_tpu.boltzmann import lensing

BASE = '/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl'
TCMB_MUK = 2.7255e6

unl = np.loadtxt(BASE + '.dat')    # l TT EE BB TE dd dT dE, l(l+1)/2pi muK^2
len_ = np.loadtxt(BASE + '_lensed.dat')

lmax_in = int(unl[-1, 0])
gl = unl[:, 0].astype(int)


def raw(col, tfac):
    out = np.zeros(lmax_in + 1)
    fac = gl * (gl + 1.0) / (2 * np.pi)
    out[gl] = col / fac / tfac
    return out


cl_tt = raw(unl[:, 1], TCMB_MUK ** 2)
cl_ee = raw(unl[:, 2], TCMB_MUK ** 2)
cl_te = raw(unl[:, 4], TCMB_MUK ** 2)
cl_bb = np.zeros(lmax_in + 1)
# dd column: l(l+1)/2pi C^dd with C^dd = l(l+1) C^pp
cl_pp = np.zeros(lmax_in + 1)
cl_pp[gl] = unl[:, 5] * 2 * np.pi / (gl * (gl + 1.0)) ** 2

lmax_out = 4000
t0 = time.time()
out = lensing.lensed_cls(*(jax.numpy.asarray(x) for x in (cl_tt, cl_ee, cl_bb, cl_te, cl_pp)),
                         lmax=lmax_out)
out = {k: np.asarray(v) for k, v in out.items()}
print(f'lensed_cls: {time.time()-t0:.1f}s')

ll = len_[:, 0].astype(int)
sel = ll <= lmax_out
fac = ll[sel] * (ll[sel] + 1.0) / (2 * np.pi)
gold = {'tt': len_[sel, 1], 'ee': len_[sel, 2], 'bb': len_[sel, 3], 'te': len_[sel, 4]}
ours = {k: fac * out[k][ll[sel]] * TCMB_MUK ** 2 for k in gold}

report_l = [2, 10, 40, 100, 220, 400, 700, 1000, 1500, 2000, 2500, 3000, 3500, 4000]
for name in ['tt', 'ee', 'bb', 'te']:
    gv, ov = gold[name], ours[name]
    denom = np.maximum(np.abs(gv), np.abs(gv).max() * 1e-3)
    rel = (ov - gv) / denom
    print(f'--- {name}: max|rel| = {np.abs(rel).max():.4f}  median|rel| = {np.median(np.abs(rel)):.5f}')
    for l in report_l:
        i = np.where(ll[sel] == l)[0]
        if len(i):
            i = i[0]
            print(f'    l={l:5d}  ours={ov[i]:12.5e}  class={gv[i]:12.5e}  rel={rel[i]:+.5f}')
