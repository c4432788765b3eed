"""TT to l=1200: peak vs trough errors + acoustic peak positions vs CLASS."""

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

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

lmax = 1250
ells = np.asarray(sorted(set(
    list(range(180, 260, 8)) + list(range(300, 480, 8)) + list(range(480, 620, 8))
    + list(range(620, 900, 8)) + list(range(900, 1251, 10)))), dtype=np.int64)
t0 = time.time()
cls = harmonic.compute_cls(p, th, lmax=lmax, ells=ells)
print(f'compute_cls lmax={lmax}, {len(ells)} ells: {time.time()-t0:.1f}s', flush=True)

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
gl = gold[:, 0].astype(int)
T2 = (2.7255e6) ** 2
fac = np.arange(lmax + 1) * (np.arange(lmax + 1) + 1.0) / (2 * np.pi)
D_ours = fac * np.asarray(cls['tt']) * T2
D_gold = np.interp(np.arange(lmax + 1), gl, gold[:, 1])

ell = np.arange(lmax + 1)


def peak_pos(D, l0, half=60):
    m = (ell > l0 - half) & (ell < l0 + half)
    c = np.polyfit(ell[m], D[m], 2)
    return -c[1] / (2 * c[0])


print(f"{'feature':>10} {'l_ours':>8} {'l_class':>8} {'shift':>7}")
for name, l0 in [('peak1', 220), ('trough1', 415), ('peak2', 537), ('trough2', 675),
                 ('peak3', 810), ('trough3', 1000), ('peak4', 1120)]:
    lo = peak_pos(D_ours, l0)
    lg = peak_pos(D_gold, l0)
    print(f'{name:>10} {lo:8.2f} {lg:8.2f} {lo-lg:+7.2f}')

print(f"\n{'l':>6} {'rel':>8}")
for l in [220, 300, 360, 415, 470, 537, 600, 675, 740, 810, 900, 1000, 1060, 1120, 1200]:
    print(f'{l:6d} {D_ours[l]/D_gold[l]-1:+8.4f}')
np.savez('/tmp/cls_1200.npz', tt=np.asarray(cls['tt']), ells=ells,
         raw_tt=np.asarray(cls['raw_sampled']['tt']),
         ee=np.asarray(cls['ee']), te=np.asarray(cls['te']), pp=np.asarray(cls['pp']))
