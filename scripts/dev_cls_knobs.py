"""Knob sweep for the TT trough excess: reload the perturbations module
with modified hierarchy/switch constants and re-project the trough band.

Usage: python scripts/dev_cls_knobs.py [variant ...]
Variants: lmax_g, rsa, tca, steps, alpha, all (default: lmax_g rsa tca)
"""

import re
import sys
import time
import types

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
import cosmoprimo_tpu.boltzmann.perturbations as P


def reload_with(**over):
    src = open(P.__file__).read()
    for k, v in over.items():
        src, n = re.subn(rf'(?m)^{k} = [^#\n]*', f'{k} = {v!r}  ', src, count=1)
        assert n == 1, k
    mod = types.ModuleType('pert_variant')
    mod.__dict__['__package__'] = 'cosmoprimo_tpu.boltzmann'
    mod.__dict__['__name__'] = 'cosmoprimo_tpu.boltzmann.pert_variant'
    mod.__dict__['__file__'] = P.__file__
    exec(compile(src, P.__file__, 'exec'), mod.__dict__)
    return mod


VARIANTS = {
    'default': {},
    'lmax_g': dict(LMAX_G=23, LMAX_POL=23, LMAX_UR=29),
    'rsa': dict(RSA_KETA=240.0),
    'tca': dict(TCA_TRIGGER=150.0),
    'tca_lo': dict(TCA_TRIGGER=15.0),
    'steps': dict(N_STEPS_A=20480, ALPHA_PHASE=0.25),
    'alpha': dict(ALPHA_PHASE=0.25),
}

names = sys.argv[1:] or ['default', 'lmax_g', 'rsa', 'tca']
if names == ['all']:
    names = list(VARIANTS)

cosmo = DESI(engine='native')
th = cosmo.get_thermodynamics().table
p = cosmo.engine._perturbation_params()

lmax = 700
kmax = max(0.12, 2.4 * lmax / 13000.0)
ells = np.asarray([150, 220, 300, 340, 380, 420, 470, 520, 570, 620, 675], dtype=np.int64)
tables = bessel.bessel_tables(ells, float(kmax) * 1.05 * 16000.0)
k_c = jnp.asarray(harmonic.coarse_k_grid(kmax))

gold = np.loadtxt('/root/reference/cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_cl.dat')
T2 = (2.7255e6) ** 2
gv = np.interp(ells, gold[:, 0], gold[:, 1]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2
gv_ee = np.interp(ells, gold[:, 0], gold[:, 2]) / (ells * (ells + 1.0) / (2 * np.pi)) / T2

res = {}
for name in names:
    mod = P if name == 'default' else reload_with(**VARIANTS[name])
    t0 = time.time()
    src = mod.compute_los_sources(p, th, k_c)
    src['P_R_params'] = (p['n_s'], p['A_s'], p['k_pivot'])
    out = harmonic.project_sources(src, ells, tables)
    res[name] = {n: np.asarray(out[n]) for n in ('tt', 'ee')}
    print(f'{name}: {time.time()-t0:.1f}s', flush=True)

print(f"{'l':>5} " + ' '.join(f'{n:>10}' for n in names) + '  |ee ' + ' '.join(f'{n:>8}' for n in names))
for i, l in enumerate(ells):
    row = ' '.join(f'{res[n]["tt"][i]/gv[i]-1:+10.4f}' for n in names)
    row2 = ' '.join(f'{res[n]["ee"][i]/gv_ee[i]-1:+8.4f}' for n in names)
    print(f'{l:5d} {row}  | {row2}')
