"""Stage-level timing of the native Boltzmann pipeline on the real TPU.

Times, as separate jitted programs (so each stage's cost is visible):
  1. the RECFAST thermodynamics table alone (6145-step lax.scan, per-
     cosmology scalars under vmap),
  2. the full native P(k) pipeline (thermo + build_tables + two-phase
     hierarchy integration),
at the batch sizes given by DEV_BATCHES (comma-separated, default "8").

Env knobs mirrored from the modules under test:
  NATIVE_UNROLL_THERMO / NATIVE_UNROLL_PERT - lax.scan unroll factors.

Usage (background, relay compiles are ~minutes each):
  DEV_BATCHES=8,64 python scripts/dev_native_perf.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_enable_x64', True)
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def log(msg):
    print(f'[perf +{time.time() - T0:7.1f}s] {msg}', flush=True)


T0 = time.time()
log(f'backend: {jax.default_backend()} {jax.devices()}')

from cosmoprimo_tpu.cosmology import Cosmology
from cosmoprimo_tpu.pipelines import make_native_pk_pipeline_batched


def make_args(n, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(0.11, 0.13, n)),
            jnp.asarray(rng.uniform(0.021, 0.023, n)),
            jnp.asarray(rng.uniform(0.65, 0.70, n)),
            jnp.asarray(rng.uniform(0.94, 0.98, n)),
            jnp.asarray(rng.uniform(2.9, 3.1, n)))


def time_best(fn, args_list):
    best = np.inf
    for args in args_list:
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best


def thermo_checksum():
    def single(omega_cdm, omega_b, h, n_s, logA):
        cosmo = Cosmology(omega_cdm=omega_cdm, omega_b=omega_b, h=h, n_s=n_s,
                          logA=logA, engine='native')
        th = cosmo.get_thermodynamics().table
        return sum(jnp.sum(v) for v in th.__dict__.values()
                   if hasattr(v, 'sum'))

    @jax.jit
    def fn(*args):
        return jnp.sum(jax.vmap(single)(*args))

    return fn


from cosmoprimo_tpu.boltzmann import perturbations as _pert
from cosmoprimo_tpu.boltzmann import thermodynamics as _therm

nk = int(os.environ.get('DEV_NK', '256'))


def run_thermo(n, unroll):
    _therm.UNROLL = unroll
    args = [make_args(n, seed=i) for i in range(4)]
    t0 = time.time()
    th_fn = thermo_checksum()
    float(th_fn(*args[0]))
    log(f'thermo  b={n} u={unroll}: compile+warm {time.time() - t0:.1f}s')
    best = time_best(th_fn, args[1:])
    log(f'thermo  b={n} u={unroll}: best {best * 1e3:.1f} ms  ({n / best:.1f} cosmologies/s)')


def run_native(n, u_therm, u_pert):
    _therm.UNROLL = u_therm
    _pert.UNROLL = u_pert
    args = [make_args(n, seed=i) for i in range(4)]
    t0 = time.time()
    fn, _ = make_native_pk_pipeline_batched(nk=nk)

    @jax.jit
    def checksum(*a):
        pkz, s8 = fn(*a)
        return jnp.sum(pkz) + jnp.sum(s8)

    float(checksum(*args[0]))
    log(f'native  b={n} ut={u_therm} up={u_pert}: compile+warm {time.time() - t0:.1f}s')
    best = time_best(checksum, args[1:])
    log(f'native  b={n} ut={u_therm} up={u_pert}: best {best:.3f} s  ({n / best:.2f} cosmologies/s)')


plan = os.environ.get('DEV_PLAN',
                      'thermo:8:1 thermo:8:16 native:8:16:1 native:8:16:2 '
                      'native:8:16:4 native:64:16:4')
for item in plan.split():
    parts = item.split(':')
    try:
        if parts[0] == 'thermo':
            run_thermo(int(parts[1]), int(parts[2]))
        else:
            run_native(int(parts[1]), int(parts[2]), int(parts[3]))
    except Exception as exc:  # keep sweeping past OOM/compile failures
        log(f'{item}: FAILED {type(exc).__name__}: {exc}')

log('done')
