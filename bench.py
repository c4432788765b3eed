"""Driver benchmark: batched FFTLog pk->xi + background distances + sigma8
over many cosmologies on the TPU, vs the same float64 pipeline on one CPU
core (numpy/pocketfft-backed XLA CPU — numerically the scipy reference: the
FFTLog path is validated against scipy quad truth in tests/test_fftlog.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_enable_x64', True)


def make_args(n, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(0.11, 0.13, n)),
            jnp.asarray(rng.uniform(0.021, 0.023, n)),
            jnp.asarray(rng.uniform(0.65, 0.70, n)),
            jnp.asarray(rng.uniform(0.94, 0.98, n)),
            jnp.asarray(rng.uniform(2.9, 3.1, n)))


def time_batched(batched, args, nrep=3):
    out = batched(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(nrep):
        t0 = time.time()
        out = batched(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    from cosmoprimo_tpu.pipelines import make_pk_to_xi_pipeline

    n = int(os.environ.get('BENCH_N', '10000'))
    n_cpu = int(os.environ.get('BENCH_N_CPU', '64'))

    fn, k, s = make_pk_to_xi_pipeline(nk=1024)
    batched = jax.jit(jax.vmap(fn))

    args = make_args(n)
    dt, out = time_batched(batched, args)
    rate = n / dt

    # ---- CPU reference (accuracy + baseline throughput)
    cpu = jax.devices('cpu')[0]
    args_cpu = jax.tree_util.tree_map(lambda a: jax.device_put(a[:n_cpu], cpu), args)
    with jax.default_device(cpu):
        batched_cpu = jax.jit(jax.vmap(fn))
        dt_cpu, out_cpu = time_batched(batched_cpu, args_cpu, nrep=2)
    rate_cpu = n_cpu / dt_cpu

    # accuracy: TPU vs CPU-f64 (scipy-validated) on the same cosmologies
    xi_t, chi_t, s8_t = (np.asarray(o)[:n_cpu] for o in out)
    xi_c, chi_c, s8_c = (np.asarray(o) for o in out_cpu)
    scale = np.abs(xi_c).max(axis=-1, keepdims=True)
    err_xi = np.abs(xi_t - xi_c) / scale          # relative to the transform scale
    err_chi = np.abs(chi_t / chi_c - 1)
    err_s8 = np.abs(s8_t / s8_c - 1)
    max_err = float(max(err_xi.max(), err_chi.max(), err_s8.max()))

    result = {
        'metric': f'pk->xi FFTLog + distances + sigma8, f64, batch {n}',
        'value': round(rate, 1),
        'unit': 'cosmologies/s',
        'vs_baseline': round(rate / rate_cpu, 2),
        'cpu_rate': round(rate_cpu, 2),
        'max_rel_err_vs_cpu_f64': max_err,
        'backend': jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
