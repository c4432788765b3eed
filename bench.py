"""Driver benchmark: batched FFTLog pk->xi + background distances + sigma8
over many cosmologies on the TPU, against the reference cosmoprimo library
(numpy/scipy) running the identical pipeline on CPU.

Timing note: on the axon TPU relay, ``block_until_ready`` does not
synchronize — every timed call therefore reduces its outputs to a scalar
ON DEVICE and forces an 8-byte readback, which bounds the full compute.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per metric;
the FIRST line is the headline (linear flagship pipeline), followed by the
non-linear (halofit) pipeline and the fused Pallas FFTLog kernel vs the XLA
f64 pair-FFT path.
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


def reference_rate(seconds=5.0):
    """Per-cosmology rate of the reference cosmoprimo library (numpy/scipy,
    mounted read-only at /root/reference) running the same pipeline on CPU.
    Returns None if the reference is unavailable."""
    try:
        import sys
        sys.path.insert(0, '/root/reference')
        import importlib.metadata as md
        _orig = md.version
        md.version = lambda name: '9.9.9' if name == 'cosmoprimo' else _orig(name)
        from cosmoprimo import Cosmology as RefCosmology
        from cosmoprimo.fftlog import PowerToCorrelation as RefP2C
    except Exception:
        return None
    rng = np.random.default_rng(0)
    base = RefCosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649,
                        engine='eisenstein_hu')
    k = np.geomspace(1e-5, 1e2, 1024)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        cc = base.clone(omega_cdm=0.11 + 0.02 * rng.random())
        pk = cc.get_fourier().pk_interpolator()
        RefP2C(k)(pk(k, 0.0))
        cc.get_background().comoving_radial_distance(np.array([0.5, 1.0, 2.0]))
        pk.sigma8_z(0.0)
        n += 1
    return n / (time.time() - t0)


def main():
    from cosmoprimo_tpu.pipelines import make_pk_to_xi_pipeline_batched

    n = int(os.environ.get('BENCH_N', '10000'))
    n_cpu = int(os.environ.get('BENCH_N_CPU', '32'))
    nrep = int(os.environ.get('BENCH_NREP', '3'))

    # headline path: batched pipeline with ONE FFTLog over the whole batch;
    # on TPU the fused Pallas double-single kernel handles the transform
    # (~16% over the XLA f64 pair-FFT), with automatic fallback if the
    # toolchain rejects it
    args_list = [make_args(n, seed=i) for i in range(nrep + 1)]
    fn, batched_checksum, fft_engine = _build_batched_checksum(
        nk=1024, non_linear=False, warm_args=args_list[0])
    best = np.inf
    for i in range(1, nrep + 1):
        t0 = time.time()
        float(batched_checksum(*args_list[i]))
        best = min(best, time.time() - t0)
    rate = n / best

    # ---- CPU f64 path: accuracy cross-check + XLA-CPU rate (the Pallas
    # kernel is TPU-only, so the CPU reference runs the XLA engine)
    from cosmoprimo_tpu.pipelines import make_pk_to_xi_pipeline_batched
    fn_cpu, _, _ = make_pk_to_xi_pipeline_batched(nk=1024, fft_engine='auto')
    cpu = jax.devices('cpu')[0]
    args_small = make_args(n_cpu, seed=1)
    args_cpu = jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu), args_small)
    with jax.default_device(cpu):
        batched_cpu = jax.jit(fn_cpu)
        out_cpu = jax.tree_util.tree_map(np.asarray, batched_cpu(*args_cpu))
        t0 = time.time()
        jax.block_until_ready(batched_cpu(*args_cpu))  # CPU backend truly blocks
        rate_cpu = n_cpu / (time.time() - t0)
    out_tpu = jax.tree_util.tree_map(np.asarray, jax.jit(fn)(*args_small))
    xi_t, chi_t, s8_t = out_tpu
    xi_c, chi_c, s8_c = out_cpu
    scale = np.abs(xi_c).max(axis=-1, keepdims=True)
    max_err = float(max((np.abs(xi_t - xi_c) / scale).max(),
                        np.abs(chi_t / chi_c - 1).max(),
                        np.abs(s8_t / s8_c - 1).max()))

    # ---- baseline: the reference cosmoprimo library itself (CPU)
    ref_rate = reference_rate()
    baseline_rate = ref_rate if ref_rate is not None else rate_cpu

    result = {
        'metric': f'pk->xi FFTLog + distances + sigma8, f64, batch {n}',
        'value': round(rate, 1),
        'unit': 'cosmologies/s',
        'vs_baseline': round(rate / baseline_rate, 2),
        'baseline': 'reference cosmoprimo (numpy/scipy, 1 CPU core)' if ref_rate is not None else 'same pipeline, XLA CPU f64',
        'baseline_rate': round(baseline_rate, 2),
        'jax_cpu_rate': round(rate_cpu, 2),
        'max_rel_err_vs_cpu_f64': max_err,
        'fft_engine': fft_engine,
        'backend': jax.default_backend(),
    }
    print(json.dumps(result), flush=True)

    bench_halofit(baseline_rate, nrep=nrep)
    bench_hmcode(baseline_rate, nrep=nrep)
    bench_pallas_fftlog()



def _build_batched_checksum(nk, non_linear, warm_args):
    """(fn, jitted checksum, engine) over the batched pipeline, honoring
    BENCH_FFT_ENGINE and preferring the fused Pallas FFT on TPU with
    automatic fallback to the XLA engine."""
    from cosmoprimo_tpu.pipelines import make_pk_to_xi_pipeline_batched

    def build(engine):
        fn, k, s = make_pk_to_xi_pipeline_batched(nk=nk, non_linear=non_linear, fft_engine=engine)

        @jax.jit
        def checksum(*args):
            xi, chi, s8 = fn(*args)
            # on-device reduction: an 8-byte readback bounds the full compute
            return jnp.sum(xi) + jnp.sum(chi) + jnp.sum(s8)

        return fn, checksum

    engine = os.environ.get('BENCH_FFT_ENGINE',
                            'pallas' if jax.default_backend() == 'tpu' else 'auto')
    try:
        fn, checksum = build(engine)
        float(checksum(*warm_args))  # compile + warm
    except Exception:
        engine = 'auto'
        fn, checksum = build(engine)
        float(checksum(*warm_args))
    return fn, checksum, engine


def bench_halofit(baseline_rate, nrep=3):
    """Non-linear (native halofit) pk->xi pipeline rate — the same flagship
    workload with the halo-fit transform inserted per cosmology."""
    n = int(os.environ.get('BENCH_N_NL', '4096'))
    args_list = [make_args(n, seed=10 + i) for i in range(nrep + 1)]
    _, checksum, _ = _build_batched_checksum(nk=1024, non_linear='halofit', warm_args=args_list[0])
    best = np.inf
    for i in range(1, nrep + 1):
        t0 = time.time()
        float(checksum(*args_list[i]))
        best = min(best, time.time() - t0)
    rate = n / best
    print(json.dumps({
        'metric': f'non-linear (halofit) pk->xi pipeline, f64, batch {n}',
        'value': round(rate, 1),
        'unit': 'cosmologies/s',
        'vs_baseline': round(rate / baseline_rate, 2),
        'baseline': 'reference linear pipeline rate (the reference has no native halofit)',
        'backend': jax.default_backend(),
    }), flush=True)


def bench_hmcode(baseline_rate, nrep=3):
    """HMcode-2020 halo-model pk->xi pipeline rate (full Sheth-Tormen + NFW
    one-halo integral per cosmology) — capability the reference only has
    through CLASS/CAMB Fortran/C."""
    n = int(os.environ.get('BENCH_N_HM', '256'))
    args_list = [make_args(n, seed=20 + i) for i in range(nrep + 1)]
    _, checksum, _ = _build_batched_checksum(nk=384, non_linear='mead', warm_args=args_list[0])
    best = np.inf
    for i in range(1, nrep + 1):
        t0 = time.time()
        float(checksum(*args_list[i]))
        best = min(best, time.time() - t0)
    rate = n / best
    print(json.dumps({
        'metric': f'HMcode-2020 halo-model pk->xi pipeline, f64, batch {n}',
        'value': round(rate, 1),
        'unit': 'cosmologies/s',
        'vs_baseline': round(rate / baseline_rate, 2),
        'baseline': 'reference linear pipeline rate (the reference has no native HMcode)',
        'backend': jax.default_backend(),
    }), flush=True)


def bench_pallas_fftlog(nrep=5):
    """Standalone fused Pallas FFTLog kernel (double-single f32) vs the XLA
    f64 pair-FFT engine on the identical transform: TophatVariance over a
    (batch, 4096) padded grid. Skipped (with a JSON note) off-TPU or if the
    kernel fails to compile on this toolchain."""
    from cosmoprimo_tpu.fftlog import TophatVariance

    nbatch = int(os.environ.get('BENCH_N_PALLAS', '4096'))
    k = np.geomspace(1e-5, 1e2, 1024)
    pk = (k / 0.05) ** 0.96 / (1 + (k / 0.1) ** 3.04) * 2e9
    pk_batch = jnp.asarray(pk)[None, :] * jnp.linspace(0.8, 1.2, nbatch)[:, None]

    def timed_rate(engine):
        tp = TophatVariance(k, engine=engine)

        @jax.jit
        def checksum(f):
            r, var = tp(f)
            return jnp.sum(var)

        float(checksum(pk_batch))  # compile + warm
        best = np.inf
        for _ in range(nrep):
            t0 = time.time()
            float(checksum(pk_batch))
            best = min(best, time.time() - t0)
        return nbatch / best

    rate_pair = timed_rate('pair')
    try:
        rate_pallas = timed_rate('pallas')
    except Exception as exc:
        print(json.dumps({
            'metric': f'fused Pallas FFTLog kernel, df32, batch {nbatch} x 4096',
            'value': 0.0,
            'unit': 'transforms/s',
            'vs_baseline': 0.0,
            'baseline': 'XLA f64 pair-FFT FFTLog (same transform)',
            'baseline_rate': round(rate_pair, 1),
            'skipped': f'{type(exc).__name__}: {exc}'[:200],
            'backend': jax.default_backend(),
        }), flush=True)
        return
    print(json.dumps({
        'metric': f'fused Pallas FFTLog kernel, df32, batch {nbatch} x 4096',
        'value': round(rate_pallas, 1),
        'unit': 'transforms/s',
        'vs_baseline': round(rate_pallas / rate_pair, 2),
        'baseline': 'XLA f64 pair-FFT FFTLog (same transform)',
        'baseline_rate': round(rate_pair, 1),
        'backend': jax.default_backend(),
    }), flush=True)


if __name__ == '__main__':
    main()
