"""Driver benchmark: batched FFTLog pk->xi + background distances + sigma8
over many cosmologies on the TPU, against the reference cosmoprimo library
(numpy/scipy) running the identical pipeline on CPU.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per metric;
the FIRST line is the headline (linear flagship pipeline), followed by the
non-linear (halofit) pipeline, the HMcode-2020 pipeline, and the fused
Pallas FFTLog kernel vs the XLA f64 pair-FFT path.

Fitting the driver's wall-clock window (round 2 was killed at rc=124 after
~20 min): XLA compilation on the axon relay dominates the old serial cost
(~25 min; the timed sections are seconds), so the five metric programs are
compiled concurrently — but with BOUNDED concurrency and in priority order
(headline, pallas, native, halofit, hmcode): round 4 showed the relay
cannot absorb five simultaneous ~400-500s compiles (each stretched to
~1000s and three metrics missed the budget), while three at a time land in
their round-3 times.  A wall-clock budget (env ``BENCH_BUDGET_S``, default
1020 s) still gates each join: a metric whose compile has not landed
in-window is reported as a JSON line with a "skipped" note instead of
being lost to the kill signal.  All threads are daemons, so a hung relay
call cannot wedge process exit.  Stage timings go to stderr.  The repo-
local persistent compile cache (gitignored, warmed by in-round TPU runs of
this same script) makes the driver's end-of-round run a cache hit.

Timing note: on the axon TPU relay, ``block_until_ready`` does not
synchronize — every timed call therefore reduces its outputs to a scalar
ON DEVICE and forces an 8-byte readback, which bounds the full compute.
"""

import json
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_enable_x64', True)

# Persistent XLA compilation cache: the four metric programs are identical
# run-over-run, and the axon relay honors the cache across processes, so a
# pre-warmed cache collapses the dominant cost (compiles, ~20 min cold) to
# seconds.  Repo-local (gitignored) so the driver's end-of-round run of this
# same working tree hits the entries warmed during development.
_CACHE_DIR = os.environ.get(
    'BENCH_COMPILE_CACHE',
    os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache'))
if _CACHE_DIR:
    jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

_T0 = time.time()

# Pinned CPU baseline rate [cosmologies/s] for the reference cosmoprimo
# library (numpy/scipy, eisenstein_hu engine, clone + pk_interpolator +
# PowerToCorrelation + distances + sigma8_z per cosmology) on one core of
# this build box.  Driver-recorded measurements of reference_rate():
# BENCH_r01.json: 9.14/s, BENCH_r02.json: 6.56/s — the 39% swing is
# contention noise on the 1-CPU box, which made `vs_baseline` unstable
# round-over-round.  Pinned to the mean; set BENCH_MEASURE_BASELINE=1 to
# re-measure live instead (the raw device rate is always reported too).
BASELINE_RATE_PINNED = 7.85

N_COMPARE = 32  # rows of the headline batch read back for the CPU cross-check


def _elapsed():
    return time.time() - _T0


def _log(msg):
    print(f'[bench +{_elapsed():7.1f}s] {msg}', file=sys.stderr, flush=True)


def _budget_left():
    return float(os.environ.get('BENCH_BUDGET_S', '1020')) - _elapsed()


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


def _build_batched_checksum(nk, non_linear, warm_args, with_slices=False):
    """(jitted checksum, engine) over the batched pipeline, honoring
    BENCH_FFT_ENGINE and preferring the fused Pallas FFT on TPU with
    automatic fallback to the XLA engine.  With ``with_slices`` the jitted
    function also returns the first N_COMPARE rows of each output (device-
    resident until fetched) so the accuracy cross-check reuses the same
    compiled program instead of compiling a second small-batch variant."""
    from cosmoprimo_tpu.pipelines import make_pk_to_xi_pipeline_batched

    def build(engine):
        fn, k, s = make_pk_to_xi_pipeline_batched(nk=nk, non_linear=non_linear, fft_engine=engine)

        @jax.jit
        def checksum(*args):
            xi, chi, s8 = fn(*args)
            # on-device reduction: an 8-byte readback bounds the full compute
            total = jnp.sum(xi) + jnp.sum(chi) + jnp.sum(s8)
            if with_slices:
                return total, (xi[:N_COMPARE], chi[:N_COMPARE], s8[:N_COMPARE])
            return total

        return checksum

    def warm(checksum):
        out = checksum(*warm_args)
        float(out[0] if with_slices else out)

    engine = os.environ.get('BENCH_FFT_ENGINE',
                            'pallas' if jax.default_backend() == 'tpu' else 'auto')
    try:
        checksum = build(engine)
        warm(checksum)  # compile + warm
    except Exception:
        engine = 'auto'
        checksum = build(engine)
        warm(checksum)
    return checksum, engine


def _build_native_checksum(nk, warm_args):
    """Jitted checksum over the batched native Boltzmann pipeline
    (RECFAST + MB95 hierarchy + linear P(k) per cosmology, vmapped)."""
    from cosmoprimo_tpu.pipelines import make_native_pk_pipeline_batched

    fn, _ = make_native_pk_pipeline_batched(nk=nk)

    @jax.jit
    def checksum(*args):
        pkz, s8 = fn(*args)
        return jnp.sum(pkz) + jnp.sum(s8)

    float(checksum(*warm_args))  # compile + warm
    return checksum


def _build_pallas_kernel(nbatch):
    """Jitted TophatVariance checksums for the pair-FFT and Pallas engines
    over the same (nbatch, 1024) input, compiled and warmed."""
    from cosmoprimo_tpu.fftlog import TophatVariance

    k = np.geomspace(1e-5, 1e2, 1024)
    pk = (k / 0.05) ** 0.96 / (1 + (k / 0.1) ** 3.04) * 2e9
    pk_batch = jnp.asarray(pk)[None, :] * jnp.linspace(0.8, 1.2, nbatch)[:, None]

    def build(engine):
        tp = TophatVariance(k, engine=engine)

        @jax.jit
        def checksum(f):
            r, var = tp(f)
            return jnp.sum(var)

        float(checksum(pk_batch))  # compile + warm
        return checksum

    pair = build('pair')
    try:
        pallas = build('pallas')
    except Exception as exc:
        pallas = exc
    return pair, pallas, pk_batch


def _time_best(checksum, args_list, scalar=lambda out: out):
    best = np.inf
    for args in args_list:
        t0 = time.time()
        float(scalar(checksum(*args)))
        best = min(best, time.time() - t0)
    return best


def _skip_line(metric, baseline, unit, reason, backend=None):
    print(json.dumps({
        'metric': metric, 'value': 0.0, 'unit': unit, 'vs_baseline': 0.0,
        'baseline': baseline, 'skipped': reason,
        'backend': backend if backend is not None else jax.default_backend(),
    }), flush=True)


def _probe_backend(timeout_s=None):
    """Bounded TPU-backend probe: the axon relay, when down, can HANG
    jax.devices() indefinitely rather than raise — which would turn this
    whole bench into an rc-124 driver kill. Probe from a daemon thread
    with a wall-clock bound and report failure instead of wedging."""
    timeout_s = float(os.environ.get('BENCH_BACKEND_PROBE_S', '240')
                      if timeout_s is None else timeout_s)
    result = []

    def probe():
        try:
            devs = jax.devices()
            result.append(('ok', devs))
        except Exception as exc:  # noqa: BLE001
            result.append(('err', exc))

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout=timeout_s)
    if not result:
        return f'backend init did not respond within {timeout_s:.0f}s (relay down/hung?)'
    status, payload = result[0]
    if status == 'err':
        return f'backend init failed: {type(payload).__name__}: {payload}'[:300]
    _log(f'backend ok: {payload}')
    return None


def main():
    # Batch sizes: throughput rises with batch until the chip saturates
    # (measured 47.5k/s @ 10k -> 84k/s @ 40k for the headline; halofit
    # 12.4k @ 4096 -> 12.9k @ 16384); beyond that, compile time and HBM
    # grow for no gain.
    n = int(os.environ.get('BENCH_N', '40000'))
    n_nl = int(os.environ.get('BENCH_N_NL', '16384'))
    n_hm = int(os.environ.get('BENCH_N_HM', '256'))
    n_pallas = int(os.environ.get('BENCH_N_PALLAS', '4096'))
    n_native = int(os.environ.get('BENCH_N_NATIVE', '8'))
    nk_native = int(os.environ.get('BENCH_NK_NATIVE', '256'))
    nrep = int(os.environ.get('BENCH_NREP', '3'))

    unavailable = _probe_backend()
    if unavailable is not None:
        _log(f'backend probe failed: {unavailable}')
        base = 'reference cosmoprimo (numpy/scipy, 1 CPU core; pinned)'
        for label, unit in (
                (f'pk->xi FFTLog + distances + sigma8, f64, batch {n}', 'cosmologies/s'),
                (f'non-linear (halofit) pk->xi pipeline, f64, batch {n_nl}', 'cosmologies/s'),
                (f'HMcode-2020 halo-model pk->xi pipeline, f64, batch {n_hm}', 'cosmologies/s'),
                (f'fused Pallas FFTLog kernel, df32, batch {n_pallas} x 4096', 'transforms/s'),
                (f'native Boltzmann linear P(k), nk={nk_native}, batch {n_native}', 'cosmologies/s'),
        ):
            _skip_line(label, base, unit, unavailable, backend='unavailable')
        return

    head_args = [make_args(n, seed=i) for i in range(nrep + 1)]
    hf_args = [make_args(n_nl, seed=10 + i) for i in range(nrep + 1)]
    hm_args = [make_args(n_hm, seed=20 + i) for i in range(nrep + 1)]
    nat_args = [make_args(n_native, seed=30 + i) for i in range(nrep + 1)]

    # ---- concurrent compilation, bounded + prioritized: round 4 showed the
    # relay cannot absorb five concurrent ~400-500s compiles (each stretched
    # to ~1000s and three metrics missed the budget).  A semaphore caps
    # in-flight compiles (default 3) and threads are STARTED in priority
    # order — headline (mandatory), pallas (fast, ~80s), native (the
    # flagship capability metric), then the two non-linear variants — so the
    # high-priority programs hold the first slots and the rest queue.
    # Threads are daemons so a hung relay call cannot block process exit.
    built = {}
    max_compiles = int(os.environ.get('BENCH_MAX_CONCURRENT_COMPILES', '3'))
    compile_slots = threading.Semaphore(max_compiles)

    def runner(name, builder):
        with compile_slots:
            try:
                t0 = time.time()
                built[name] = ('ok', builder())
                _log(f'{name}: compiled + warmed in {time.time() - t0:.0f}s')
            except Exception as exc:  # noqa: BLE001 - report, don't crash the bench
                built[name] = ('err', exc)
                _log(f'{name}: build FAILED: {type(exc).__name__}: {exc}')

    builders = {  # insertion order IS the compile priority
        'headline': lambda: _build_batched_checksum(nk=1024, non_linear=False,
                                                    warm_args=head_args[0], with_slices=True),
        'pallas': lambda: _build_pallas_kernel(n_pallas),
        'native': lambda: _build_native_checksum(nk=nk_native, warm_args=nat_args[0]),
        'halofit': lambda: _build_batched_checksum(nk=1024, non_linear='halofit',
                                                   warm_args=hf_args[0]),
        'hmcode': lambda: _build_batched_checksum(nk=384, non_linear='mead',
                                                  warm_args=hm_args[0]),
    }
    threads = {}
    for name, builder in builders.items():
        threads[name] = threading.Thread(target=runner, args=(name, builder), daemon=True)
        threads[name].start()
        time.sleep(0.2)  # deterministic slot acquisition in priority order
    _log(f'five metric programs queued ({max_compiles} concurrent compile slots)')

    # ---- CPU f64 cross-check reference, in the main thread meanwhile
    _log('cpu cross-check: compiling on CPU backend')
    from cosmoprimo_tpu.pipelines import make_pk_to_xi_pipeline_batched
    fn_cpu, _, _ = make_pk_to_xi_pipeline_batched(nk=1024, fft_engine='auto')
    cpu = jax.devices('cpu')[0]
    args_small = jax.tree_util.tree_map(lambda a: a[:N_COMPARE], head_args[1])
    args_cpu = jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu), args_small)
    with jax.default_device(cpu):
        batched_cpu = jax.jit(fn_cpu)
        out_cpu = jax.tree_util.tree_map(np.asarray, batched_cpu(*args_cpu))
        t0 = time.time()
        jax.block_until_ready(batched_cpu(*args_cpu))  # CPU backend truly blocks
        rate_cpu = N_COMPARE / (time.time() - t0)
    _log('cpu cross-check: reference computed')

    if os.environ.get('BENCH_MEASURE_BASELINE'):
        ref_rate = reference_rate()
        baseline_rate = ref_rate if ref_rate is not None else rate_cpu
        baseline_name = ('reference cosmoprimo (numpy/scipy, 1 CPU core, measured live)'
                         if ref_rate is not None else 'same pipeline, XLA CPU f64')
    else:
        baseline_rate = BASELINE_RATE_PINNED
        baseline_name = ('reference cosmoprimo (numpy/scipy, 1 CPU core; '
                         'pinned mean of r01/r02 driver measurements)')

    # ---- headline: wait for its compile (mandatory), time, cross-check
    threads['headline'].join(timeout=max(60.0, _budget_left() - 120.0))
    status = built.get('headline')
    if status is None or status[0] != 'ok':
        reason = ('compile did not finish in budget' if status is None
                  else f'{type(status[1]).__name__}: {status[1]}'[:200])
        _skip_line(f'pk->xi FFTLog + distances + sigma8, f64, batch {n}',
                   baseline_name, 'cosmologies/s', reason)
    else:
        checksum, fft_engine = status[1]
        best = _time_best(checksum, [head_args[i] for i in range(1, nrep + 1)],
                          scalar=lambda out: out[0])
        rate = n / best
        # accuracy: first N_COMPARE rows of the first timed rep vs CPU f64
        _, slices = checksum(*head_args[1])
        xi_t, chi_t, s8_t = (np.asarray(v) for v in slices)
        xi_c, chi_c, s8_c = out_cpu
        scale = np.abs(xi_c).max(axis=-1, keepdims=True)
        max_err = float(max((np.abs(xi_t - xi_c) / scale).max(),
                            np.abs(chi_t / chi_c - 1).max(),
                            np.abs(s8_t / s8_c - 1).max()))
        print(json.dumps({
            'metric': f'pk->xi FFTLog + distances + sigma8, f64, batch {n}',
            'value': round(rate, 1),
            'unit': 'cosmologies/s',
            'vs_baseline': round(rate / baseline_rate, 2),
            'baseline': baseline_name,
            'baseline_rate': round(baseline_rate, 2),
            'jax_cpu_rate': round(rate_cpu, 2),
            'max_rel_err_vs_cpu_f64': max_err,
            'fft_engine': fft_engine,
            'backend': jax.default_backend(),
        }), flush=True)
        _log('headline: emitted')

    # ---- native Boltzmann solver: the capability metric (the reference
    # can only obtain a Boltzmann P(k) from an external single-cosmology
    # CPU C build; there is nothing in-image to race, so vs_baseline is
    # against a pinned nominal 1.5 s/cosmology CLASS-like solve).  Joined
    # BEFORE the non-linear variants: it is the flagship metric.
    label = f'native Boltzmann linear P(k), nk={nk_native}, batch {n_native}'
    base_label = 'nominal CLASS-like C Boltzmann solve, 1.5 s/cosmology on 1 CPU core (pinned; no external build runnable in-image)'
    threads['native'].join(timeout=max(0.0, _budget_left() - 90.0))
    status = built.get('native')
    if status is None or status[0] != 'ok':
        reason = (f'compile did not finish in budget ({_budget_left():.0f}s left)'
                  if status is None else f'{type(status[1]).__name__}: {status[1]}'[:200])
        _skip_line(label, base_label, 'cosmologies/s', reason)
    else:
        checksum = status[1]
        best = _time_best(checksum, [nat_args[i] for i in range(1, nrep + 1)])
        print(json.dumps({
            'metric': label,
            'value': round(n_native / best, 3),
            'unit': 'cosmologies/s',
            'vs_baseline': round(n_native / best / (1.0 / 1.5), 2),
            'baseline': base_label,
            'backend': jax.default_backend(),
        }), flush=True)
        _log('native: emitted')

    # ---- halofit / hmcode pipelines
    for name, n_batch, reserve, label in (
            ('halofit', n_nl, 60.0, f'non-linear (halofit) pk->xi pipeline, f64, batch {n_nl}'),
            ('hmcode', n_hm, 30.0, f'HMcode-2020 halo-model pk->xi pipeline, f64, batch {n_hm}')):
        base_label = f'reference linear pipeline rate (the reference has no native {name})'
        threads[name].join(timeout=max(0.0, _budget_left() - reserve))
        status = built.get(name)
        if status is None or status[0] != 'ok':
            reason = (f'compile did not finish in budget ({_budget_left():.0f}s left)'
                      if status is None else f'{type(status[1]).__name__}: {status[1]}'[:200])
            _skip_line(label, base_label, 'cosmologies/s', reason)
            continue
        checksum, _ = status[1]
        args_list = hf_args if name == 'halofit' else hm_args
        best = _time_best(checksum, [args_list[i] for i in range(1, nrep + 1)])
        print(json.dumps({
            'metric': label,
            'value': round(n_batch / best, 1),
            'unit': 'cosmologies/s',
            'vs_baseline': round(n_batch / best / baseline_rate, 2),
            'baseline': base_label,
            'backend': jax.default_backend(),
        }), flush=True)
        _log(f'{name}: emitted')

    # ---- standalone fused Pallas FFTLog kernel vs the XLA pair-FFT engine
    label = f'fused Pallas FFTLog kernel, df32, batch {n_pallas} x 4096'
    base_label = 'XLA f64 pair-FFT FFTLog (same transform)'
    threads['pallas'].join(timeout=max(0.0, _budget_left() - 10.0))
    status = built.get('pallas')
    if status is None or status[0] != 'ok':
        reason = (f'compile did not finish in budget ({_budget_left():.0f}s left)'
                  if status is None else f'{type(status[1]).__name__}: {status[1]}'[:200])
        _skip_line(label, base_label, 'transforms/s', reason)
    else:
        pair, pallas, pk_batch = status[1]
        best_pair = _time_best(pair, [(pk_batch,)] * 5)
        if isinstance(pallas, Exception):
            _skip_line(label, base_label, 'transforms/s',
                       f'{type(pallas).__name__}: {pallas}'[:200])
        else:
            best_pallas = _time_best(pallas, [(pk_batch,)] * 5)
            print(json.dumps({
                'metric': label,
                'value': round(n_pallas / best_pallas, 1),
                'unit': 'transforms/s',
                'vs_baseline': round(best_pair / best_pallas, 2),
                'baseline': base_label,
                'baseline_rate': round(n_pallas / best_pair, 1),
                'backend': jax.default_backend(),
            }), flush=True)
            _log('pallas kernel: emitted')
    _log('all metrics done')


if __name__ == '__main__':
    main()
