"""Roofline decomposition of the fused Pallas FFTLog kernel vs alternatives.

The round-3/4 question: the fused df32 kernel beats the XLA f64 pair-FFT
by only ~1.25x end-to-end on the bench shape (4096 x 4096) - is that all
the transform can give on a v5e, or is there headroom?

This measures, on the same (4096, n) batch:
  1. XLA complex64 FFT alone        - the f32 "speed of light" for the
                                      butterfly work (no Mellin, no df32)
  2. XLA f64 pair-FFT FFTLog        - the production fallback path
  3. fused Pallas df32 FFTLog       - the kernel under test
  4. XLA complex64 FFTLog           - same transform at plain f32 (accuracy
                                      is what df32 exists to fix)

If (3) lands within ~2x of (1) (two FFTs + Mellin multiply per transform),
the kernel is at the achievable envelope and 1.25x vs (2) is a property of
how fast XLA's f64 emulation already is - record and stop.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

T0 = time.time()


def log(msg):
    print(f'[roofline +{time.time() - T0:6.1f}s] {msg}', flush=True)


log(f'backend: {jax.default_backend()} {jax.devices()}')

from cosmoprimo_tpu.fftlog import TophatVariance

NB = 4096
k = np.geomspace(1e-5, 1e2, 1024)
pk = (k / 0.05) ** 0.96 / (1 + (k / 0.1) ** 3.04) * 2e9
pk_batch = jnp.asarray(pk)[None, :] * jnp.linspace(0.8, 1.2, NB)[:, None]


def timeit(fn, *args, nrep=5):
    fn(*args)  # compile+warm
    best = np.inf
    for _ in range(nrep):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best


# probe a 'pair' instance for the padded geometry + Mellin kernel
tp_probe = TophatVariance(k, engine='pair')
fl = tp_probe  # TophatVariance IS an FFTlog
npad = int(fl.padded_size)
log(f'padded transform length: {npad}')

# 1. raw f32 real FFT round trip - the butterfly speed of light
x32 = jnp.asarray(np.random.default_rng(0).standard_normal((NB, npad)),
                  dtype=jnp.float32)


@jax.jit
def fft_f32(z):
    return jnp.sum(jnp.abs(jnp.fft.irfft(jnp.fft.rfft(z, axis=-1), n=npad, axis=-1)))


t_fft = timeit(fft_f32, x32)
log(f'1. f32 rfft+irfft        : {t_fft * 1e3:7.2f} ms  ({NB / t_fft:9.0f} /s)')

# 2. full f32 FFTLog (plain single precision - what df32 fixes accuracy-wise)
# complex constants cannot cross the relay boundary eagerly: ship real/imag
# f32 planes and rebuild the complex kernel inside the jit
pre32 = jnp.asarray(np.asarray(fl.padded_prefactor), dtype=jnp.float32)
post32 = jnp.asarray(np.real(np.asarray(fl.padded_postfactor)), dtype=jnp.float32)
u_np = np.asarray(fl.padded_u)
u_re = jnp.asarray(np.real(u_np), dtype=jnp.float32)
u_im = jnp.asarray(np.imag(u_np), dtype=jnp.float32)
li, ri = int(fl.padded_size_in_left), int(fl.padded_size_in_right)


@jax.jit
def fftlog_f32(f):
    fp = jnp.pad(f.astype(jnp.float32), ((0, 0), (li, ri)))
    s = jnp.fft.rfft(fp * pre32, axis=-1)
    u = jax.lax.complex(u_re[: s.shape[-1]], u_im[: s.shape[-1]])
    out = jnp.fft.irfft(s * u, n=npad, axis=-1) * post32
    return jnp.sum(out)


t_f32 = timeit(fftlog_f32, pk_batch.astype(jnp.float32))
log(f'2. plain-f32 FFTLog      : {t_f32 * 1e3:7.2f} ms  ({NB / t_f32:9.0f} transforms/s)')

for name, engine in [('pair (f64)', 'pair'), ('pallas (df32)', 'pallas')]:
    try:
        tp = TophatVariance(k, engine=engine)

        @jax.jit
        def checksum(f, tp=tp):
            r, var = tp(f)
            return jnp.sum(var)

        t = timeit(checksum, pk_batch)
        log(f'   {name:>14s} FFTLog: {t * 1e3:7.2f} ms  ({NB / t:9.0f} transforms/s)')
    except Exception as exc:
        log(f'   {name}: FAILED {type(exc).__name__}: {exc}')

log('done')
