"""Fused FFTLog transform as a Pallas TPU kernel in double-single arithmetic.

Mosaic (the Pallas TPU compiler) has no 64-bit types, but FFTLog needs
better than float32 (<1e-6 end-to-end). This kernel represents every value
as an unevaluated sum of two float32s ("double-single", ~2^-48 relative
accuracy) and performs the whole FFTLog core — forward FFT, Mellin
multiply, inverse FFT — on a (block, n) tile resident in VMEM:

- error-free transforms (Knuth two-sum, Dekker split two-prod — no FMA
  assumption) implement df64 add/mul on the VPU;
- twiddle factors are computed in float64 on the host per stage and passed
  in as hi/lo pairs (no in-kernel transcendentals);
- orderings avoid in-kernel gathers: the input is bit-reverse permuted
  outside, the forward transform is decimation-in-time (reversed -> natural),
  the inverse is decimation-in-frequency (natural -> reversed), and the
  output is un-permuted outside (bit reversal is an involution).

``fftlog_pair_reference`` is the identical-contract jnp float64 path used
for verification and on backends with native f64.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fft import _fft_tables, fft_pair


# ----------------------------------------------------------------------------
# double-single (two-float32) arithmetic
# ----------------------------------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    # Dekker split for f32: 2^12 + 1
    t = a * np.float32(4097.0)
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _df_add(xh, xl, yh, yl):
    sh, sl = _two_sum(xh, yh)
    sl = sl + (xl + yl)
    return _quick_two_sum(sh, sl)


def _df_sub(xh, xl, yh, yl):
    return _df_add(xh, xl, -yh, -yl)


def _df_mul(xh, xl, yh, yl):
    ph, pl = _two_prod(xh, yh)
    pl = pl + (xh * yl + xl * yh)
    return _quick_two_sum(ph, pl)


def _df_cmul(ar, al, ai, ail, br, brl, bi, bil):
    """(ar + i ai) * (br + i bi) in df64 pairs; returns re(hi,lo), im(hi,lo)."""
    t1h, t1l = _df_mul(ar, al, br, brl)
    t2h, t2l = _df_mul(ai, ail, bi, bil)
    reh, rel = _df_sub(t1h, t1l, t2h, t2l)
    t3h, t3l = _df_mul(ar, al, bi, bil)
    t4h, t4l = _df_mul(ai, ail, br, brl)
    imh, iml = _df_add(t3h, t3l, t4h, t4l)
    return reh, rel, imh, iml


def to_pair(x64):
    """float64 array -> (hi, lo) float32 pair."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def from_pair(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


# ----------------------------------------------------------------------------
# butterfly stages (df64 complex)
# ----------------------------------------------------------------------------

def _view(x, n, size):
    return x.reshape(x.shape[:-1] + (n // size, size))


def _stage_dit(state, twiddle, size):
    (reh, rel, imh, iml) = state
    (ch, cl, sh, sl) = twiddle  # (1, half) pairs of cos/sin
    n = reh.shape[-1]
    half = size // 2
    vs = [_view(x, n, size) for x in (reh, rel, imh, iml)]
    e = [v[..., :half] for v in vs]
    o = [v[..., half:] for v in vs]
    # t = w * odd
    tr_h, tr_l, ti_h, ti_l = _df_cmul(o[0], o[1], o[2], o[3], ch, cl, sh, sl)
    outs = []
    for (eh, el), (th, tl) in (((e[0], e[1]), (tr_h, tr_l)), ((e[2], e[3]), (ti_h, ti_l))):
        ph, plo = _df_add(eh, el, th, tl)
        mh, mlo = _df_sub(eh, el, th, tl)
        outs.append((jnp.concatenate([ph, mh], axis=-1).reshape(reh.shape),
                     jnp.concatenate([plo, mlo], axis=-1).reshape(reh.shape)))
    (reh, rel), (imh, iml) = outs
    return reh, rel, imh, iml


def _stage_dif(state, twiddle, size):
    (reh, rel, imh, iml) = state
    (ch, cl, sh, sl) = twiddle
    n = reh.shape[-1]
    half = size // 2
    vs = [_view(x, n, size) for x in (reh, rel, imh, iml)]
    a = [v[..., :half] for v in vs]
    b = [v[..., half:] for v in vs]
    sr_h, sr_l = _df_add(a[0], a[1], b[0], b[1])
    si_h, si_l = _df_add(a[2], a[3], b[2], b[3])
    dr_h, dr_l = _df_sub(a[0], a[1], b[0], b[1])
    di_h, di_l = _df_sub(a[2], a[3], b[2], b[3])
    tr_h, tr_l, ti_h, ti_l = _df_cmul(dr_h, dr_l, di_h, di_l, ch, cl, sh, sl)
    reh = jnp.concatenate([sr_h, tr_h], axis=-1).reshape(reh.shape)
    rel = jnp.concatenate([sr_l, tr_l], axis=-1).reshape(rel.shape)
    imh = jnp.concatenate([si_h, ti_h], axis=-1).reshape(imh.shape)
    iml = jnp.concatenate([si_l, ti_l], axis=-1).reshape(iml.shape)
    return reh, rel, imh, iml


@functools.lru_cache(maxsize=16)
def _twiddle_tables(n, sign):
    """Per-stage (cos, sin) hi/lo float32 tables, host-precomputed in f64.
    Stage s (size = 2^s) uses the first 2^(s-1) entries; tables are padded
    to (1, n//2) so every stage input has a static shape."""
    m = n.bit_length() - 1
    tables = []
    for s in range(1, m + 1):
        half = 1 << (s - 1)
        ang = sign * 2.0 * np.pi * np.arange(half) / (1 << s)
        c, sn = np.cos(ang), np.sin(ang)
        # broadcast pattern: within a group of `size`, twiddle index = lane % half
        reps = (n // 2) // half
        c = np.tile(c, reps)
        sn = np.tile(sn, reps)
        ch = c.astype(np.float32)
        cl = (c - ch.astype(np.float64)).astype(np.float32)
        sh = sn.astype(np.float32)
        sl = (sn - sh.astype(np.float64)).astype(np.float32)
        tables.append((ch[None], cl[None], sh[None], sl[None]))
    return tables


def _kernel_body(fun_h_ref, fun_l_ref, u_ref, post_ref, ftw_ref, itw_ref, out_h_ref, out_l_ref, *, n):
    """u_ref (4, n): conj(hermitian u)/n as (re_h, re_l, im_h, im_l) rows.
    post_ref (2, n): postfactor (hi, lo), bit-reverse permuted.
    ftw_ref / itw_ref (4m, n//2): per-stage twiddles (cos_h, cos_l, sin_h,
    sin_l) rows for the forward / inverse transforms."""
    reh = fun_h_ref[...]
    rel = fun_l_ref[...]
    imh = jnp.zeros_like(reh)
    iml = jnp.zeros_like(reh)
    state = (reh, rel, imh, iml)
    m = n.bit_length() - 1

    def tw(ref, s, half):
        r = 4 * (s - 1)
        return (ref[r:r + 1, :half], ref[r + 1:r + 2, :half],
                ref[r + 2:r + 3, :half], ref[r + 3:r + 4, :half])

    # forward DIT (bit-reversed input -> natural output)
    for s in range(1, m + 1):
        state = _stage_dit(state, tw(ftw_ref, s, 1 << (s - 1)), 1 << s)
    reh, rel, imh, iml = state
    # T = conj(F) * uc with uc = conj(hermitian-extended u) / n
    tr_h, tr_l, ti_h, ti_l = _df_cmul(reh, rel, -imh, -iml,
                                      u_ref[0:1], u_ref[1:2], u_ref[2:3], u_ref[3:4])
    state = (tr_h, tr_l, ti_h, ti_l)
    # inverse DIF (natural input -> bit-reversed output)
    for s in range(m, 0, -1):
        state = _stage_dif(state, tw(itw_ref, s, 1 << (s - 1)), 1 << s)
    reh, rel, _, _ = state
    ph, plo = _df_mul(reh, rel, post_ref[0:1], post_ref[1:2])
    out_h_ref[...] = ph
    out_l_ref[...] = plo


def _hermitian_extend(u_half_re, u_half_im, n):
    tail = slice(n // 2 - 1, 0, -1)
    re = jnp.concatenate([u_half_re, u_half_re[tail]])
    im = jnp.concatenate([u_half_im, -u_half_im[tail]])
    return re, im


@functools.partial(jax.jit, static_argnums=(4,))
def fftlog_pallas(padded_fun, u_half_re, u_half_im, postfactor, block=16):
    """Fused FFTLog core ``irfft(conj(rfft(f) * u)) * postfactor`` for real
    f64 ``padded_fun`` (batch, n); evaluated in double-single f32 arithmetic
    inside a single Pallas kernel per (block, n) tile. Returns float64
    (accuracy ~1e-13 relative to the f64 reference)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, n = padded_fun.shape
    m = n.bit_length() - 1
    rev, _ = _fft_tables(n)
    rev_j = jnp.asarray(rev)

    u_re, u_im = _hermitian_extend(jnp.asarray(u_half_re, jnp.float64), jnp.asarray(u_half_im, jnp.float64), n)
    ur_h, ur_l = to_pair(u_re / n)
    ui_h, ui_l = to_pair(-u_im / n)
    u4 = jnp.stack([ur_h, ur_l, ui_h, ui_l])

    fun_rev = jnp.take(jnp.asarray(padded_fun, jnp.float64), rev_j, axis=-1)
    fh, fl = to_pair(fun_rev)
    post_rev = jnp.take(jnp.broadcast_to(jnp.asarray(postfactor, jnp.float64), (n,)), rev_j)
    post2 = jnp.stack(to_pair(post_rev))

    ftw = jnp.asarray(np.concatenate([np.concatenate(t, axis=0) for t in _twiddle_tables(n, -1.0)], axis=0))  # (4m, n//2)
    itw = jnp.asarray(np.concatenate([np.concatenate(t, axis=0) for t in _twiddle_tables(n, +1.0)], axis=0))

    pad = (-batch) % block
    if pad:
        fh = jnp.concatenate([fh, jnp.zeros((pad, n), fh.dtype)], axis=0)
        fl = jnp.concatenate([fl, jnp.zeros((pad, n), fl.dtype)], axis=0)
    nblocks = fh.shape[0] // block

    blk_spec = pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_h, out_l = pl.pallas_call(
        functools.partial(_kernel_body, n=n),
        grid=(nblocks,),
        in_specs=[
            blk_spec, blk_spec,
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * m, n // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * m, n // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(blk_spec, blk_spec),
        out_shape=(jax.ShapeDtypeStruct((fh.shape[0], n), jnp.float32),
                   jax.ShapeDtypeStruct((fh.shape[0], n), jnp.float32)),
    )(fh, fl, u4, post2, ftw, itw)

    out = from_pair(out_h, out_l)
    out = jnp.take(out, rev_j, axis=-1)  # bit reversal is an involution
    return out[:batch]


def fftlog_pair_reference(padded_fun, u_half_re, u_half_im, postfactor):
    """Same contract as :func:`fftlog_pallas`, built on the jnp f64 pair FFT
    (verification / non-TPU path)."""
    n = padded_fun.shape[-1]
    u_re, u_im = _hermitian_extend(u_half_re, u_half_im, n)
    u_im = -u_im  # conj: T = conj(F) * conj(u_ext) = hermitian ext of conj(S u)
    re, im = fft_pair(padded_fun, jnp.zeros_like(padded_fun))
    tr = re * u_re + im * u_im
    ti = re * u_im - im * u_re
    out_re, _ = fft_pair(tr, ti, inverse=True)
    return out_re / n * postfactor
