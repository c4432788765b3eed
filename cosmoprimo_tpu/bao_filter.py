r"""BAO wiggle/peak removal filters.

Nine filters with reference parity (cosmoprimo/bao_filter.py):

==============  =========================================================  ==========
name            method                                                     traced?
==============  =========================================================  ==========
hinton2017      degree-12 constrained poly fit in log-log                  yes (after prepare)
savgol          Savitzky-Golay on log(k pk) — here a static-coefficient    yes
                jnp convolution (coefficients precomputed at prepare)
ehsavgol        Savitzky-Golay on the ratio to EH-nowiggle                 yes
ehpoly          6-term poly fit of pk / EH-nowiggle (constrained LSQ)      yes
wallish2018     DST-II to real space, excise the peak, inverse DST         no (host)
brieden2022     peak/trough averaging at fiducial peak positions           no (host)
peakaverage     simplified Brieden with frozen fiducial peak k's           yes (after prepare)
bspline         velocileptors-style constrained B-spline fit               yes (after prepare)
kirkby2013      (xi) cut the peak window, poly fit outside, blend          yes (after prepare)
==============  =========================================================  ==========

Two-phase structure: ``_prepare`` runs once, eagerly on host (data-dependent
index selection — argmax / find_peaks — is frozen there, the reference's
design made explicit); ``_compute`` re-runs per power spectrum and is traced
jnp wherever marked, with static shapes (zero-weight masking instead of
boolean indexing, the jit-safe reformulation).
"""

import numpy as np

import jax
import jax.numpy as jnp

from .cosmology import Cosmology, Fourier
from .interpolator import CorrelationFunctionInterpolator2D, PowerSpectrumInterpolator2D
from .ops import Interpolator1D, simpson
from .utils import LeastSquareSolver

_FIDUCIAL_RS_DRAG = 100.91463132327911  # DESI fiducial, Mpc/h


# ----------------------------------------------------------------------------
# Power spectrum filters
# ----------------------------------------------------------------------------

_PK_FILTER_REGISTRY = {}
_XI_FILTER_REGISTRY = {}


def register_pk_filter(cls):
    _PK_FILTER_REGISTRY[cls.name] = cls
    return cls


def register_xi_filter(cls):
    _XI_FILTER_REGISTRY[cls.name] = cls
    return cls


class BasePowerSpectrumBAOFilter(object):
    """Base BAO filter for power spectra; evaluates the input interpolator
    on a 1024-point geometric k-grid and exposes pk / pknow / wiggles."""

    name = 'base'

    def __init__(self, pk_interpolator, cosmo=None, cosmo_fid=None, **kwargs):
        self._cosmo_fid = cosmo_fid
        self._cosmo = cosmo
        self.pk_interpolator = pk_interpolator
        self.set_k(**kwargs)
        self.set_pk(pk_interpolator, cosmo=cosmo)
        self._prepare()
        self._compute()
        self.pk, self.pknow = (x.reshape(self.shape) for x in (self.pk, self.pknow))

    def _prepare(self):
        """One-time host-side setup (freeze data-dependent indices here)."""

    def set_k(self, nk=1024):
        self.k = np.geomspace(float(self.pk_interpolator.extrap_kmin), float(self.pk_interpolator.extrap_kmax), nk)

    def set_pk(self, pk_interpolator, cosmo=None):
        if cosmo is not None:
            self._cosmo = cosmo
        self.pk_interpolator = pk_interpolator
        if isinstance(pk_interpolator, PowerSpectrumInterpolator2D):
            pk = pk_interpolator(jnp.asarray(self.k), pk_interpolator.z, ignore_growth=True)
        else:
            pk = pk_interpolator(jnp.asarray(self.k))
        self.shape = pk.shape
        self.pk = pk.reshape(pk.shape[0], -1)

    def __call__(self, pk_interpolator, cosmo=None):
        self.set_pk(pk_interpolator, cosmo=cosmo)
        self._compute()
        self.pk, self.pknow = (x.reshape(self.shape) for x in (self.pk, self.pknow))
        return self

    @property
    def wiggles(self):
        return self.pk / self.pknow

    def smooth_pk_interpolator(self, **kwargs):
        return self.pk_interpolator.clone(k=self.k, pk=self.pknow, **kwargs)

    def smooth_xi_interpolator(self, **kwargs):
        return self.smooth_pk_interpolator().to_xi(**kwargs)

    @property
    def cosmo(self):
        if self._cosmo is None:
            self._cosmo = Cosmology()
        return self._cosmo

    @property
    def cosmo_fid(self):
        if self._cosmo_fid is None:
            self._cosmo_fid = Cosmology()
        return self._cosmo_fid

    def rs_drag_ratio(self):
        if self._cosmo is None:
            return 1.0
        if self._cosmo_fid is None:
            rs_fid = _FIDUCIAL_RS_DRAG
        else:
            rs_fid = self.cosmo_fid.rs_drag
        return self.cosmo.rs_drag / rs_fid

    def _pknow_eh(self, k, cosmo=None):
        """EH no-wiggle power spectrum evaluated at k (z=0, growth ignored)."""
        cosmo = cosmo if cosmo is not None else self.cosmo
        return Fourier(cosmo, engine='eisenstein_hu_nowiggle', set_engine=False).pk_interpolator()(jnp.asarray(k), z=0.0)


@register_pk_filter
class Hinton2017PowerSpectrumBAOFilter(BasePowerSpectrumBAOFilter):
    """Degree-12 polynomial fit of log pk in log k with a Gaussian
    down-weight around the spectrum peak and 6 endpoint constraints
    (Barry's smoothing; arXiv:1611.08040 heritage)."""

    name = 'hinton2017'

    def __init__(self, pk_interpolator, degree=12, sigma=0.5, weight=0.9, **kwargs):
        self.degree = degree
        self.sigma = sigma
        self.weight = weight
        super().__init__(pk_interpolator, **kwargs)

    def _prepare(self):
        self.kmask = (self.k > 1e-4) & (self.k < 5.0)
        logk = np.log10(self.k[self.kmask])
        logpk0 = np.log10(np.asarray(self.pk[self.kmask, 0]))
        maxk = logk[np.argmax(logpk0)]  # frozen at prepare
        meanlogk, stdlogk = np.mean(logk), np.std(logk)
        gauss = np.exp(-0.5 * ((logk - maxk) / self.sigma) ** 2)
        w = 1.0 - self.weight * gauss

        gradient = np.array([((logk - meanlogk) / stdlogk) ** i for i in range(self.degree + 1)])
        constraint_gradient = np.column_stack([
            gradient[..., 0], gradient[..., 1] - gradient[..., 0],
            gradient[..., 2] - 2.0 * gradient[..., 1] + gradient[..., 0],
            gradient[..., -1], gradient[..., -2] - gradient[..., -1],
            gradient[..., -3] - 2.0 * gradient[..., -2] + gradient[..., -1]])
        self.solver = LeastSquareSolver(gradient, precision=w ** 2, constraint_gradient=constraint_gradient)

    def _compute(self):
        logpk = jnp.log10(self.pk[self.kmask].T)
        constraint = jnp.stack([
            logpk[..., 0], logpk[..., 1] - logpk[..., 0],
            logpk[..., 2] - 2.0 * logpk[..., 1] + logpk[..., 0],
            logpk[..., -1], logpk[..., -2] - logpk[..., -1],
            logpk[..., -3] - 2.0 * logpk[..., -2] + logpk[..., -1]], axis=-1)
        self.solver(logpk, constraint=constraint)
        model = 10 ** self.solver.model().T
        mask = jnp.asarray(self.kmask)[:, None]
        self.pknow = jnp.where(mask, jnp.zeros_like(self.pk).at[self.kmask].set(model), self.pk)


def _savgol_smooth(y, coeffs, edge):
    """'same'-mode convolution along axis 0 with static Savitzky-Golay
    coefficients; the ``edge`` leading/trailing samples keep the input."""
    n = y.shape[0]
    out = jax.vmap(lambda col: jnp.convolve(col, coeffs, mode='same'), in_axes=1, out_axes=1)(y)
    idx = jnp.arange(n)[:, None]
    keep = (idx < edge) | (idx >= n - edge)
    return jnp.where(keep, y, out)


def _savgol_coeffs(window, polyorder):
    """Savitzky-Golay smoothing coefficients (host, static): least-squares
    polynomial fit weights at the window center."""
    half = window // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    A = np.vander(x, polyorder + 1, increasing=True)   # (window, order+1)
    # value at the center of the fitted polynomial = e0^T (A^T A)^-1 A^T y
    coeffs = np.linalg.lstsq(A, np.eye(window), rcond=None)[0][0]
    return coeffs[::-1]


@register_pk_filter
class SavGolPowerSpectrumBAOFilter(BasePowerSpectrumBAOFilter):
    """Savitzky-Golay smoothing of log(k pk); the reference calls
    scipy.signal.savgol_filter (host-only) — here the static filter
    coefficients are precomputed so the smoothing itself traces."""

    name = 'savgol'

    def _prepare(self):
        self.nfilter = int(np.ceil(np.log(7) / np.log(self.k[-1] / self.k[-2])) // 2 * 2 + 1)
        self._coeffs = jnp.asarray(_savgol_coeffs(self.nfilter, 4))

    def _compute(self):
        logkpk = jnp.log(jnp.asarray(self.k)[:, None] * self.pk)
        smooth = _savgol_smooth(logkpk, self._coeffs, self.nfilter // 2)
        self.pknow = jnp.exp(smooth) / jnp.asarray(self.k)[:, None]


@register_pk_filter
class EHNoWiggleSavGolPowerSpectrumBAOFilter(BasePowerSpectrumBAOFilter):
    """Savitzky-Golay smoothing of the ratio to the EH no-wiggle spectrum."""

    name = 'ehsavgol'

    def _prepare(self):
        self.nfilter = int(np.ceil(np.log(7) / np.log(self.k[-1] / self.k[-2])) // 2 * 2 + 1)
        self._coeffs = jnp.asarray(_savgol_coeffs(self.nfilter, 4))

    def _compute(self):
        pknow = self._pknow_eh(self.k)[:, None]
        ratio = self.pk / pknow
        self.pknow = _savgol_smooth(ratio, self._coeffs, self.nfilter // 2) * pknow


@register_pk_filter
class EHNoWigglePolyPowerSpectrumBAOFilter(BasePowerSpectrumBAOFilter):
    """6-term polynomial (k^-2 .. k^3) constrained fit of pk / EH-nowiggle.

    Static-shape formulation: the k-range selection enters as zero weights
    in the least-squares precision instead of boolean indexing, so the
    whole filter jits (including a traced ``rs_drag`` rescale)."""

    name = 'ehpoly'

    def __init__(self, pk_interpolator, krange=(1e-3, 1.0), rescale_krange=True, cosmo=None, **kwargs):
        self.krange = krange
        self.rescale_krange = rescale_krange
        super().__init__(pk_interpolator, cosmo=cosmo, **kwargs)

    def _prepare(self):
        # fixed fitting support for the traced path: the widest k-range
        # used; the (possibly rescaled) krange selects via weights
        self.kmask = (self.k >= self.krange[0] / 2.0) & (self.k <= self.krange[1] * 2.0)
        self._kfit = self.k[self.kmask]
        self.model = np.array([self._kfit ** (i - 2) for i in range(6)])

    def _compute(self):
        import jax as _jax
        rescale = self.rs_drag_ratio() if self.rescale_krange else 1.0
        if not isinstance(rescale, _jax.core.Tracer):
            # concrete rescale: reproduce the reference exactly — boolean
            # mask at the rescaled krange, constraints at the masked edges
            # (reference bao_filter.py:326-342)
            krange = np.asarray(self.krange) / float(np.asarray(rescale))
            mask = (self.k >= krange[0]) & (self.k <= krange[1])
            k = self.k[mask]
            model = np.array([k ** (i - 2) for i in range(6)])
            pknow = self._pknow_eh(k)[:, None]
            ratio = (self.pk[mask] / pknow).T
            constraint_gradient = np.column_stack([
                model[..., 0], model[..., 1] - model[..., 0],
                model[..., -1], model[..., -2] - model[..., -1]])
            solver = LeastSquareSolver(model, precision=k ** 2, constraint_gradient=constraint_gradient)
            solver(ratio, constraint=jnp.stack([ratio[..., 0], ratio[..., 1] - ratio[..., 0],
                                                ratio[..., -1], ratio[..., -2] - ratio[..., -1]], axis=-1))
            wiggles = jnp.ones_like(self.pk).at[mask].set((ratio / solver.model()).T)
            self.pknow = self.pk / wiggles
            return
        # traced rescale: static shapes via zero-weight masking over the
        # wide fixed support (jit-safe reformulation)
        krange = jnp.asarray(self.krange) / rescale
        k = jnp.asarray(self._kfit)
        inrange = (k >= krange[0]) & (k <= krange[1])
        weights = jnp.where(inrange, k ** 2, 0.0)

        pknow = self._pknow_eh(self._kfit)[:, None]
        ratio = (self.pk[self.kmask] / pknow).T

        constraint_gradient = np.column_stack([
            self.model[..., 0], self.model[..., 1] - self.model[..., 0],
            self.model[..., -1], self.model[..., -2] - self.model[..., -1]])
        solver = LeastSquareSolver(self.model, precision=weights, constraint_gradient=constraint_gradient)
        solver(ratio, constraint=jnp.stack([ratio[..., 0], ratio[..., 1] - ratio[..., 0],
                                            ratio[..., -1], ratio[..., -2] - ratio[..., -1]], axis=-1))
        wiggles_fit = (ratio / solver.model()).T
        wiggles = jnp.ones_like(self.pk).at[self.kmask].set(jnp.where(inrange[:, None], wiggles_fit, 1.0))
        self.pknow = self.pk / wiggles


@register_pk_filter
class Wallish2018PowerSpectrumBAOFilter(BasePowerSpectrumBAOFilter):
    """DST-II of log(k pk) on a 4096-point linear k-grid; the BAO bump is
    located via the curvature maximum of the even/odd sine coefficients,
    excised and re-splined (x idx^2), then inverse-transformed
    (arXiv:1810.02800 App. D). Host-side (data-dependent index boxes)."""

    name = 'wallish2018'

    def _compute(self):
        from scipy import fftpack, interpolate
        k = np.linspace(float(self.pk_interpolator.extrap_kmin), 2.0, 4096)
        if isinstance(self.pk_interpolator, PowerSpectrumInterpolator2D):
            pk = self.pk_interpolator(k, self.pk_interpolator.z, ignore_growth=True)
        else:
            pk = self.pk_interpolator(k)
        pk = np.asarray(pk).reshape(pk.shape[0], -1)

        kpk = np.log(k[:, None] * pk)
        kpkffted = fftpack.dst(kpk, type=2, axis=0, norm='ortho')
        even = kpkffted[::2].copy()
        odd = kpkffted[1::2].copy()

        xeven = 1 + np.arange(even.shape[0])
        xodd = 1 + np.arange(odd.shape[0])
        dd_even = interpolate.CubicSpline(xeven, even, axis=0, bc_type='clamped')(xeven, nu=2)
        dd_odd = interpolate.CubicSpline(xodd, odd, axis=0, bc_type='clamped')(xodd, nu=2)
        margin_first, margin_second = 20, 5
        offset = (-10, 20)

        def smooth(vals, x, dd):
            argmax = dd[margin_first:-margin_first].argmax() + margin_first
            hi = argmax + margin_second + dd[argmax + margin_second:-margin_first].argmax() + offset[1]
            box = (argmax + offset[0], hi)
            mask = np.ones_like(vals, dtype=bool)
            mask[box[0]:box[1] + 1] = False
            spline = interpolate.CubicSpline(x[mask], vals[mask] * x[mask] ** 2, bc_type='clamped')
            return spline(x) / x ** 2

        for iz in range(pk.shape[-1]):
            even[:, iz] = smooth(even[:, iz], xeven, dd_even[:, iz])
            odd[:, iz] = smooth(odd[:, iz], xodd, dd_odd[:, iz])

        merged = np.empty_like(kpkffted)
        merged[::2] = even
        merged[1::2] = odd
        kpknow = fftpack.idst(merged, type=2, axis=0, norm='ortho')
        pknow = np.exp(kpknow) / k[:, None]

        mask = (k > 1e-2) & (k < 1.5)
        k, pknow = k[mask], pknow[mask]
        pk_self = np.asarray(self.pk)
        mask_left, mask_right = self.k < 5e-4, self.k > 2.0
        k = np.concatenate([self.k[mask_left], k, self.k[mask_right]], axis=0)
        pknow = np.concatenate([pk_self[mask_left], pknow, pk_self[mask_right]], axis=0)
        pknow = interpolate.CubicSpline(k, pknow, axis=0, bc_type='clamped', extrapolate=False)(self.k)
        tophat = self._tophat(self.k, kmax=1.0, scale=20.0)[..., None]
        wiggles = (pk_self / pknow - 1.0) * tophat + 1.0
        self.pknow = jnp.asarray(pk_self / wiggles)

    @staticmethod
    def _tophat(k, kmax=1, scale=1):
        tophat = np.ones_like(k)
        mask = k > kmax
        tophat[mask] = np.exp(-scale ** 2 * (k[mask] / kmax - 1.0) ** 2)
        return tophat


@register_pk_filter
class Brieden2022PowerSpectrumBAOFilter(BasePowerSpectrumBAOFilter):
    """Peak/trough averaging of pk/pknow_EH at fiducial peak positions
    (arXiv:2204.11868 App. D). Requires ``cosmo_fid`` with an engine;
    host-side (scipy find_peaks / quadratic interp)."""

    name = 'brieden2022'

    @property
    def cosmo_fid(self):
        if self._cosmo_fid is None:
            raise ValueError('cosmo_fid must be provided, with an engine')
        return self._cosmo_fid

    def _prepare(self):
        self.kmask_fid = (self.k >= 1e-3) & (self.k <= 1.0)
        self.k_fid = self.k[self.kmask_fid]
        pk_fid = np.asarray(Fourier(self.cosmo_fid).pk_interpolator()(jnp.asarray(self.k_fid), z=0.0))
        pknow_fid = np.asarray(self._pknow_eh(self.k_fid, cosmo=self.cosmo_fid))
        ratio = pk_fid / pknow_fid
        gradient = np.array([self.k_fid ** (i - 1) for i in range(4)])
        constraint_gradient = np.column_stack([gradient[..., 0], gradient[..., 1] - gradient[..., 0],
                                               gradient[..., -1], gradient[..., -2] - gradient[..., -1]])
        solver = LeastSquareSolver(gradient, precision=self.k_fid ** 2, constraint_gradient=constraint_gradient)
        solver(ratio, constraint=np.array([ratio[..., 0], ratio[..., 1] - ratio[..., 0],
                                           ratio[..., -1], ratio[..., -2] - ratio[..., -1]]))
        self.pknow_correction = np.asarray(solver.model())[:, None]
        self.ratio_fid = ratio[:, None] / self.pknow_correction
        ik0 = np.searchsorted(self.k_fid, 0.02, side='right') + 1
        from scipy import signal
        self.ik_fid_peaks = []
        for si in [1.0, -1.0]:
            ix = signal.find_peaks(si * self.ratio_fid[ik0:, 0])[0] + ik0
            ix = np.concatenate([[0]] * bool(ix[0] > 0) + [ix] + [[-1]] * bool(ix[-1] < self.k_fid.size - 1), axis=0)
            self.ik_fid_peaks.append(ix)
        self.ratio_now_fid = self._interp(*self.ik_fid_peaks, self.k_fid, self.ratio_fid)

    @staticmethod
    def _interp(ixh, ixl, x, y, kind=2):
        from scipy import interpolate
        toret = 0.0
        for ix in [ixh, ixl]:
            toret = toret + interpolate.interp1d(x[ix], np.asarray(y)[ix], kind=kind, axis=0,
                                                 fill_value='extrapolate', assume_sorted=True)(x)
        return toret / 2.0

    def _compute(self):
        rescale = float(self.rs_drag_ratio())
        is2d = isinstance(self.pk_interpolator, PowerSpectrumInterpolator2D)
        if is2d:
            pk = self.pk_interpolator(jnp.asarray(self.k_fid / rescale), self.pk_interpolator.z, ignore_growth=True)
        else:
            pk = self.pk_interpolator(jnp.asarray(self.k_fid / rescale))
        pk = np.asarray(pk).reshape(pk.shape[0], -1)

        pknow = np.asarray(self._pknow_eh(self.k_fid * rescale))[:, None]
        pknow = pknow * self.pknow_correction
        ratio = pk / pknow / self.ratio_fid
        pknow = self._interp(*self.ik_fid_peaks, self.k_fid, ratio) * pknow * self.ratio_now_fid
        pk_interpolator = self.pk_interpolator.clone(k=self.k_fid / rescale, pk=pknow)
        pknow_out = np.array(self.pk, copy=True)
        if is2d:
            pkv = pk_interpolator(jnp.asarray(self.k_fid), self.pk_interpolator.z, ignore_growth=True)
        else:
            pkv = pk_interpolator(jnp.asarray(self.k_fid))
        pknow_out[self.kmask_fid] = np.asarray(pkv).reshape(pkv.shape[0], -1)
        self.pknow = jnp.asarray(pknow_out)


@register_pk_filter
class PeakAveragePowerSpectrumBAOFilter(BasePowerSpectrumBAOFilter):
    """Simplified Brieden 2022: fiducial peak positions frozen at prepare,
    rescaled by rs_drag ratio, averaged through cubic splines in log-k.
    Traced after prepare (Interpolator1D handles traced knots)."""

    name = 'peakaverage'

    @property
    def cosmo_fid(self):
        if self._cosmo_fid is None:
            raise ValueError('cosmo_fid must be provided, with an engine')
        return self._cosmo_fid

    def _prepare(self):
        index = np.flatnonzero((self.k >= 1e-3) & (self.k <= 1.0))
        k_fid = self.k[index]
        pk_fid = np.asarray(Fourier(self.cosmo_fid).pk_interpolator()(jnp.asarray(k_fid), z=0.0))
        pknow_fid = np.asarray(self._pknow_eh(k_fid, cosmo=self.cosmo_fid))
        ratio = pk_fid / pknow_fid
        gradient = np.array([k_fid ** (i - 1) for i in range(4)])
        constraint_gradient = np.column_stack([gradient[..., 0], gradient[..., 1] - gradient[..., 0],
                                               gradient[..., -1], gradient[..., -2] - gradient[..., -1]])
        solver = LeastSquareSolver(gradient, precision=k_fid ** 2, constraint_gradient=constraint_gradient)
        solver(ratio, constraint=np.array([ratio[..., 0], ratio[..., 1] - ratio[..., 0],
                                           ratio[..., -1], ratio[..., -2] - ratio[..., -1]]))
        pknow_correction = np.asarray(solver.model())
        ik0 = np.searchsorted(k_fid, 1e-2, side='right') + 1
        from scipy import signal
        self.k_peaks, self.pad_peaks = [], []
        for si in [1.0, -1.0]:
            ik = signal.find_peaks(si * ratio[ik0:] / pknow_correction[ik0:])[0] + ik0
            npadlow = int(index[0])
            ik = ik + npadlow
            ikmax = max(index[-1], ik[-1] + 1)
            self.pad_peaks.append((npadlow, len(ik), self.k.size - ikmax))
            self.k_peaks.append(self.k[np.concatenate([np.arange(npadlow), ik, np.arange(ikmax, self.k.size)], axis=0)])

    def _interp(self, xh, xl, x, y, k=3):
        logx = jnp.log10(jnp.asarray(x))
        interp = Interpolator1D(logx, y, k=k, extrap=True, assume_sorted=True)
        toret = 0.0
        for xx in [xh, xl]:
            logxx = jnp.log10(xx)
            yy = interp(logxx)
            toret = toret + Interpolator1D(logxx, yy, k=k, extrap=True, assume_sorted=True)(logx)
        return toret / 2.0

    def _compute(self):
        rescale = self.rs_drag_ratio()
        rescales = [jnp.concatenate([jnp.linspace(1.0, rescale, npad[0]), jnp.full(npad[1], rescale),
                                     jnp.linspace(rescale, 1.0, npad[2])]) for npad in self.pad_peaks]
        pknow = self._pknow_eh(self.k)[:, None]
        self.pknow = self._interp(jnp.asarray(self.k_peaks[0]) / rescales[0],
                                  jnp.asarray(self.k_peaks[1]) / rescales[1],
                                  self.k, self.pk / pknow) * pknow


@register_pk_filter
class BSplinePowerSpectrumBAOFilter(BasePowerSpectrumBAOFilter):
    """Constrained B-spline fit of pk / EH-nowiggle (arXiv:1509.02120 App.
    A); solutions of several knot counts are combined to preserve sigma8
    (and optionally sigma_d) of the input spectrum."""

    name = 'bspline'

    def __init__(self, pk_interpolator, constraint=('sigma8',), cosmo=None, **kwargs):
        if not isinstance(constraint, (tuple, list)):
            constraint = [constraint]
        self.constraint = list(constraint)
        super().__init__(pk_interpolator, cosmo=cosmo, **kwargs)

    def _prepare(self):
        from scipy import interpolate
        kmin, kmax = 5e-3, 1.0
        logk = np.log10(self.k)
        self.kmask_fid = (self.k >= kmin) & (self.k <= kmax)
        logk_fid = logk[self.kmask_fid]
        weights_fid = 1 + 1e6 * np.tanh(0.005 * (logk_fid + 1.1) ** 16)
        weights_fid /= np.sum(weights_fid)
        nknots_degrees = [(14, 5), (14, 6), (15, 7)][:1 + len(self.constraint)]
        self.solvers = []
        for nknots, degree in nknots_degrees:
            ts = np.concatenate([np.zeros(degree + 1), np.arange(1, nknots - 2 * degree) / (nknots - 2 * degree),
                                 np.ones(degree + 1)])
            ts = np.log10((kmax - kmin) * ts + kmin)
            gradient = []
            for ii in range(nknots - degree):
                cn = np.zeros(len(ts) - degree - 1)
                cn[ii] = 1
                gradient.append(interpolate.BSpline(ts, cn, degree)(logk_fid))
            gradient = np.array(gradient)
            constraint_gradient = np.column_stack([gradient[..., 0], gradient[..., 1] - gradient[..., 0],
                                                   gradient[..., -1], gradient[..., -2] - gradient[..., -1]])
            self.solvers.append(LeastSquareSolver(gradient, precision=weights_fid, constraint_gradient=constraint_gradient))

    def _compute(self):
        pknow = self._pknow_eh(self.k)
        ratio_fid = (self.pk[self.kmask_fid] / pknow[self.kmask_fid, None]).T
        constraint = jnp.stack([ratio_fid[..., 0], ratio_fid[..., 1] - ratio_fid[..., 0],
                                ratio_fid[..., -1], ratio_fid[..., -2] - ratio_fid[..., -1]], axis=-1)
        spline_models = []
        for solver in self.solvers:
            solver(ratio_fid, constraint=constraint)
            model = self.pk.T
            model = model.at[..., self.kmask_fid].set(solver.model() * pknow[self.kmask_fid])
            spline_models.append(model)
        spline_models = jnp.stack(spline_models)

        k = jnp.asarray(self.k)

        def tophat(kr):
            return 3 * (jnp.sin(kr) - kr * jnp.cos(kr)) / kr ** 3

        def sigma8(pk):
            return 1 / (2.0 * jnp.pi ** 2) * simpson(k ** 2 * tophat(k * 8.0) ** 2 * pk, x=k, axis=-1)

        def sigmad(pk):
            return 1 / (6.0 * jnp.pi ** 2) * simpson(pk, x=k, axis=-1)

        callables = {'sigma8': sigma8, 'sigmad': sigmad}
        nz = ratio_fid.shape[0]
        system = [jnp.ones((nz, 1, len(spline_models)))]
        target = [jnp.ones((nz, 1))]
        for constraint in self.constraint:
            fn = callables.get(constraint, constraint)
            system.append(jnp.concatenate([fn(model)[..., None, None] for model in spline_models], axis=-1))
            target.append(fn(self.pk.T)[..., None])
        system = jnp.concatenate(system, axis=1)
        target = jnp.concatenate(target, axis=1)
        coeffs = jnp.linalg.solve(system, target[..., None])[..., 0].reshape(nz, len(spline_models))
        self.pknow = jnp.sum(coeffs.T[..., None] * spline_models, axis=0).T


# ----------------------------------------------------------------------------
# Correlation function filters
# ----------------------------------------------------------------------------

class BaseCorrelationFunctionBAOFilter(object):
    """Base BAO filter for correlation functions."""

    name = 'base'

    def __init__(self, xi_interpolator, cosmo=None, cosmo_fid=None, **kwargs):
        self._cosmo_fid = cosmo_fid
        self._cosmo = cosmo
        self.xi_interpolator = xi_interpolator
        self.set_s(**kwargs)
        self.set_xi(xi_interpolator, cosmo=cosmo)
        self._prepare()
        self._compute()
        self.xi, self.xinow = (x.reshape(self.shape) for x in (self.xi, self.xinow))

    def _prepare(self):
        pass

    def set_s(self, ns=1024):
        self.s = np.geomspace(float(self.xi_interpolator.extrap_smin), float(self.xi_interpolator.extrap_smax), ns)

    def set_xi(self, xi_interpolator, cosmo=None):
        if cosmo is not None:
            self._cosmo = cosmo
        self.xi_interpolator = xi_interpolator
        if isinstance(xi_interpolator, CorrelationFunctionInterpolator2D):
            xi = xi_interpolator(jnp.asarray(self.s), xi_interpolator.z, ignore_growth=True)
        else:
            xi = xi_interpolator(jnp.asarray(self.s))
        self.shape = xi.shape
        self.xi = xi.reshape(xi.shape[0], -1)

    def __call__(self, xi_interpolator, cosmo=None):
        self.set_xi(xi_interpolator, cosmo=cosmo)
        self._compute()
        self.xi, self.xinow = (x.reshape(self.shape) for x in (self.xi, self.xinow))
        return self

    def smooth_xi_interpolator(self, **kwargs):
        return self.xi_interpolator.clone(s=self.s, xi=self.xinow, **kwargs)

    def smooth_pk_interpolator(self, **kwargs):
        return self.smooth_xi_interpolator().to_pk(**kwargs)

    @property
    def cosmo(self):
        if self._cosmo is None:
            self._cosmo = Cosmology()
        return self._cosmo

    @property
    def cosmo_fid(self):
        if self._cosmo_fid is None:
            self._cosmo_fid = Cosmology()
        return self._cosmo_fid

    def rs_drag_ratio(self):
        if self._cosmo is None:
            return 1.0
        if self._cosmo_fid is None:
            rs_fid = _FIDUCIAL_RS_DRAG
        else:
            rs_fid = self.cosmo_fid.rs_drag
        return self.cosmo.rs_drag / rs_fid


@register_xi_filter
class Kirkby2013CorrelationFunctionBAOFilter(BaseCorrelationFunctionBAOFilter):
    """Cut the BAO peak window and fit s^(1-i), i<5 polynomials outside,
    blending smoothly (arXiv:1301.3456, picca heritage). Fully traced."""

    name = 'kirkby2013'

    def __init__(self, xi_interpolator, srange_left=(50.0, 82.0), srange_right=(150.0, 190.0),
                 rescale_sbox=True, cosmo=None, **kwargs):
        self.srange_left = np.asarray(srange_left)
        self.srange_right = np.asarray(srange_right)
        self.rescale_sbox = rescale_sbox
        super().__init__(xi_interpolator, cosmo=cosmo, **kwargs)

    def _prepare(self):
        factor = 2.0
        self.smask = (self.s >= self.srange_left[0] / factor) & (self.s <= self.srange_right[1] * factor)
        self.model = np.array([self.s ** (1 - i) for i in range(5)])
        frac = 1.0 / 100.0
        shift = (self.srange_right[0] - self.srange_left[1]) * frac
        self.window = (np.concatenate([[self.srange_left[0] * (1.0 - frac)], self.srange_left,
                                       [self.srange_left[1] + shift, self.srange_right[0] - shift],
                                       self.srange_right, [self.srange_right[1] * (1.0 + frac)]], axis=0),
                       np.array([0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.0]))

    def _compute(self):
        rescale = self.rs_drag_ratio() if self.rescale_sbox else 1.0
        s = jnp.asarray(self.s)
        precision = jnp.interp(s[self.smask] / rescale, jnp.asarray(self.window[0]), jnp.asarray(self.window[1]),
                               left=0.0, right=0.0)
        center = jnp.interp(s / rescale, jnp.asarray(self.window[0][2:-2]), jnp.asarray(1.0 - self.window[1][2:-2]),
                            left=0.0, right=0.0)
        solver = LeastSquareSolver(self.model[..., self.smask], precision=precision)
        params = solver(self.xi[self.smask].T)
        model = params @ jnp.asarray(self.model)
        self.xinow = (self.xi.T * (1.0 - center) + model * center).T


def PowerSpectrumBAOFilter(pk_interpolator, engine='wallish2018', **kwargs):
    """Run the power-spectrum BAO filter named ``engine``."""
    engine = engine.lower()
    try:
        cls = _PK_FILTER_REGISTRY[engine]
    except KeyError:
        raise ValueError(f'Power spectrum BAO filter {engine} is unknown '
                         f'(available: {sorted(_PK_FILTER_REGISTRY)})')
    return cls(pk_interpolator, **kwargs)


def CorrelationFunctionBAOFilter(xi_interpolator, engine='kirkby2013', **kwargs):
    """Run the correlation-function BAO filter named ``engine``."""
    engine = engine.lower()
    try:
        cls = _XI_FILTER_REGISTRY[engine]
    except KeyError:
        raise ValueError(f'Correlation function BAO filter {engine} is unknown '
                         f'(available: {sorted(_XI_FILTER_REGISTRY)})')
    return cls(xi_interpolator, **kwargs)
