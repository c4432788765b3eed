"""BAO filter tests: wiggle removal quality (smoothness + unbiasedness),
numerical stability under small parameter jitter (reference parity:
tests/test_bao_filter.py:30-46), and trace contracts for the
differentiable subset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmoprimo_tpu.bao_filter import CorrelationFunctionBAOFilter, PowerSpectrumBAOFilter
from cosmoprimo_tpu.cosmology import Cosmology


@pytest.fixture(scope='module')
def setup():
    cosmo = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649, engine='eisenstein_hu')
    cosmo_fid = Cosmology(engine='eisenstein_hu')
    pk = cosmo.get_fourier().pk_interpolator().to_1d(z=0.0)
    return cosmo, cosmo_fid, pk


def _check_pknow(filt, pk, k=None):
    """pknow should be smooth, positive, and unbiased: the wiggles should
    oscillate around 1 within the BAO range."""
    if k is None:
        k = np.geomspace(5e-3, 0.5, 200)
    kk = np.asarray(filt.k)
    mask = (kk >= k[0]) & (kk <= k[-1])
    wig = np.asarray(filt.wiggles).reshape(len(kk), -1)[mask, 0]
    assert np.isfinite(wig).all()
    assert np.all(np.abs(wig - 1) < 0.15), np.abs(wig - 1).max()
    # unbiased: mean of wiggles ~ 1
    assert abs(np.mean(wig) - 1) < 0.02


@pytest.mark.parametrize('engine', ['hinton2017', 'savgol', 'ehsavgol', 'ehpoly', 'wallish2018', 'bspline'])
def test_pk_filters(setup, engine):
    cosmo, cosmo_fid, pk = setup
    filt = PowerSpectrumBAOFilter(pk, engine=engine, cosmo=cosmo, cosmo_fid=cosmo_fid)
    _check_pknow(filt, pk)
    interp = filt.smooth_pk_interpolator()
    assert np.isfinite(float(interp(0.1)))


@pytest.mark.parametrize('engine', ['brieden2022', 'peakaverage'])
def test_pk_filters_fid(setup, engine):
    cosmo, cosmo_fid, pk = setup
    filt = PowerSpectrumBAOFilter(pk, engine=engine, cosmo=cosmo, cosmo_fid=cosmo_fid)
    _check_pknow(filt, pk)


def test_xi_filter(setup):
    cosmo, cosmo_fid, pk = setup
    xi = pk.to_xi()
    filt = CorrelationFunctionBAOFilter(xi, engine='kirkby2013', cosmo=cosmo, cosmo_fid=cosmo_fid)
    s = np.asarray(filt.s)
    xinow = np.asarray(filt.xinow)
    assert np.isfinite(xinow).all()
    # peak removed: xinow * s^2 should not have the BAO bump near 100 Mpc/h
    mask = (s > 80) & (s < 120)
    bump = np.asarray(filt.xi)[mask] * s[mask] ** 2
    smooth = xinow[mask] * s[mask] ** 2
    assert bump.max() > smooth.max()  # peak actually removed
    # matches input xi outside the filter window
    far = (s > 250) & (s < 400)
    np.testing.assert_allclose(xinow[far], np.asarray(filt.xi)[far], rtol=1e-6)


def test_stability_under_jitter(setup):
    """Filters should be numerically stable: 1e-5 parameter jitter moves
    pknow by a comparable relative amount (no index flips)."""
    cosmo, cosmo_fid, _ = setup
    for engine in ['ehpoly', 'hinton2017', 'wallish2018']:
        pk1 = cosmo.get_fourier().pk_interpolator().to_1d(z=0.0)
        cosmo2 = cosmo.clone(omega_cdm=0.12 * (1 + 1e-5))
        pk2 = cosmo2.get_fourier(engine='eisenstein_hu').pk_interpolator().to_1d(z=0.0)
        f1 = PowerSpectrumBAOFilter(pk1, engine=engine, cosmo=cosmo, cosmo_fid=cosmo_fid)
        f2 = PowerSpectrumBAOFilter(pk2, engine=engine, cosmo=cosmo2, cosmo_fid=cosmo_fid)
        mask = (f1.k > 1e-3) & (f1.k < 1.0)
        rel = np.abs(np.asarray(f2.pknow)[mask] / np.asarray(f1.pknow)[mask] - 1)
        assert rel.max() < 1e-3, (engine, rel.max())


def test_ehpoly_traced(setup):
    """ehpoly is fully traced: jit + grad through the filter."""
    cosmo, cosmo_fid, _ = setup

    def pknow_at(omega_cdm):
        c = Cosmology(omega_cdm=omega_cdm, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649,
                      engine='eisenstein_hu')
        pk = c.get_fourier().pk_interpolator().to_1d(z=0.0)
        filt = PowerSpectrumBAOFilter(pk, engine='ehpoly', cosmo=None)
        kk = np.asarray(filt.k)
        i = np.searchsorted(kk, 0.1)
        return filt.pknow.reshape(len(kk), -1)[i, 0]

    v = float(jax.jit(pknow_at)(0.12))
    assert np.isfinite(v) and v > 0
    g = float(jax.grad(pknow_at)(0.12))
    assert np.isfinite(g) and g != 0


def test_kirkby_traced(setup):
    cosmo, cosmo_fid, pk = setup
    xi = pk.to_xi()

    def xinow_at(scale):
        filt = CorrelationFunctionBAOFilter(xi.clone(xi=scale * xi.xi), engine='kirkby2013')
        return filt.xinow.reshape(-1)[400]

    v = float(jax.jit(xinow_at)(1.0))
    g = float(jax.grad(xinow_at)(1.0))
    assert np.isfinite(v) and np.isfinite(g) and abs(g - v) < 1e-10  # linear
