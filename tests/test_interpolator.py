"""Tests of Pk/Xi interpolators: extrapolation semantics, NaN-blocking,
sigma integrals, to_xi/to_pk round trips, jit/vmap/jacfwd contracts
(reference parity: tests/test_interpolator.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmoprimo_tpu.cosmology import Cosmology
from cosmoprimo_tpu.interpolator import (CorrelationFunctionInterpolator1D, PowerSpectrumInterpolator1D,
                                         PowerSpectrumInterpolator2D)


@pytest.fixture(scope='module')
def pk2d():
    cosmo = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649, engine='eisenstein_hu')
    return cosmo.get_fourier().pk_interpolator()


@pytest.fixture(scope='module')
def pk_tab(pk2d):
    k = np.geomspace(1e-4, 10.0, 300)
    z = np.linspace(0.0, 3.0, 10)
    return PowerSpectrumInterpolator2D(k, z, pk2d(k, z))


def test_extrapolation(pk_tab):
    # log-log extrapolation beyond the table, NaN beyond extrap range
    v = float(pk_tab(5e-5, 0.0))
    assert np.isfinite(v) and v > 0
    assert np.isnan(float(pk_tab(1e-8, 0.0)))
    assert np.isnan(float(pk_tab(1e3, 0.0)))
    assert np.isnan(float(pk_tab(0.1, 5.0)))  # z out of range
    # power-law continuation: slope continuity
    k1, k2 = 2e-5, 4e-5
    slope = np.log(float(pk_tab(k2, 0.0)) / float(pk_tab(k1, 0.0))) / np.log(k2 / k1)
    kk1, kk2 = 1.2e-4, 1.5e-4
    slope_in = np.log(float(pk_tab(kk2, 0.0)) / float(pk_tab(kk1, 0.0))) / np.log(kk2 / kk1)
    assert abs(slope - slope_in) < 0.1


def test_table_accuracy(pk2d, pk_tab):
    k = np.geomspace(2e-4, 8.0, 75)
    z = np.array([0.0, 1.2, 2.5])
    ref = np.asarray(pk2d(k, z))
    got = np.asarray(pk_tab(k, z))
    np.testing.assert_allclose(got, ref, rtol=3e-4)


def test_sigma8(pk2d):
    s8_fftlog = float(pk2d.sigma8_z(0.0))
    s8_simpson = float(pk2d.sigma8_z(0.0, method='simpson'))
    assert abs(s8_fftlog - 0.8) < 1e-6
    assert abs(s8_simpson / s8_fftlog - 1) < 1e-5
    # sigma_d
    sd = float(pk2d.sigma_dz(0.0))
    assert np.isfinite(sd) and 0 < sd < 20


def test_growth_rate_rz(pk2d):
    f = float(pk2d.growth_rate_rz(8.0, 0.5))
    # EH growth rate ~ Omega_m(z)^0.55
    cosmo = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649, engine='eisenstein_hu')
    f_ba = float(cosmo.get_background().growth_rate(0.5))
    assert abs(f - f_ba) < 0.01


def test_to_xi_roundtrip(pk2d):
    xi = pk2d.to_xi()
    pk_back = xi.to_pk()
    k = np.geomspace(1e-3, 1.0, 40)
    ref = np.asarray(pk2d(k, 0.0))
    got = np.asarray(pk_back(k, 0.0))
    np.testing.assert_allclose(got, ref, rtol=1e-2)
    # BAO peak visible in xi around 100 Mpc/h
    s = np.linspace(60, 140, 81)
    xiv = np.asarray(xi(s, 0.0)) * s ** 2
    ipeak = np.argmax(xiv)
    assert 85 < s[ipeak] < 115


def test_1d(pk2d):
    pk1d = pk2d.to_1d(z=0.5)
    k = np.geomspace(1e-3, 1.0, 20)
    np.testing.assert_allclose(np.asarray(pk1d(k)), np.asarray(pk2d(k, 0.5)), rtol=1e-4)
    s8 = float(pk1d.sigma8())
    assert abs(s8 - float(pk2d.sigma8_z(0.5))) < 1e-4
    # tabulated 1D
    tab = PowerSpectrumInterpolator1D(k, pk1d(k))
    np.testing.assert_allclose(np.asarray(tab(k)), np.asarray(pk1d(k)), rtol=1e-8)
    xi1d = pk1d.to_xi()
    assert isinstance(xi1d, CorrelationFunctionInterpolator1D)
    assert np.isfinite(float(xi1d(50.0)))


def test_rescale_sigma8(pk_tab):
    pk_tab = pk_tab.clone()
    pk_tab.rescale_sigma8(0.9)
    assert abs(float(pk_tab.sigma8_z(0.0)) - 0.9) < 1e-6


def test_jax_contract(pk_tab):
    # pytree: pass interpolator through jit
    @jax.jit
    def evaluate(interp, k):
        return interp(k, 0.5)

    v = float(evaluate(pk_tab, 0.1))
    assert abs(v - float(pk_tab(0.1, 0.5))) < 1e-10

    # jacfwd of sigma8 through a freshly built table
    def s8(amplitude):
        k = jnp.geomspace(1e-4, 10.0, 100)
        interp = PowerSpectrumInterpolator1D(k, amplitude * jnp.asarray(pk_tab(k, 0.0)))
        return interp.sigma8()

    g = float(jax.grad(s8)(1.0))
    assert np.isfinite(g) and g > 0
