"""Shape/dtype contract tests across engines and sections: scalar in ->
scalar out, empty in -> (0,) out, float32 in -> float32 out, ncdm species
axes (reference parity: tests/test_cosmology.py:87-107 asserts these
exhaustively on every background method)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cosmoprimo_tpu.cosmology import Cosmology

ENGINES = ['eisenstein_hu', 'eisenstein_hu_nowiggle', 'eisenstein_hu_nowiggle_variants', 'bbks']

BACKGROUND_METHODS = ['efunc', 'hubble_function', 'comoving_radial_distance',
                      'angular_diameter_distance', 'luminosity_distance', 'growth_factor',
                      'growth_rate', 'time', 'Omega_m', 'Omega_de']


@pytest.fixture(scope='module')
def cosmo():
    return Cosmology(engine='eisenstein_hu', m_ncdm=[0.02, 0.05])


def test_background_scalar_contract(cosmo):
    ba = cosmo.get_background()
    for name in BACKGROUND_METHODS:
        value = getattr(ba, name)(1.0)
        assert np.ndim(value) == 0, f'{name}(scalar) must be scalar, got shape {np.shape(value)}'
        assert np.isfinite(float(value))


def test_background_empty_contract(cosmo):
    ba = cosmo.get_background()
    for name in BACKGROUND_METHODS:
        value = getattr(ba, name)(np.array([], dtype=np.float64))
        assert np.shape(value)[-1] == 0, f'{name}([]) must have trailing size 0'


def test_background_shape_passthrough(cosmo):
    ba = cosmo.get_background()
    z = np.linspace(0.0, 3.0, 12).reshape(3, 4)
    for name in BACKGROUND_METHODS:
        value = getattr(ba, name)(z)
        assert np.shape(value)[-2:] == (3, 4), f'{name} must preserve input shape'


def test_background_float32_contract(cosmo):
    ba = cosmo.get_background()
    z32 = np.linspace(0.0, 3.0, 5, dtype=np.float32)
    for name in ['efunc', 'comoving_radial_distance', 'growth_factor']:
        value = getattr(ba, name)(z32)
        assert jnp.asarray(value).dtype == jnp.float32, f'{name}(float32) must return float32'
        value64 = getattr(ba, name)(np.float64(1.0))
        assert jnp.asarray(value64).dtype == jnp.float64


def test_background_species_axes(cosmo):
    ba = cosmo.get_background()
    z = np.linspace(0.0, 3.0, 7)
    for name in ['rho_ncdm', 'Omega_ncdm']:
        value = getattr(ba, name)(z)
        assert np.shape(value) == (2, 7), f'{name} must carry the (N_ncdm, nz) axes'
    single = ba.rho_ncdm(z, species=0)
    assert np.shape(single) == (7,)
    # scalar z keeps the species axis
    assert np.shape(ba.rho_ncdm(1.0)) == (2,)


@pytest.mark.parametrize('engine', ENGINES)
def test_fourier_contracts(engine):
    cosmo = Cosmology(engine=engine)
    pki = cosmo.get_fourier().pk_interpolator()
    pk = pki(np.array([0.1]), z=0.0)
    assert np.all(np.isfinite(np.asarray(pk))) and np.all(np.asarray(pk) > 0)
    # grid evaluation: (nk, nz)
    k = np.geomspace(1e-3, 1.0, 11)
    z = np.array([0.0, 0.5, 1.0])
    pkz = pki(k, z=z)
    assert np.shape(pkz) == (11, 3)
    # scalar k, scalar z -> scalar
    assert np.ndim(pki(0.1, z=0.5)) == 0


def test_thermodynamics_scalars(cosmo):
    th = cosmo.get_thermodynamics()
    for name in ['rs_drag', 'z_drag']:
        value = getattr(th, name)
        assert np.ndim(value) == 0 and np.isfinite(float(value))


def test_primordial_contract(cosmo):
    pm = cosmo.get_primordial()
    k = np.geomspace(1e-4, 1.0, 9)
    pk = pm.pk_k(k)
    assert np.shape(pk) == (9,)
    assert np.ndim(pm.pk_k(0.05)) == 0


if __name__ == '__main__':
    import sys
    sys.exit(pytest.main([__file__, '-q']))
