"""Fiducial-cosmology invariants (reference parity: tests/test_fiducial.py:
DESI A_s/n_s/N_ur/omega_ncdm/h exact values, TabulatedDESI interpolation
precision 1e-7)."""

import numpy as np
import pytest

from cosmoprimo_tpu.fiducial import (DESI, AbacusSummit, AbacusSummit_params, BOSS,
                                     DESIDR2Flatw0waCDM, Planck2018FullFlatLCDM, TabulatedDESI, Uchuu)


def test_desi_invariants():
    cosmo = DESI()
    assert abs(float(cosmo['A_s']) - 2.0830e-9) < 1e-13
    assert abs(float(cosmo['n_s']) - 0.9649) < 1e-12
    assert abs(float(cosmo['N_ur']) - 2.0328) < 1e-4
    assert abs(float(cosmo['h']) - 0.6736) < 1e-12
    assert abs(float(cosmo['omega_ncdm'][0]) - 0.0006442) < 1e-7
    assert abs(float(cosmo['omega_b']) - 0.02237) < 1e-12
    assert abs(float(cosmo['omega_cdm']) - 0.12) < 1e-12
    # one massive neutrino species
    assert cosmo['N_ncdm'] == 1
    assert abs(float(cosmo['m_ncdm'][0]) - 0.06) < 2e-3


def test_abacus_catalog():
    all_params = AbacusSummit_params()
    assert len(all_params) >= 90
    p0 = AbacusSummit_params(name=0)
    assert abs(p0['omega_cdm'] - 0.12) < 1e-12
    c = AbacusSummit(name=4)
    assert np.isfinite(float(c['h']))
    with pytest.raises(ValueError):
        AbacusSummit_params(name='99999')


def test_tabulated_desi():
    tab = TabulatedDESI()
    cosmo = DESI(engine='eisenstein_hu')
    ba_tab = tab.get_background()
    ba = cosmo.get_background()
    z = np.array([0.15, 0.5, 1.0, 2.5, 9.0])
    # tabulated values come from CLASS; our closed-form E(z) agrees to ~1e-5
    # (CLASS treats ncdm with its own momentum grid)
    np.testing.assert_allclose(np.asarray(ba_tab.efunc(z)), np.asarray(ba.efunc(z)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ba_tab.comoving_radial_distance(z)),
                               np.asarray(ba.comoving_radial_distance(z)), rtol=1e-4)


def test_tabulated_desi_interpolation_precision():
    """Reference parity (fiducial.py:279-280, tests/test_tabulated.py):
    TabulatedDESI claims relative interpolation precision 1e-7 over
    z in [0, 100]. Held-out check: interpolate from every OTHER table node
    onto the skipped nodes. Linear interp error scales with spacing^2, so
    the shipped full-density grid is ~4x better than what this measures:
    measured half-grid maxima are 1.29e-7 (efunc, near z=100) and 8.5e-8
    (chi, near z=2) => full grid ~3e-8, inside the 1e-7 claim. The final
    node is dropped from the queries (it falls beyond the last half-grid
    knot and would measure extrapolation, not interpolation)."""
    from cosmoprimo_tpu.fiducial import _DESI_filename
    z, ef, chi = np.loadtxt(_DESI_filename, comments='#', unpack=True)
    for table in (ef, chi):
        got = np.interp(z[1::2][:-1], z[::2], table[::2])
        rel = np.abs(got / table[1::2][:-1] - 1.0)
        assert rel.max() < 4e-7 / 2, rel.max()  # half-grid bound => <1e-7 shipped


def test_other_fiducials():
    for factory in [Planck2018FullFlatLCDM, BOSS, Uchuu]:
        c = factory(engine='eisenstein_hu')
        assert np.isfinite(float(c.get_background().comoving_radial_distance(1.0)))
    c = DESIDR2Flatw0waCDM(engine='eisenstein_hu')
    assert abs(float(c['w0_fld']) + 0.7536302620) < 1e-10
    assert abs(float(c['Omega_m']) - 0.3191980194) < 1e-8
