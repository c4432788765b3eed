"""Boltzmann wrapper tests: pure parameter translations (unit-testable
without pyclass/camb) and clean gating when the external codes are absent.
Full integration runs only where pyclass/camb are installed."""

import numpy as np
import pytest

from cosmoprimo_tpu.cosmology import Cosmology, CosmologyInputError
from cosmoprimo_tpu.models.boltzmann import (build_task_dependency, camb_nu_degeneracies,
                                             translate_camb_params, translate_class_params)


@pytest.fixture(scope='module')
def cosmo():
    return Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649, m_ncdm=0.06)


def test_class_translation(cosmo):
    p = translate_class_params(cosmo.get_params(), A_s_fid=2.1e-9, has_fld=False, N_ncdm=1)
    assert p['lensing'] == 'no'
    assert p['N_ncdm'] == 1
    assert 'sigma8' not in p and p['A_s'] == 2.1e-9
    assert 'w0_fld' not in p  # LCDM: fld keys dropped
    assert p['P_k_max_h/Mpc'] == 10.0
    assert p['l_max_scalars'] == 2500
    # fld cosmology keeps the CLP keys and forces Omega_Lambda = 0
    cfld = Cosmology(w0_fld=-0.9, wa_fld=0.1)
    pf = translate_class_params(cfld.get_params(), A_s_fid=2.1e-9, has_fld=True, N_ncdm=0)
    assert pf['Omega_Lambda'] == 0.0
    assert pf['fluid_equation_of_state'] == 'CLP'
    # beta_s rejected
    cb = Cosmology(beta_s=0.01)
    with pytest.raises(CosmologyInputError):
        translate_class_params(cb.get_params(), N_ncdm=0)


def test_camb_translation(cosmo):
    base, post = translate_camb_params(cosmo.get_params(), A_s_fid=2.1e-9, has_fld=False, N_eff=3.044)
    assert abs(base['ombh2'] - 0.02237) < 1e-10
    assert abs(base['H0'] - 67.36) < 1e-10
    assert base['As'] == 2.1e-9
    assert base['nnu'] == 3.044
    assert base['parameterization'] == 'tensor_param_rpivot'
    assert base['redshifts'][0] == max(base['redshifts'])  # descending
    assert post['non_linear'] == ''
    g, f = camb_nu_degeneracies([0.71611], [0.06])
    np.testing.assert_allclose(g, (0.71611 / (4.0 / 11.0) ** (1.0 / 3.0)) ** 4)
    np.testing.assert_allclose(f, [1.0])


def test_task_dependency():
    assert sorted(build_task_dependency('harmonic')) == ['fourier', 'harmonic', 'transfer']
    assert build_task_dependency('background') == ['background']
    assert 'background' not in build_task_dependency(['thermodynamics'])


def test_engine_gating():
    """Engines raise a clear error when the external package is missing
    (and run for real when it is installed)."""
    for name, module in [('class', 'pyclass'), ('camb', 'camb'), ('astropy', 'astropy')]:
        try:
            __import__(module)
            available = True
        except ImportError:
            available = False
        if available:
            c = Cosmology(engine=name)
            assert np.isfinite(float(c.get_background().comoving_radial_distance(1.0)))
        else:
            with pytest.raises(CosmologyInputError):
                Cosmology(engine=name)
