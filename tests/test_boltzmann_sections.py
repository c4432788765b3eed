"""Stub-driven tests of the Boltzmann wrapper engines' FULL section surface
(reference classy.py / camb.py): every section class executes against the
fake pyclass/camb host modules (tests/fake_boltzmann.py), including the
CAMB theta_cb Omega-weighted reconstruction and Weyl k^-2 un-scaling
(reference camb.py:779-805), thermodynamics extras (classy.py:107-146),
CLASS-table-backed background growth, and the variant engines' parameter
surfaces."""

import numpy as np
import pytest

from fake_boltzmann import VAR_SCALE, Z_STAR_TRUE, install_fake_camb, install_fake_pyclass

from cosmoprimo_tpu.cosmology import Cosmology, CosmologyInputError

PARAMS = dict(omega_cdm=0.12, omega_b=0.02237, h=0.6736, A_s=2.083e-9, n_s=0.9649)


@pytest.fixture
def fake_class(monkeypatch):
    install_fake_pyclass(monkeypatch)
    return Cosmology(engine='class', **PARAMS)


@pytest.fixture
def fake_camb(monkeypatch):
    install_fake_camb(monkeypatch)
    return Cosmology(engine='camb', **PARAMS)


# ----------------------------------------------------------------------------
# CLASS sections
# ----------------------------------------------------------------------------

def test_class_background(fake_class):
    cosmo = fake_class
    ba = cosmo.get_background()
    truth = Cosmology(engine='eisenstein_hu', **PARAMS).get_background()
    z = np.array([0.0, 0.5, 1.0, 2.0])
    # table-backed quantities reproduce the host's values (the stub serves
    # our analytic truth, so spline-through-table must match it closely)
    np.testing.assert_allclose(np.asarray(ba.efunc(z)), np.asarray(truth.efunc(z)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ba.comoving_radial_distance(z)),
                               np.asarray(truth.comoving_radial_distance(z)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ba.time(z)), np.asarray(truth.time(z)), rtol=1e-4)
    # growth comes from the host tables (CLASS-backed), normalized to D(0)=1
    g = np.asarray(ba.growth_factor(z))
    assert abs(g[0] - 1.0) < 1e-10
    np.testing.assert_allclose(g, np.asarray(truth.growth_factor(z)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ba.growth_rate(z)), np.asarray(truth.growth_rate(z)), rtol=1e-4)
    # distances derived through BaseBackground use the imported chi
    np.testing.assert_allclose(np.asarray(ba.comoving_transverse_distance(z)),
                               np.asarray(truth.comoving_transverse_distance(z)), rtol=1e-5)
    assert np.isfinite(np.asarray(ba.comoving_sound_horizon(np.array([100.0])))).all()


def test_class_thermodynamics(fake_class):
    th = fake_class.get_thermodynamics()
    h = PARAMS['h']
    assert float(np.asarray(th.rs_drag)) > 0  # Mpc/h (stub returns Mpc; engine multiplies by h)
    assert th.z_drag > 900
    assert th.z_star == Z_STAR_TRUE
    # z_star_noreion: kappa(z) = (z / Z_STAR_TRUE)^p crosses 1 + tau_reio
    expected = Z_STAR_TRUE * (1.0 + 0.06) ** (1.0 / 8.0)
    assert abs(th.z_star_noreion - expected) < 2.0
    assert th.rs_star_noreion > 0 and np.isfinite(th.rs_star_noreion)
    assert 0 < float(np.asarray(th.theta_star)) < 0.1
    assert 0 < float(np.asarray(th.theta_star_noreion)) < 0.1
    assert 0.008 < float(np.asarray(th.theta_cosmomc)) < 0.012
    assert np.isfinite(np.asarray(th.rs_z(np.array([10.0, 100.0])))).all()
    assert th.tau_reio == pytest.approx(0.06)


def test_class_primordial(fake_class):
    pm = fake_class.get_primordial()
    assert float(np.asarray(pm.A_s)) == pytest.approx(PARAMS['A_s'])
    k = np.geomspace(1e-3, 1.0, 8)
    pk = np.asarray(pm.pk_k(k))
    assert pk.shape == k.shape and (pk > 0).all()
    assert np.isfinite(float(np.asarray(pm.ln_1e10_A_s)))


def test_class_perturbations_transfer(fake_class):
    pt = fake_class.get_perturbations().table()
    assert 'delta_cdm' in pt.dtype.names
    tr = fake_class.get_transfer().table(0.0)
    assert 'd_cdm' in tr.dtype.names and np.isfinite(tr['d_cdm']).all()


def test_class_harmonic(fake_class):
    hr = fake_class.get_harmonic()
    cl = hr.lensed_cl(ellmax=64)
    assert len(cl['ell']) == 65
    assert np.isfinite(np.asarray(cl['tt'])).all()
    un = hr.unlensed_cl(ellmax=32)
    assert np.asarray(un['tt'])[1] > 0
    pot = hr.lens_potential_cl(ellmax=32)
    assert np.isfinite(np.asarray(pot['pp'])).all()
    table = hr.lensed_table(ellmax=16, of=['tt', 'te'])
    assert set(table.dtype.names) >= {'ell', 'tt', 'te'}


def test_class_fourier(fake_class):
    fo = fake_class.get_fourier()
    k, z, pk = fo.table(of='delta_m')
    assert pk.shape == (len(k), len(z))
    # of-tuple scaling passes through
    _, _, pk_cb = fo.table(of=('delta_cb', 'delta_cb'))
    np.testing.assert_allclose(pk_cb, pk * (VAR_SCALE['delta_cb'] / VAR_SCALE['delta_m']) ** 2, rtol=1e-12)
    interp = fo.pk_interpolator()
    assert float(interp(0.1, 0.0)) > 0
    assert 0.5 < float(np.asarray(fo.sigma8_m)) < 1.2
    assert float(np.asarray(fo.sigma8_cb)) == pytest.approx(float(np.asarray(fo.sigma8_m)) * 1.005, rel=1e-6)


def test_class_sigma8_rescaling(monkeypatch):
    """Giving sigma8 re-normalizes all perturbative outputs through the
    engine's own Fourier (explicit two-pass)."""
    install_fake_pyclass(monkeypatch)
    target = 0.75
    cosmo = Cosmology(engine='class', omega_cdm=0.12, omega_b=0.02237, h=0.6736,
                      sigma8=target, n_s=0.9649)
    assert float(np.asarray(cosmo.get_fourier().sigma8_m)) == pytest.approx(target, rel=1e-6)


# ----------------------------------------------------------------------------
# CAMB sections
# ----------------------------------------------------------------------------

def test_camb_background(fake_camb):
    ba = fake_camb.get_background()
    truth = Cosmology(engine='eisenstein_hu', **PARAMS).get_background()
    z = np.array([0.0, 0.5, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(ba.efunc(z)), np.asarray(truth.efunc(z)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ba.comoving_radial_distance(z)),
                               np.asarray(truth.comoving_radial_distance(z)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ba.luminosity_distance(z)),
                               np.asarray(truth.luminosity_distance(z)), rtol=1e-6)
    for name in ['Omega_cdm', 'Omega_b', 'Omega_g', 'Omega_de', 'Omega_ncdm_tot']:
        np.testing.assert_allclose(np.asarray(getattr(ba, name)(z)),
                                   np.asarray(getattr(truth, name)(z)), rtol=1e-6, atol=1e-12)
    for name in ['rho_cdm', 'rho_b', 'rho_de']:
        np.testing.assert_allclose(np.asarray(getattr(ba, name)(z)),
                                   np.asarray(getattr(truth, name)(z)), rtol=1e-6)
    assert ba.age == pytest.approx(13.8)
    assert np.isfinite(np.asarray(ba.time(z))).all()


def test_camb_thermodynamics(fake_camb):
    th = fake_camb.get_thermodynamics()
    assert float(np.asarray(th.rs_drag)) > 0 and th.z_drag > 900
    assert th.z_star_noreion == pytest.approx(1089.0)  # CAMB native zstar
    # CLASS-convention z_star from the opacity evolution: stub tau crosses 1
    # at Z_STAR_TRUE by construction
    assert abs(th.z_star - Z_STAR_TRUE) < 5.0
    assert th.rs_star > 0 and th.rs_star_noreion > 0
    assert 0 < th.theta_star < 0.1 and 0 < th.theta_star_noreion < 0.1
    assert th.theta_cosmomc == pytest.approx(0.0104)
    assert np.isfinite(np.asarray(th.rs_z(np.array([10.0, 1000.0])))).all()
    assert th.tau_reio == pytest.approx(0.06)


def test_camb_primordial(fake_camb):
    pm = fake_camb.get_primordial()
    assert float(np.asarray(pm.A_s)) == pytest.approx(PARAMS['A_s'])
    assert pm.n_s == pytest.approx(PARAMS['n_s'])
    k = np.geomspace(1e-3, 1.0, 8)
    pk = np.asarray(pm.pk_k(k))
    # camb primordial_power path: h^3 A_s (k/kp)^(ns-1)
    h = PARAMS['h']
    kp = 0.05 / h
    expected = h ** 3 * PARAMS['A_s'] * (k / kp) ** (PARAMS['n_s'] - 1.0)
    np.testing.assert_allclose(pk, expected, rtol=1e-10)


def test_camb_transfer(fake_camb):
    table = fake_camb.get_transfer().table()
    assert table.dtype.names[0] == 'k'
    assert 'delta_cdm' in table.dtype.names and 'v_newtonian_cdm' in table.dtype.names
    assert 'k/h' not in table.dtype.names
    assert table['z'].shape == table['k'].shape  # (nk, nz) grid
    assert np.isfinite(table['delta_tot']).all()


def test_camb_harmonic(monkeypatch):
    install_fake_camb(monkeypatch)
    cosmo = Cosmology(engine='camb', lensing=True, **PARAMS)
    hr = cosmo.get_harmonic()
    cl = hr.lensed_cl(ellmax=64)
    assert len(cl['ell']) == 65 and np.isfinite(np.asarray(cl['tt'])).all()
    un = hr.unlensed_cl(ellmax=-1)
    assert len(un['ell']) == 2501  # ellmax_cl inclusive
    pot = hr.lens_potential_cl(ellmax=32)
    assert np.isfinite(np.asarray(pot['pp'])).all()
    # without lensing: clear error
    cosmo2 = Cosmology(engine='camb', lensing=False, **PARAMS)
    with pytest.raises(CosmologyInputError):
        cosmo2.get_harmonic().lensed_cl(ellmax=16)


def test_camb_fourier_units_and_vars(fake_camb):
    fo = fake_camb.get_fourier()
    k, z, pk = fo.table(of='delta_m')
    assert pk.shape == (len(k), len(z))
    # manual hubble-unit conversion reproduces the truth h-unit spectrum
    truth = Cosmology(engine='eisenstein_hu', **PARAMS).get_fourier().pk_interpolator()
    ik = np.argmin(np.abs(k - 0.1))
    np.testing.assert_allclose(pk[ik, 0], float(truth(k[ik], z[0])), rtol=1e-6)
    # delta_cb scaling
    _, _, pk_cb = fo.table(of='delta_cb')
    np.testing.assert_allclose(pk_cb, pk * VAR_SCALE['delta_cb'] ** 2, rtol=1e-12)


def test_camb_fourier_weyl_unscaling(fake_camb):
    """of='phi_plus_psi': the Weyl ~ k^2 (phi+psi)/2 convention is un-done
    (factor 2 and k^-2 per slot, reference camb.py:781-786)."""
    fo = fake_camb.get_fourier()
    k, z, pk_m = fo.table(of='delta_m')
    _, _, pk_pp = fo.table(of='phi_plus_psi')
    np.testing.assert_allclose(pk_pp, pk_m * VAR_SCALE['phi_plus_psi'] ** 2, rtol=1e-10)
    # cross spectrum with one Weyl slot
    _, _, pk_x = fo.table(of=('delta_m', 'phi_plus_psi'))
    np.testing.assert_allclose(pk_x, pk_m * VAR_SCALE['phi_plus_psi'], rtol=1e-10)


def test_camb_fourier_theta_cb(fake_camb):
    """of='theta_cb' reconstructs the Omega-weighted cdm+baryon velocity
    (reference camb.py:770-779)."""
    fo = fake_camb.get_fourier()
    k, z, pk_m = fo.table(of='delta_m')
    Omega_cdm = float(np.asarray(fake_camb['Omega_cdm']))
    Omega_b = float(np.asarray(fake_camb['Omega_b']))
    w_c = Omega_cdm / (Omega_cdm + Omega_b)
    w_b = Omega_b / (Omega_cdm + Omega_b)
    s = w_c * VAR_SCALE['theta_cdm'] + w_b * VAR_SCALE['theta_b']
    _, _, pk_tt = fo.table(of='theta_cb')
    np.testing.assert_allclose(pk_tt, pk_m * s ** 2, rtol=1e-10)
    _, _, pk_x = fo.table(of=('delta_cb', 'theta_cb'))
    np.testing.assert_allclose(pk_x, pk_m * VAR_SCALE['delta_cb'] * s, rtol=1e-10)


def test_camb_fourier_sigma8_and_checkz(fake_camb):
    fo = fake_camb.get_fourier()
    assert 0.5 < float(np.asarray(fo.sigma8_m)) < 1.2
    assert float(fo.pk_kz(0.1, 0.0)) > 0


def test_camb_sigma8_rescaling(monkeypatch):
    install_fake_camb(monkeypatch)
    target = 0.75
    cosmo = Cosmology(engine='camb', omega_cdm=0.12, omega_b=0.02237, h=0.6736,
                      sigma8=target, n_s=0.9649)
    assert float(np.asarray(cosmo.get_fourier().sigma8_m)) == pytest.approx(target, rel=1e-6)


# ----------------------------------------------------------------------------
# Variant engines
# ----------------------------------------------------------------------------

def test_class_variants_run(monkeypatch):
    install_fake_pyclass(monkeypatch)
    for name in ['axiclass', 'mochiclass', 'negnuclass']:
        cosmo = Cosmology(engine=name, **PARAMS)
        assert np.isfinite(float(np.asarray(cosmo.get_background().comoving_radial_distance(1.0))))
    # axiclass scf_parameters__1/2 folding
    cosmo = Cosmology(engine='axiclass', extra_params={'scf_parameters__1': 2.7, 'scf_parameters__2': 0.0},
                      **PARAMS)
    assert cosmo._engine.classy.params['scf_parameters'] == [2.7, 0.0]
    with pytest.raises(CosmologyInputError):
        Cosmology(engine='axiclass', extra_params={'scf_parameters__1': 2.7}, **PARAMS)


def test_dsclass_growth(monkeypatch):
    """dsclass forces Newtonian gauge / PPF and solves the DS-modified
    growth ODE; with xi_ds=0 the growth must agree with the standard one."""
    install_fake_pyclass(monkeypatch)
    cosmo = Cosmology(engine='dsclass', xi_ds=0.5, **PARAMS)
    params = cosmo._engine.classy.params
    assert params['gauge'] == 'Newtonian'
    assert params['use_ppf'] == 'yes'
    assert params['Omega_Lambda'] == 0.0
    assert params['dark_scattering'] == 'yes'
    z = np.array([0.0, 0.5, 1.0])
    ba = cosmo.get_background()
    g = np.asarray(ba.growth_factor(z))
    assert abs(g[0] - 1.0) < 1e-10 and (np.diff(g) < 0).all()
    assert np.isfinite(np.asarray(ba.growth_rate(z))).all()
    # xi_ds = 0: DS ODE reduces to the standard growth
    cosmo0 = Cosmology(engine='dsclass', xi_ds=0.0, **PARAMS)
    truth = Cosmology(engine='eisenstein_hu', **PARAMS).get_background()
    g0 = np.asarray(cosmo0.get_background().growth_factor(z))
    np.testing.assert_allclose(g0, np.asarray(truth.growth_factor(z)), rtol=5e-3)


def test_camb_variants_params(monkeypatch):
    """Variant engines carry their full published parameter surfaces and
    pass them to the host set_params."""
    install_fake_camb(monkeypatch)
    from cosmoprimo_tpu.models.camb import HEFTCambEngine, ISiTGREngine, MGCambEngine
    assert len(ISiTGREngine._default_cosmological_parameters) >= 37
    assert len(MGCambEngine._default_cosmological_parameters) >= 62
    assert len(HEFTCambEngine._default_cosmological_parameters) == 4

    cosmo = Cosmology(engine='isitgr', mu0=0.1, Sigma0=-0.05, **PARAMS)
    pars = cosmo._engine._camb_params
    assert pars.extra['mu0'] == 0.1 and pars.extra['Sigma0'] == -0.05
    assert pars.extra['E11'] == 0.0  # default flows through

    cosmo = Cosmology(engine='mgcamb', B1=1.5, **PARAMS)
    assert cosmo._engine._camb_params.extra['B1'] == 1.5
    assert cosmo._engine._camb_params.extra['MGCAMB_Mu_idx_7'] == 1.0

    cosmo = Cosmology(engine='heftcamb', extra_params={'RPH_braiding0': 0.2}, **PARAMS)
    assert cosmo._engine._camb_params.extra['RPHbraiding_ODE0'] == 0.2
    assert cosmo._engine._camb_params.extra['dark_energy_model'] == 'EFTCAMB'

    cosmo = Cosmology(engine='isitide', **PARAMS)
    ba = cosmo.get_background()
    z = np.array([0.0, 1.0])
    f = np.asarray(ba.growth_rate(z))
    truth = Cosmology(engine='eisenstein_hu', **PARAMS).get_background()
    np.testing.assert_allclose(f, np.asarray(truth.growth_rate(z)) * 1.01, rtol=1e-6)


def test_engine_getters_all_sections(fake_class, fake_camb):
    """All seven section getters resolve for CLASS; CAMB provides six (no
    Perturbations, matching the reference)."""
    for name in ['background', 'thermodynamics', 'primordial', 'perturbations',
                 'transfer', 'harmonic', 'fourier']:
        assert fake_class._engine.get_section(name) is not None
    for name in ['background', 'thermodynamics', 'primordial', 'transfer', 'harmonic', 'fourier']:
        assert fake_camb._engine.get_section(name) is not None
    with pytest.raises(CosmologyInputError):
        fake_camb._engine.get_section('perturbations')


def test_camb_background_growth(fake_camb):
    """Growth on the CAMB-family background runs (review finding: the
    growth ODE's scan body used to hit the host-delegating Omega overrides
    with tracers and crash) and matches the closed-form growth ODE (the EH
    engine's Carroll approximation differs by ~0.2%, so the oracle is
    DefaultBackground over the same engine)."""
    from cosmoprimo_tpu.cosmology import DefaultBackground
    ba = fake_camb.get_background()
    truth = DefaultBackground(fake_camb._engine)
    z = np.array([0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(ba.growth_factor(z)),
                               np.asarray(truth.growth_factor(z)), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ba.growth_rate(z)),
                               np.asarray(truth.growth_rate(z)), rtol=1e-9)


def test_class_z_reio_thermodynamics(monkeypatch):
    """z_reio-parameterized cosmologies reach the thermodynamics section
    (review finding: the eager getattr fallback raised on tau_reio)."""
    install_fake_pyclass(monkeypatch)
    cosmo = Cosmology(engine='class', omega_cdm=0.12, omega_b=0.02237, h=0.6736,
                      A_s=2.083e-9, n_s=0.9649, z_reio=7.5)
    th = cosmo.get_thermodynamics()
    assert th.tau_reio == pytest.approx(0.06)  # from the host object


def test_class_growth_znorm_convention(fake_class):
    """znorm on the CLASS-backed growth matches the analytic engines' raw
    matter-era convention (review finding: it was applied to the
    D(0)=1-normalized host table, ~25-30% off)."""
    ba = fake_class.get_background()
    truth = Cosmology(engine='eisenstein_hu', **PARAMS).get_background()
    z = np.array([0.0, 1.0, 3.0])
    np.testing.assert_allclose(np.asarray(ba.growth_factor(z, znorm=0.0)),
                               np.asarray(truth.growth_factor(z, znorm=0.0)), rtol=2e-2)


def test_camb_z_reio_tau_fallback(monkeypatch):
    """Under z_reio parameterization, Thermodynamics.tau_reio does not
    return the untouched CAMBparams field default (review finding)."""
    install_fake_camb(monkeypatch)
    cosmo = Cosmology(engine='camb', omega_cdm=0.12, omega_b=0.02237, h=0.6736,
                      A_s=2.083e-9, n_s=0.9649, z_reio=7.5)
    # fake set_params writes tau only when given: optical_depth keeps its
    # class default (0.06 in the fake) -> value must be truthy, never 0
    th = cosmo.get_thermodynamics()
    assert th.tau_reio and th.tau_reio > 0
