"""Differential tests of the Cosmology front-end, background physics and the
EH engine family against independent scipy/numpy oracles (SURVEY.md §4:
oracle-differential + jit/vmap/jacfwd contracts + shape/dtype contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate

from cosmoprimo_tpu import constants
from cosmoprimo_tpu.cosmology import Cosmology, CosmologyError, CosmologyInputError, compute_ncdm_momenta


@pytest.fixture(scope='module')
def cosmo():
    return Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649)


def test_params_aliases_conflicts():
    c = Cosmology(H0=70.0)
    assert abs(float(c['h']) - 0.7) < 1e-12
    c = Cosmology(ombh2=0.022)
    assert abs(float(c['omega_b']) - 0.022) < 1e-12
    assert abs(float(c['Omega_b']) - 0.022 / 0.7 ** 2) < 1e-12
    with pytest.raises(CosmologyInputError):
        Cosmology(h=0.7, H0=70.0)
    with pytest.raises(CosmologyInputError):
        Cosmology(sigma8=0.8, A_s=2e-9)
    # logA -> A_s
    c = Cosmology(logA=3.0)
    assert abs(float(c['A_s']) - np.exp(3.0) * 1e-10) < 1e-22
    assert abs(float(c['logA']) - 3.0) < 1e-12


def test_omega_budget(cosmo):
    total = (cosmo['Omega_cdm'] + cosmo['Omega_b'] + cosmo['Omega_g'] + cosmo['Omega_ur']
             + cosmo['Omega_ncdm_tot'] + cosmo['Omega_k'] + cosmo['Omega_de'])
    assert abs(float(total) - 1.0) < 1e-12
    # Omega_m round trip
    c2 = Cosmology(Omega_m=0.31, omega_b=0.022, h=0.7)
    assert abs(float(c2['Omega_m']) - 0.31) < 1e-10


def test_efunc_closed_form(cosmo):
    ba = cosmo.get_background(engine='eisenstein_hu')
    # no massive neutrinos: E^2 = (Ocdm+Ob)(1+z)^3 + (Og+Our)(1+z)^4 + Ok(1+z)^2 + Ode
    Om = float(cosmo['Omega_cdm'] + cosmo['Omega_b'])
    Or = float(cosmo['Omega_g'] + cosmo['Omega_ur'])
    Ode = float(cosmo['Omega_de'])
    z = np.array([0.0, 0.5, 1.0, 10.0, 100.0])
    expected = np.sqrt(Om * (1 + z) ** 3 + Or * (1 + z) ** 4 + Ode)
    np.testing.assert_allclose(np.asarray(ba.efunc(z)), expected, rtol=1e-10)


def test_distances_vs_quad(cosmo):
    ba = cosmo.get_background(engine='eisenstein_hu')
    Om = float(cosmo['Omega_cdm'] + cosmo['Omega_b'])
    Or = float(cosmo['Omega_g'] + cosmo['Omega_ur'])
    Ode = float(cosmo['Omega_de'])

    def efunc(z):
        return np.sqrt(Om * (1 + z) ** 3 + Or * (1 + z) ** 4 + Ode)

    for z in [0.1, 0.5, 1.0, 2.0, 5.0]:
        chi_ref = integrate.quad(lambda zz: constants.c / 1e3 / 100.0 / efunc(zz), 0, z, epsrel=1e-11)[0]
        chi = float(ba.comoving_radial_distance(z))
        assert abs(chi / chi_ref - 1) < 1e-6, (z, chi, chi_ref)
    # relations between distances
    z = np.array([0.5, 1.0])
    np.testing.assert_allclose(np.asarray(ba.luminosity_distance(z)),
                               np.asarray(ba.comoving_transverse_distance(z)) * (1 + z), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ba.angular_diameter_distance(z)),
                               np.asarray(ba.comoving_transverse_distance(z)) / (1 + z), rtol=1e-12)


def test_curved_distances():
    for Ok, branch in [(0.1, 'open'), (-0.1, 'closed')]:
        c = Cosmology(Omega_k=Ok, engine='eisenstein_hu')
        ba = c.get_background()
        chi = float(ba.comoving_radial_distance(1.0))
        K = float(c['K'])
        if K > 0:
            expected = np.sin(np.sqrt(K) * chi) / np.sqrt(K)
        else:
            expected = np.sinh(np.sqrt(-K) * chi) / np.sqrt(-K)
        np.testing.assert_allclose(float(ba.comoving_transverse_distance(1.0)), expected, rtol=1e-10)


def test_growth_ode_vs_scipy(cosmo):
    # analytic engines override growth with the CPT92 approximation (as the
    # reference does); the ODE solution lives in DefaultBackground
    from cosmoprimo_tpu.cosmology import DefaultBackground
    cosmo.get_background(engine='eisenstein_hu')
    ba = DefaultBackground(cosmo.engine)
    Om0 = float(cosmo['Omega_cdm'] + cosmo['Omega_b'])
    Or0 = float(cosmo['Omega_g'] + cosmo['Omega_ur'])
    Ode0 = float(cosmo['Omega_de'])

    def E2(z):
        return Om0 * (1 + z) ** 3 + Or0 * (1 + z) ** 4 + Ode0

    def rhs(eta, y):
        z = np.exp(-eta) - 1.0
        Om = Om0 * (1 + z) ** 3 / E2(z)
        Orad = Or0 * (1 + z) ** 4 / E2(z)
        Ode = Ode0 / E2(z)
        f1 = -1.0 - (-0.5) * (1.0 + Orad + 3 * (-1.0) * Ode)
        return [y[1], 1.5 * Om * y[0] + f1 * y[1]]

    # reproduce the same normalization: D ~ a deep in matter era
    sol = integrate.solve_ivp(rhs, (-6.0, 0.0), [np.exp(-6.0), np.exp(-6.0)], rtol=1e-10, atol=1e-14, dense_output=True)
    z = np.array([0.0, 0.5, 1.0, 3.0])
    eta = -np.log(1 + z)
    D = sol.sol(eta)[0]
    got = np.asarray(jnp.atleast_1d(jnp.asarray([ba.growth_factor(zz) for zz in z])))
    np.testing.assert_allclose(got, D / sol.sol(0.0)[0], rtol=2e-6)
    f = sol.sol(eta)[1] / sol.sol(eta)[0]
    got_f = np.asarray(jnp.asarray([ba.growth_rate(zz) for zz in z]))
    np.testing.assert_allclose(got_f, f, rtol=2e-6)
    # CPT92 approximation (analytic engines) agrees with the ODE to ~0.5%
    ba_eh = cosmo.get_background(engine='eisenstein_hu')
    approx = np.asarray(jnp.asarray([ba_eh.growth_factor(zz) for zz in z]))
    np.testing.assert_allclose(approx, D / sol.sol(0.0)[0], rtol=5e-3)


def test_ncdm():
    # omega_ncdm ~ m / 93.14 rule (reference test_cosmology.py:593-607 rtol 1e-3)
    c = Cosmology(m_ncdm=0.06)
    omega = float(c['omega_ncdm'][0] - c['omega_pncdm'][0])
    assert abs(omega / (0.06 / 93.14) - 1) < 1e-3
    # Omega_ncdm -> m inversion round trip
    target = float(c['Omega_ncdm'][0])
    c2 = Cosmology(Omega_ncdm=target)
    assert abs(float(c2['m_ncdm'][0]) / 0.06 - 1) < 1e-6
    # N_eff bookkeeping
    assert abs(float(c['N_eff']) - constants.NEFF) < 1e-12
    # hierarchy splitting
    for hierarchy in ['normal', 'inverted', 'degenerate']:
        ch = Cosmology(m_ncdm=0.12, neutrino_hierarchy=hierarchy)
        masses = np.asarray(ch['m_ncdm'])
        assert masses.shape == (3,)
        assert abs(masses.sum() - 0.12) < 1e-10
    with pytest.raises(CosmologyInputError):
        Cosmology(m_ncdm=[0.02, 0.02], neutrino_hierarchy='normal')


def test_ncdm_momenta_vs_quad():
    from scipy import integrate as sint
    T_eff = constants.TCMB * constants.TNCDM_OVER_CMB
    m, z = 0.1, 0.0
    over_T = constants.electronvolt_over_joule / (constants.Boltzmann * T_eff)
    m2T2 = (m * over_T) ** 2

    def integrand(q):
        return q ** 2 * np.sqrt(q ** 2 + m2T2) / (1 + np.exp(q))

    ref = sint.quad(integrand, 0, 100, epsabs=1e-13, epsrel=1e-13)[0]
    ref *= (7. / 8. * 4 / constants.c ** 3 * constants.Stefan_Boltzmann * T_eff ** 4
            / (7. * np.pi ** 4 / 120.) / (1e10 * constants.msun_over_kg) * constants.megaparsec_over_m ** 3)
    got = float(compute_ncdm_momenta(T_eff, m, z, out='rho'))
    assert abs(got / ref - 1) < 1e-10


def test_fld_validation():
    with pytest.raises(CosmologyInputError):
        Cosmology(w0_fld=0.5)
    # NaN poisoning under trace
    out = jax.jit(lambda w0: Cosmology(w0_fld=w0)['w0_fld'])(0.5)
    assert np.isnan(float(out))
    # CPL density
    c = Cosmology(w0_fld=-0.9, wa_fld=0.1, engine='eisenstein_hu')
    ba = c.get_background()
    z = 1.0
    expected = float(c['Omega_de']) * (1 + z) ** (3 * (1 + (-0.9) + 0.1)) * np.exp(3 * 0.1 * (1 / (1 + z) - 1))
    np.testing.assert_allclose(float(ba.Omega_fld(0.0)), float(c['Omega_de']), rtol=1e-10)
    np.testing.assert_allclose(float(ba.rho_fld(z)) / constants.rho_crit_over_Msunph_per_Mpcph3 * (1 + z) ** 3,
                               expected, rtol=1e-10)


def test_clone(cosmo):
    c2 = cosmo.clone(h=0.7)
    assert abs(float(c2['h']) - 0.7) < 1e-12
    # input basis: omega_b kept fixed, Omega_b recomputed
    assert abs(float(c2['omega_b']) - 0.02237) < 1e-12
    c3 = cosmo.clone(base='internal', h=0.7)
    # internal basis: Omega_b kept fixed
    assert abs(float(c3['Omega_b']) - float(cosmo['Omega_b'])) < 1e-12


def test_shape_dtype_contracts(cosmo):
    ba = cosmo.get_background(engine='eisenstein_hu')
    assert ba.efunc(1.0).shape == ()
    assert ba.efunc(np.zeros(0)).shape == (0,)
    assert ba.efunc(np.zeros((2, 3))).shape == (2, 3)
    assert ba.efunc(np.array(1.0, dtype='f4')).dtype == np.float32
    assert ba.efunc(np.array(1.0, dtype='f8')).dtype == np.float64
    c = Cosmology(m_ncdm=[0.02, 0.03], engine='eisenstein_hu')
    ban = c.get_background()
    assert ban.rho_ncdm(1.0).shape == (2,)
    assert ban.rho_ncdm(np.ones(5)).shape == (2, 5)


def test_serialization(cosmo, tmp_path):
    fn = str(tmp_path / 'cosmo.json')
    c = cosmo.clone(engine='eisenstein_hu')
    c.write(fn)
    c2 = Cosmology.read(fn)
    assert abs(float(c2['h']) - float(c['h'])) < 1e-12
    assert c2.engine.name == 'eisenstein_hu'
    fn = str(tmp_path / 'cosmo.npy')
    c.write(fn)
    c3 = Cosmology.read(fn)
    assert abs(float(c3['omega_cdm']) - float(c['omega_cdm'])) < 1e-12


def test_sigma8_rescaling(cosmo):
    fo = cosmo.get_fourier(engine='eisenstein_hu')
    assert abs(float(fo.sigma8_m) - 0.8) < 1e-10
    pk = fo.pk_interpolator()
    assert abs(float(pk.sigma8_z(0.0)) - 0.8) < 1e-8
    # A_s input instead
    ca = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, A_s=2.083e-9, n_s=0.9649, engine='eisenstein_hu')
    assert abs(float(ca.get_primordial().A_s) - 2.083e-9) < 1e-15


def test_engines_consistency():
    """The no-wiggle engines should agree with the wiggly one to ~5% on
    smooth scales, and variants->EH with no ncdm to ~15% (different fits)."""
    k = np.geomspace(1e-3, 1.0, 50)
    base = dict(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649)
    pks = {}
    for engine in ['eisenstein_hu', 'eisenstein_hu_nowiggle', 'eisenstein_hu_nowiggle_variants', 'bbks']:
        c = Cosmology(**base, engine=engine)
        pks[engine] = np.asarray(c.get_fourier().pk_interpolator()(k, 0.0))
        assert np.isfinite(pks[engine]).all() and (pks[engine] > 0).all()
    ratio = pks['eisenstein_hu_nowiggle'] / pks['eisenstein_hu']
    assert np.all(np.abs(ratio - 1) < 0.11)
    # sigma8 normalization makes them all match at the 8 Mpc/h scale
    for engine, pk in pks.items():
        c = Cosmology(**base, engine=engine)
        assert abs(float(c.get_fourier().sigma8_m) - 0.8) < 1e-8


def test_variants_ncdm_suppression():
    base = dict(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649)
    c0 = Cosmology(**base, engine='eisenstein_hu_nowiggle_variants')
    cm = Cosmology(**base, m_ncdm=0.3, engine='eisenstein_hu_nowiggle_variants')
    k = np.array([1.0])
    pk0 = np.asarray(c0.get_fourier().pk_interpolator(of='delta_m')(k, 0.0))
    pkm_m = np.asarray(cm.get_fourier().pk_interpolator(of='delta_m')(k, 0.0))
    pkm_cb = np.asarray(cm.get_fourier().pk_interpolator(of='delta_cb')(k, 0.0))
    # delta_cb > delta_m at small scales with massive neutrinos
    assert pkm_cb > pkm_m


def test_jax_contracts():
    def chi(omega_cdm):
        c = Cosmology(omega_cdm=omega_cdm, omega_b=0.02237, h=0.6736, sigma8=0.8,
                      n_s=0.9649, engine='eisenstein_hu')
        return c.get_background().comoving_radial_distance(1.0)

    jchi = jax.jit(chi)
    v0 = float(jchi(0.12))
    assert abs(v0 - float(chi(0.12))) < 1e-9
    g = float(jax.grad(chi)(0.12))
    assert np.isfinite(g) and g != 0
    batch = np.asarray(jax.vmap(jchi)(jnp.linspace(0.11, 0.13, 4)))
    assert np.isfinite(batch).all() and (np.diff(batch) < 0).all()

    def sig8(h):
        c = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=h, A_s=2.083e-9, n_s=0.9649, engine='eisenstein_hu')
        return c.get_fourier().sigma8_m

    g = float(jax.grad(sig8)(0.6736))
    assert np.isfinite(g) and g != 0


def test_theta_cosmomc(cosmo):
    c = cosmo.clone(engine='eisenstein_hu')
    theta = float(c['theta_cosmomc'])
    # Planck-like cosmology: 100*theta_MC ~ 1.041
    assert 1.03 < 100 * theta < 1.05


def test_solve():
    c = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649, engine='eisenstein_hu')
    target = 1.041
    sol = c.solve('h', 'theta_MC_100', target=target)
    got = float(sol['theta_MC_100'])
    assert abs(got - target) < 1e-4


def test_solve_non_theta_paths():
    import pytest
    c = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, sigma8=0.8, n_s=0.9649, engine='eisenstein_hu')

    # callable func, param with a built-in default step (h)
    target_chi = float(c.get_background().comoving_radial_distance(1.0)) * 1.02
    sol = c.solve('h', lambda cosmo: cosmo.get_background().comoving_radial_distance(1.0), target=target_chi)
    assert abs(float(sol.get_background().comoving_radial_distance(1.0)) - target_chi) < 1e-3 * target_chi

    # callable func, param with NO default step (relative secant step path)
    target_om = 0.30
    sol = c.solve('omega_cdm', lambda cosmo: cosmo['Omega_m'], target=target_om)
    assert abs(float(sol['Omega_m']) - target_om) < 1e-5

    # string func that is a generic derived parameter (not theta_MC_100)
    sol = c.solve('omega_cdm', 'Omega_m', target=target_om)
    assert abs(float(sol['Omega_m']) - target_om) < 1e-5

    # explicit limits skip bracketing
    sol = c.solve('omega_cdm', 'Omega_m', target=target_om, limits=(0.10, 0.16))
    assert abs(float(sol['Omega_m']) - target_om) < 1e-5

    # non-callable, non-string func -> clear error
    with pytest.raises(Exception, match='callable'):
        c.solve('h', 12345, target=1.0)


def test_tabulated(tmp_path, cosmo):
    ba = cosmo.get_background(engine='eisenstein_hu')
    z = np.linspace(0.0, 10.0, 501)
    table = np.column_stack([z, np.asarray(ba.efunc(z)), np.asarray(ba.comoving_radial_distance(z))])
    fn = str(tmp_path / 'table.txt')
    np.savetxt(fn, table)
    ct = Cosmology(engine='tabulated', extra_params={'filename': fn})
    bat = ct.get_background()
    zq = np.array([0.3, 1.7, 9.2])
    np.testing.assert_allclose(np.asarray(bat.efunc(zq)), np.asarray(ba.efunc(zq)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bat.comoving_radial_distance(zq)),
                               np.asarray(ba.comoving_radial_distance(zq)), rtol=1e-6)


def test_package_export_surface():
    # the reference's top-level import set (reference __init__.py:1-5)
    import cosmoprimo_tpu as cp
    for name in ['Cosmology', 'Background', 'Thermodynamics', 'Primordial', 'Transfer',
                 'Harmonic', 'Fourier', 'CosmologyError', 'CosmologyInputError',
                 'CosmologyComputationError', 'PowerSpectrumInterpolator1D',
                 'PowerSpectrumInterpolator2D', 'CorrelationFunctionInterpolator1D',
                 'CorrelationFunctionInterpolator2D', 'FFTlog', 'PowerToCorrelation',
                 'CorrelationToPower', 'TophatVariance', 'PowerSpectrumBAOFilter',
                 'CorrelationFunctionBAOFilter', 'fiducial']:
        assert getattr(cp, name) is not None
    c = cp.Cosmology(engine='eisenstein_hu')
    assert np.isfinite(float(np.asarray(cp.Background(c).efunc(1.0))))
