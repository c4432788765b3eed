"""Bindings exercised against stub cobaya/cosmosis APIs (neither package is
installed in this image): the adapters' math — unit conversions, datablock
layout, requirement getters — is what these tests pin down (reference
parity: bindings/cobaya/cosmoprimo.py, bindings/cosmosis/
cosmoprimo_interface.py)."""

import sys
import types

import numpy as np
import pytest

from cosmoprimo_tpu.cosmology import Cosmology


@pytest.fixture(scope='module')
def cosmo():
    return Cosmology(engine='eisenstein_hu', omega_cdm=0.12, omega_b=0.02237, h=0.6736,
                     A_s=2.083e-9, n_s=0.9649)


def test_cobaya_getters(cosmo):
    from cosmoprimo_tpu.bindings.cobaya.cosmoprimo_tpu import CosmoprimoTPU, _get_from_cosmo

    theory = CosmoprimoTPU.__new__(CosmoprimoTPU)
    theory.current_state = {'cosmo': cosmo}
    h = float(np.asarray(cosmo['h']))

    z = np.array([0.5, 1.0, 2.0])
    H = theory.get_Hubble(z)
    np.testing.assert_allclose(H, np.asarray(cosmo.get_background().hubble_function(z)))
    H_invmpc = theory.get_Hubble(z, units='1/Mpc')
    np.testing.assert_allclose(H_invmpc, H / 299792.458, rtol=1e-6)

    # cobaya distances are in Mpc (not Mpc/h)
    dA = theory.get_angular_diameter_distance(z)
    np.testing.assert_allclose(dA, np.asarray(cosmo.get_background().angular_diameter_distance(z)) / h)
    chi = theory.get_comoving_radial_distance(z)
    np.testing.assert_allclose(chi, np.asarray(cosmo.get_background().comoving_radial_distance(z)) / h)

    k, zgrid, pkz = theory.get_Pk_grid()
    assert pkz.shape == (len(zgrid), len(k))
    # 1/Mpc and Mpc^3 conventions
    pk_ours = cosmo.get_fourier().pk_interpolator()
    np.testing.assert_allclose(k, np.asarray(pk_ours.k) * h)
    ik = np.argmin(np.abs(k - 0.1))
    np.testing.assert_allclose(pkz[0, ik], float(pk_ours(k[ik] / h, z=zgrid[0])) / h ** 3, rtol=1e-10)

    s8 = theory.get_sigma8_z(np.array([0.0, 1.0]))
    assert 0.5 < s8[0] < 1.1 and s8[1] < s8[0]
    fs8 = theory.get_fsigma8(np.array([0.5]))
    assert 0.2 < float(fs8[0]) < 0.7

    rd = theory.get_rs_drag()
    np.testing.assert_allclose(rd, float(np.asarray(cosmo.get_thermodynamics().rs_drag)) / h)

    assert abs(_get_from_cosmo(cosmo, 'omegam') - float(np.asarray(cosmo['Omega_m']))) < 1e-12
    assert _get_from_cosmo(cosmo, 'rdrag') > 0


class _FakeBlock(dict):
    def __setitem__(self, key, value):
        super().__setitem__(tuple(key) if isinstance(key, tuple) else key, value)

    def has_value(self, section, name):
        return (section, name) in self

    def put_grid(self, section, zname, z, kname, k, pname, p):
        self[section, zname] = z
        self[section, kname] = k
        self[section, pname] = p


def _install_fake_cosmosis():
    cosmosis = types.ModuleType('cosmosis')
    datablock = types.ModuleType('cosmosis.datablock')
    names = types.SimpleNamespace(cosmological_parameters='cosmological_parameters',
                                  distances='distances', growth_parameters='growth',
                                  matter_power_lin='matter_power_lin', cmb_cl='cmb_cl')
    datablock.names = names
    datablock.option_section = 'module_options'
    cosmosis.datablock = datablock
    sys.modules['cosmosis'] = cosmosis
    sys.modules['cosmosis.datablock'] = datablock
    return names


def test_cosmosis_execute():
    from cosmoprimo_tpu.bindings.cosmosis import cosmoprimo_tpu_interface as iface
    names = _install_fake_cosmosis()
    try:
        class Options:
            """Fake ini options: enable the fourier products."""

            def get_string(self, s, n, default=''):
                return default

            def get_double(self, s, n, default=0.0):
                return default

            def get_int(self, s, n, default=0):
                return {'nz': 20}.get(n, default)

            def get_bool(self, s, n, default=False):
                return True if n == 'fourier' else default

        config = iface.setup(Options())
        assert config['fourier'] is True
        block = _FakeBlock()
        cp = names.cosmological_parameters
        block[cp, 'h0'] = 0.6736
        block[cp, 'omega_b'] = 0.0493
        block[cp, 'omega_c'] = 0.2645
        block[cp, 'n_s'] = 0.9649
        block[cp, 'a_s'] = 2.083e-9
        assert iface.execute(block, config) == 0

        z = block['distances', 'z']
        dc = block['distances', 'd_c']
        da = block['distances', 'd_a']
        assert np.all(np.diff(dc) > 0)
        # cosmosis units: Mpc; d_a = d_m / (1+z)
        np.testing.assert_allclose(da[1:], np.asarray(block['distances', 'd_m'])[1:] / (1 + z[1:]), rtol=1e-10)
        # m_ncdm = 0.06 is the reference interface's default (mnu)
        cosmo = config['base'].clone(h=0.6736, Omega_b=0.0493, Omega_cdm=0.2645,
                                     n_s=0.9649, A_s=2.083e-9, m_ncdm=0.06,
                                     z_pk=np.linspace(0.0, 3.01, 20), kmax_pk=50.0)
        np.testing.assert_allclose(dc, np.asarray(cosmo.get_background().comoving_radial_distance(z)) / 0.6736,
                                   rtol=1e-8)
        # distance extras: D_V, H, mu, rs
        assert np.isfinite(block['distances', 'd_v'][1:]).all()
        np.testing.assert_allclose(block['distances', 'mu'][1:],
                                   5 * np.log10(block['distances', 'd_l'][1:]) + 25, rtol=1e-12)
        assert 90 < block['distances', 'rs_zdrag'] < 160
        assert np.isfinite(block['distances', 'f_ap'][1:]).all()
        # growth and pk blocks
        zg = block['growth', 'z']
        assert np.all(np.diff(block['growth', 'd_z']) < 0)
        assert np.all((block['growth', 'f_z'] > 0.3) & (block['growth', 'f_z'] < 1.1))
        np.testing.assert_allclose(block['growth', 'fsigma_8'],
                                   block['growth', 'f_z'] * np.asarray(
                                       cosmo.get_fourier().sigma8_z(zg, of='delta_cb')), rtol=1e-6)
        pkz = block['matter_power_lin', 'p_k']
        nk = len(block['matter_power_lin', 'k_h'])
        nzpk = len(block['matter_power_lin', 'z'])
        assert pkz.shape == (nzpk, nk) and np.all(np.isfinite(pkz)) and np.all(pkz > 0)
        assert ('cdm_baryon_power_lin', 'p_k') in block
        assert 0.5 < block[cp, 'sigma_8'] < 1.1
        assert 0.3 < block[cp, 'S_8'] < 1.2
        assert block[cp, 'sigma_12'] > 0
        assert iface.cleanup(config) == 0
    finally:
        sys.modules.pop('cosmosis', None)
        sys.modules.pop('cosmosis.datablock', None)


def test_cobaya_calculate(cosmo):
    from cosmoprimo_tpu.bindings.cobaya.cosmoprimo_tpu import CosmoprimoTPU, LoggedError

    theory = CosmoprimoTPU.__new__(CosmoprimoTPU)
    theory._base_cosmo = cosmo
    theory.output_params = ['omegam', 'rdrag']
    theory.log = None
    state = {}
    assert theory.calculate(state, want_derived=True, omega_cdm=0.121) is True
    assert abs(float(np.asarray(state['cosmo']['omega_cdm'])) - 0.121) < 1e-12
    assert state['derived']['rdrag'] > 0 and 0.2 < state['derived']['omegam'] < 0.5
    # invalid input surfaces as the cobaya error type
    with pytest.raises(LoggedError):
        theory.calculate({}, want_derived=False, w0_fld=1.0, wa_fld=1.0)

def test_cobaya_get_Cl(tmp_path):
    from test_emulators import _make_synthetic_capse
    from cosmoprimo_tpu.emulators import EmulatedEngine
    from cosmoprimo_tpu.bindings.cobaya.cosmoprimo_tpu import CosmoprimoTPU
    from cosmoprimo_tpu import constants

    engine_cls = EmulatedEngine.read(_make_synthetic_capse(tmp_path))
    cl_cosmo = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, logA=3.0, n_s=0.9649,
                         tau_reio=0.055, ellmax_cl=49, engine=engine_cls)
    theory = CosmoprimoTPU.__new__(CosmoprimoTPU)
    theory.current_state = {'cosmo': cl_cosmo}
    raw = np.asarray(cl_cosmo.get_harmonic().lensed_cl()['tt'])

    cl = theory.get_Cl(ell_factor=False, units='FIRASmuK2')
    assert cl['ell'].shape == raw.shape
    np.testing.assert_allclose(cl['tt'], raw * (constants.TCMB * 1e6) ** 2, rtol=1e-12)
    cl2 = theory.get_Cl(ell_factor=True, units='1')
    ell = cl2['ell']
    np.testing.assert_allclose(cl2['tt'][2:], raw[2:] * (ell * (ell + 1) / (2 * np.pi))[2:], rtol=1e-12)


def _fresh_theory(cosmo):
    from cosmoprimo_tpu.bindings.cobaya.cosmoprimo_tpu import CosmoprimoTPU
    theory = CosmoprimoTPU.__new__(CosmoprimoTPU)
    theory._base_cosmo = cosmo
    theory.output_params = []
    theory.log = None
    return theory


def test_cobaya_must_provide_collectors(cosmo):
    """Requirement registration: collectors with pooled z-arrays (reference
    bindings/cobaya/cosmoprimo.py:96-228) and collected products read back
    by the standard getters."""
    theory = _fresh_theory(cosmo)
    z1 = np.array([0.3, 0.8])
    z2 = np.array([0.8, 1.4])  # overlapping pools must merge
    theory.must_provide(Hubble={'z': z1}, comoving_radial_distance={'z': z1})
    theory.must_provide(Hubble={'z': z2}, sigma8_z={'z': z1}, fsigma8={'z': z1})
    pool = theory.collectors['Hubble'].z_pool
    np.testing.assert_allclose(pool.values, [0.3, 0.8, 1.4])

    state = {}
    assert theory.calculate(state, want_derived=False) is True
    theory.current_state = state
    # Hubble collected in cobaya's 1/Mpc convention over the pooled z's
    H = state['Hubble']
    truth = np.asarray(cosmo.get_background().hubble_function(pool.values)) / 299792.458
    np.testing.assert_allclose(H, truth, rtol=1e-6)
    # distances divided by h (Mpc)
    h = float(np.asarray(cosmo['h']))
    chi = state['comoving_radial_distance']
    np.testing.assert_allclose(
        chi, np.asarray(cosmo.get_background().comoving_radial_distance(z1)) / h, rtol=1e-10)
    # getters serve from the collected state at the requested z subset
    s8 = theory.get_sigma8_z(z1)
    assert s8.shape == z1.shape and np.all((0.2 < s8) & (s8 < 1.2))
    fs8 = theory.get_fsigma8(np.array([0.8]))
    assert 0.1 < float(fs8[0]) < 1.0


def test_cobaya_must_provide_pk_grid(cosmo):
    theory = _fresh_theory(cosmo)
    key = ('Pk_grid', False, 'delta_tot', 'delta_tot')
    theory.must_provide({key: {'k_max': 2.0, 'z': np.array([0.0, 1.0]), 'nonlinear': False}})
    assert theory.extra_args['kmax_pk'] == 2.0
    np.testing.assert_allclose(theory.z_for_matter_power, [0.0, 1.0])
    state = {}
    assert theory.calculate(state, want_derived=False) is True
    theory.current_state = state
    k, z, pk = state[key]
    assert pk.shape == (len(z), len(k))
    np.testing.assert_allclose(z, [0.0, 1.0])
    # cobaya conventions: k in 1/Mpc, P in Mpc^3
    h = float(np.asarray(cosmo['h']))
    truth = cosmo.get_fourier().pk_interpolator()
    ik = len(k) // 2
    np.testing.assert_allclose(pk[0, ik], float(truth(k[ik] / h, 0.0)) / h ** 3, rtol=1e-4)
    # get_Pk_grid serves the collected product
    k2, z2, pk2 = theory.get_Pk_grid(var_pair=('delta_tot', 'delta_tot'), nonlinear=False)
    np.testing.assert_allclose(pk2, pk, rtol=1e-12)


def test_cobaya_must_provide_cl_and_derived(cosmo):
    theory = _fresh_theory(cosmo)
    theory.must_provide(Cl={'tt': 40, 'te': 30}, H0=None)
    assert theory.extra_args['ellmax_cl'] == 40
    assert theory.extra_args['lensing'] is True
    assert 'H0' in theory.derived_extra
    assert theory.collectors['Cl'].section == 'harmonic'


if __name__ == '__main__':
    import sys as _sys
    _sys.exit(pytest.main([__file__, '-q']))


def test_cobaya_cl_pp_units(cosmo):
    """The dimensionless lensing-potential 'pp' never gets the muK^2 unit
    factor (review finding), matching the reference binding."""
    theory = _fresh_theory(cosmo)
    ell = np.arange(10)
    cls = {'ell': ell, 'tt': np.ones(10), 'pp': np.ones(10), 'tp': np.ones(10)}
    theory.current_state = {'cosmo': cosmo}
    out = theory._postprocess_cl(dict(cls), ell_factor=False, units='FIRASmuK2')
    T = float(np.asarray(cosmo['T_cmb'])) * 1e6
    np.testing.assert_allclose(out['tt'], T ** 2)
    np.testing.assert_allclose(out['pp'], 1.0)        # no unit factor
    np.testing.assert_allclose(out['tp'], T ** 2)     # reference convention
    out2 = theory._postprocess_cl(dict(cls), ell_factor=True, units='1')
    ellf = ell * (ell + 1) / (2 * np.pi)
    np.testing.assert_allclose(out2['pp'], ellf ** 2 * (2 * np.pi))


def test_cobaya_zpool_strict_lookup(cosmo):
    """Requesting a redshift never declared in must_provide fails loudly
    instead of returning a neighboring pool value (review finding)."""
    from cosmoprimo_tpu.bindings.cobaya.cosmoprimo_tpu import _ZPool1D
    pool = _ZPool1D([0.3, 0.8, 1.4])
    np.testing.assert_array_equal(pool.find_indices([0.8, 0.3]), [1, 0])
    with pytest.raises(ValueError):
        pool.find_indices([0.81])


def test_cosmosis_mnu_total_split():
    """cosmosis 'mnu' is the total neutrino mass: split over species
    (review finding; the reference multiplies it by num_massive_neutrinos)."""
    from cosmoprimo_tpu.bindings.cosmosis import cosmoprimo_tpu_interface as iface
    names = _install_fake_cosmosis()
    try:
        block = _FakeBlock()
        cp = names.cosmological_parameters
        block[cp, 'h0'] = 0.68
        block[cp, 'mnu'] = 0.06
        block[cp, 'num_massive_neutrinos'] = 2
        params = iface.get_inputs(block, {'harmonic': False, 'fourier': False,
                                          'lensing': True, 'nonlinear': ''})
        np.testing.assert_allclose(params['m_ncdm'], [0.03, 0.03])
    finally:
        sys.modules.pop('cosmosis', None)
        sys.modules.pop('cosmosis.datablock', None)
