"""Fake ``pyclass`` / ``camb`` host modules for exercising the Boltzmann
wrapper engines end to end without the external codes (the pattern proven in
test_bindings.py for cobaya/cosmosis).

The stubs serve physically-sensible numbers from an internal
``cosmoprimo_tpu`` Cosmology with the eisenstein_hu engine, with known
per-variable scalings so tests can assert the wrappers' math: CAMB's Weyl
~ k^2 (phi+psi)/2 convention, theta_cb Omega-weighted reconstruction,
hubble-unit conversions, sigma8 rescaling, z_star-from-opacity.
"""

import sys
import types

import numpy as np

# per-variable multiplicative scalings of the base matter spectrum,
# shared by both stubs so tests can predict cross spectra exactly
VAR_SCALE = {'delta_tot': 1.0, 'delta_m': 1.0,
             'delta_nonu': 1.05, 'delta_cb': 1.05,
             'v_newtonian_cdm': 0.8, 'theta_cdm': 0.8,
             'v_newtonian_baryon': 0.6, 'theta_b': 0.6,
             'phi_plus_psi': 3.0}
Z_STAR_TRUE = 1100.0   # total optical depth crosses 1 here (stub convention)
Z_TAU_POW = 8.0


def _truth_cosmology(h, omega_cdm, omega_b, A_s=None, sigma8=None, n_s=0.96):
    from cosmoprimo_tpu import Cosmology
    kw = dict(h=h, omega_cdm=omega_cdm, omega_b=omega_b, n_s=n_s, engine='eisenstein_hu')
    if A_s is not None:
        kw['A_s'] = A_s
    else:
        kw['sigma8'] = sigma8 if sigma8 is not None else 0.8
    return Cosmology(**kw)


def _pk_table_h(cosmo, non_linear=False):
    """(k [h/Mpc], z, pk [(Mpc/h)^3]) base table from the truth cosmology."""
    k = np.geomspace(1e-4, 10.0, 200)
    z = np.array([0.0, 0.5, 1.0, 2.0])
    pk = np.asarray(cosmo.get_fourier().pk_interpolator()(k, z))
    if non_linear:
        pk = pk * (1.0 + 0.1 * (k[:, None] / (1.0 + k[:, None])))  # distinguishable tag
    return k, z, pk


def _cl_array(ellmax, names, amp=1e-10):
    ell = np.arange(ellmax + 1)
    out = np.empty(ellmax + 1, dtype=[('ell', np.int64)] + [(n, np.float64) for n in names])
    out['ell'] = ell
    for i, n in enumerate(names):
        out[n] = amp * (i + 1) / (ell * (ell + 1.0) + 1.0)
    return out


# ----------------------------------------------------------------------------
# fake pyclass
# ----------------------------------------------------------------------------

class ClassBadInput(Exception):
    pass


class ClassBadComputation(Exception):
    pass


class _FakeClassEngineBase(object):

    def __init__(self, params=None):
        self.params = dict(params or {})
        if 'unknown_param_to_fail_on' in self.params:
            raise ClassBadInput('unknown parameter')
        h = float(self.params.get('h', 0.7))
        self.cosmo = _truth_cosmology(
            h=h,
            omega_cdm=float(self.params.get('Omega_cdm', 0.25)) * h ** 2,
            omega_b=float(self.params.get('Omega_b', 0.05)) * h ** 2,
            A_s=self.params.get('A_s'), sigma8=self.params.get('sigma8'),
            n_s=float(self.params.get('n_s', 0.96)))
        self.h = h

    def compute(self, tasks):
        if self.params.get('fail_compute'):
            raise ClassBadComputation('boom')

    def get_background(self):
        return _FakeClassBackground(self)

    def get_thermodynamics(self):
        return _FakeClassThermodynamics(self)

    def get_primordial(self):
        return _FakeClassPrimordial(self)

    def get_perturbations(self):
        return _FakeClassPerturbations(self)

    def get_transfer(self):
        return _FakeClassTransfer(self)

    def get_harmonic(self):
        return _FakeClassHarmonic(self)

    def get_fourier(self):
        return _FakeClassFourier(self)


class _FakeClassBackground(object):

    def __init__(self, engine):
        self.eng = engine
        self.ba = engine.cosmo.get_background()

    def efunc(self, z):
        return np.asarray(self.ba.efunc(np.asarray(z)))

    def comoving_radial_distance(self, z):
        return np.asarray(self.ba.comoving_radial_distance(np.asarray(z)))

    def time(self, z):
        return np.asarray(self.ba.time(np.asarray(z)))

    def growth_factor(self, z):
        return np.asarray(self.ba.growth_factor(np.asarray(z)))

    def growth_rate(self, z):
        return np.asarray(self.ba.growth_rate(np.asarray(z)))

    def comoving_sound_horizon(self, z):
        # smooth monotone stand-in with the right late-time value scale
        z = np.asarray(z, dtype=np.float64)
        return 100.0 * np.sqrt(1090.0 / np.maximum(z, 1.0))

    def table(self):
        z = np.geomspace(1e-3, 100.0, 64)[::-1]
        H = np.asarray(self.ba.hubble_function(z)) / 299792.458  # 1/Mpc
        out = np.empty(z.size, dtype=[('z', np.float64), ('H [1/Mpc]', np.float64),
                                      ('(.)rho_b', np.float64), ('(.)rho_cdm', np.float64),
                                      ('(.)rho_fld', np.float64)])
        out['z'] = z
        out['H [1/Mpc]'] = H
        rho_crit = H ** 2
        Om = np.asarray(self.ba.Omega_m(z))
        Ode = np.asarray(self.ba.Omega_de(z))
        fb = float(np.asarray(self.eng.cosmo['Omega_b'] / self.eng.cosmo['Omega_m']))
        out['(.)rho_b'] = rho_crit * Om * fb
        out['(.)rho_cdm'] = rho_crit * Om * (1 - fb)
        out['(.)rho_fld'] = rho_crit * Ode
        return out


class _FakeClassThermodynamics(object):

    def __init__(self, engine):
        self.eng = engine
        th = engine.cosmo.get_thermodynamics()
        h = engine.h
        self.rs_drag = float(np.asarray(th.rs_drag)) / h  # pyclass units: Mpc
        self.z_drag = float(np.asarray(th.z_drag))
        self.rs_star = self.rs_drag * 0.98
        self.z_star = Z_STAR_TRUE
        self.tau_reio = float(self.eng.params.get('tau_reio', 0.06))
        self.z_reio = 7.7
        self.YHe = 0.245

    def table(self):
        z = np.linspace(0.0, 2000.0, 512)
        kappa = self.tau_reio * (z < 50.0) + (z / Z_STAR_TRUE) ** Z_TAU_POW
        out = np.empty(z.size, dtype=[('z', np.float64), ('exp(-kappa)', np.float64)])
        out['z'] = z
        out['exp(-kappa)'] = np.exp(-kappa)
        return out


class _FakeClassPrimordial(object):

    def __init__(self, engine):
        self.A_s = float(engine.params.get('A_s', 2.1e-9))


class _FakeClassPerturbations(object):

    def __init__(self, engine):
        self.eng = engine

    def table(self):
        k = np.geomspace(1e-3, 1.0, 16)
        out = np.empty(k.size, dtype=[('k', np.float64), ('delta_cdm', np.float64)])
        out['k'] = k
        out['delta_cdm'] = -k ** 0.5
        return out


class _FakeClassTransfer(object):

    def __init__(self, engine):
        self.eng = engine

    def table(self, z=0.0):
        k = np.geomspace(1e-4, 10.0, 32)
        tk = np.asarray(self.eng.cosmo.get_transfer().transfer_k(k))
        out = np.empty(k.size, dtype=[('k', np.float64), ('d_cdm', np.float64), ('d_b', np.float64)])
        out['k'] = k
        out['d_cdm'] = tk
        out['d_b'] = 0.9 * tk
        return out


class _FakeClassHarmonic(object):

    def __init__(self, engine):
        self.eng = engine

    def unlensed_cl(self, ellmax=-1):
        return _cl_array(ellmax, ['tt', 'ee', 'bb', 'te'])

    def lensed_cl(self, ellmax=-1):
        return _cl_array(ellmax, ['tt', 'ee', 'bb', 'te'], amp=1.1e-10)

    def lens_potential_cl(self, ellmax=-1):
        return _cl_array(ellmax, ['pp', 'tp', 'ep'], amp=1e-12)

    def unlensed_table(self, ellmax=-1, of=None):
        return _cl_array(ellmax, list(of) if of else ['tt', 'ee', 'bb', 'te'])

    def lensed_table(self, ellmax=-1, of=None):
        return _cl_array(ellmax, list(of) if of else ['tt', 'ee', 'bb', 'te'], amp=1.1e-10)


class _FakeClassFourier(object):

    def __init__(self, engine):
        self.eng = engine
        self.sigma8_m = float(np.asarray(engine.cosmo.get_fourier().sigma8_m))
        self.sigma8_cb = self.sigma8_m * 1.005

    def table(self, non_linear='', of='delta_m'):
        if isinstance(of, str):
            of = (of, of)
        k, z, pk = _pk_table_h(self.eng.cosmo, non_linear=bool(non_linear))
        return k, z, pk * VAR_SCALE[of[0]] * VAR_SCALE[of[1]]


def install_fake_pyclass(monkeypatch=None):
    """Install a fake ``pyclass`` (with variant submodules) in sys.modules;
    returns the module. Use ``uninstall_fakes`` or monkeypatch to clean up."""
    pyclass = types.ModuleType('pyclass')
    base = types.ModuleType('pyclass.base')

    class ClassEngine(_FakeClassEngineBase):
        pass

    base.ClassEngine = ClassEngine
    base.ClassInputError = ClassBadInput
    base.ClassComputationError = ClassBadComputation
    pyclass.base = base
    pyclass.ClassEngine = ClassEngine
    pyclass.ClassInputError = ClassBadInput
    pyclass.ClassComputationError = ClassBadComputation
    modules = {'pyclass': pyclass, 'pyclass.base': base}
    for variant in ['axiclass', 'mochiclass', 'negnuclass', 'dsclass']:
        sub = types.ModuleType(f'pyclass.{variant}')
        sub.ClassEngine = ClassEngine
        sub.ClassInputError = ClassBadInput
        sub.ClassComputationError = ClassBadComputation
        setattr(pyclass, variant, sub)
        modules[f'pyclass.{variant}'] = sub
    for name, mod in modules.items():
        if monkeypatch is not None:
            monkeypatch.setitem(sys.modules, name, mod)
        else:
            sys.modules[name] = mod
    return pyclass


# ----------------------------------------------------------------------------
# fake camb
# ----------------------------------------------------------------------------

class CAMBError(Exception):
    pass


class CAMBParamRangeError(CAMBError):
    pass


class CAMBValueError(CAMBError):
    pass


class CAMBUnknownArgumentError(CAMBError):
    pass


TRANSFER_NAMES = ['k/h', 'delta_cdm', 'delta_baryon', 'delta_photon', 'delta_neutrino',
                  'delta_nu', 'delta_tot', 'delta_nonu', 'delta_tot_de', 'Weyl',
                  'v_newtonian_cdm', 'v_newtonian_baryon', 'v_baryon_cdm']


class _InitPower(object):
    As = 2.1e-9
    ns = 0.96
    nrun = 0.0
    nrunrun = 0.0
    pivot_scalar = 0.05
    pivot_tensor = 0.05
    r = 0.0
    nt = 0.0
    ntrun = 0.0


class _Reion(object):
    optical_depth = 0.06
    delta_redshift = 0.5


class _FakeCAMBparams(object):

    def __init__(self):
        self.InitPower = _InitPower()
        self.Reion = _Reion()
        self.NonLinear = 0  # NonLinear_none
        self.NonLinearModel = None
        self.DoLensing = False
        self.Want_CMB_lensing = False
        self.WantScalars = True
        self.WantVectors = False
        self.WantTensors = False
        self.share_delta_neff = False
        self.omnuh2 = 0.0
        self.num_nu_massless = 3.044
        self.num_nu_massive = 0
        self.nu_mass_eigenstates = 0
        self.nu_mass_numbers = np.zeros(0, dtype=np.int32)
        self.nu_mass_fractions = np.zeros(0)
        self.nu_mass_degeneracies = np.zeros(0)
        self.H0 = 70.0
        self.ombh2 = 0.022
        self.omch2 = 0.12
        self.YHe = 0.245
        self.zrei = 7.7
        self.redshifts = np.array([0.0])
        self.kmax = 10.0
        self.lmax = 2500
        self.EFTCAMB = object()  # so heftcamb's capability check passes
        self.extra = {}

    def get_zrei(self):
        return self.zrei

    def primordial_power(self, k_mpc, index):
        ip = self.InitPower
        if index != 0:
            return np.zeros_like(np.asarray(k_mpc))
        lnkkp = np.log(np.asarray(k_mpc) / ip.pivot_scalar)
        return ip.As * (np.asarray(k_mpc) / ip.pivot_scalar) ** (
            ip.ns - 1.0 + 0.5 * ip.nrun * lnkkp + ip.nrunrun * lnkkp ** 2 / 6.0)

    @property
    def h(self):
        return self.H0 / 100.0


def _fake_set_params(pars, **kwargs):
    initpower_keys = {'As', 'ns', 'nrun', 'nrunrun', 'pivot_scalar', 'pivot_tensor', 'r', 'nt', 'ntrun'}
    for name, value in kwargs.items():
        if name in initpower_keys:
            setattr(pars.InitPower, name, value)
        elif name == 'tau':
            pars.Reion.optical_depth = value
        elif name == 'zrei':
            pars.zrei = value
        elif name in ('YHe',) and value is None:
            pass
        elif name == 'fail_with_range_error':
            raise CAMBParamRangeError('bad value')
        elif hasattr(pars, name):
            setattr(pars, name, value)
        else:
            pars.extra[name] = value
    return pars


class _FakeCAMBdata(object):

    def __init__(self, pars=None, no_thermo=True):
        self.Params = pars
        if pars is not None:
            self._bind(pars)

    def _bind(self, pars):
        self.Params = pars
        h = pars.H0 / 100.0
        self.h = h
        self.cosmo = _truth_cosmology(h=h, omega_cdm=pars.omch2, omega_b=pars.ombh2,
                                      A_s=pars.InitPower.As, n_s=pars.InitPower.ns)
        self.ba = self.cosmo.get_background()
        self.transfer_redshifts = np.sort(np.asarray(pars.redshifts))  # ascending, as camb returns

    # ---- background
    def get_Omega(self, var, z=0.0):
        z = np.asarray(z, dtype=np.float64)
        names = {'K': 'Omega_k', 'cdm': 'Omega_cdm', 'baryon': 'Omega_b', 'photon': 'Omega_g',
                 'neutrino': 'Omega_ur', 'nu': 'Omega_ncdm_tot', 'de': 'Omega_de'}
        return np.asarray(getattr(self.ba, names[var])(z))

    def get_background_densities(self, a, vars=None):
        a = np.asarray(a, dtype=np.float64)
        z = 1.0 / a - 1.0
        names = {'K': 'rho_k', 'cdm': 'rho_cdm', 'baryon': 'rho_b', 'photon': 'rho_g',
                 'neutrino': 'rho_ur', 'nu': 'rho_ncdm_tot', 'de': 'rho_de'}
        out = {}
        H0_kms = self.Params.H0
        # invert the engine conversion: rho_ref = dens * RH0 * (1 + z), with
        # RH0 = rho_crit_msunph * c^2 / (H0 km/s in m/s)^2 / 3
        from cosmoprimo_tpu import constants
        RH0 = constants.rho_crit_over_Msunph_per_Mpcph3 * constants.c ** 2 / (H0_kms * 1e3) ** 2 / 3.0
        for var in vars:
            rho_ref = np.asarray(getattr(self.ba, names[var])(z))
            out[var] = rho_ref / RH0 / (1.0 + z)
        return out

    def hubble_parameter(self, z):
        return np.asarray(self.ba.hubble_function(np.asarray(z)))

    def physical_time(self, z):
        return float(np.asarray(self.ba.time(float(z))))

    def comoving_radial_distance(self, z):
        return np.asarray(self.ba.comoving_radial_distance(np.asarray(z))) / self.h

    def angular_diameter_distance(self, z):
        return np.asarray(self.ba.angular_diameter_distance(np.asarray(z))) / self.h

    def luminosity_distance(self, z):
        return np.asarray(self.ba.luminosity_distance(np.asarray(z))) / self.h

    # ---- thermodynamics
    def get_derived_params(self):
        th = self.cosmo.get_thermodynamics()
        return {'rdrag': float(np.asarray(th.rs_drag)) / self.h,
                'zdrag': float(np.asarray(th.z_drag)),
                'rstar': float(np.asarray(th.rs_drag)) * 0.98 / self.h,
                'zstar': 1089.0,
                'age': 13.8}

    def sound_horizon(self, z):
        return 100.0 * np.sqrt(1090.0 / np.maximum(np.asarray(z, dtype=np.float64), 1.0)) / self.h / 0.7

    def cosmomc_theta(self):
        return 0.0104

    def get_background_redshift_evolution(self, z, vars=None):
        z = np.asarray(z)
        # total optical depth tau(z) = (z / Z_STAR_TRUE)^p -> opacity = dtau/dchi
        dtau_dz = Z_TAU_POW / Z_STAR_TRUE * (np.maximum(z, 1e-10) / Z_STAR_TRUE) ** (Z_TAU_POW - 1.0)
        chi = self.comoving_radial_distance(z)
        dchi_dz = np.gradient(chi, z)
        return {'opacity': dtau_dz / np.maximum(dchi_dz, 1e-30)}

    # ---- transfer / fourier / harmonic
    def calc_power_spectra(self, pars=None):
        if pars is not None:
            self._bind(pars)

    def get_matter_transfer_data(self):
        k_h = np.geomspace(1e-4, 10.0, 32)
        z = self.transfer_redshifts
        tk = np.asarray(self.cosmo.get_transfer().transfer_k(k_h))
        data = types.SimpleNamespace()
        arr = np.empty((len(TRANSFER_NAMES), k_h.size, len(z)))
        for i, name in enumerate(TRANSFER_NAMES):
            if name == 'k/h':
                arr[i] = k_h[:, None]
            else:
                arr[i] = tk[:, None] * (1.0 + 0.01 * i) / (1.0 + np.asarray(z)[None, :])
        data.transfer_data = arr
        return data

    def _base_pk_mpc(self, nonlinear):
        k_h, z, pk_h = _pk_table_h(self.cosmo, non_linear=nonlinear)
        # to non-hubble units: k [1/Mpc], P [Mpc^3]
        return k_h * self.h, z, pk_h / self.h ** 3

    def get_linear_matter_power_spectrum(self, var1='delta_tot', var2='delta_tot', hubble_units=True,
                                         k_hunit=True, have_power_spectra=True, nonlinear=False):
        k_mpc, z, pk_mpc = self._base_pk_mpc(nonlinear)

        def scale(var):
            if var == 'Weyl':  # Weyl ~ k^2 (phi + psi) / 2
                return VAR_SCALE['phi_plus_psi'] * k_mpc[:, None] ** 2 / 2.0
            return VAR_SCALE[var]

        pk = pk_mpc * scale(var1) * scale(var2)
        k = k_mpc
        if k_hunit:
            k = k_mpc / self.h
        if hubble_units:
            pk = pk * self.h ** 3
        return k, z, pk.T  # camb returns (z, k)

    def get_sigma8(self):
        s8 = float(np.asarray(self.cosmo.get_fourier().sigma8_m))
        return np.array([s8 * (1.0 + 0.01 * i) for i in range(len(self.transfer_redshifts))])[::-1]

    def get_unlensed_total_cls(self, lmax=None, CMB_unit=None, raw_cl=True):
        ell = np.arange(lmax + 1)
        return np.stack([1e-10 * (i + 1) / (ell * (ell + 1.0) + 1.0) for i in range(4)], axis=-1)

    def get_total_cls(self, lmax=None, CMB_unit=None, raw_cl=True):
        return 1.1 * self.get_unlensed_total_cls(lmax=lmax)

    def get_lens_potential_cls(self, lmax=None, CMB_unit=None, raw_cl=True):
        ell = np.arange(lmax + 1)
        return np.stack([1e-12 * (i + 1) / (ell * (ell + 1.0) + 1.0) ** 2 for i in range(3)], axis=-1)

    # ---- isitide extras
    def get_fQ_growth_rate(self, z=0.0):
        return np.asarray(self.ba.growth_rate(np.asarray(z))) * 1.01

    def get_growth_factor(self, z=0.0):
        return np.asarray(self.ba.growth_factor(np.asarray(z))) * 1.0


def install_fake_camb(monkeypatch=None, names=('camb', 'isitgr', 'mgcamb', 'isitide', 'heftcamb')):
    """Install a fake ``camb`` module (and variant aliases) in sys.modules."""
    camb = types.ModuleType('camb')
    camb.CAMBparams = _FakeCAMBparams
    camb.CAMBdata = _FakeCAMBdata
    camb.set_params = _fake_set_params
    camb.get_background = lambda pars, no_thermo=True: _FakeCAMBdata(pars, no_thermo=no_thermo)
    camb.get_transfer_functions = lambda pars: _FakeCAMBdata(pars)
    camb.CAMBError = CAMBError
    baseconfig = types.SimpleNamespace(CAMBError=CAMBError, CAMBParamRangeError=CAMBParamRangeError,
                                       CAMBValueError=CAMBValueError, CAMBUnknownArgumentError=CAMBUnknownArgumentError)
    camb.baseconfig = baseconfig
    camb.model = types.SimpleNamespace(NonLinear_none=0, NonLinear_both=2, transfer_names=TRANSFER_NAMES)

    class _Halofit(object):
        def set_params(self, halofit_version=None):
            self.halofit_version = halofit_version

    camb.nonlinear = types.SimpleNamespace(Halofit=_Halofit)
    camb.dark_energy = types.SimpleNamespace(DarkEnergyPPF=object, DarkEnergyFluid=object)
    for name in names:
        if monkeypatch is not None:
            monkeypatch.setitem(sys.modules, name, camb)
        else:
            sys.modules[name] = camb
    return camb
