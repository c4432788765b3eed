"""Host-side Boltzmann engines: CLASS ('class') and CAMB ('camb'), plus
their published variants, as optional table providers.

TPU-first design (SURVEY.md §7 stage 11): the external native code runs ON
HOST once per cosmology; its outputs are imported as tables (background
grids, P(k, z), Cls) and served through this framework's interpolators and
section API as device arrays. Nothing external sits inside a trace — the
Boltzmann path is the host data-provider, emulators are the on-device path.

Parameter translation reproduces the reference wrappers
(cosmoprimo/classy.py:15-71, cosmoprimo/camb.py:52-193, CCL heritage); the
translation functions are pure and unit-tested without the external codes.
pyclass / camb are imported lazily and a clear error is raised when absent.
"""

import numpy as np

import jax.numpy as jnp

from .. import constants, utils
from ..cosmology import (BaseEngine, BaseSection, CosmologyComputationError, CosmologyInputError,
                         DefaultBackground, register_engine, register_section)
from ..interpolator import PowerSpectrumInterpolator1D, PowerSpectrumInterpolator2D
from ..ops import Interpolator1D, flatarray


# ----------------------------------------------------------------------------
# Pure parameter translations (unit-testable without the external codes)
# ----------------------------------------------------------------------------

def translate_class_params(params, extra_params=None, A_s_fid=None, has_fld=False, N_ncdm=0):
    """Translate compiled cosmology parameters to CLASS input keys
    (reference classy.py:15-71)."""
    params = {**(extra_params or {}), **{k: v for k, v in params.items()}}
    lensing = params.pop('lensing')
    params['lensing'] = 'yes' if lensing else 'no'
    params['modes'] = ','.join(params['modes'])
    if 't' not in params['modes']:
        params.pop('r', None)
    params.setdefault('z_max_pk', float(np.max(params.pop('z_pk'))))
    params.setdefault('P_k_max_h/Mpc', params.pop('kmax_pk'))
    params.setdefault('l_max_scalars', params.pop('ellmax_cl'))
    non_linear = params.pop('non_linear', '')
    if non_linear:
        if non_linear in ('mead', 'hmcode'):
            params['non_linear'] = 'hmcode'
            params.setdefault('hmcode_min_k_max', params['P_k_max_h/Mpc'])
        elif non_linear == 'halofit':
            params['non_linear'] = 'halofit'
            params.setdefault('halofit_min_k_max', params['P_k_max_h/Mpc'])
        else:
            raise CosmologyInputError(f'Unknown non-linear code {non_linear}')
    else:
        if A_s_fid is not None:
            params['A_s'] = A_s_fid
        params.pop('sigma8', None)
    params['N_ncdm'] = N_ncdm
    params['T_ncdm'] = params.pop('T_ncdm_over_cmb')
    if not N_ncdm:
        params.pop('m_ncdm', None)
        params.pop('T_ncdm', None)
    params['use_ppf'] = 'yes' if params.get('use_ppf', True) else 'no'
    params.setdefault('fluid_equation_of_state', 'CLP')
    if has_fld:
        params['Omega_Lambda'] = 0.0  # forces non-zero Omega_fld
    else:
        for name in ['w0_fld', 'wa_fld', 'cs2_fld', 'use_ppf', 'fluid_equation_of_state']:
            params.pop(name, None)
    if 't' not in params['modes']:
        params.pop('n_t', None)
        params.pop('alpha_t', None)
    if params.get('beta_s', 0.0):
        raise CosmologyInputError('class does not take beta_s')
    params.pop('beta_s', None)
    params.setdefault('k_per_decade_for_bao', 100)
    params.setdefault('k_per_decade_for_pk', 20)
    out = {}
    for name, value in params.items():
        if name != 'N_ncdm':
            try:
                value = float(value)
            except (TypeError, ValueError):
                pass
        out[name] = value
    return out


def translate_camb_params(params, extra_params=None, A_s_fid=None, has_fld=False, use_ppf=True, N_eff=None):
    """Translate compiled cosmology parameters to camb.set_params keys
    (reference camb.py:52-145, CCL heritage). Returns (set_params kwargs,
    post-settings dict applied to CAMBparams attributes)."""
    base = {k: v for k, v in params.items()}
    base['ombh2'] = base.pop('Omega_b') * base['h'] ** 2
    base['omch2'] = base.pop('Omega_cdm') * base['h'] ** 2
    base['H0'] = 100.0 * base.pop('h')
    for name, rename in {'tau_reio': 'tau', 'z_reio': 'zrei', 'Omega_k': 'omk', 'T_cmb': 'TCMB',
                         'A_L': 'Alens', 'n_s': 'ns', 'alpha_s': 'nrun', 'beta_s': 'nrunrun',
                         'r': 'r', 'n_t': 'nt', 'alpha_t': 'ntrun'}.items():
        if name in base:
            base[rename] = base.pop(name)
    if base.get('YHe', None) == 'BBN':
        base['YHe'] = None
    if N_eff is not None:
        base['nnu'] = N_eff
    base['As'] = base.pop('A_s', A_s_fid)
    base['pivot_tensor'] = base['pivot_scalar'] = base.pop('k_pivot')
    base['parameterization'] = 'tensor_param_rpivot'
    base['standard_neutrino_neff'] = constants.NEFF
    de = {rename: base.pop(name) for name, rename in
          {'w0_fld': 'w', 'wa_fld': 'wa', 'cs2_fld': 'cs2'}.items() if name in base}
    base['Want_CMB_lensing'] = base['DoLensing'] = base.pop('lensing')
    base['lmax'] = base.pop('ellmax_cl')
    base['redshifts'] = np.sort(np.asarray(base.pop('z_pk')))[::-1]
    base['kmax'] = base.pop('kmax_pk') * base['H0'] / 100.0
    for name in ['use_ppf', 'modes', 'T_ncdm_over_cmb', 'N_ur', 'm_ncdm', 'reionization_width', 'sigma8']:
        base.pop(name, None)
    non_linear = base.pop('non_linear', '')
    base = {**(extra_params or {}), **base}
    post = {'de_params': de, 'has_fld': has_fld, 'use_ppf': use_ppf, 'non_linear': non_linear}
    return base, post


def camb_nu_degeneracies(T_ncdm_over_cmb, m_ncdm):
    """CAMB neutrino degeneracy factors matching CLASS's effective
    temperatures: g = (T_ncdm_over_cmb / (4/11)^(1/3))^4 (camb.py:155-172)."""
    g = np.asarray(T_ncdm_over_cmb, dtype=np.float64) ** 4 * (4.0 / 11.0) ** (-4.0 / 3.0)
    m = np.asarray(m_ncdm, dtype=np.float64)
    f = np.full_like(m, 1.0 / 3.0) if m.sum() == 0.0 else m / m.sum()
    return g, f


# ----------------------------------------------------------------------------
# CLASS engine
# ----------------------------------------------------------------------------

@register_engine
class ClassEngine(BaseEngine):
    """Engine wrapping the CLASS Boltzmann code via pyclass (host-side).

    Requires ``pyclass``; raises an informative error when unavailable.
    """

    name = 'class'
    _classy_module = 'pyclass'

    def __init__(self, cosmo, **extra_params):
        super().__init__(cosmo, **extra_params)
        N_ncdm = self['N_ncdm']
        translated = translate_class_params(
            self._params, extra_params=self._extra_params,
            A_s_fid=float(np.asarray(self._get_A_s_fid())),
            has_fld=bool(np.asarray(self._has_fld)), N_ncdm=N_ncdm)
        self._set_classy(translated)

    def _set_classy(self, params):
        try:
            import importlib
            pyclass = importlib.import_module(self._classy_module)
            base = pyclass.base
        except ImportError as exc:
            raise CosmologyInputError(
                f'{self._classy_module} is required for engine {self.name!r}; install it or use an '
                'analytic/emulated engine (on-device path).') from exc

        class _ClassEngine(base.ClassEngine):
            def compute(self, tasks):
                try:
                    return super().compute(tasks)
                except base.ClassInputError as exc:
                    raise CosmologyInputError from exc
                except base.ClassComputationError as exc:
                    raise CosmologyComputationError from exc

        self.classy = _ClassEngine(params=params)

    def _rescale_sigma8(self):
        if self._rsigma8 is not None:
            return self._rsigma8
        self._rsigma8 = 1.0
        if 'sigma8' in self._params:
            self._sections.pop('fourier', None)
            self._rsigma8 = self._params['sigma8'] / self.get_section('fourier').sigma8_m
            self._sections.pop('fourier', None)
        return self._rsigma8


@register_engine
class AxiClassEngine(ClassEngine):
    """axiCLASS (axion / early dark energy CLASS variant)."""

    name = 'axiclass'
    _classy_module = 'pyaxiclass'
    _default_cosmological_parameters = dict(scf_potential=None, scf_parameters=None, scf_evolve_as_fluid=None)


@register_engine
class MochiClassEngine(ClassEngine):
    """mochi_class (modified-gravity CLASS variant)."""

    name = 'mochiclass'
    _classy_module = 'pymochiclass'
    _default_cosmological_parameters = dict(gravity_model=None, expansion_model=None)


@register_engine
class NegNuClassEngine(ClassEngine):
    """CLASS variant allowing negative neutrino masses."""

    name = 'negnuclass'
    _classy_module = 'pynegnuclass'
    _check_ignore = ('m_ncdm',)


@register_engine
class DSClassEngine(ClassEngine):
    """Dark-Scattering CLASS variant (interacting dark energy); forces
    Newtonian gauge and PPF."""

    name = 'dsclass'
    _classy_module = 'pydsclass'
    _default_cosmological_parameters = dict(xi_ds=0.0)


# ----------------------------------------------------------------------------
# CAMB engine
# ----------------------------------------------------------------------------

class _Ready(object):
    def __init__(self):
        self.ba = self.th = self.tr = self.le = self.hr = self.fo = False


def build_task_dependency(tasks):
    """Complete a task list with its dependencies (camb.py:18-44)."""
    if not isinstance(tasks, (tuple, list)):
        tasks = [tasks]
    tasks = set(tasks)
    if 'thermodynamics' in tasks:
        tasks.discard('background')
    if 'harmonic' in tasks:
        tasks.add('fourier')
    if 'fourier' in tasks:
        tasks.add('transfer')
    return list(tasks)


@register_engine
class CambEngine(BaseEngine):
    """Engine wrapping the CAMB Boltzmann code (host-side).

    Requires ``camb``; raises an informative error when unavailable. Results
    are computed through a small task DAG (background -> thermodynamics ->
    transfer -> fourier/harmonic) with ready flags, as the reference does
    (camb.py:193-244).
    """

    name = 'camb'
    _camb_module = 'camb'

    def __init__(self, cosmo, **extra_params):
        super().__init__(cosmo, **extra_params)
        self._set_camb()
        camb = self.camb
        base, post = translate_camb_params(
            self._params, extra_params=self._extra_params,
            A_s_fid=float(np.asarray(self._get_A_s_fid())),
            has_fld=bool(np.asarray(self._has_fld)), use_ppf=self._params.get('use_ppf', True),
            N_eff=float(np.asarray(self['N_eff'])))
        self._camb_params = camb.CAMBparams()
        try:
            if post['has_fld']:
                base.setdefault('dark_energy_model',
                                camb.dark_energy.DarkEnergyPPF if post['use_ppf'] and post['de_params'].get('cs2', 1.0) == 1.0
                                else camb.dark_energy.DarkEnergyFluid)
                base.update(post['de_params'])
            non_linear = post['non_linear']
            if non_linear:
                self._camb_params.NonLinear = camb.model.NonLinear_both
                self._camb_params.NonLinearModel = camb.nonlinear.Halofit()
                halofit_version = {'mead': 'mead', 'hmcode': 'mead', 'halofit': 'original'}.get(non_linear, non_linear)
                if base.get('Want_CMB_lensing'):
                    base.setdefault('lens_potential_accuracy', 1)
            camb.set_params(self._camb_params, **base)
            self._camb_params.Reion.delta_redshift = self['reionization_width']
            if non_linear:
                self._camb_params.NonLinearModel.set_params(halofit_version=halofit_version)
            self._camb_params.share_delta_neff = False
            self._camb_params.omnuh2 = float(np.sum(np.asarray(self['omega_ncdm'])))
            self._camb_params.num_nu_massless = float(np.asarray(self['N_ur']))
            self._camb_params.num_nu_massive = self['N_ncdm']
            self._camb_params.nu_mass_eigenstates = self['N_ncdm']
            g, f = camb_nu_degeneracies(self['T_ncdm_over_cmb'], self['m_ncdm'])
            self._camb_params.nu_mass_numbers = np.ones(self['N_ncdm'], dtype=np.int32)
            self._camb_params.nu_mass_fractions = f
            self._camb_params.nu_mass_degeneracies = g
            self._camb_params.WantScalars = 's' in self['modes']
            self._camb_params.WantVectors = 'v' in self['modes']
            self._camb_params.WantTensors = 't' in self['modes']
        except (camb.baseconfig.CAMBParamRangeError, camb.baseconfig.CAMBValueError,
                camb.baseconfig.CAMBError, camb.baseconfig.CAMBUnknownArgumentError) as exc:
            raise CosmologyInputError from exc
        self.ready = _Ready()

    def _set_camb(self):
        try:
            import importlib
            self.camb = importlib.import_module(self._camb_module)
        except ImportError as exc:
            raise CosmologyInputError(
                f'{self._camb_module} is required for engine {self.name!r}; install it or use an '
                'analytic/emulated engine (on-device path).') from exc

    def compute(self, tasks):
        tasks = build_task_dependency(tasks)
        camb = self.camb
        try:
            if 'background' in tasks and not self.ready.ba:
                self.ba = camb.get_background(self._camb_params, no_thermo=True)
                self.ready.ba = True
            if 'thermodynamics' in tasks and not self.ready.th:
                self.ba = self.th = camb.get_background(self._camb_params, no_thermo=False)
                self.ready.ba = self.ready.th = True
            if 'transfer' in tasks and not self.ready.tr:
                self.tr = camb.get_transfer_functions(self._camb_params)
                self.ready.tr = True
            if 'harmonic' in tasks and not self.ready.hr:
                self.ready.hr = True
                self.ready.fo = False
            if 'lensing' in tasks and not self.ready.le:
                self._camb_params.DoLensing = True
                self._camb_params.Want_CMB_lensing = True
                self.ready.le = True
                self.tr = camb.CAMBdata()
                self.tr.calc_power_spectra(self._camb_params)
                self.le = self.hr = self.fo = self.tr
                self.ready.fo = True
            if 'fourier' in tasks and not self.ready.fo:
                self.tr.calc_power_spectra(self._camb_params)
                self.fo = self.hr = self.le = self.tr
                self.ready.fo = True
        except camb.baseconfig.CAMBError as exc:
            raise CosmologyInputError from exc

    def _rescale_sigma8(self):
        if self._rsigma8 is not None:
            return self._rsigma8
        self._rsigma8 = 1.0
        if 'sigma8' in self._params:
            self._sections.pop('fourier', None)
            self._rsigma8 = self._params['sigma8'] / self.get_section('fourier').sigma8_m
            if self._camb_params.NonLinear != self.camb.model.NonLinear_none:
                self._camb_params.InitPower.As *= self._rsigma8 ** 2
                self.tr.calc_power_spectra(self._camb_params)
                self._sections.pop('fourier', None)
                self._rsigma8 = 1.0
                self._rsigma8 = self._params['sigma8'] / self.get_section('fourier').sigma8_m
            self._sections.pop('fourier', None)
        return self._rsigma8


@register_engine
class ISiTGREngine(CambEngine):
    """ISiTGR modified-gravity CAMB variant (mu/Sigma parameterization);
    MG parameters are passed through ``extra_params``."""

    name = 'isitgr'
    _camb_module = 'isitgr'
    _default_cosmological_parameters = dict(parameterization=None, MG_flag=None)


@register_engine
class MGCambEngine(CambEngine):
    """MGCAMB modified-gravity variant; MG parameters via ``extra_params``."""

    name = 'mgcamb'
    _camb_module = 'mgcamb'
    _default_cosmological_parameters = dict(MG_flag=0)


@register_engine
class ISiTIDEEngine(CambEngine):
    """Interacting-dark-energy CAMB variant."""

    name = 'isitide'
    _camb_module = 'isitide'
    _default_cosmological_parameters = dict(xi_ide=0.0)


@register_engine
class HEFTCambEngine(CambEngine):
    """EFT-of-dark-energy (alpha-basis) CAMB variant; EFT parameters via
    ``extra_params``."""

    name = 'heftcamb'
    _camb_module = 'heftcamb'
    _default_cosmological_parameters = dict(EFT_flag=0)


# ----------------------------------------------------------------------------
# Shared table-serving sections (host tables -> device arrays)
# ----------------------------------------------------------------------------

@register_section
class Background(DefaultBackground):
    """Background from the host Boltzmann code, tabulated once and splined
    (distances/growth from the external code's tables; closed-form
    densities from DefaultBackground where they agree by construction)."""

    def __init__(self, engine):
        super().__init__(engine)
        self._engine_ref = engine
        if isinstance(engine, CambEngine):
            engine.compute('background')

    def _table(self, name):
        if name in self._cache:
            return self._cache[name]
        engine = self._engine_ref
        zgrid = np.concatenate([np.linspace(0.0, 0.3, 20)[:-1], 1.0 / np.geomspace(1e-4, 1.0 / 1.3, 100)[::-1] - 1.0])
        if isinstance(engine, ClassEngine):
            ba = engine.classy.get_background()
            values = {'comoving_radial_distance': np.asarray(ba.comoving_radial_distance(zgrid))}[name]
        else:  # CAMB gives proper Mpc; convert to Mpc/h
            values = {'comoving_radial_distance':
                      np.asarray(engine.ba.comoving_radial_distance(zgrid)) * float(np.asarray(engine['h']))}[name]
        self._cache[name] = Interpolator1D(zgrid, jnp.asarray(values), assume_sorted=True)
        return self._cache[name]

    @flatarray()
    def comoving_radial_distance(self, z):
        try:
            return self._table('comoving_radial_distance')(z)
        except (NotImplementedError, AttributeError):
            # fall back to the on-device integral of the closed-form E(z)
            return DefaultBackground.comoving_radial_distance.__wrapped__(self, z)


@register_section
@utils.addproperty('rs_drag', 'z_drag', 'rs_star', 'z_star')
class Thermodynamics(BaseSection):
    """Thermodynamics scalars imported from the host Boltzmann code."""

    def __init__(self, engine):
        super().__init__(engine)
        h = engine['h']
        if isinstance(engine, CambEngine):
            engine.compute('thermodynamics')
            derived = engine.th.get_derived_params()
            self._rs_drag = derived['rdrag'] * h
            self._z_drag = derived['zdrag']
            self._rs_star = derived['rstar'] * h
            self._z_star = derived['zstar']
        else:
            th = engine.classy.get_thermodynamics()
            self._rs_drag = th.rs_drag * h
            self._z_drag = th.z_drag
            self._rs_star = th.rs_star * h
            self._z_star = th.z_star


@register_section
@utils.addproperty('k_pivot', 'n_s', 'alpha_s', 'beta_s')
class Primordial(BaseSection):
    """Primordial parameters (A_s renormalized by the sigma8 rescale)."""

    def __init__(self, engine):
        super().__init__(engine)
        self._h = engine['h']
        self._n_s = engine['n_s']
        self._alpha_s = engine['alpha_s']
        self._beta_s = engine['beta_s']
        self._k_pivot = engine['k_pivot'] / self._h
        if isinstance(engine, CambEngine):
            self._A_s_raw = engine._camb_params.InitPower.As
        else:
            self._A_s_raw = engine.classy.get_primordial().A_s
        self._rsigma8 = engine._rescale_sigma8()

    @property
    def A_s(self):
        return self._A_s_raw * self._rsigma8 ** 2

    @property
    def ln_1e10_A_s(self):
        return jnp.log(1e10 * self.A_s)

    def pk_k(self, k, mode='scalar'):
        lnkkp = jnp.log(k / self.k_pivot)
        return self._h ** 3 * self.A_s * (k / self.k_pivot) ** (
            self.n_s - 1.0 + 0.5 * self.alpha_s * lnkkp + self.beta_s * lnkkp ** 2 / 6.0)

    def pk_interpolator(self, mode='scalar'):
        return PowerSpectrumInterpolator1D.from_callable(pk_callable=lambda k: self.pk_k(k, mode=mode))


# CAMB transfer variable names for each perturbed quantity (camb.py:745-807)
_CAMB_OF_VARS = {'delta_m': 'delta_tot', 'delta_cb': 'delta_nonu',
                 'theta_cdm': 'v_newtonian_cdm', 'theta_b': 'v_newtonian_baryon',
                 'phi_plus_psi': 'Weyl'}


@register_section
class Fourier(BaseSection):
    """Linear (and non-linear) power spectra imported as (k, z) tables."""

    def __init__(self, engine):
        super().__init__(engine)
        self._engine_ref = engine
        self._h = engine['h']
        if isinstance(engine, CambEngine):
            engine.compute('fourier')
        self._rsigma8 = engine._rescale_sigma8()

    def table(self, non_linear=False, of='delta_m'):
        engine = self._engine_ref
        h = float(np.asarray(self._h))
        if isinstance(of, str):
            of = (of, of)
        if isinstance(engine, CambEngine):
            var1 = _CAMB_OF_VARS.get(of[0], of[0])
            var2 = _CAMB_OF_VARS.get(of[1], of[1])
            k, z, pk = engine.fo.get_linear_matter_power_spectrum(
                var1=var1, var2=var2, hubble_units=True, nonlinear=non_linear)
            return np.asarray(k), np.asarray(z), np.asarray(pk).T
        fo = engine.classy.get_fourier()
        k, z, pk = fo.table(non_linear='' if not non_linear else 'halofit', of=of)
        return np.asarray(k), np.asarray(z), np.asarray(pk)

    def pk_interpolator(self, non_linear=False, of='delta_m', **kwargs):
        k, z, pk = self.table(non_linear=non_linear, of=of)
        return PowerSpectrumInterpolator2D(k, z, pk * float(np.asarray(self._rsigma8)) ** 2, **kwargs)

    def pk_kz(self, k, z, non_linear=False, of='delta_m'):
        return self.pk_interpolator(non_linear=non_linear, of=of)(k, z)

    def sigma_rz(self, r, z, of='delta_m', **kwargs):
        return self.pk_interpolator(of=of, **kwargs).sigma_rz(r, z)

    def sigma8_z(self, z, of='delta_m'):
        return self.sigma_rz(8.0, z, of=of)

    @property
    def sigma8_m(self):
        return self.sigma8_z(0.0, of='delta_m')


@register_section
class Harmonic(BaseSection):
    """CMB Cls imported from the host Boltzmann code (muK^2 normalization
    removed, reference camb.py:657-713)."""

    def __init__(self, engine):
        super().__init__(engine)
        self._engine_ref = engine
        self._rsigma8 = engine._rescale_sigma8()
        self.ellmax_cl = engine['ellmax_cl']
        if isinstance(engine, CambEngine):
            engine.compute(['harmonic', 'lensing'] if engine['lensing'] else 'harmonic')

    def _cl_table(self, kind):
        engine = self._engine_ref
        names = ['tt', 'ee', 'bb', 'te']
        if isinstance(engine, CambEngine):
            powers = engine.hr.get_cmb_power_spectra(engine._camb_params, CMB_unit=None, raw_cl=True)
            key = {'lensed_cl': 'lensed_scalar', 'unlensed_cl': 'unlensed_scalar',
                   'lens_potential_cl': 'lens_potential'}[kind]
            arr = powers[key]
            if kind == 'lens_potential_cl':
                names = ['pp', 'tp', 'ep']
            table = {name: jnp.asarray(arr[:, i]) * self._rsigma8 ** 2 for i, name in enumerate(names)}
        else:
            hr = engine.classy.get_harmonic()
            cl = getattr(hr, kind)()
            table = {name: jnp.asarray(cl[name]) * self._rsigma8 ** 2 for name in cl.dtype.names if name != 'ell'}
        table['ell'] = np.arange(len(next(iter(table.values()))))
        from ..emulators.emulated import cl_table
        return cl_table(table)

    def unlensed_cl(self, ellmax=-1):
        if ellmax < 0:
            ellmax = self.ellmax_cl + 1 + ellmax
        return self._cl_table('unlensed_cl')[slice(0, ellmax + 1)]

    def lensed_cl(self, ellmax=-1):
        if ellmax < 0:
            ellmax = self.ellmax_cl + 1 + ellmax
        return self._cl_table('lensed_cl')[slice(0, ellmax + 1)]

    def lens_potential_cl(self, ellmax=-1):
        if ellmax < 0:
            ellmax = self.ellmax_cl + 1 + ellmax
        return self._cl_table('lens_potential_cl')[slice(0, ellmax + 1)]
