"""cobaya theory adapter: expose this framework as a Boltzmann-like theory
(reference parity: bindings/cobaya/cosmoprimo.py — a BoltzmannBase subclass
serving Hubble/distances/Pk/Cl/sigma requirements from the engine's
sections).

Requires ``cobaya`` (optional). The engine defaults to the on-device
'eisenstein_hu' path; set ``engine: 'emulated'`` (with ``path``) to serve
trained emulators, or 'class'/'camb' for the host Boltzmann wrappers.
"""

import numpy as np

try:
    from cobaya.theories.cosmo import BoltzmannBase
    from cobaya.log import LoggedError
    HAS_COBAYA = True
except ImportError:
    HAS_COBAYA = False

    class BoltzmannBase(object):
        """Placeholder when cobaya is unavailable."""

    class LoggedError(RuntimeError):
        """Placeholder when cobaya is unavailable."""

        def __init__(self, log, msg, *args):
            super().__init__(msg % args if args else msg)


def _get_from_cosmo(cosmo, name):
    """Translate a cobaya parameter name to a cosmology value."""
    aliases = {'omegam': 'Omega_m', 'omegab': 'Omega_b', 'omegac': 'Omega_cdm', 'omk': 'Omega_k',
               'sigma8': 'sigma8', 'ns': 'n_s', 'As': 'A_s', 'tau': 'tau_reio',
               'rdrag': 'rs_drag', 'zdrag': 'z_drag', 'thetastar': 'theta_cosmomc',
               'H0': 'H0', 'mnu': 'm_ncdm_tot', 'nnu': 'N_eff'}
    name = aliases.get(name, name)
    if name in ('rs_drag', 'z_drag'):
        return float(np.asarray(getattr(cosmo.get_thermodynamics(), name)))
    return float(np.asarray(cosmo[name]))


class CosmoprimoTPU(BoltzmannBase):
    """cobaya theory wrapping cosmoprimo_tpu."""

    engine = 'eisenstein_hu'
    extra_params = {}
    fiducial = ''

    def initialize(self):
        if not HAS_COBAYA:
            raise ImportError('cobaya is required for this binding')
        super().initialize()
        from cosmoprimo_tpu import Cosmology, fiducial as fiducial_module
        if self.fiducial:
            self._base_cosmo = getattr(fiducial_module, self.fiducial)(engine=self.engine,
                                                                       extra_params=self.extra_params or None)
        else:
            self._base_cosmo = Cosmology(engine=self.engine, extra_params=self.extra_params or None)
        self._cosmo = None

    def calculate(self, state, want_derived=True, **params_values_dict):
        from cosmoprimo_tpu import CosmologyError
        try:
            self._cosmo = self._base_cosmo.clone(**params_values_dict)
        except CosmologyError as exc:
            raise LoggedError(self.log, 'cosmology error: %s', exc)
        state['cosmo'] = self._cosmo
        if want_derived:
            state['derived'] = {p: _get_from_cosmo(self._cosmo, p) for p in self.output_params}
        return True

    # ---- requirement getters (cobaya BoltzmannBase interface)
    def get_Hubble(self, z, units='km/s/Mpc'):
        ba = self.current_state['cosmo'].get_background()
        H = np.asarray(ba.hubble_function(np.asarray(z)))
        if units == '1/Mpc':
            from cosmoprimo_tpu import constants
            H = H / (constants.c / 1e3)
        return H

    def get_angular_diameter_distance(self, z):
        ba = self.current_state['cosmo'].get_background()
        h = float(np.asarray(self.current_state['cosmo']['h']))
        return np.asarray(ba.angular_diameter_distance(np.asarray(z))) / h  # Mpc

    def get_comoving_radial_distance(self, z):
        ba = self.current_state['cosmo'].get_background()
        h = float(np.asarray(self.current_state['cosmo']['h']))
        return np.asarray(ba.comoving_radial_distance(np.asarray(z))) / h  # Mpc

    def get_Pk_grid(self, var_pair=('delta_tot', 'delta_tot'), nonlinear=False, extrap_kmax=None):
        cosmo = self.current_state['cosmo']
        fo = cosmo.get_fourier()
        of = {'delta_tot': 'delta_m', 'delta_nonu': 'delta_cb'}
        pk = fo.pk_interpolator(of=(of.get(var_pair[0], var_pair[0]), of.get(var_pair[1], var_pair[1])))
        h = float(np.asarray(cosmo['h']))
        k = np.asarray(pk.k) * h  # 1/Mpc
        z = np.asarray(pk.z)
        pkz = np.asarray(pk(pk.k, z)) / h ** 3  # Mpc^3
        return k, z, pkz.T

    def get_sigma8_z(self, z):
        fo = self.current_state['cosmo'].get_fourier()
        return np.asarray(fo.pk_interpolator().sigma8_z(np.asarray(z)))

    def get_fsigma8(self, z):
        cosmo = self.current_state['cosmo']
        ba = cosmo.get_background()
        pk = cosmo.get_fourier().pk_interpolator()
        z = np.asarray(z)
        return np.asarray(ba.growth_rate(z)) * np.asarray(pk.sigma8_z(z))

    def get_Cl(self, ell_factor=False, units='FIRASmuK2'):
        cosmo = self.current_state['cosmo']
        hr = cosmo.get_harmonic()
        cls = hr.lensed_cl()
        ell = np.asarray(cls['ell'])
        out = {'ell': ell}
        factor = 1.0
        if units == 'FIRASmuK2':
            from cosmoprimo_tpu import constants
            factor = (constants.TCMB * 1e6) ** 2
        ellf = ell * (ell + 1) / (2 * np.pi) if ell_factor else 1.0
        for name in ['tt', 'ee', 'bb', 'te']:
            if name in cls:
                out[name] = np.asarray(cls[name]) * factor * ellf
        return out

    def get_rs_drag(self):
        th = self.current_state['cosmo'].get_thermodynamics()
        h = float(np.asarray(self.current_state['cosmo']['h']))
        return float(np.asarray(th.rs_drag)) / h  # Mpc
