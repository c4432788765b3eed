"""Background-only engine backed by astropy.cosmology (host-side, optional).

Reference parity: cosmoprimo/astropy.py — picks the Flat/open (w0wa/w/
Lambda)CDM astropy class matching the parameters.
"""

import numpy as np

import jax.numpy as jnp

from ..cosmology import BaseEngine, BaseSection, CosmologyInputError, register_engine, register_section
from ..ops import flatarray


@register_engine
class AstropyEngine(BaseEngine):
    """Engine wrapping astropy.cosmology (background only)."""

    name = 'astropy'

    def __init__(self, cosmo, **extra_params):
        super().__init__(cosmo, **extra_params)
        try:
            from astropy import cosmology, units
        except ImportError as exc:
            raise CosmologyInputError(
                "astropy is required for engine 'astropy'; install it or use the "
                "'tabulated' / analytic engines.") from exc

        flat = float(np.asarray(self['Omega_k'])) == 0.0
        has_fld = bool(np.asarray(self._has_fld))
        w0 = float(np.asarray(self['w0_fld']))
        wa = float(np.asarray(self['wa_fld']))
        kwargs = dict(H0=float(np.asarray(self['H0'])), Om0=float(np.asarray(self['Omega_cdm'] + self['Omega_b'])),
                      Tcmb0=float(np.asarray(self['T_cmb'])), Neff=float(np.asarray(self['N_eff'])),
                      m_nu=np.atleast_1d(np.asarray(self['m_ncdm'])) * units.eV if self['N_ncdm'] else None,
                      Ob0=float(np.asarray(self['Omega_b'])))
        if has_fld:
            if wa != 0.0:
                cls = cosmology.Flatw0waCDM if flat else cosmology.w0waCDM
                kwargs.update(w0=w0, wa=wa)
            else:
                cls = cosmology.FlatwCDM if flat else cosmology.wCDM
                kwargs.update(w0=w0)
        else:
            cls = cosmology.FlatLambdaCDM if flat else cosmology.LambdaCDM
        if not flat:
            kwargs['Ode0'] = float(np.asarray(self['Omega_de']))
        self.astropy = cls(**{k: v for k, v in kwargs.items() if v is not None})


@register_section
class Background(BaseSection):
    """Background quantities from astropy (in Mpc/h units)."""

    def __init__(self, engine):
        super().__init__(engine)
        self._astropy = engine.astropy
        self._h = engine['h']

    @flatarray()
    def efunc(self, z):
        return jnp.asarray(self._astropy.efunc(np.asarray(z)))

    @flatarray()
    def hubble_function(self, z):
        return jnp.asarray(self._astropy.H(np.asarray(z)).value)

    @flatarray()
    def comoving_radial_distance(self, z):
        return jnp.asarray(self._astropy.comoving_distance(np.asarray(z)).value) * self._h

    @flatarray()
    def angular_diameter_distance(self, z):
        return jnp.asarray(self._astropy.angular_diameter_distance(np.asarray(z)).value) * self._h

    @flatarray()
    def luminosity_distance(self, z):
        return jnp.asarray(self._astropy.luminosity_distance(np.asarray(z)).value) * self._h

    @flatarray()
    def comoving_transverse_distance(self, z):
        return jnp.asarray(self._astropy.comoving_transverse_distance(np.asarray(z)).value) * self._h

    @flatarray()
    def Omega_m(self, z):
        return jnp.asarray(self._astropy.Om(np.asarray(z)))

    @flatarray()
    def Omega_de(self, z):
        return jnp.asarray(self._astropy.Ode(np.asarray(z)))

    @property
    def age(self):
        return jnp.asarray(self._astropy.age(0.0).value)
