r"""Eisenstein & Hu (1999) no-wiggle transfer function with massive
neutrinos: scale-dependent growth with free-streaming suppression.

Physics: arXiv:astro-ph/9710252 eqs. 1-23 (z_eq, p_c/p_cb, alpha_nu,
gamma_eff, y_freestream, delta_cb vs delta_m growth). Reference parity:
cosmoprimo/eisenstein_hu_nowiggle_variants.py.
"""

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..cosmology import BaseEngine, BaseSection, CosmologyError, register_engine, register_section
from ..interpolator import PowerSpectrumInterpolator2D
from .eisenstein_hu import Background, Primordial, Thermodynamics  # noqa: F401
from .eisenstein_hu import Fourier as _EHFourier


@register_engine
class EisensteinHuNoWiggleVariantsEngine(BaseEngine):
    """EH99 no-wiggle engine with massive-neutrino suppression."""

    name = 'eisenstein_hu_nowiggle_variants'

    def __init__(self, cosmo, **extra_params):
        super().__init__(cosmo, **extra_params)
        self.compute()
        self._A_s = self._get_A_s_fid()

    def compute(self):
        c = {}
        c['omega_b'] = self['omega_b']
        c['omega_m'] = self['omega_cdm'] + self['omega_b'] + self['omega_ncdm_tot'] - self['omega_pncdm_tot']
        c['frac_b'] = c['omega_b'] / c['omega_m']
        c['frac_cdm'] = self['omega_cdm'] / c['omega_m']
        c['frac_cb'] = c['frac_cdm'] + c['frac_b']
        c['frac_ncdm'] = 1.0 - c['frac_cb']
        c['N_ncdm'] = self['N_ncdm']
        c['theta_cmb'] = self['T_cmb'] / 2.7

        om, ob, th = c['omega_m'], c['omega_b'], c['theta_cmb']
        # EH99 eq. 1
        c['z_eq'] = 2.5e4 * om * th ** (-4) - 1.0
        c['k_eq'] = 0.0746 * om * th ** (-2)
        # EH99 eq. 2 (original EH98 z_drag normalization here)
        b1 = 0.313 * om ** (-0.419) * (1 + 0.607 * om ** 0.674)
        b2 = 0.238 * om ** 0.223
        c['z_drag'] = 1291 * om ** 0.251 / (1.0 + 0.659 * om ** 0.828) * (1.0 + b1 * ob ** b2)
        # EH98 eq. 26 approximate sound horizon
        c['rs_drag'] = 44.5 * jnp.log(9.83 / om) / jnp.sqrt(1.0 + 10.0 * ob ** 0.75)

        frac_bncdm = c['frac_b'] + c['frac_ncdm']
        # EH99 eq. 11: growth exponents
        c['p_c'] = (5.0 - jnp.sqrt(1 + 24 * c['frac_cdm'])) / 4.0
        c['p_cb'] = (5.0 - jnp.sqrt(1 + 24.0 * c['frac_cb'])) / 4.0
        y_drag = (1 + c['z_eq']) / (1 + c['z_drag'])
        # EH99 eq. 15: small-scale suppression
        alpha_ncdm = (c['frac_cdm'] / c['frac_cb'] * (5.0 - 2.0 * (c['p_c'] + c['p_cb'])) / (5.0 - 4.0 * c['p_cb'])
                      * (1 + y_drag) ** (c['p_cb'] - c['p_c'])
                      * (1 + frac_bncdm * (-0.553 + 0.126 * frac_bncdm ** 2))
                      / (1 - 0.193 * jnp.sqrt(c['frac_ncdm'] * c['N_ncdm']) + 0.169 * c['frac_ncdm'] * c['N_ncdm'] ** 0.2)
                      * (1 + (c['p_c'] - c['p_cb']) / 2 * (1 + 1 / (3.0 - 4.0 * c['p_c']) / (7.0 - 4.0 * c['p_cb'])) / (1 + y_drag)))
        c['gamma_ncdm'] = jnp.sqrt(alpha_ncdm)
        c['beta_c'] = 1 / (1 - 0.949 * frac_bncdm)
        self._coefficients = c

    def __getattr__(self, name):
        coeffs = self.__dict__.get('_coefficients', {})
        if name in coeffs:
            return coeffs[name]
        raise AttributeError(name)

    def tree_flatten(self):
        children, aux = super().tree_flatten()
        children = children + (self._coefficients, getattr(self, '_A_s', None))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        new = super().tree_unflatten(aux, children[:-2])
        new._coefficients = children[-2]
        new._A_s = children[-1]
        return new


@register_section
class Transfer(BaseSection):
    """EH99 transfer function with scale-dependent ncdm growth."""

    def __init__(self, engine):
        super().__init__(engine)
        self._h = engine['h']
        for name in ['omega_m', 'theta_cmb', 'N_ncdm', 'frac_ncdm', 'z_eq', 'p_cb', 'frac_cb',
                     'gamma_ncdm', 'rs_drag', 'beta_c']:
            setattr(self, '_' + name, getattr(engine, name))
        self.ba = engine.get_background()

    def transfer_kz(self, k, z=0.0, of='delta_m', grid=True):
        """Transfer function on a (k, z) grid (or paired points)."""
        z = jnp.asarray(z)
        k = jnp.asarray(k) * self._h  # 1/Mpc
        if grid:
            toret_shape = k.shape + z.shape
            k = k.reshape(k.shape + (1,) * z.ndim)
        q = k / self._omega_m * self._theta_cmb ** 2

        # scale-dependent growth (EH99 eqs. 12-14)
        if self._N_ncdm:
            growth_k0 = self.ba.growth_factor(z, znorm=self._z_eq)
            y_fs = 17.2 * self._frac_ncdm * (1 + 0.488 * self._frac_ncdm ** (-7.0 / 6.0)) * (self._N_ncdm * q / self._frac_ncdm) ** 2
            tmp1 = growth_k0 ** (1.0 - self._p_cb)
            tmp2 = (growth_k0 / (1 + y_fs)) ** 0.7
            if of == 'delta_cb':
                growth = (1.0 + tmp2) ** (self._p_cb / 0.7) * tmp1
            elif of == 'delta_m':
                growth = (self._frac_cb ** (0.7 / self._p_cb) + tmp2) ** (self._p_cb / 0.7) * tmp1
            else:
                raise CosmologyError(f'No {of} transfer (choices: ["delta_cb", "delta_m"])')
        else:
            growth = growth_k0 = jnp.ones_like(z)

        # master function (EH99 eqs. 16-18)
        gamma_eff = self._omega_m * (self._gamma_ncdm + (1 - self._gamma_ncdm) / (1 + (k * self._rs_drag * 0.43) ** 4))
        q_eff = q * self._omega_m / gamma_eff
        T_L = jnp.log(np.e + 1.84 * self._beta_c * self._gamma_ncdm * q_eff)
        T_C = 14.4 + 325.0 / (1 + 60.5 * q_eff ** 1.08)
        T_sup = T_L / (T_L + T_C * q_eff ** 2)

        # free-streaming correction (EH99 eqs. 22-23)
        if self._N_ncdm:
            q_ncdm = 3.92 * q * jnp.sqrt(self._N_ncdm / self._frac_ncdm)
            T_sup = T_sup * (1 + 1.24 * self._frac_ncdm ** 0.64 * self._N_ncdm ** (0.3 + 0.6 * self._frac_ncdm)
                             / (q_ncdm ** (-1.6) + q_ncdm ** 0.8))

        toret = T_sup * growth / growth_k0
        if grid:
            toret = toret.reshape(toret_shape)
        return toret


@register_section
class Fourier(_EHFourier):
    """Power spectra with the growth folded into the 2D transfer."""

    def pk_interpolator(self, of='delta_m', non_linear=False, **kwargs):
        """P(k, z) for 'delta_m'/'delta_cb' (+ 'theta_*' velocity rescaling);
        ``non_linear='halofit'`` applies the native Takahashi 2012 transform
        with the Bird 2012 massive-neutrino corrections (models/halofit.py)."""
        if non_linear:
            from ..cosmology import CosmologyInputError
            if non_linear is True:
                non_linear = self._non_linear or 'halofit'
            if non_linear in ('halofit', 'takahashi'):
                from .halofit import halofit_pk_interpolator
                lin = self.pk_interpolator(of=of, **kwargs)
                return halofit_pk_interpolator(lin, self.ba, w0=self._w0, wa=self._wa, fnu=self._fnu)
            if non_linear in ('mead', 'hmcode', 'mead2020', 'hmcode2020', 'mead2020_feedback'):
                # this engine DOES distinguish the cb field (scale-dependent
                # free-streaming growth): HMcode gets sigma(R) from cb and
                # the two-halo term from total matter, as the paper specifies
                from .hmcode import hmcode_pk_interpolator
                lin_m = self.pk_interpolator(of='delta_m', **kwargs)
                lin_cb = self.pk_interpolator(of='delta_cb', **kwargs)
                hm_params = dict(self._hm_params)
                if non_linear == 'mead2020_feedback':
                    hm_params['logT_AGN'] = getattr(self, '_logT_AGN', 7.8)
                return hmcode_pk_interpolator(lin_m, self.ba, hm_params, pk2d_cb=lin_cb)
            raise CosmologyInputError(f'non_linear={non_linear!r} is not supported; '
                                      "use 'halofit' (Takahashi 2012), 'mead' (HMcode-2020) "
                                      "or 'mead2020_feedback' (HMcode-2020 + T_AGN baryons)")
        if not isinstance(of, (tuple, list)):
            of = (of, of)
        ntheta = sum(o.startswith('theta_') for o in of)
        of = tuple(o.replace('theta_', 'delta_') for o in of)

        if ntheta:
            def growth_factor_sq(ba, z):
                return ba.growth_factor(z, znorm=0.0) ** 2 * ba.growth_rate(z) ** ntheta
        else:
            def growth_factor_sq(ba, z):
                return ba.growth_factor(z, znorm=0.0) ** 2

        def pk_callable(ba, pm, tr, k, z=0, grid=True):
            tk = tr.transfer_kz(k, z=z, grid=grid, of=of[0])
            if of[1] == of[0]:
                tk = tk ** 2
            else:
                tk = tk * tr.transfer_kz(k, z=z, grid=grid, of=of[1])
            potential_to_density = (3.0 * ba.Omega0_m * 100 ** 2 / (2.0 * (constants.c / 1e3) ** 2 * k ** 2)) ** (-2)
            curvature_to_potential = 9.0 / 25.0 * 2.0 * jnp.pi ** 2 / k ** 3 / ba.h ** 3
            pdd = potential_to_density * curvature_to_potential * pm.pk_k(k)
            return tk * growth_factor_sq(ba, z) * pdd.reshape(pdd.shape + (1,) * (tk.ndim - pdd.ndim))

        from jax.tree_util import Partial
        return PowerSpectrumInterpolator2D.from_callable(
            pk_callable=Partial(pk_callable, self.ba, self.pm, self.tr), growth_factor_sq=None, **kwargs)
