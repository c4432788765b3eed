"""Native TPU Boltzmann engine: thermodynamics (and, progressively, linear
perturbations) computed on device with no external C code.

The reference has no counterpart: it obtains z_star/z_drag/rs_drag and the
full ionization history exclusively from CLASS or CAMB
(cosmoprimo/classy.py get_thermodynamics, camb.py:get_derived_params), and
its analytic engines fall back to the EH98/HS96 fitting formulas
(eisenstein_hu.py), which are ~2% off CLASS truth on rs_drag. This engine's
recombination history (boltzmann/thermodynamics.py) lands within ~0.1% of
CLASS on z_star/z_drag and ~5e-4 on rs_drag for the DESI fiducial —
validated against the CLASS v3.1.1 background table the reference archives
(tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_background.dat) — while
remaining jit/vmap/jacfwd-clean.

Sections: Background (closed-form + ODE tables, as the analytic engines),
Thermodynamics (native), Primordial (standard power-law with runnings).
Transfer/Fourier from the native perturbation module arrive with
boltzmann/perturbations.py; until then this engine serves background +
thermodynamics + primordial, like the reference's astropy engine serves
background only.
"""

import jax.numpy as jnp

from .. import utils
from ..boltzmann import compute_thermodynamics
from ..cosmology import BaseEngine, BaseSection, register_engine, register_section
from .eisenstein_hu import Primordial  # noqa: F401  (standard power-law primordial)
from ..cosmology import DefaultBackground as Background  # noqa: F401


@register_engine
class NativeEngine(BaseEngine):
    """Engine computing thermodynamics natively (traced JAX)."""

    name = 'native'

    def __init__(self, cosmo, **extra_params):
        super().__init__(cosmo, **extra_params)
        self._A_s = self._get_A_s_fid()

    def tree_flatten(self):
        children, aux = super().tree_flatten()
        children = children + (getattr(self, '_A_s', None),)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        new = super().tree_unflatten(aux, children[:-1])
        new._A_s = children[-1]
        return new


@register_section
@utils.addproperty('rs_drag', 'z_drag', 'rs_star', 'z_star', 'tau_reio',
                   'z_reio', 'YHe', 'z_star_noreion')
class Thermodynamics(BaseSection):
    """Native recombination history and derived scalars.

    Surface parity with the class/camb Thermodynamics sections
    (models/classy.py:231, models/camb.py:435): rs_drag/rs_star in Mpc/h,
    z_drag/z_star, z_star_noreion (CAMB's zstar convention), theta_star,
    theta_cosmomc, plus the history itself: x_e(z), T_b(z)."""

    def __init__(self, engine):
        super().__init__(engine)
        self._engine = engine
        ba = engine.get_section('background')
        th = compute_thermodynamics(
            engine['omega_b'], engine['h'], engine['T_cmb'], ba.efunc,
            tau_reio=engine['tau_reio'],
            reionization_width=engine['reionization_width'],
            N_eff=engine['N_eff'])
        self._th = th
        self._rs_drag = ba.rs(th.z_drag)
        self._rs_star = ba.rs(th.z_star)
        self._z_drag = th.z_drag
        self._z_star = th.z_star
        self._z_star_noreion = th.z_star_noreion
        self._tau_reio = th.tau_reio
        self._z_reio = th.z_reio
        self._YHe = th.YHe

    @property
    def _ba(self):
        return self._engine.get_section('background')

    @property
    def table(self):
        """The full :class:`ThermodynamicsResult` (ln a grid tables)."""
        return self._th

    def x_e(self, z):
        """Free-electron fraction (per hydrogen nucleus) at z."""
        lna = -jnp.log1p(jnp.asarray(z, dtype=jnp.float64))
        return jnp.interp(lna, self._th.lna, self._th.x_e)

    def T_b(self, z):
        """Baryon (matter) temperature [K] at z."""
        lna = -jnp.log1p(jnp.asarray(z, dtype=jnp.float64))
        return jnp.interp(lna, self._th.lna, self._th.T_m)

    @property
    def rs_star_noreion(self):
        """Comoving sound horizon at z_star_noreion, in Mpc/h."""
        return self._ba.rs(self._z_star_noreion)

    @property
    def theta_star(self):
        """Sound-horizon angle rs_star / D_M(z_star), in radians."""
        return self.rs_star / self._ba.comoving_transverse_distance(self.z_star)

    @property
    def theta_cosmomc(self):
        """CosmoMC approximation to the sound-horizon angle."""
        from ..cosmology import _compute_rs_cosmomc
        h = self._engine['h']
        rs, zstar = _compute_rs_cosmomc(self._engine['Omega_b'] * h ** 2,
                                        self._engine['Omega_m'] * h ** 2,
                                        self._ba.hubble_function)
        return rs * h / self._ba.comoving_transverse_distance(zstar)
