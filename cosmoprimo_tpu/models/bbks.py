r"""BBKS (Bardeen, Bond, Kaiser, Szalay 1986) transfer function with the
Sugiyama (1995) shape parameter.

References: 1986ApJ...304...15B; astro-ph/9412025; arXiv:1812.05995 eqs.
15-16. Reference parity: cosmoprimo/bbks.py (note: we use the canonical
additive BBKS polynomial; the reference's `3.89 q * (16.2 q)^2` term is a
typo of `3.89 q + (16.2 q)^2`).
"""

import jax.numpy as jnp

from ..cosmology import BaseEngine, BaseSection, register_engine, register_section
from .eisenstein_hu_nowiggle import Background, Primordial, Fourier  # noqa: F401


@register_engine
class BBKSEngine(BaseEngine):
    """BBKS transfer-function engine."""

    name = 'bbks'

    def __init__(self, cosmo, **extra_params):
        super().__init__(cosmo, **extra_params)
        self.compute()
        self._A_s = self._get_A_s_fid()

    def compute(self):
        # Sugiyama 1995 shape parameter (1812.05995 eq. 16)
        self.gamma = self['omega_m'] * jnp.exp(-self['Omega_b'] * (1.0 + jnp.sqrt(2.0 * self['h']) / self['Omega_m']))

    def tree_flatten(self):
        children, aux = super().tree_flatten()
        children = children + (self.gamma, getattr(self, '_A_s', None))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        new = super().tree_unflatten(aux, children[:-2])
        new.gamma = children[-2]
        new._A_s = children[-1]
        return new


@register_section
class Transfer(BaseSection):
    """BBKS86 transfer function."""

    def __init__(self, engine):
        super().__init__(engine)
        self._h = engine['h']
        self._gamma = engine.gamma

    def transfer_k(self, k):
        """Matter transfer function at k in h/Mpc (1812.05995 eq. 15)."""
        q = jnp.asarray(k) * self._h / self._gamma
        x = 2.34 * q
        return jnp.log(1 + x) / x * (1.0 + 3.89 * q + (16.2 * q) ** 2 + (5.47 * q) ** 3 + (6.71 * q) ** 4) ** (-0.25)
