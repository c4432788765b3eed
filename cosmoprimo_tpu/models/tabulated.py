"""Background-only engine backed by a tabulated ASCII file (z, efunc, chi).

Reference parity: cosmoprimo/tabulated.py. Values are linearly interpolated;
queries outside the tabulated range return NaN under trace (error eagerly).
"""

import jax.numpy as jnp
import numpy as np

from ..cosmology import BaseEngine, BaseSection, CosmologyError, register_engine, register_section
from ..ops import exception


@register_engine
class TabulatedEngine(BaseEngine):
    """Engine reading (z, <names>...) columns from an ASCII table."""

    name = 'tabulated'

    def __init__(self, cosmo, **extra_params):
        super().__init__(cosmo, **extra_params)
        self._names = self._extra_params.get('names', ['efunc', 'comoving_radial_distance'])
        arrays = np.loadtxt(self._extra_params['filename'], comments='#',
                            usecols=range(len(self._names) + 1), unpack=True)
        self.z = jnp.asarray(arrays[0])
        self._tables = {name: jnp.asarray(array) for name, array in zip(self._names, arrays[1:])}

    def tree_flatten(self):
        children, aux = super().tree_flatten()
        children = children + (self.z, self._tables)
        aux['names'] = self._names
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        new = super().tree_unflatten(aux, children[:-2])
        new.z, new._tables = children[-2:]
        new._names = aux['names']
        return new


@register_section
class Background(BaseSection):
    """Tabulated background quantities (linear interpolation)."""

    def __init__(self, engine):
        super().__init__(engine)
        self._z = engine.z
        self._tables = dict(engine._tables)

    def _interp(self, name, z):
        z = jnp.asarray(z)
        bad = (z < self._z[0]) | (z > self._z[-1])

        def raise_error(has_bad):
            if has_bad:
                raise CosmologyError('Input z outside of tabulated range.')
        exception(raise_error, bad.any())
        return jnp.where(bad, jnp.nan, jnp.interp(z, self._z, self._tables[name]))


def _make_accessor(name):
    def func(self, z):
        return self._interp(name, z)
    func.__name__ = name
    return func


for _name in ['efunc', 'comoving_radial_distance']:
    setattr(Background, _name, _make_accessor(_name))
