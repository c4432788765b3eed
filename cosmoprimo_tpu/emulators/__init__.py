"""Emulator toolkit: train MLP/Taylor/Point emulators of cosmology outputs
and serve them back as an engine ('emulated' / 'capse' /
'cosmopower_bolliet2023').

Reference parity: cosmoprimo/emulators (tools/base.py, samples.py, mlp.py,
taylor.py, emulated.py, __init__.py).
"""

import numpy as np

import jax.numpy as jnp

from math import comb

from ..cosmology import Cosmology
from ..interpolator import PowerSpectrumInterpolator1D
from ..ops import Interpolator1D
from ..utils import setup_logging
from .base import (BaseEmulatorEngine, Emulator as _ToolsEmulator, EmulatedCalculator, PointEmulatorEngine,
                   find_names, get_engine, make_list)
from .operations import (ArcsinhOperation, ChebyshevOperation, Log10Operation, NormOperation, Operation,
                         PCAOperation, ScaleOperation, get_operation, register_operation)
from .samples import (BaseSampler as _ToolsBaseSampler, CalculatorComputationError, DiffSampler as _ToolsDiffSampler,
                      GridSampler as _ToolsGridSampler, InputSampler as _ToolsInputSampler,
                      QMCSampler as _ToolsQMCSampler, Samples)
from .mlp import MLP, MLPEmulatorEngine
from .taylor import TaylorEmulatorEngine
from .emulated import EmulatedEngine, CAPSEEngine, CosmopowerBolliet2023Engine


def get_calculator(cosmo, section=None):
    """Turn a Cosmology into a calculator ``f(**params) -> flat dict`` of
    section states ('background.comoving_radial_distance', 'fourier.pk.
    delta_cb.delta_cb', ...), for sampling/training (reference
    emulators/__init__.py:11-60)."""
    from ..cosmology import Cosmology, CosmologyError
    from . import emulated

    if not isinstance(cosmo, Cosmology):
        return cosmo

    section_names = make_list(section if section is not None else list(cosmo.engine._Section_classes))
    order = ['harmonic', 'fourier', 'transfer', 'perturbations', 'primordial', 'thermodynamics', 'background']
    section_names = [s for s in order if s in section_names] + [s for s in section_names if s not in order]

    def calculator(**params):
        toret = {}
        try:
            clone = cosmo.clone(**params)
            for section_name in section_names:
                section = getattr(clone, f'get_{section_name}')()
                Section = getattr(emulated, section_name.capitalize(), None)
                state = {}
                if Section is not None and hasattr(Section, '__getstate__'):
                    state = Section.__getstate__(section)
                for name, value in state.items():
                    toret[f'{section_name}.{name}'] = value
        except CosmologyError as exc:
            raise CalculatorComputationError from exc
        return toret

    return calculator


class Emulator(_ToolsEmulator):
    """Emulator accepting a Cosmology directly as calculator."""

    def _classify_calculator(self, calculator, params=None):
        return super()._classify_calculator(get_calculator(calculator), params=params)


class BaseSampler(_ToolsBaseSampler):
    def __init__(self, calculator, *args, **kwargs):
        super().__init__(get_calculator(calculator), *args, **kwargs)


class InputSampler(BaseSampler, _ToolsInputSampler):
    pass


class GridSampler(BaseSampler, _ToolsGridSampler):
    pass


class DiffSampler(BaseSampler, _ToolsDiffSampler):
    pass


class QMCSampler(BaseSampler, _ToolsQMCSampler):
    pass


def batch_vmap(func, *vargs, batch_size=None, **vkwargs):
    """vmap ``func`` over the leading axis in chunks of ``batch_size``:
    bounds peak memory when mapping big emulator batches (reference
    emulators/tools/base.py:34-56, generalized from dict-of-arrays to any
    pytree of arrays)."""
    import jax
    vfunc = jax.vmap(func, *vargs, **vkwargs)

    def wrapper(*args):
        leaves = jax.tree_util.tree_leaves(args)
        size = len(leaves[0]) if leaves else 0
        nbatch = 1 if batch_size is None else (size + batch_size - 1) // max(1, batch_size)
        chunks = []
        for ibatch in range(nbatch):
            sl = slice(ibatch * size // nbatch, (ibatch + 1) * size // nbatch)
            chunks.append(vfunc(*jax.tree_util.tree_map(lambda leaf: leaf[sl], args)))
        if nbatch == 1:
            return chunks[0]
        return jax.tree_util.tree_map(lambda *parts: jnp.concatenate(parts, axis=0), *chunks)

    return wrapper


def mask_subsample(size, factor=1., seed=42):
    """Boolean mask selecting a random subsample: a fraction if
    ``factor <= 1``, else ``factor`` samples (reference
    emulators/__init__.py:99-104)."""
    rng = np.random.RandomState(seed=seed)
    mask = np.zeros(size, dtype='?')
    if factor <= 1.:
        factor = int(factor * size)
    mask[rng.choice(size, int(factor), replace=False)] = True
    return mask


def smoothstep(x, xmin=0, xmax=1, order=1):
    x = np.clip((x - xmin) / (xmax - xmin), 0, 1)
    result = 0
    for n in range(0, order + 1):
        result += comb(order + n, n) * comb(2 * order + 1, order - n) * (-x) ** n
    return result * x ** (order + 1)


@register_operation
class HarmonicNormOperation(Operation):
    """theta*-rescaled ell-warping of Cls divided by A_s: factorizes the
    acoustic-scale dependence out of the emulated spectra (reference
    emulators/__init__.py:124-171)."""

    name = 'harmonic_norm'

    def __init__(self, ref_theta_cosmomc=0.010409108133982346):  # DESI fiducial
        self.ref_theta_cosmomc = ref_theta_cosmomc
        super().__init__('v')

    def initialize(self, v, **kwargs):
        names = find_names(list(v.keys()), ['harmonic.*_cl.*'])
        self.ells, self.wells, self.windows, self.norm_cl_names = {}, {}, {}, {}
        wsize = 60
        for keyname in names:
            _, name, key = keyname.split('.')
            self.norm_cl_names.setdefault(name, []).append(keyname)
            size = np.shape(v[keyname])[-1]
            self.ells[name] = np.arange(size)
            smooth = smoothstep(np.linspace(0.0, 1.0, wsize), xmin=0.2, xmax=0.8, order=3)
            self.windows[name] = np.concatenate([smooth, np.ones(size - 3 * wsize), smooth[::-1], np.zeros(wsize)])
            self.wells[name] = np.linspace(0.0, size, size)

    def _cosmo(self, X):
        from ..cosmology import Cosmology
        return Cosmology(**{k: v for k, v in X.items() if not k.startswith(('Y.', 'X.'))}, engine='bbks')

    def __call__(self, v, X=None, cosmo=None):
        from ..ops import Interpolator1D
        if cosmo is None:
            cosmo = self._cosmo(X)
        s = cosmo['theta_cosmomc'] / self.ref_theta_cosmomc
        A_s = 1e9 * cosmo['A_s']
        v = dict(v)
        for namespace, cl_names in self.norm_cl_names.items():
            ell = self.ells[namespace]
            elli = self.wells[namespace] / (1.0 + self.windows[namespace] * s)
            for cl_name in cl_names:
                v[cl_name] = Interpolator1D(ell, v[cl_name] / A_s, extrap=True, assume_sorted=True)(elli)
        return v

    def inverse(self, v, X=None, cosmo=None):
        from ..ops import Interpolator1D
        if cosmo is None:
            cosmo = self._cosmo(X)
        s = cosmo['theta_cosmomc'] / self.ref_theta_cosmomc
        A_s = 1e9 * cosmo['A_s']
        v = dict(v)
        for namespace, cl_names in self.norm_cl_names.items():
            ell = self.wells[namespace] / (1.0 + self.windows[namespace] * s)
            elli = self.ells[namespace]
            for cl_name in cl_names:
                v[cl_name] = Interpolator1D(ell, v[cl_name] * A_s, extrap=True)(elli)
        return v

    def __getstate__(self):
        return {name: getattr(self, name) for name in
                ['name', 'ells', 'wells', 'windows', 'norm_cl_names', 'ref_theta_cosmomc'] if hasattr(self, name)}

    def __setstate__(self, state):
        self.__dict__.update(state)


@register_operation
class FourierNormOperation(Operation):
    """Divide all power spectra by the reference delta_cb spectrum and
    factorize its z-dependence (reference emulators/__init__.py:174-223)."""

    name = 'fourier_norm'

    def __init__(self, ref_pk_name='fourier.pk.delta_cb.delta_cb'):
        self.ref_pk_name = ref_pk_name
        super().__init__('v')

    def initialize(self, v, **kwargs):
        self.norm_pk_names = [name for name in find_names(list(v.keys()), ['fourier.pk.*.*', 'fourier.pk_non_linear.*.*'])
                              if name != self.ref_pk_name]

    def _prim(self, k, z, X):
        # fully traced (the BBKS engine is jnp end to end), so this operation
        # vmaps over the sample axis without host round-trips
        from ..cosmology import Cosmology
        cosmo = Cosmology(**{key: val for key, val in X.items()})
        h = cosmo['h']
        prim = cosmo.get_fourier(engine='bbks').pk_interpolator(
            extrap_kmin=k[0] / 10.0, extrap_kmax=k[-1] * 10.0)(k / h, z[0]) / h ** 3
        return h, prim

    def __call__(self, v, X=None, cosmo=None):
        v = dict(v)
        k, z = v['fourier.k'], v['fourier.z']
        h, prim = self._prim(k, z, X)
        for pk_name in [self.ref_pk_name] + self.norm_pk_names:
            # (Mpc/h) -> Mpc units: log-log spline in k with trailing z axes
            v[pk_name] = Interpolator1D(k, v[pk_name], interp_x='log', interp_fun='log',
                                        extrap=True)(k / h) / h ** 3
        pk_dd = v[self.ref_pk_name]
        for pk_name in self.norm_pk_names:
            v[pk_name] = v[pk_name] / pk_dd[..., :v[pk_name].shape[-1]]
        v['fourier.pkz'] = v[self.ref_pk_name] / v[self.ref_pk_name][..., [0]]
        v[self.ref_pk_name] = v[self.ref_pk_name][..., 0] / prim
        return v

    def inverse(self, v, X=None, cosmo=None):
        v = dict(v)
        k, z = v['fourier.k'], v['fourier.z']
        h, prim = self._prim(k, z, X)
        ref = v[self.ref_pk_name] * prim
        pk_dd = v[self.ref_pk_name] = ref[..., None] * v['fourier.pkz']
        for pk_name in self.norm_pk_names:
            v[pk_name] = v[pk_name] * pk_dd[..., :v[pk_name].shape[-1]]
        for pk_name in [self.ref_pk_name] + self.norm_pk_names:
            v[pk_name] = Interpolator1D(k / h, v[pk_name] * h ** 3, interp_x='log', interp_fun='log',
                                        extrap=True)(k)
        return v

    def __getstate__(self):
        return {name: getattr(self, name) for name in ['name', 'ref_pk_name', 'norm_pk_names'] if hasattr(self, name)}

    def __setstate__(self, state):
        self.__dict__.update(state)
