"""Emulator orchestration: classify calculator outputs, fit per-quantity
engines, predict with x/y operation chains, HDF5/npy round trip.

Reference parity: emulators/tools/base.py (Emulator at 90-545, engine
registry at 546-583, BaseEmulatorEngine at 586-683, PointEmulatorEngine at
685-709). Process fan-out goes through parallel.distributed instead of MPI.
"""

import copy
import fnmatch
import inspect
import os
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from .. import utils
from ..parallel.distributed import get_comm
from .operations import Operation, get_operation
from .samples import Samples


def make_list(li):
    if li is None:
        return []
    if not isinstance(li, (tuple, list)):
        li = [li]
    return list(li)


def find_names(allnames, patterns):
    """Expand wildcard patterns against available names (order-preserving)."""
    patterns = make_list(patterns)
    toret = []
    for pattern in patterns:
        for name in allnames:
            if fnmatch.fnmatch(name, pattern) and name not in toret:
                toret.append(name)
    return toret


def expand_dict(di, names):
    """Map each name to the value of the LAST matching (wildcard) key, so
    later, more specific patterns override earlier globs (the reference's
    tools/utils.py:230 semantics)."""
    toret = {name: None for name in names}
    for pattern, value in di.items():
        for name in find_names(names, pattern):
            toret[name] = value
    return toret


_ENGINE_REGISTRY = {}


def register_emulator_engine(cls):
    _ENGINE_REGISTRY[cls.name] = cls
    return cls


def get_engine(engine):
    """Resolve str / class / instance to an emulator engine instance."""
    if isinstance(engine, str):
        engine = engine.lower()
        if engine == 'mlp':
            from . import mlp  # noqa: F401
        elif engine == 'taylor':
            from . import taylor  # noqa: F401
        try:
            engine = _ENGINE_REGISTRY[engine]()
        except KeyError:
            raise ValueError(f'Unknown engine {engine}.')
    if isinstance(engine, type):
        engine = engine()
    return engine


class BaseEmulatorEngine(object):
    """Base per-quantity emulator engine. Subclasses implement
    ``_fit_no_operation`` / ``_predict_no_operation``."""

    name = 'base'

    def __init__(self, xoperation=None, yoperation=None, attrs=None):
        self.xoperations = [get_operation(op) for op in make_list(xoperation)]
        self.yoperations = [get_operation(op) for op in make_list(yoperation)]
        self.attrs = dict(attrs or {})

    def initialize(self, params, comm=None):
        self.params = list(params)
        self.comm = comm if comm is not None else get_comm()

    def get_default_samples(self, calculator, params, **kwargs):
        raise NotImplementedError

    def fit(self, X, Y, attrs, **kwargs):
        X, Y = np.asarray(X), np.asarray(Y)
        for operation in self.yoperations:
            operation.initialize(Y)
            Y = np.asarray(jax.vmap(lambda y, x: operation(y, X=dict(zip(self.params, x))))(Y, X))
        for operation in self.xoperations:
            operation.initialize(X)
            X = np.asarray(jax.vmap(operation)(X))
        self.xshape, self.yshape = X.shape[1:], Y.shape[1:]
        X, Y = X.reshape(len(X), -1), Y.reshape(len(Y), -1)
        self._fit_no_operation(X, Y, attrs, **kwargs)

    def predict(self, params, kw_yoperation=None):
        X = jnp.column_stack([jnp.atleast_1d(params[name]) for name in self.params]).reshape(-1)
        for operation in self.xoperations:
            X = operation(X)
        Y = self._predict_no_operation(X.reshape(-1)).reshape(self.yshape)
        kw_yoperation = kw_yoperation or {}
        for operation in self.yoperations[::-1]:
            Y = operation.inverse(Y, X=params, **kw_yoperation)
        return Y

    def _fit_no_operation(self, X, Y, attrs):
        raise NotImplementedError

    def _predict_no_operation(self, X):
        raise NotImplementedError

    def copy(self):
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        # bypass __getstate__ (serialization form): keep live configuration
        new = self.__class__.__new__(self.__class__)
        memo[id(self)] = new
        new.__dict__.update(copy.deepcopy(self.__dict__, memo))
        return new

    def __getstate__(self):
        state = {'name': self.name, 'attrs': self.attrs}
        for name in ['params', 'xshape', 'yshape']:
            if hasattr(self, name):
                state[name] = getattr(self, name)
        state['xoperations'] = [op.__getstate__() for op in self.xoperations]
        state['yoperations'] = [op.__getstate__() for op in self.yoperations]
        return state

    def __setstate__(self, state):
        self.__dict__.update({k: v for k, v in state.items() if k not in ('name', 'xoperations', 'yoperations')})
        self.xoperations = [Operation.from_state(s) for s in state.get('xoperations', [])]
        self.yoperations = [Operation.from_state(s) for s in state.get('yoperations', [])]

    @classmethod
    def from_state(cls, state):
        state = dict(state)
        name = state.pop('name')
        if name == 'mlp':
            from . import mlp  # noqa: F401
        elif name == 'taylor':
            from . import taylor  # noqa: F401
        cls = _ENGINE_REGISTRY[name]
        new = cls.__new__(cls)
        BaseEmulatorEngine.__init__(new)
        new.__setstate__(state)
        return new


@register_emulator_engine
class PointEmulatorEngine(BaseEmulatorEngine):
    """Constant predictor (pipeline sanity check)."""

    name = 'point'

    def get_default_samples(self, calculator, params, **kwargs):
        from .samples import GridSampler
        sampler = GridSampler(calculator, params)
        return sampler.run(**kwargs)

    def _fit_no_operation(self, X, Y, attrs):
        self.point = np.asarray(Y[0])

    def _predict_no_operation(self, X):
        return jnp.asarray(self.point)

    def __getstate__(self):
        state = super().__getstate__()
        if hasattr(self, 'point'):
            state['point'] = self.point
        return state


def _deep_eq(a, b):
    try:
        return np.array_equal(np.asarray(a), np.asarray(b))
    except Exception:
        return a == b


class Emulator(object):
    """Emulate a calculator ``f(**params) -> dict of arrays``: classify
    varied/fixed outputs, fit one engine per varied output, serve
    predictions through the operation chains."""

    def __init__(self, calculator=None, samples=None, engine=None, xoperation=None, yoperation=None,
                 comm=None, **kwargs):
        self.comm = comm if comm is not None else get_comm()
        self.xoperations = [get_operation(op) for op in make_list(xoperation)]
        self.yoperations = [get_operation(op) for op in make_list(yoperation)]
        self.engines, self.defaults, self.fixed = {}, {}, {}
        self._input_engines = {}
        self._init_engines = {}
        self._samples = {}
        if engine is not None:
            self.set_engine(engine)
        if calculator is not None:
            self._calculator, self._params, self._varied, self._fixed = self._classify_calculator(
                calculator, params=kwargs.get('params', None))
        if samples is not None:
            self.set_samples(samples=samples, **{k: v for k, v in kwargs.items() if k != 'params'})

    # ------------------------------------------------------------- setup
    def set_engine(self, engine, update=True):
        if not hasattr(engine, 'items'):
            engine = {'*': engine}
        engines = {key: get_engine(eng) for key, eng in engine.items()}
        if update:
            self._input_engines.update(engines)
        else:
            self._input_engines = engines

    @staticmethod
    def _sort_varied_fixed(samples, subsample=None):
        varied, fixed = {}, {}
        index = slice(None)
        if subsample is not None:
            size = len(next(iter(samples.values())))
            rng = np.random.RandomState(seed=42)
            index = rng.choice(size, min(subsample, size), replace=False)
        for name, values in samples.items():
            values = np.asarray(values)[index]
            if all(_deep_eq(value, values[0]) for value in values):
                fixed[name] = values[0]
            else:
                varied[name] = values[0].shape
        return varied, fixed

    def _classify_calculator(self, calculator, params=None):
        params = dict(params)
        sig = inspect.signature(calculator)
        self.defaults = {}
        for param in sig.parameters.values():
            if param.kind == param.POSITIONAL_OR_KEYWORD and param.default is not param.empty:
                self.defaults[param.name] = param.default
        rng = np.random.RandomState(seed=42)
        state = {}
        for _ in range(3):
            p = {param: rng.uniform(*limits) for param, limits in params.items()}
            for name, value in calculator(**p).items():
                state.setdefault(name, []).append(np.asarray(value))
        varied, fixed = self._sort_varied_fixed(state)
        if not varied:
            raise ValueError('Found no varying quantity in provided calculator')
        return calculator, params, varied, fixed

    def set_samples(self, engine=None, samples=None, params=None, calculator=None, **kwargs):
        """Attach samples (computing them via the engines' default samplers
        if not provided) and instantiate per-quantity engines."""
        if engine is not None:
            self.set_engine(engine)

        if samples is None:
            if calculator is not None:
                calculator, params, varied, fixed = self._classify_calculator(calculator, params=params)
            else:
                calculator, params, varied, fixed = (getattr(self, name, None) for name in
                                                     ('_calculator', '_params', '_varied', '_fixed'))
            engines = expand_dict(self._input_engines, list(varied))
            for name, eng in engines.items():
                if eng is None:
                    raise ValueError(f'Engine not specified for varying attribute {name}')
                eng.initialize(params=params, comm=self.comm)
                samples = eng.get_default_samples(calculator, params=params, **kwargs)
                break
        else:
            samples = samples if isinstance(samples, Samples) else Samples.read(samples)
            if params is None:
                params = {name[2:]: None for name in samples.columns('X.*')}
            varied, fixed = self._sort_varied_fixed(
                {name[2:]: samples[name] for name in samples.columns('Y.*')}, subsample=10)

        notfinite = [name for name, value in samples.items() if not np.isfinite(np.asarray(value)).all()]
        if notfinite:
            warnings.warn(f'{notfinite} are not finite')

        # global x/y operations
        X = {name[2:]: np.asarray(samples[name]) for name in samples.columns('X.*')}
        Y = {name[2:]: np.asarray(samples[name]) for name in samples.columns('Y.*')}
        for operation in self.yoperations:
            operation.initialize({**fixed, **Y}, X=X)
            Y = {name: np.asarray(value) for name, value in
                 jax.vmap(lambda y, x: operation({**fixed, **y}, X=x))(Y, X).items() if name not in fixed}
        for operation in self.xoperations:
            operation.initialize(X)
            X = {name: np.asarray(value) for name, value in jax.vmap(operation)(X).items()}

        self.fixed.update(fixed)
        params = list(X)
        processed = Samples({**{'X.' + name: X[name] for name in X}, **{'Y.' + name: Y[name] for name in Y}},
                            attrs=dict(samples.attrs))
        varied, _fixed2 = self._sort_varied_fixed(Y, subsample=10)
        self.fixed.update(_fixed2)

        engines = expand_dict(self._input_engines, list(varied))
        for name, eng in engines.items():
            if eng is None:
                raise ValueError(f'Engine not specified for varying attribute {name}')
            eng = eng.copy()
            eng.initialize(params=params, comm=self.comm)
            self._init_engines[name] = eng
            self._samples[name] = processed
        return samples, processed

    # ------------------------------------------------------------- fit / predict
    @property
    def params(self):
        params = []
        for engine in self.engines.values():
            params += [p for p in engine.params if p not in params]
        return params

    def fit(self, name=None, **kwargs):
        names = find_names(list(self._samples.keys()), name if name is not None else '*')
        for name in names:
            engine = self._init_engines[name].copy()
            samples = self._samples[name]
            X = np.column_stack([samples['X.' + p] for p in engine.params])
            Y = np.asarray(samples['Y.' + name])
            if not np.isfinite(X).all():
                raise ValueError('X is not finite')
            if not np.isfinite(Y).all():
                raise ValueError(f'{name} is not finite')
            engine.fit(X, Y, dict(samples.attrs), **kwargs)
            self.engines[name] = engine

    def predict(self, params, kw_yoperation=None):
        params = {**self.defaults, **params}
        X = dict(params)
        for operation in self.xoperations:
            params = operation(params)
        predict = dict(self.fixed)
        predict.update({name: engine.predict(params) for name, engine in self.engines.items()})
        kw_yoperation = kw_yoperation or {}
        for operation in self.yoperations[::-1]:
            predict = operation.inverse(predict, X=X, **kw_yoperation)
        return predict

    def to_calculator(self):
        def calculator(**params):
            return self.predict(params)
        return calculator

    # ------------------------------------------------------------- io
    def __getstate__(self):
        state = {'engines': {name: engine.__getstate__() for name, engine in self.engines.items()},
                 'xoperations': [op.__getstate__() for op in self.xoperations],
                 'yoperations': [op.__getstate__() for op in self.yoperations],
                 'defaults': self.defaults, 'fixed': self.fixed}
        return state

    def __setstate__(self, state):
        self.comm = get_comm()
        self._input_engines, self._init_engines, self._samples = {}, {}, {}
        self.engines = {name: BaseEmulatorEngine.from_state(s) for name, s in state['engines'].items()}
        self.xoperations = [Operation.from_state(s) for s in state.get('xoperations', [])]
        self.yoperations = [Operation.from_state(s) for s in state.get('yoperations', [])]
        self.defaults = dict(state.get('defaults', {}))
        self.fixed = {name: np.asarray(value) for name, value in state.get('fixed', {}).items()}

    @classmethod
    def from_state(cls, state):
        new = cls.__new__(cls)
        new.__setstate__(state)
        return new

    def write(self, filename):
        import json
        state = self.__getstate__()
        filename = str(filename)
        utils.mkdir(os.path.dirname(filename))
        if filename.endswith(('.h5', '.hdf5')):
            import h5py
            with h5py.File(filename, 'w') as f:
                engines_grp = f.create_group('engines')
                for engine_name, engine_state in state['engines'].items():
                    _h5_write_state(engines_grp.create_group(engine_name), engine_state)
                fixed_grp = f.create_group('fixed')
                for name, arr in state.get('fixed', {}).items():
                    fixed_grp.create_dataset(name, data=np.asarray(arr))
                meta = {k: v for k, v in state.items() if k not in ('engines', 'fixed')}
                f.attrs['__meta__'] = json.dumps(utils._prepare_for_json(meta))
        else:
            np.save(filename, state, allow_pickle=True)

    @classmethod
    def read(cls, filename):
        import json
        filename = str(filename)
        if filename.endswith(('.h5', '.hdf5')):
            import h5py
            with h5py.File(filename, 'r') as f:
                engines = {name: _h5_read_state(f['engines'][name]) for name in f['engines'].keys()}
                fixed = {name: f['fixed'][name][...] for name in f['fixed'].keys()}
                meta = utils._restore_from_json(json.loads(str(f.attrs.get('__meta__', '{}'))))
            state = {**meta, 'engines': engines, 'fixed': fixed}
        else:
            state = np.load(filename, allow_pickle=True)[()]
        return cls.from_state(state)


class EmulatedCalculator(object):
    """Load an emulator file as a plain calculator."""

    @classmethod
    def read(cls, filename):
        return Emulator.read(filename).to_calculator()


def _h5_write_state(group, state):
    """Recursively write a nested state dict to an h5 group: ndarrays as
    datasets, everything else as JSON in attrs."""
    import json
    meta = {}
    for key, value in state.items():
        if isinstance(value, np.ndarray) and value.dtype.kind in 'fiu':
            group.create_dataset(key, data=value)
        elif isinstance(value, dict):
            _h5_write_state(group.create_group(key), value)
        elif isinstance(value, (list, tuple)) and value and isinstance(value[0], dict):
            sub = group.create_group(key)
            sub.attrs['__list__'] = len(value)
            for i, item in enumerate(value):
                _h5_write_state(sub.create_group(str(i)), item)
        else:
            meta[key] = value
    group.attrs['__meta__'] = json.dumps(utils._prepare_for_json(meta))


def _h5_read_state(group):
    import json
    import h5py
    state = utils._restore_from_json(json.loads(str(group.attrs.get('__meta__', '{}'))))
    if '__list__' in group.attrs:
        return [_h5_read_state(group[str(i)]) for i in range(int(group.attrs['__list__']))]
    for key in group.keys():
        item = group[key]
        if isinstance(item, h5py.Group):
            state[key] = _h5_read_state(item)
        else:
            state[key] = item[...]
    return state
