"""Pre/post-processing operation algebra for emulators.

Operations transform calculator inputs 'x' / outputs 'y' before fitting and
invert after prediction. The reference serializes operations as python
expression strings evaluated with ``eval`` (tools/base.py:747-813); we keep
that on-disk schema (so reference-trained emulators load) but evaluate
through a *restricted* evaluator exposing only ``jnp`` and the operation's
locals — no builtins.
"""

import numpy as np

import jax.numpy as jnp

_OPERATION_REGISTRY = {}


def register_operation(cls):
    _OPERATION_REGISTRY[cls.name] = cls
    return cls


def get_operation(operation):
    """Resolve str / class / instance to an Operation instance."""
    if isinstance(operation, str):
        try:
            operation = _OPERATION_REGISTRY[operation.lower()]()
        except KeyError:
            raise ValueError(f'Unknown operation {operation}.')
    if isinstance(operation, type):
        operation = operation()
    return operation


_ALLOWED_AST_NODES = (
    'Expression', 'BinOp', 'UnaryOp', 'BoolOp', 'Compare', 'IfExp', 'Call',
    'Name', 'Attribute', 'Constant', 'Subscript', 'Slice', 'Tuple', 'List',
    'keyword', 'Load',
    # operators
    'Add', 'Sub', 'Mult', 'Div', 'FloorDiv', 'Mod', 'Pow', 'MatMult',
    'UAdd', 'USub', 'Not', 'And', 'Or', 'Eq', 'NotEq', 'Lt', 'LtE', 'Gt', 'GtE',
)


def _guarded_import(name, globals=None, locals=None, fromlist=(), level=0):
    """__import__ restricted to the jax/numpy family — the only imports the
    jnp dispatch machinery legitimately triggers from inside an operation
    expression (see evaluate)."""
    import builtins
    root = name.partition('.')[0]
    if level != 0 or root not in ('jax', 'jaxlib', 'numpy', 'ml_dtypes', 'opt_einsum'):
        raise ImportError(f'operation expressions may not import {name!r}')
    return builtins.__import__(name, globals, locals, fromlist, level)


def evaluate(expression, locals=None):
    """Evaluate an operation expression with jnp and the given locals only.

    Restricted equivalent of the reference's utils.evaluate: no builtins, and
    the expression is AST-checked first — only arithmetic/call/index nodes
    are allowed and no identifier or attribute may start with an underscore,
    which blocks dunder-chain escapes like ``().__class__...``.

    NOTE on trust model: this guards the *expression strings*; emulator
    files as a whole (h5/npy with ``allow_pickle``) are trusted input, the
    same threat model as pickle — do not load emulator files from untrusted
    sources.
    """
    import ast
    tree = ast.parse(expression, mode='eval')
    for node in ast.walk(tree):
        kind = type(node).__name__
        if kind not in _ALLOWED_AST_NODES:
            raise ValueError(f'Disallowed construct {kind!r} in operation expression {expression!r}')
        if isinstance(node, ast.Name) and node.id.startswith('_'):
            raise ValueError(f'Disallowed identifier {node.id!r} in operation expression {expression!r}')
        if isinstance(node, ast.Attribute) and node.attr.startswith('_'):
            raise ValueError(f'Disallowed attribute {node.attr!r} in operation expression {expression!r}')
    env = {'jnp': jnp, 'np': jnp}
    env.update(locals or {})
    # jnp call dispatch resolves '__import__' from this frame's builtins
    # (jax's C++ dispatch path uses the caller's builtins for lazy imports,
    # so an empty dict breaks even jnp.log10 with KeyError '__import__').
    # Expressions cannot *name* it (underscore identifiers are rejected at
    # the AST gate above), and the copy exposed here is further restricted
    # to the jax/numpy family — importing anything else raises.
    return eval(compile(tree, '<operation>', 'eval'),
                {'__builtins__': {'__import__': _guarded_import}}, env)


@register_operation
class Operation(object):
    """Expression-backed transform with a direct and an inverse form.

    ``direct`` / ``inverse`` are expressions in the variable ``v`` (plus any
    name in ``locals`` and keyword arguments passed at call time).
    """

    name = 'base'

    def __init__(self, direct='v', inverse=None, locals=None, input_type=None):
        self._direct = str(direct)
        self._inverse = str(inverse) if inverse is not None else None
        self._locals = dict(locals or {})
        self.input_type = input_type

    @property
    def locals(self):
        return dict(self._locals)

    def initialize(self, v, **kwargs):
        return

    def __call__(self, v, **kwargs):
        return evaluate(self._direct, locals={**self._locals, 'v': v, **kwargs})

    def inverse(self, v, **kwargs):
        return evaluate(self._inverse, locals={**self._locals, 'v': v, **kwargs})

    def update(self, **kwargs):
        if 'locals' in kwargs:
            self._locals = dict(kwargs['locals'] or {})
        if 'direct' in kwargs:
            self._direct = str(kwargs['direct'])
        if 'inverse' in kwargs:
            self._inverse = str(kwargs['inverse']) if kwargs['inverse'] is not None else None

    def clone(self, **kwargs):
        new = self.copy()
        new.update(**kwargs)
        return new

    def copy(self):
        new = self.__class__.__new__(self.__class__)
        new.__dict__.update({k: (dict(v) if isinstance(v, dict) else v) for k, v in self.__dict__.items()})
        return new

    def __deepcopy__(self, memo):
        # bypass __getstate__ (which serializes only the expression fields):
        # keep subclass configuration like ScaleOperation.limits
        import copy as _copy
        new = self.__class__.__new__(self.__class__)
        memo[id(self)] = new
        new.__dict__.update(_copy.deepcopy(self.__dict__, memo))
        return new

    def __getstate__(self):
        return {'name': self.name, '_direct': self._direct, '_inverse': self._inverse, '_locals': self._locals}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.input_type = state.get('input_type', None)

    @classmethod
    def from_state(cls, state):
        state = dict(state)
        name = state.pop('name')
        cls = _OPERATION_REGISTRY[name]
        new = cls.__new__(cls)
        new.__setstate__(state)
        return new


@register_operation
class Log10Operation(Operation):
    """log10 <-> 10^x."""

    name = 'log10'

    def __init__(self):
        super().__init__('jnp.log10(v)', inverse='10**v', locals={})


@register_operation
class ArcsinhOperation(Operation):
    """arcsinh <-> sinh."""

    name = 'arcsinh'

    def __init__(self):
        super().__init__('jnp.arcsinh(v)', inverse='jnp.sinh(v)', locals={})


@register_operation
class ScaleOperation(Operation):
    """Rescale to [0, 1] by (sample or provided) limits."""

    name = 'scale'

    def __init__(self, limits=None):
        self.limits = list(limits) if limits else [None] * 2
        super().__init__('v')

    def initialize(self, values, **kwargs):
        values = np.asarray(values)
        limits = list(self.limits)
        if limits[0] is None:
            limits[0] = np.min(values, axis=0)
        if limits[1] is None:
            limits[1] = np.max(values, axis=0)
        mask = limits[1] == limits[0]
        limits[0] = np.where(mask, 0.0, limits[0])
        limits[1] = np.where(mask, 1.0, limits[1])
        self.limits = limits
        self.update(direct='(v - limits[0]) / (limits[1] - limits[0])',
                    inverse='v * (limits[1] - limits[0]) + limits[0]',
                    locals={'limits': limits})


@register_operation
class NormOperation(Operation):
    """Standardize by sample mean / std."""

    name = 'norm'

    def __init__(self):
        super().__init__('v')

    def initialize(self, v, **kwargs):
        v = np.asarray(v)
        mean, sigma = np.mean(v, axis=0), np.std(v, ddof=1, axis=0)
        sigma = np.where(sigma == 0.0, 1.0, sigma)
        self.update(direct='(v - mean) / sigma', inverse='v * sigma + mean',
                    locals={'mean': mean, 'sigma': sigma})


def _subspace(X, npcs=None):
    """Principal directions of X (nsamples, ...), via SVD of the flattened,
    whitened matrix (reference tools/utils.subspace role)."""
    X = np.asarray(X).reshape(len(X), -1)
    cov = X.T @ X / len(X)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evecs = evecs[:, order]
    if npcs is not None:
        evecs = evecs[:, :npcs]
    return evecs


@register_operation
class PCAOperation(Operation):
    """Project onto the ``npcs`` leading principal components."""

    name = 'pca'

    def __init__(self, npcs=1):
        self.npcs = npcs
        super().__init__('v')

    def initialize(self, v, **kwargs):
        v = np.asarray(v)
        self.mean, self.sigma = np.mean(v, axis=0), np.std(v, ddof=1, axis=0)
        self.sigma = np.where(self.sigma == 0.0, 1.0, self.sigma)
        eig = _subspace((v - self.mean) / self.sigma, npcs=self.npcs)
        self.eigenvectors = eig.T.reshape((-1,) + self.mean.shape)

    def __call__(self, v, **kwargs):
        return jnp.sum(jnp.expand_dims((v - self.mean) / self.sigma, axis=0) * self.eigenvectors,
                       axis=tuple(range(1, self.eigenvectors.ndim)))

    def inverse(self, v, **kwargs):
        return jnp.sum(jnp.expand_dims(v, axis=tuple(range(1, self.eigenvectors.ndim))) * self.eigenvectors,
                       axis=0) * self.sigma + self.mean

    def __getstate__(self):
        return {name: getattr(self, name) for name in ['name', 'mean', 'sigma', 'eigenvectors'] if hasattr(self, name)}

    def __setstate__(self, state):
        self.__dict__.update(state)


@register_operation
class ChebyshevOperation(Operation):
    """Project onto a Chebyshev basis up to ``order`` along ``axis``."""

    name = 'chebyshev'

    def __init__(self, order=10, axis=-1):
        self.order = int(order)
        self.axis = int(axis)
        super().__init__('v')

    def initialize(self, v, **kwargs):
        size = v.shape[1:][self.axis]
        ndim = v.ndim - 1
        self.axis = self.axis % ndim
        shape = [1] * ndim
        shape.insert(self.axis, size)
        x = np.linspace(-1.0, 1.0, size)
        # Chebyshev polynomials T_n by recurrence (no scipy)
        polys = [np.ones_like(x), x]
        for n in range(2, self.order + 1):
            polys.append(2 * x * polys[-1] - polys[-2])
        poly = np.stack(polys[:self.order + 1], axis=-1)  # (size, order+1)
        full_shape = [1] * (ndim + 1)
        full_shape[self.axis] = size
        full_shape[self.axis + 1] = self.order + 1
        self.poly = poly.reshape(full_shape)
        flatpoly = poly.reshape(size, -1)
        self.proj = (flatpoly @ np.linalg.inv(flatpoly.T @ flatpoly)).reshape(self.poly.shape)

    def __call__(self, v, **kwargs):
        return jnp.sum(jnp.expand_dims(v, self.axis + 1) * self.poly, axis=self.axis)

    def inverse(self, v, **kwargs):
        return jnp.sum(jnp.expand_dims(v, self.axis) * self.proj, axis=self.axis + 1)

    def __getstate__(self):
        return {name: getattr(self, name) for name in ['name', 'proj', 'poly', 'axis'] if hasattr(self, name)}

    def __setstate__(self, state):
        self.__dict__.update(state)


@register_operation
class SplitDerivedOperation(Operation):
    """Unpack a packed derived-parameter vector (e.g. cosmopower's
    'thermodynamics.all': [..., z_star, rs_star, z_drag, rs_drag, ...])
    into named quantities at serving time, optionally rescaling sound
    horizons from Mpc to Mpc/h (reference conversion.py:248-257, here as a
    typed operation instead of an exec-string — our expression sandbox is
    expression-only by design)."""

    name = 'split_derived'

    def __init__(self, conversion=None, key='thermodynamics.all',
                 h_scale=('thermodynamics.rs_drag', 'thermodynamics.rs_star')):
        self.conversion = dict(conversion or {})
        self.key = str(key)
        self.h_scale = tuple(h_scale)
        super().__init__('v')

    def __call__(self, v, X=None, cosmo=None):
        # training direction: drop the unpacked names (the packed vector is
        # the stored target); converted emulators never fit, so this is
        # only for symmetry
        return {name: value for name, value in dict(v).items()
                if name not in self.conversion}

    def inverse(self, v, X=None, cosmo=None):
        v = dict(v)
        if self.key not in v:
            return v
        derived = v.pop(self.key)
        for name, index in self.conversion.items():
            value = derived[..., index]
            if name in self.h_scale and X is not None:
                value = value * X['h']
            v[name] = value
        return v

    def __getstate__(self):
        return {'name': self.name, 'conversion': self.conversion, 'key': self.key,
                'h_scale': list(self.h_scale)}

    def __setstate__(self, state):
        self.conversion = dict(state['conversion'])
        self.key = state['key']
        self.h_scale = tuple(state['h_scale'])
        self._direct, self._inverse, self._locals = 'v', None, {}
        self.input_type = None


@register_operation
class FourierUnitOperation(Operation):
    """Convert served fourier tables from the foreign network's units to
    this framework's (Mpc/h, (Mpc/h)^3) convention: k -> k / h and
    (optionally, for cosmopower v1 networks trained in Mpc^3) pk -> pk h^3
    (reference conversion.py:259-263)."""

    name = 'fourier_unit'

    def __init__(self, pk_h3=True):
        self.pk_h3 = bool(pk_h3)
        super().__init__('v')

    def __call__(self, v, X=None, cosmo=None):
        v = dict(v)
        if 'fourier.k' in v and X is not None:
            v['fourier.k'] = v['fourier.k'] * X['h']
            if self.pk_h3:
                v = {name: value / X['h'] ** 3 if name.startswith('fourier.pk') else value
                     for name, value in v.items()}
        return v

    def inverse(self, v, X=None, cosmo=None):
        v = dict(v)
        if 'fourier.k' in v and X is not None:
            v['fourier.k'] = v['fourier.k'] / X['h']
            if self.pk_h3:
                v = {name: value * X['h'] ** 3 if name.startswith('fourier.pk') else value
                     for name, value in v.items()}
        return v

    def __getstate__(self):
        return {'name': self.name, 'pk_h3': self.pk_h3}

    def __setstate__(self, state):
        self.pk_h3 = bool(state['pk_h3'])
        self._direct, self._inverse, self._locals = 'v', None, {}
        self.input_type = None
