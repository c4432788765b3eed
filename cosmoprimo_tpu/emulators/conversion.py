"""Converters from public pretrained-emulator weight formats (jaxcapse /
jaxmapse / cosmopower) into this framework's Emulator state.

Reference parity: emulators/conversion.py. The converters read the foreign
weight files from a LOCAL directory (this build has no network egress) and
emit an :class:`Emulator` whose engines are serialized Operation chains —
identical on-disk schema to reference-converted emulators, so files
converted by either implementation load in both.
"""

import glob
import json
from pathlib import Path

import numpy as np

from .base import Emulator, find_names
from .operations import Operation


# ----------------------------------------------------------------------------
# jaxace family (jaxcapse Cls / jaxmapse Pk)
# ----------------------------------------------------------------------------

def _jaxace_load_emulator_files(path):
    path = Path(path)
    weights = np.load(path / 'weights.npy')
    inminmax = np.load(path / 'nminmax.npy')
    outminmax = np.load(path / 'outminmax.npy')
    with open(path / 'nn_setup.json') as f:
        nn_dict = json.load(f)
    return nn_dict, weights, inminmax, outminmax


def _jaxace_unpack_layers_operations(nn_dict, weights):
    """Unpack the flat Fortran-order weight vector into Operation chains."""
    n_input = nn_dict['n_input_features']
    n_output = nn_dict['n_output_features']
    hidden = [v['n_neurons'] for v in nn_dict['layers'].values()]
    sizes = [n_input] + hidden + [n_output]
    operations, offset = [], 0
    for i in range(len(sizes) - 1):
        n_in, n_out = sizes[i], sizes[i + 1]
        W = weights[offset: offset + n_in * n_out].reshape(n_out, n_in, order='F')
        offset += n_in * n_out
        b = weights[offset: offset + n_out]
        offset += n_out
        operations.append(Operation('kernel @ v + bias', locals={'kernel': W, 'bias': b}))
        if i < len(sizes) - 2:
            activation = nn_dict['layers'][f'layer_{i + 1}']['activation_function']
            if activation == 'silu':
                operations.append(Operation('v / (1 + jnp.exp(-v))', locals={}))
            elif activation == 'relu':
                operations.append(Operation('jnp.maximum(v, 0.)', locals={}))
            elif activation == 'tanh':
                operations.append(Operation('jnp.tanh(v)', locals={}))
            else:
                raise ValueError(f'unknown activation {activation}')
    return operations


def convert_jaxcapse_to_cosmoprimo(fn, params=None, include_quantities=None):
    """Convert a jaxcapse (Capse.jl export) Cl-emulator directory."""
    fn = Path(fn)
    conversion = {}
    for name in ['tt', 'te', 'ee', 'bb']:
        conversion[f'harmonic.lensed_cl.{name}'] = name.upper()
    conversion['harmonic.lens_potential_cl.pp'] = 'PP'

    quantities = [q for q in conversion if glob.glob(str(fn / conversion[q]))]
    if include_quantities is not None:
        quantities = find_names(quantities, include_quantities)
    if params is None:
        params = ['logA', 'n_s', 'H0', 'omega_b', 'omega_cdm', 'tau_reio']

    state = {'engines': {}, 'xoperations': [], 'yoperations': [], 'defaults': {}, 'fixed': {}}
    for quantity in quantities:
        nn_dict, weights, inminmax, outminmax = _jaxace_load_emulator_files(fn / conversion[quantity])
        model_operations = _jaxace_unpack_layers_operations(nn_dict, weights)
        xoperations = [Operation('(v - limits[0]) / (limits[1] - limits[0])',
                                 locals={'limits': np.asarray(inminmax.T)})]
        limits = np.asarray(outminmax.T)
        ells = np.arange(outminmax.shape[0] + 2)
        # remove muK^2 and the ell (ell+1) / 2pi normalization
        TCMB = 2.7255
        CMB_unit = TCMB * 1e6
        ells2 = (ells * (ells + 1))[2:]
        if 'lens_potential' in quantity:
            limits = limits / (ells2 ** 2 / (2.0 * np.pi))
        else:
            limits = limits / (CMB_unit ** 2 * (ells2 / (2.0 * np.pi)))
        yoperations = [
            Operation("v / jnp.exp(X['logA'] - 3.)", inverse="v * jnp.exp(X['logA'] - 3.)"),
            Operation('((v - limits[0]) / (limits[1] - limits[0]))[:2]',
                      inverse='jnp.concatenate([jnp.zeros(2), v * (limits[1] - limits[0]) + limits[0]])',
                      locals={'limits': limits}),
        ]
        state['engines'][quantity] = {
            'name': 'mlp', 'params': params, 'xshape': (len(params),), 'yshape': (outminmax.shape[0],),
            'attrs': {},
            'xoperations': [op.__getstate__() for op in xoperations],
            'yoperations': [op.__getstate__() for op in yoperations],
            'model_operations': [op.__getstate__() for op in model_operations],
            'model_yoperations': []}
        state['fixed']['.'.join(quantity.split('.')[:2]) + '.ell'] = ells
    return Emulator.from_state(state)


def convert_jaxmapse_to_cosmoprimo(fn, params=None, include_quantities=None):
    """Convert a jaxmapse Pk-emulator directory."""
    fn = Path(fn)
    conversion = {'fourier.pk.delta_cb.delta_cb': 'plin',
                  'fourier.pknow.delta_cb.delta_cb': 'pnw'}
    quantities = [q for q in conversion if glob.glob(str(fn / conversion[q]))]
    if include_quantities is not None:
        quantities = find_names(quantities, include_quantities)
    if params is None:
        params = ['logA', 'n_s', 'H0', 'omega_b', 'omega_cdm']

    state = {'engines': {}, 'xoperations': [], 'yoperations': [], 'defaults': {}, 'fixed': {}}
    for quantity in quantities:
        nn_dict, weights, inminmax, outminmax = _jaxace_load_emulator_files(fn / conversion[quantity])
        model_operations = _jaxace_unpack_layers_operations(nn_dict, weights)
        xoperations = [Operation('(v - limits[0]) / (limits[1] - limits[0])',
                                 locals={'limits': np.asarray(inminmax.T)})]
        limits = np.asarray(outminmax.T)
        yoperations = [Operation('(v - limits[0]) / (limits[1] - limits[0])',
                                 inverse='v * (limits[1] - limits[0]) + limits[0]', locals={'limits': limits})]
        state['engines'][quantity] = {
            'name': 'mlp', 'params': params, 'xshape': (len(params),), 'yshape': (outminmax.shape[0],),
            'attrs': {},
            'xoperations': [op.__getstate__() for op in xoperations],
            'yoperations': [op.__getstate__() for op in yoperations],
            'model_operations': [op.__getstate__() for op in model_operations],
            'model_yoperations': []}
        kfile = fn / conversion[quantity] / 'k.npy'
        if kfile.exists():
            state['fixed']['fourier.k'] = np.load(kfile)
    return Emulator.from_state(state)


# ----------------------------------------------------------------------------
# cosmopower (.npz networks)
# ----------------------------------------------------------------------------

def _cosmopower_operations(fpz):
    """Operation chain from a cosmopower .npz network dump."""
    operations = []
    nlayers = int(fpz['n_layers'])
    kernels = fpz['weights_'] if 'weights_' in fpz else [fpz[f'W_{i}'] for i in range(nlayers)]
    biases = fpz['biases_'] if 'biases_' in fpz else [fpz[f'b_{i}'] for i in range(nlayers)]
    alphas = fpz.get('alphas_', [fpz.get(f'alphas_{i}') for i in range(nlayers - 1)])
    betas = fpz.get('betas_', [fpz.get(f'betas_{i}') for i in range(nlayers - 1)])
    for ilayer in range(nlayers):
        operations.append(Operation('v @ kernel + bias',
                                    locals={'kernel': np.asarray(kernels[ilayer]), 'bias': np.asarray(biases[ilayer])}))
        if ilayer < nlayers - 1:
            operations.append(Operation('(beta + (1 - beta) / (1 + jnp.exp(-alpha * v))) * v',
                                        locals={'alpha': np.asarray(alphas[ilayer]), 'beta': np.asarray(betas[ilayer])}))
    return operations


def convert_cosmopower_to_cosmoprimo(fn, quantity='harmonic.lensed_cl.tt', params=None, log10_output=True):
    """Convert a single cosmopower .npz network into an Emulator.

    cosmopower standardizes inputs by (mean, std) and typically predicts
    log10 spectra; ``log10_output`` applies the 10** inverse.
    """
    fpz = dict(np.load(str(fn), allow_pickle=True))
    fpz = {key: (value[()] if getattr(value, 'ndim', 1) == 0 else value) for key, value in fpz.items()}
    operations = _cosmopower_operations(fpz)
    if params is None:
        params = [str(p) for p in np.atleast_1d(fpz.get('parameters_', fpz.get('parameters', [])))] or \
                 ['omega_b', 'omega_cdm', 'h', 'tau_reio', 'n_s', 'logA']
    xoperations = []
    if 'param_train_mean' in fpz:
        xoperations.append(Operation('(v - mean) / sigma', inverse='v * sigma + mean',
                                     locals={'mean': np.asarray(fpz['param_train_mean']),
                                             'sigma': np.asarray(fpz['param_train_std'])}))
    yoperations = []
    if 'feature_train_mean' in fpz:
        yoperations.append(Operation('(v - mean) / sigma', inverse='v * sigma + mean',
                                     locals={'mean': np.asarray(fpz['feature_train_mean']),
                                             'sigma': np.asarray(fpz['feature_train_std'])}))
    if log10_output:
        yoperations.insert(0, Operation('jnp.log10(v)', inverse='10**v'))
    yshape = None
    for op in operations[::-1]:
        if 'bias' in op.locals:
            yshape = (np.asarray(op.locals['bias']).shape[-1],)
            break
    state = {'engines': {quantity: {'name': 'mlp', 'params': list(params), 'xshape': (len(params),),
                                    'yshape': yshape, 'attrs': {},
                                    'xoperations': [op.__getstate__() for op in xoperations],
                                    'yoperations': [op.__getstate__() for op in yoperations],
                                    'model_operations': [op.__getstate__() for op in operations],
                                    'model_yoperations': []}},
             'xoperations': [], 'yoperations': [], 'defaults': {}, 'fixed': {}}
    if 'modes' in fpz:
        namespace = '.'.join(quantity.split('.')[:2])
        key = 'ell' if 'harmonic' in quantity else 'k'
        state['fixed'][f'{namespace}.{key}'] = np.asarray(fpz['modes'])
    return Emulator.from_state(state)
