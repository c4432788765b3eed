"""Emulator toolkit tests: samplers, operations, Point/Taylor/MLP engines,
Emulator IO round trip, and the 'emulated' cosmology engine end to end
(reference parity: emulators/tests + emulators/tools/tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosmoprimo_tpu.cosmology import Cosmology
from cosmoprimo_tpu.emulators import (Emulator, EmulatedEngine, GridSampler, MLPEmulatorEngine,
                                      PointEmulatorEngine, QMCSampler, Samples, TaylorEmulatorEngine,
                                      get_calculator)


def toy_calculator(a=1.0, b=0.0):
    x = np.linspace(0.0, 1.0, 10)
    return {'x': x, 'y': a * np.sin(3 * x) + b * x ** 2, 'z': a ** 2 + np.exp(b)}


PARAMS = {'a': (0.8, 1.2), 'b': (-0.2, 0.2)}


def test_operation_evaluate_restricted():
    from cosmoprimo_tpu.emulators.operations import evaluate, Operation
    np.testing.assert_allclose(float(evaluate('jnp.log10(v) + s', {'v': 100.0, 's': 1.0})), 3.0)
    np.testing.assert_allclose(np.asarray(evaluate('v @ kernel + bias',
                                                   {'v': np.ones((1, 2)), 'kernel': np.ones((2, 2)),
                                                    'bias': np.zeros(2)})), [[2.0, 2.0]])
    # dunder-chain escapes and statements are rejected at the AST gate
    for evil in ["().__class__.__mro__[1].__subclasses__()",
                 "v.__class__",
                 "_secret",
                 "[x for x in (1,)]",
                 "lambda: 1",
                 "jnp.__loader__",
                 "f'{v}'",
                 "getattr(v, 'real')"]:
        with pytest.raises((ValueError, SyntaxError, NameError)):
            evaluate(evil, {'v': 1.0})
    # the evaluator's builtins expose nothing nameable: open/exec/eval and
    # every other non-underscore builtin must not resolve
    for evil in ["open('/etc/passwd')", "exec", "eval"]:
        with pytest.raises((ValueError, SyntaxError, NameError)):
            evaluate(evil, {'v': 1.0})
    # the guarded __import__ (needed by jnp dispatch) refuses non-jax/numpy
    from cosmoprimo_tpu.emulators.operations import _guarded_import
    with pytest.raises(ImportError):
        _guarded_import('os')
    with pytest.raises(ImportError):
        _guarded_import('subprocess.check_output')
    # jnp submodule attribute access works inside the sandbox
    np.testing.assert_allclose(float(evaluate('jnp.linalg.norm(v)', {'v': np.asarray([3.0, 4.0])})), 5.0)
    # round-trip through Operation state keeps working
    op = Operation('jnp.exp(v)', inverse='jnp.log(v)')
    state = op.__getstate__()
    op2 = Operation.from_state(state)
    np.testing.assert_allclose(float(op2.inverse(op2(1.5))), 1.5, rtol=1e-12)


def test_samples_io(tmp_path):
    sampler = QMCSampler(toy_calculator, PARAMS, engine='rqrs')
    samples = sampler.run(niterations=16)
    assert samples.size == 16
    assert set(samples.columns('X.*')) == {'X.a', 'X.b'}
    for fn in ['samples.npy', 'samples.h5']:
        path = str(tmp_path / fn)
        samples.write(path)
        loaded = Samples.read(path)
        np.testing.assert_allclose(loaded['Y.y'], samples['Y.y'])


def test_grid_sampler():
    sampler = GridSampler(toy_calculator, PARAMS)
    samples = sampler.run(ngrid=3)
    assert samples.size == 9


def test_point_engine(tmp_path):
    emulator = Emulator(calculator=toy_calculator, params=PARAMS, engine=PointEmulatorEngine())
    emulator.set_samples()
    emulator.fit()
    pred = emulator.predict({'a': 1.0, 'b': 0.0})
    assert 'y' in pred and 'x' in pred  # x is fixed
    np.testing.assert_allclose(np.asarray(pred['x']), np.linspace(0, 1, 10))
    # io round trip
    for fn in ['emu.npy', 'emu.h5']:
        path = str(tmp_path / fn)
        emulator.write(path)
        emulator2 = Emulator.read(path)
        pred2 = emulator2.predict({'a': 1.0, 'b': 0.0})
        np.testing.assert_allclose(np.asarray(pred2['y']), np.asarray(pred['y']))


def test_taylor_engine(tmp_path):
    emulator = Emulator(calculator=toy_calculator, params=PARAMS, engine=TaylorEmulatorEngine(order=3))
    emulator.set_samples()
    emulator.fit()
    for a, b in [(1.0, 0.0), (1.1, 0.1), (0.85, -0.15)]:
        pred = emulator.predict({'a': a, 'b': b})
        truth = toy_calculator(a, b)
        np.testing.assert_allclose(np.asarray(pred['y']), truth['y'], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pred['z']), truth['z'], rtol=1e-3)
    # jit + grad through prediction
    path = str(tmp_path / 'taylor.npy')
    emulator.write(path)
    emulator2 = Emulator.read(path)

    def f(a):
        return jnp.sum(emulator2.predict({'a': a, 'b': 0.05})['y'])

    g = float(jax.grad(f)(1.0))
    truth_g = np.sum(np.sin(3 * np.linspace(0, 1, 10)))
    assert abs(g - truth_g) < 1e-3


@pytest.mark.slow
def test_mlp_engine():
    emulator = Emulator(calculator=toy_calculator, params=PARAMS,
                        engine=MLPEmulatorEngine(nhidden=(16, 16)))
    emulator.set_samples(niterations=128)
    emulator.fit(epochs=150, batch_frac=(1.0,), learning_rate=(1e-2,), patience=150)
    pred = emulator.predict({'a': 1.0, 'b': 0.0})
    truth = toy_calculator(1.0, 0.0)
    # small net, few samples: accept few-percent accuracy
    np.testing.assert_allclose(np.asarray(pred['y']), truth['y'], atol=0.1)


def test_mlp_engine_batch_norm():
    """batch_norm folds BatchNorm into affine Operations; serving stays
    flax-free (reference tools/mlp.py:119-121, 174-176)."""
    emulator = Emulator(calculator=toy_calculator, params=PARAMS,
                        engine=MLPEmulatorEngine(nhidden=(8, 8)))
    emulator.set_samples(niterations=64)
    emulator.fit(epochs=20, batch_frac=(1.0,), learning_rate=(1e-2,), patience=20, batch_norm=True)
    engine = emulator.engines['y']
    exprs = [op._direct for op in engine.model_operations]
    assert 'scale * (v - mean) + bias' in exprs
    pred = emulator.predict({'a': 1.0, 'b': 0.0})
    assert np.isfinite(np.asarray(pred['y'])).all()


@pytest.mark.slow
def test_emulated_engine(tmp_path):
    cosmo = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, A_s=2.083e-9, n_s=0.9649,
                      engine='eisenstein_hu')
    calculator = get_calculator(cosmo, section=['background', 'thermodynamics', 'primordial'])
    emulator = Emulator(calculator=calculator, params={'omega_cdm': (0.11, 0.13)},
                        engine=TaylorEmulatorEngine(order=2))
    emulator.set_samples()
    emulator.fit()
    path = str(tmp_path / 'cosmo_emu.npy')
    emulator.write(path)

    engine_cls = EmulatedEngine.read(path)
    cosmo_emu = Cosmology(omega_cdm=0.121, omega_b=0.02237, h=0.6736, A_s=2.083e-9, n_s=0.9649,
                          engine=engine_cls)
    cosmo_ref = cosmo.clone(omega_cdm=0.121)
    z = np.array([0.5, 1.0, 2.0])
    chi_emu = np.asarray(cosmo_emu.get_background().comoving_radial_distance(z))
    chi_ref = np.asarray(cosmo_ref.get_background().comoving_radial_distance(z))
    np.testing.assert_allclose(chi_emu, chi_ref, rtol=1e-5)
    assert abs(float(cosmo_emu.get_thermodynamics().rs_drag) / float(cosmo_ref.get_thermodynamics().rs_drag) - 1) < 1e-5
    # differentiable serving
    def chi_of(omega_cdm):
        c = Cosmology(omega_cdm=omega_cdm, omega_b=0.02237, h=0.6736, A_s=2.083e-9, n_s=0.9649,
                      engine=engine_cls)
        return c.get_background().comoving_radial_distance(1.0)
    g = float(jax.grad(chi_of)(0.121))
    assert np.isfinite(g) and g != 0


def test_jaxcapse_conversion(tmp_path):
    """Convert a synthetic jaxcapse-format network and verify the prediction
    against a manual forward pass."""
    import json
    from cosmoprimo_tpu.emulators.conversion import convert_jaxcapse_to_cosmoprimo

    rng = np.random.default_rng(3)
    n_in, hidden, n_out = 6, [8, 8], 12
    sizes = [n_in] + hidden + [n_out]
    weights, raw = [], []
    for i in range(len(sizes) - 1):
        W = rng.normal(size=(sizes[i + 1], sizes[i])) * 0.3
        b = rng.normal(size=sizes[i + 1]) * 0.1
        raw.append((W, b))
        weights.append(W.ravel(order='F'))
        weights.append(b)
    weights = np.concatenate(weights)
    nn_dict = {'n_input_features': n_in, 'n_output_features': n_out,
               'layers': {f'layer_{i+1}': {'n_neurons': h, 'activation_function': 'tanh'}
                          for i, h in enumerate(hidden)}}
    d = tmp_path / 'TT'
    d.mkdir()
    np.save(d / 'weights.npy', weights)
    inminmax = np.stack([np.zeros(n_in), np.ones(n_in)], axis=-1)
    outminmax = np.stack([np.zeros(n_out), np.ones(n_out)], axis=-1)
    np.save(d / 'nminmax.npy', inminmax)
    np.save(d / 'outminmax.npy', outminmax)
    with open(d / 'nn_setup.json', 'w') as f:
        json.dump(nn_dict, f)

    emu = convert_jaxcapse_to_cosmoprimo(tmp_path)
    assert 'harmonic.lensed_cl.tt' in emu.engines
    X = {'logA': 3.0, 'n_s': 0.96, 'H0': 67.0, 'omega_b': 0.022, 'omega_cdm': 0.12, 'tau_reio': 0.055}
    pred = emu.predict(X)
    cl = np.asarray(pred['harmonic.lensed_cl.tt'])
    assert cl.shape == (n_out + 2,)
    assert np.all(cl[:2] == 0)
    # manual forward pass
    x = np.array([X[p] for p in ['logA', 'n_s', 'H0', 'omega_b', 'omega_cdm', 'tau_reio']])
    h = x  # inminmax is (0,1): scaling is identity
    for i, (W, b) in enumerate(raw):
        h = W @ h + b
        if i < len(raw) - 1:
            h = np.tanh(h)
    ells = np.arange(n_out + 2)
    ells2 = (ells * (ells + 1))[2:]
    TCMB_unit = (2.7255e6) ** 2 * ells2 / (2 * np.pi)
    expected = h / TCMB_unit * np.exp(X['logA'] - 3.0)
    np.testing.assert_allclose(cl[2:], expected, rtol=1e-10)


def test_cosmopower_conversion(tmp_path):
    from cosmoprimo_tpu.emulators.conversion import convert_cosmopower_to_cosmoprimo
    rng = np.random.default_rng(4)
    n_in, n_out = 4, 10
    W0, b0 = rng.normal(size=(n_in, 16)), rng.normal(size=16)
    W1, b1 = rng.normal(size=(16, n_out)), rng.normal(size=n_out)
    a0, be0 = rng.normal(size=16), rng.normal(size=16)
    fn = tmp_path / 'net.npz'
    np.savez(fn, n_layers=2, W_0=W0, b_0=b0, W_1=W1, b_1=b1, alphas_0=a0, betas_0=be0,
             param_train_mean=np.zeros(n_in), param_train_std=np.ones(n_in),
             feature_train_mean=np.zeros(n_out), feature_train_std=np.ones(n_out),
             parameters_=np.array(['omega_b', 'omega_cdm', 'h', 'logA']),
             modes=np.arange(2, n_out + 2))
    emu = convert_cosmopower_to_cosmoprimo(fn, quantity='harmonic.lensed_cl.tt')
    X = {'omega_b': 0.022, 'omega_cdm': 0.12, 'h': 0.67, 'logA': 3.0}
    pred = np.asarray(emu.predict(X)['harmonic.lensed_cl.tt'])
    # manual
    x = np.array([X[p] for p in ['omega_b', 'omega_cdm', 'h', 'logA']])
    h = x @ W0 + b0
    h = (be0 + (1 - be0) / (1 + np.exp(-a0 * h))) * h
    h = h @ W1 + b1
    np.testing.assert_allclose(pred, 10 ** h, rtol=1e-10)


def _make_synthetic_capse(tmp_path, n_in=6, n_out=48):
    """Build a synthetic jaxcapse-format Cl network and convert it."""
    import json as _json
    from cosmoprimo_tpu.emulators.conversion import convert_jaxcapse_to_cosmoprimo
    rng = np.random.default_rng(11)
    hidden = [16]
    sizes = [n_in] + hidden + [n_out]
    weights = []
    for i in range(len(sizes) - 1):
        W = rng.normal(size=(sizes[i + 1], sizes[i])) * 0.05
        b = rng.normal(size=sizes[i + 1]) * 0.01 + (1.0 if i == len(sizes) - 2 else 0.0)
        weights.append(W.ravel(order='F'))
        weights.append(b)
    nn_dict = {'n_input_features': n_in, 'n_output_features': n_out,
               'layers': {f'layer_{i+1}': {'n_neurons': h, 'activation_function': 'silu'}
                          for i, h in enumerate(hidden)}}
    d = tmp_path / 'TT'
    d.mkdir()
    np.save(d / 'weights.npy', np.concatenate(weights))
    np.save(d / 'nminmax.npy', np.stack([np.array([2.5, 0.9, 60, 0.02, 0.1, 0.01]),
                                         np.array([3.5, 1.0, 75, 0.024, 0.14, 0.10])], axis=-1))
    np.save(d / 'outminmax.npy', np.stack([np.zeros(n_out), np.ones(n_out)], axis=-1))
    with open(d / 'nn_setup.json', 'w') as f:
        _json.dump(nn_dict, f)
    emu = convert_jaxcapse_to_cosmoprimo(tmp_path)
    fn = str(tmp_path / 'capse.npy')
    emu.write(fn)
    return fn


@pytest.mark.slow
def test_capse_style_harmonic_serving(tmp_path):
    """BASELINE config #5: lensed_cl()['tt'] served on-device through the
    harmonic section with end-to-end jacfwd gradients."""
    from cosmoprimo_tpu.emulators import EmulatedEngine
    fn = _make_synthetic_capse(tmp_path)
    engine_cls = EmulatedEngine.read(fn)

    def get_cosmo(logA):
        return Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, logA=logA, n_s=0.9649,
                         tau_reio=0.055, ellmax_cl=49, engine=engine_cls)

    hr = get_cosmo(3.0).get_harmonic()
    cl = hr.lensed_cl()
    tt = np.asarray(cl['tt'])
    assert tt.shape == (50,)
    assert np.all(tt[:2] == 0) and np.isfinite(tt).all()
    assert np.asarray(cl['ell']).shape == (50,)

    def tt_sum(logA):
        return jnp.sum(get_cosmo(logA).get_harmonic().lensed_cl()['tt'])

    g = float(jax.jacfwd(tt_sum)(3.0))
    assert np.isfinite(g) and g != 0
    # Cl scales with A_s ~ exp(logA): d(sum)/dlogA ~ sum at leading order
    assert abs(g / float(tt_sum(3.0)) - 1) < 0.5


def test_hybrid_background_fallback(tmp_path):
    # an emulator trained on thermodynamics only: the emulated engine must
    # serve the ODE default background (reference hybrid.py design) and
    # resolve theta_MC_100 inputs without recursing into itself
    from cosmoprimo_tpu.emulators import PointEmulatorEngine, Samples
    cosmo = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, A_s=2.083e-9, n_s=0.9649,
                      engine='eisenstein_hu')
    emulator = Emulator(engine=PointEmulatorEngine())
    emulator.set_samples(samples=Samples({'X.theta_MC_100': np.array([1.04, 1.041]),
                                          'Y.thermodynamics.rs_drag': np.array([147.0, 147.2]),
                                          'Y.thermodynamics.z_drag': np.array([1060.0, 1060.5])}))
    emulator.fit()
    path = str(tmp_path / 'thermo_only.npy')
    emulator.write(path)

    # extra_params path binding (no subclassing needed)
    cosmo_emu = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, A_s=2.083e-9, n_s=0.9649,
                          engine='emulated', extra_params={'path': path})
    assert abs(float(cosmo_emu.get_thermodynamics().rs_drag) - 147.0) < 1e-10
    # background falls back to the ODE tables and matches the source engine
    z = np.array([0.5, 1.0, 2.0])
    chi_emu = np.asarray(cosmo_emu.get_background().comoving_radial_distance(z))
    chi_ref = np.asarray(cosmo.get_background().comoving_radial_distance(z))
    np.testing.assert_allclose(chi_emu, chi_ref, rtol=1e-5)


def test_train_boltzmann_configs():
    from cosmoprimo_tpu.emulators.train.train_boltzmann import CONFIGS, make_reparam, build_cosmology
    assert set(CONFIGS) == {'base', 'base_mnu', 'base_w_wa', 'base_mnu_w_wa'}
    assert 'm_ncdm' in CONFIGS['base_mnu_w_wa'] and 'w0_fld' in CONFIGS['base_mnu_w_wa']
    assert 'm_ncdm' not in CONFIGS['base_w_wa']
    cosmo = build_cosmology('eisenstein_hu', 'base_w_wa')
    update_params, reparam = make_reparam(cosmo, list(CONFIGS['base_w_wa']))
    params = update_params(CONFIGS['base_w_wa'])
    assert 'h' not in params and params['theta_MC_100'] == (1.02, 1.06)


def test_residual_plot_helpers(tmp_path):
    pytest.importorskip('matplotlib')
    from cosmoprimo_tpu.emulators import Samples
    from cosmoprimo_tpu.emulators.plotting import plot_residual_thermodynamics
    # reference samples with one NaN row (failed evaluation) and an emulated
    # Samples (column-served) prediction source
    ref = Samples({'X.omega_cdm': np.array([0.11, 0.12, 0.13]),
                   'Y.thermodynamics.rs_drag': np.array([148.0, np.nan, 146.0])})
    emu = Samples({'X.omega_cdm': np.array([0.11, 0.12, 0.13]),
                   'Y.thermodynamics.rs_drag': np.array([148.1, 147.0, 145.8])})
    fig = plot_residual_thermodynamics(ref, emu, fn=str(tmp_path / 'thermo.png'))
    assert (tmp_path / 'thermo.png').exists()


def test_batch_vmap():
    from cosmoprimo_tpu.emulators import batch_vmap
    x = jnp.arange(10.0)
    fn = lambda v: {'sq': v ** 2, 'lin': 3 * v}
    out = batch_vmap(fn, batch_size=3)(x)
    np.testing.assert_allclose(np.asarray(out['sq']), np.arange(10.0) ** 2)
    np.testing.assert_allclose(np.asarray(out['lin']), 3 * np.arange(10.0))
    # no batching path and pytree args
    out2 = batch_vmap(lambda a, b: a + b['y'])(x, {'y': 2 * x})
    np.testing.assert_allclose(np.asarray(out2), 3 * np.arange(10.0))


def test_sampler_reparam():
    # X columns record sampled coordinates; calculator sees reparam(X)
    def reparam(X):
        X = dict(X)
        X['b'] = X.pop('bp') - 1.0
        return X
    sampler = QMCSampler(toy_calculator, {'a': (0.8, 1.2), 'bp': (0.9, 1.1)},
                         engine='rqrs', reparam=reparam)
    samples = sampler.run(niterations=8)
    assert 'X.bp' in samples and 'X.b' not in samples
    truth = toy_calculator(a=float(samples['X.a'][0]), b=float(samples['X.bp'][0]) - 1.0)
    np.testing.assert_allclose(np.asarray(samples['Y.y'][0]), truth['y'])


def test_fourier_norm_operation_roundtrip():
    # forward + inverse of the pk factorization recovers the tables
    from cosmoprimo_tpu.emulators import FourierNormOperation
    c = Cosmology(engine='eisenstein_hu', omega_cdm=0.12, omega_b=0.02237, h=0.6736,
                  A_s=2.083e-9, n_s=0.9649)
    state = get_calculator(c, section=['fourier'])(omega_cdm=0.12)
    v = {name: np.asarray(val) for name, val in state.items() if val is not None}
    op = FourierNormOperation()
    op.initialize(v)
    X = {'omega_cdm': 0.12, 'omega_b': 0.02237, 'h': 0.6736, 'A_s': 2.083e-9, 'n_s': 0.9649}
    w = op(dict(v), X=X)
    # the normalized reference spectrum is O(1) (primordial factored out)
    ref = np.asarray(w['fourier.pk.delta_cb.delta_cb'])
    assert ref.ndim == 1 and np.all(ref > 0) and ref.max() / ref.min() < 1e4
    u = op.inverse(dict(w), X=X)
    k = v['fourier.k']
    sel = (k > 1e-3) & (k < 10)
    for name in ['fourier.pk.delta_m.delta_m', 'fourier.pk.delta_cb.delta_cb']:
        np.testing.assert_allclose(u[name][sel], v[name][sel], rtol=1e-4)


@pytest.mark.slow
def test_train_boltzmann_cli(tmp_path):
    # end-to-end sample -> fit through the CLI entry (tiny shapes)
    from cosmoprimo_tpu.emulators.train.train_boltzmann import main
    out = str(tmp_path)
    main(['--todo', 'sample', '--engine', 'eisenstein_hu', '--config', 'base',
          '--section', 'thermodynamics', '--stop', '6', '--outdir', out])
    fn = tmp_path / 'eisenstein_hu_base' / 'samples.npy'
    assert fn.exists()
    s = Samples.read(str(fn))
    assert s.size == 6 and 'Y.thermodynamics.rs_drag' in s
    main(['--todo', 'fit', '--engine', 'eisenstein_hu', '--config', 'base',
          '--section', 'thermodynamics', '--epochs', '3', '--outdir', out])
    emu_fn = tmp_path / 'eisenstein_hu_base' / 'emulator.npy'
    assert emu_fn.exists()
    emu = Emulator.read(str(emu_fn))
    pred = emu.predict({name: 0.5 * (lo + hi) for name, (lo, hi) in
                        __import__('cosmoprimo_tpu.emulators.train.train_boltzmann',
                                   fromlist=['CONFIGS']).CONFIGS['base'].items()})
    assert np.isfinite(np.asarray(pred['thermodynamics.rs_drag']))


def test_jaxmapse_conversion(tmp_path):
    """Convert a synthetic jaxmapse-format (jaxace) Pk network and verify
    the prediction against a manual numpy forward pass of the foreign net
    (VERDICT round 2: per-format synthetic round-trip)."""
    import json
    from cosmoprimo_tpu.emulators.conversion import convert_jaxmapse_to_cosmoprimo

    rng = np.random.default_rng(7)
    n_in, hidden, n_out = 5, [16], 32
    sizes = [n_in] + hidden + [n_out]
    weights, raw = [], []
    for i in range(len(sizes) - 1):
        W = rng.normal(size=(sizes[i + 1], sizes[i])) * 0.3
        b = rng.normal(size=sizes[i + 1]) * 0.1
        raw.append((W, b))
        weights.append(W.ravel(order='F'))
        weights.append(b)
    nn_dict = {'n_input_features': n_in, 'n_output_features': n_out,
               'layers': {'layer_1': {'n_neurons': hidden[0], 'activation_function': 'silu'}}}
    d = tmp_path / 'plin'
    d.mkdir()
    np.save(d / 'weights.npy', np.concatenate(weights))
    inminmax = np.stack([np.full(n_in, -1.0), np.full(n_in, 3.0)], axis=-1)
    outminmax = np.stack([np.full(n_out, 2.0), np.full(n_out, 6.0)], axis=-1)
    np.save(d / 'nminmax.npy', inminmax)
    np.save(d / 'outminmax.npy', outminmax)
    np.save(d / 'k.npy', np.geomspace(1e-4, 10.0, n_out))
    with open(d / 'nn_setup.json', 'w') as f:
        json.dump(nn_dict, f)

    emu = convert_jaxmapse_to_cosmoprimo(tmp_path)
    assert 'fourier.pk.delta_cb.delta_cb' in emu.engines
    assert np.allclose(np.asarray(emu.fixed['fourier.k']), np.geomspace(1e-4, 10.0, n_out))
    X = {'logA': 3.0, 'n_s': 0.96, 'H0': 67.0, 'omega_b': 0.022, 'omega_cdm': 0.12}
    pred = np.asarray(emu.predict(X)['fourier.pk.delta_cb.delta_cb'])
    # manual foreign forward: minmax-normalize, dense->silu->dense, denorm
    x = np.array([X[p] for p in ['logA', 'n_s', 'H0', 'omega_b', 'omega_cdm']])
    h = (x - inminmax[:, 0]) / (inminmax[:, 1] - inminmax[:, 0])
    (W0, b0), (W1, b1) = raw
    h = W0 @ h + b0
    h = h / (1 + np.exp(-h))
    h = W1 @ h + b1
    expected = h * (outminmax[:, 1] - outminmax[:, 0]) + outminmax[:, 0]
    np.testing.assert_allclose(pred, expected, rtol=1e-10)


def _cosmopower_net(rng, n_in, n_out):
    """Synthetic cosmopower network arrays + its numpy forward pass."""
    W0, b0 = rng.normal(size=(n_in, 12)) * 0.3, rng.normal(size=12) * 0.1
    W1, b1 = rng.normal(size=(12, n_out)) * 0.3, rng.normal(size=n_out) * 0.1
    a0, be0 = rng.normal(size=12), rng.normal(size=12)

    def forward(x):
        h = x @ W0 + b0
        h = (be0 + (1 - be0) / (1 + np.exp(-a0 * h))) * h
        return h @ W1 + b1

    arrays = dict(n_layers=2, W_0=W0, b_0=b0, W_1=W1, b_1=b1, alphas_0=a0, betas_0=be0)
    return arrays, forward


def test_cosmopower_jense2024_release(tmp_path):
    """Convert a synthetic cosmopower_jense2024-layout release directory
    ('v2': networks/*Cl_tt*, *derived*) and verify the Cl against the
    foreign net's numpy forward pass plus the published serving
    conventions (10**, ell(ell+1)/2pi removal, ell = 0, 1 rows), and the
    packed derived vector unpacked with rs_drag, rs_star in Mpc/h."""
    from cosmoprimo_tpu.emulators.conversion import convert_cosmopower_release_to_cosmoprimo

    rng = np.random.default_rng(11)
    d = tmp_path / 'cosmopower_jense2024_base' / 'networks'
    d.mkdir(parents=True)
    n_in, n_ell = 6, 40
    params = ['ombh2', 'omch2', 'H0', 'logA', 'ns', 'tau']
    cl_arrays, cl_forward = _cosmopower_net(rng, n_in, n_ell)
    xmean, xstd = np.linspace(0.5, 1.5, n_in), np.full(n_in, 0.2)
    ymean, ystd = np.full(n_ell, -10.0), np.full(n_ell, 0.5)
    np.savez(d / 'jense_Cl_tt_net.npz', parameters=np.array(params),
             param_train_mean=xmean, param_train_std=xstd,
             feature_train_mean=ymean, feature_train_std=ystd, **cl_arrays)
    n_der = 10  # thetastar..N_eff packed vector
    der_arrays, der_forward = _cosmopower_net(rng, n_in, n_der)
    dmean, dstd = np.linspace(1.0, 10.0, n_der), np.full(n_der, 0.3)
    np.savez(d / 'jense_derived_net.npz', parameters=np.array(params),
             param_train_mean=xmean, param_train_std=xstd,
             feature_train_mean=dmean, feature_train_std=dstd, **der_arrays)

    emu = convert_cosmopower_release_to_cosmoprimo(tmp_path / 'cosmopower_jense2024_base')
    assert set(emu.engines) == {'harmonic.lensed_cl.tt', 'thermodynamics.all'}
    # parameter renames: ombh2 -> omega_b etc., H0 -> h
    assert 'h' in emu.engines['harmonic.lensed_cl.tt'].params
    X = {'omega_b': 0.022, 'omega_cdm': 0.12, 'h': 0.67, 'logA': 3.0,
         'n_s': 0.96, 'tau_reio': 0.055}
    names = emu.engines['harmonic.lensed_cl.tt'].params
    pred = emu.predict({name: X[name] for name in names})
    cl = np.asarray(pred['harmonic.lensed_cl.tt'])
    assert cl.shape == (n_ell + 2,) and np.all(cl[:2] == 0)
    # manual foreign forward with the release's serving conventions
    x = np.array([X[name] for name in names])
    xh = np.array(x)
    xh[names.index('h')] *= 100.0  # network was trained on H0
    xn = (np.where(np.array(names) == 'h', x * 100.0, x) - xmean) / xstd
    raw = cl_forward(xn) * ystd + ymean
    ells = np.arange(n_ell + 2)
    factor = (ells * (ells + 1))[2:] / (2 * np.pi)
    np.testing.assert_allclose(cl[2:], 10.0 ** raw / factor, rtol=1e-10)

    # derived unpacking through the emulator-level typed operation: predict
    # applies the SplitDerivedOperation inverse itself
    out = {name: np.asarray(value)
           for name, value in emu.predict({name: X[name] for name in names}).items()}
    raw_der = der_forward(xn) * dstd + dmean
    np.testing.assert_allclose(out['thermodynamics.z_star'], raw_der[5], rtol=1e-10)
    np.testing.assert_allclose(out['thermodynamics.rs_drag'], raw_der[8] * X['h'], rtol=1e-10)
    assert 'thermodynamics.all' not in out


def test_cosmopower_bolliet2023_release(tmp_path):
    """The 'v1' (bolliet2023) layout: folder structure, arr_0-wrapped dicts,
    log10 derived vector with the v1 index map, Pk in Mpc units converted
    back to Mpc/h by the typed FourierUnitOperation."""
    from cosmoprimo_tpu.emulators.conversion import convert_cosmopower_release_to_cosmoprimo

    rng = np.random.default_rng(13)
    base = tmp_path / 'cosmopower_bolliet2023_base'
    (base / 'PK').mkdir(parents=True)
    (base / 'derived-parameters').mkdir()
    n_in = 4
    params = ['ombh2', 'omch2', 'H0', 'logA']
    xmean, xstd = np.linspace(0.5, 1.5, n_in), np.full(n_in, 0.2)
    n_k = 500
    pk_arrays, pk_forward = _cosmopower_net(rng, n_in, n_k)
    ymean, ystd = np.full(n_k, 3.0), np.full(n_k, 0.4)
    state = dict(parameters=np.array(params), param_train_mean=xmean, param_train_std=xstd,
                 feature_train_mean=ymean, feature_train_std=ystd, **pk_arrays)
    np.savez(base / 'PK' / 'PKL_net.npz', arr_0=np.array(state, dtype=object))
    n_der = 14
    der_arrays, der_forward = _cosmopower_net(rng, n_in, n_der)
    dmean, dstd = np.linspace(0.1, 2.0, n_der), np.full(n_der, 0.1)
    state = dict(parameters=np.array(params), param_train_mean=xmean, param_train_std=xstd,
                 feature_train_mean=dmean, feature_train_std=dstd, **der_arrays)
    np.savez(base / 'derived-parameters' / 'DER_net.npz', arr_0=np.array(state, dtype=object))

    emu = convert_cosmopower_release_to_cosmoprimo(base, version='1')
    assert set(emu.engines) == {'fourier.pk.delta_m.delta_m', 'thermodynamics.all'}
    assert emu.defaults == {'A_b': 3.0, 'eta_b': 0.75, 'logT_AGN': 7.8}
    names = emu.engines['fourier.pk.delta_m.delta_m'].params
    X = {'omega_b': 0.022, 'omega_cdm': 0.12, 'h': 0.67, 'logA': 3.0}
    # predict merges the fixed k grid and applies the dict yoperations
    # (FourierUnitOperation, SplitDerivedOperation) itself
    out = {name: np.asarray(value) for name, value in emu.predict({n: X[n] for n in names}).items()}
    # foreign forward: 10**(denormalized net), in Mpc^3 at k [1/Mpc]
    xn = (np.where(np.array(names) == 'h',
                   np.array([X[n] for n in names]) * 100.0,
                   np.array([X[n] for n in names])) - xmean) / xstd
    pk_mpc = 10.0 ** (pk_forward(xn) * ystd + ymean)
    np.testing.assert_allclose(out['fourier.pk.delta_m.delta_m'], pk_mpc * X['h'] ** 3, rtol=1e-9)
    np.testing.assert_allclose(out['fourier.k'], np.geomspace(1e-4, 50.0, 5000)[::10] / X['h'], rtol=1e-12)
    # v1 derived: log10-packed, indices 10-13
    raw_der = 10.0 ** (der_forward(xn) * dstd + dmean)
    np.testing.assert_allclose(out['thermodynamics.z_drag'], raw_der[12], rtol=1e-9)
    np.testing.assert_allclose(out['thermodynamics.rs_star'], raw_der[11] * X['h'], rtol=1e-9)


def test_converted_release_roundtrips_disk(tmp_path):
    """A converted release emulator survives write -> read with its typed
    dict operations (SplitDerivedOperation / FourierUnitOperation) intact."""
    from cosmoprimo_tpu.emulators.conversion import convert_cosmopower_release_to_cosmoprimo

    rng = np.random.default_rng(17)
    d = tmp_path / 'cosmopower_jense2024_base' / 'networks'
    d.mkdir(parents=True)
    params = ['ombh2', 'omch2', 'H0', 'logA']
    arrays, _ = _cosmopower_net(rng, 4, 10)
    np.savez(d / 'x_derived.npz', parameters=np.array(params),
             param_train_mean=np.zeros(4), param_train_std=np.ones(4),
             feature_train_mean=np.zeros(10), feature_train_std=np.ones(10), **arrays)
    emu = convert_cosmopower_release_to_cosmoprimo(tmp_path / 'cosmopower_jense2024_base')
    fn = str(tmp_path / 'emu.npy')
    emu.write(fn)
    emu2 = Emulator.read(fn)
    ops = [type(op).__name__ for op in emu2.yoperations]
    assert 'SplitDerivedOperation' in ops
    X = {'omega_b': 0.022, 'omega_cdm': 0.12, 'h': 0.7, 'logA': 3.0}
    out = {'thermodynamics.all': np.arange(10.0)}
    for op in emu2.yoperations[::-1]:
        out = op.inverse(out, X=X)
    np.testing.assert_allclose(out['thermodynamics.rs_drag'], 8.0 * 0.7)
