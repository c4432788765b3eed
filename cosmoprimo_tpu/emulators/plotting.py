"""Residual diagnostics for trained emulators (reference parity:
emulators/plotting.py). matplotlib is optional; the compute part returns
arrays so it is usable headless."""

import numpy as np


def compute_residuals(emulator, calculator, params_box, ntest=50, seed=7):
    """Relative residuals |pred - truth| / max|truth| for each emulated
    quantity over ``ntest`` random points in ``params_box``."""
    rng = np.random.default_rng(seed)
    residuals = {}
    for _ in range(ntest):
        p = {name: rng.uniform(*box) for name, box in params_box.items()}
        truth = calculator(**p)
        pred = emulator.predict(p)
        for name in pred:
            if name not in truth:
                continue
            t, q = np.asarray(truth[name]), np.asarray(pred[name])
            if t.size == 0:
                continue
            scale = np.maximum(np.abs(t).max(), 1e-30)
            residuals.setdefault(name, []).append(np.abs(q - t) / scale)
    return {name: np.array(values) for name, values in residuals.items()}


def plot_residuals(residuals, fn=None, quantiles=(0.68, 0.95, 1.0)):
    """Plot per-quantity residual quantile bands; returns the figure
    (requires matplotlib)."""
    from matplotlib import pyplot as plt
    names = list(residuals)
    fig, axes = plt.subplots(len(names), 1, figsize=(6, 2.5 * len(names)), squeeze=False)
    for ax, name in zip(axes[:, 0], names):
        res = residuals[name]
        if res.ndim == 1:
            res = res[:, None]
        x = np.arange(res.shape[-1])
        for q in quantiles:
            ax.fill_between(x, 0, np.quantile(res, q, axis=0), alpha=0.3, label=f'{100 * q:.0f}%')
        ax.set_yscale('log')
        ax.set_title(name, fontsize=9)
        ax.legend(fontsize=7)
    fig.tight_layout()
    if fn:
        from .. import utils
        import os
        utils.mkdir(os.path.dirname(str(fn)))
        fig.savefig(fn, dpi=120)
    return fig

def _emulated_predictions(emulated_samples, X, section, take=None):
    """Predictions of ``emulated_samples`` at input points ``X``.

    ``emulated_samples`` may be a Samples (columns read directly, sliced by
    ``take`` — absolute row indices matching ``X``), a Cosmology (its
    ``section`` recomputed per point through get_calculator) or an
    Emulator/calculator. Mirrors the flexible ``emulated_samples`` argument
    of the reference's plotting helpers (emulators/plotting.py:30+).
    """
    from . import Samples, get_calculator
    if isinstance(emulated_samples, Samples) or (hasattr(emulated_samples, 'keys') and not hasattr(emulated_samples, 'get_background')):
        take = take if take is not None else slice(None)
        return {name[2:]: np.asarray(emulated_samples[name])[take] for name in emulated_samples
                if str(name).startswith('Y.')}
    from .samples import CalculatorComputationError
    calculator = get_calculator(emulated_samples, section=[section])
    npoints = len(next(iter(X.values())))
    rows = []
    for i in range(npoints):
        try:
            rows.append(calculator(**{name: float(np.asarray(value)[i]) for name, value in X.items()}))
        except CalculatorComputationError:
            rows.append(None)
    template = next(row for row in rows if row is not None)
    return {name: np.array([np.asarray(row[name]) if row is not None and row[name] is not None
                            else np.full(np.shape(template[name]), np.nan) for row in rows])
            for name in template if template[name] is not None}


def _plot_residual_section(ref_samples, emulated_samples, section, quantities=None,
                           subsample=1.0, q=(0.68, 0.95, 0.99), fn=None, relative=True):
    """Quantile bands of the (relative) emulation error per quantity of a
    section, evaluated at the reference sample points."""
    ntotal = ref_samples.size if hasattr(ref_samples, 'size') else len(next(iter(ref_samples.values())))
    finite = ref_samples.isfinite() if hasattr(ref_samples, 'isfinite') else np.ones(ntotal, dtype=bool)
    X = {name[2:]: np.asarray(ref_samples[name])[finite] for name in ref_samples if str(name).startswith('X.')}
    ref_samples = {name: np.asarray(value)[finite] for name, value in ref_samples.items()}
    npoints = len(next(iter(X.values())))
    if subsample < 1.0:
        rng = np.random.default_rng(11)
        index = np.sort(rng.choice(npoints, size=max(1, int(subsample * npoints)), replace=False))
        X = {name: value[index] for name, value in X.items()}
    else:
        index = np.arange(npoints)
    # absolute row indices into the unfiltered samples, for column-served
    # prediction sources
    take = np.flatnonzero(finite)[index]
    pred = _emulated_predictions(emulated_samples, X, section, take=take)
    residuals = {}
    for name in ref_samples:
        name = str(name)
        if not name.startswith(f'Y.{section}.'):
            continue
        qname = name[2:]
        if quantities is not None and qname[len(section) + 1:] not in quantities:
            continue
        if qname not in pred:
            continue
        truth = np.asarray(ref_samples[name])[index]
        guess = np.asarray(pred[qname])
        if truth.size == 0 or guess.shape != truth.shape:
            continue
        scale = np.maximum(np.abs(truth), 1e-30) if relative else 1.0
        residuals[qname] = np.abs(guess - truth) / scale
    return plot_residuals(residuals, fn=fn, quantiles=q)


def plot_residual_background(ref_samples, emulated_samples, quantities=None, subsample=1.0,
                             q=(0.68, 0.95, 0.99), color='C0', fn=None):
    """Background-section residual bands (reference emulators/plotting.py:30-93)."""
    return _plot_residual_section(ref_samples, emulated_samples, 'background',
                                  quantities=quantities, subsample=subsample, q=q, fn=fn)


def plot_residual_thermodynamics(ref_samples, emulated_samples, quantities=None, subsample=1.0,
                                 q=(0.68, 0.95, 0.99), color='C0', fn=None):
    """Thermodynamics-section residual bands (reference emulators/plotting.py:95-152)."""
    return _plot_residual_section(ref_samples, emulated_samples, 'thermodynamics',
                                  quantities=quantities, subsample=subsample, q=q, fn=fn)


def plot_residual_primordial(ref_samples, emulated_samples, quantities=None, subsample=1.0, fn=None):
    """Primordial-section residual bands (reference emulators/plotting.py:154-205)."""
    return _plot_residual_section(ref_samples, emulated_samples, 'primordial',
                                  quantities=quantities, subsample=subsample, fn=fn)


def plot_residual_harmonic(ref_samples, emulated_samples, quantities=None, fsky=1.0, subsample=1.0,
                           q=(0.68, 0.95, 0.99), color='C0', fn=None):
    """Cl residual bands; ``fsky`` kept for reference signature parity
    (emulators/plotting.py:207-283, which scales by cosmic variance)."""
    return _plot_residual_section(ref_samples, emulated_samples, 'harmonic',
                                  quantities=quantities, subsample=subsample, q=q, fn=fn)


def plot_residual_fourier(ref_samples, emulated_samples, quantities=None, iz=0, volume=1e9,
                          kstep=5e-3, subsample=1.0, q=(0.68, 0.95, 0.99), color='C0', fn=None):
    """pk residual bands; ``iz``/``volume``/``kstep`` kept for reference
    signature parity (emulators/plotting.py:285+, which scales by the
    Gaussian pk variance in a ``volume`` survey)."""
    return _plot_residual_section(ref_samples, emulated_samples, 'fourier',
                                  quantities=quantities, subsample=subsample, q=q, fn=fn)
