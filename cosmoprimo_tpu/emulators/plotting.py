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
