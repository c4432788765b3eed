"""Anchor the non-linear stack against the structurally independent scipy
oracle (tests/scipy_oracle.py) plus literature bands.

The oracle shares no numerics with the JAX path (adaptive quad vs static
trapezoid matmuls, brentq vs fixed-depth Newton-on-spline, solve_ivp vs
rk4-on-scan, scipy.ndimage smoothing vs smoothing matmul, Python loops vs
einsum/vmap) — agreement pins every implementation choice.  The literature
bands (non-linear scale, effective index, curvature, boost factors for a
Planck-like cosmology) are coefficient-sensitive: a sign error in a single
fitted coefficient of Takahashi 2012 / Mead 2021 moves the boost by tens of
percent and escapes the wide band.
"""

import numpy as np
import pytest

from cosmoprimo_tpu.cosmology import Cosmology

from scipy_oracle import growth_scipy, halofit_scales_scipy, halofit_scipy, hmcode_scipy

PARAMS = dict(omega_cdm=0.11933, omega_b=0.02242, h=0.6736, A_s=2.105e-9, n_s=0.9649)


@pytest.fixture(scope='module')
def cosmo():
    return Cosmology(engine='eisenstein_hu', **PARAMS)


@pytest.fixture(scope='module')
def linear(cosmo):
    k = np.geomspace(1e-5, 1e2, 1024)
    pk2d = cosmo.get_fourier().pk_interpolator()
    return k, {z: np.asarray(pk2d(k, z)) for z in (0.0, 1.0)}


def test_halofit_vs_scipy_oracle(cosmo, linear):
    from cosmoprimo_tpu.models.halofit import halofit
    import jax.numpy as jnp
    k, pks = linear
    ba = cosmo.get_background()
    for z in (0.0, 1.0):
        zz = jnp.array([float(z)])
        ours = np.asarray(halofit(jnp.asarray(k), jnp.asarray(pks[z])[:, None],
                                  ba.Omega_m(zz), ba.Omega_de(zz), jnp.array([-1.0])))[:, 0]
        oracle = halofit_scipy(k, pks[z], float(ba.Omega_m(zz)[0]),
                               float(ba.Omega_de(zz)[0]), -1.0)
        band = (k > 1e-3) & (k < 50.0)
        np.testing.assert_allclose(ours[band], oracle[band], rtol=2e-3)


def test_halofit_scales_literature_bands(linear):
    """k_sigma, n_eff, C at z = 0 for a Planck-like (sigma8 ~ 0.83)
    cosmology land in the physically sensible ranges: the Gaussian-window
    non-linear scale k_sigma ~ 0.25-0.5 h/Mpc, the effective index at
    collapse n_eff ~ -(2.2-1.4) (the local power-law slope near k ~ 1/3
    h/Mpc), curvature C ~ 0.2-0.5.  Wide, but any single sign/coefficient
    error in the sigma^2 window or the root-find moves these far out."""
    k, pks = linear
    ksigma, neff, C = halofit_scales_scipy(k, pks[0.0])
    assert 0.25 < ksigma < 0.5
    assert -2.2 < neff < -1.4
    assert 0.2 < C < 0.5


def test_halofit_boost_literature_bands(cosmo, linear):
    """Absolute boost bands: for sigma8 ~ 0.83 at z = 0 the non-linear
    enhancement P_NL/P_L is ~1.2-2 at k = 0.3, ~3-8.5 at k = 1, tens at
    k = 10; weaker at z = 1 and ~1 (within the percent-level exp(-f(y))
    quasi-linear damping) at k = 0.01.  Broad, but a sign flip in any
    single halofit coefficient (a_n, b_n, c_n, gamma, alpha, beta) breaks
    at least one."""
    from cosmoprimo_tpu.models.halofit import halofit
    import jax.numpy as jnp
    k, pks = linear
    ba = cosmo.get_background()

    def boost(z, ktest):
        zz = jnp.array([float(z)])
        nl = np.asarray(halofit(jnp.asarray(k), jnp.asarray(pks[z])[:, None],
                                ba.Omega_m(zz), ba.Omega_de(zz), jnp.array([-1.0])))[:, 0]
        i = int(np.argmin(np.abs(k - ktest)))
        return nl[i] / pks[z][i]

    assert 1.1 < boost(0.0, 0.3) < 2.0
    assert 3.0 < boost(0.0, 1.0) < 8.5
    assert 15.0 < boost(0.0, 10.0) < 90.0
    assert boost(1.0, 1.0) < boost(0.0, 1.0)
    assert abs(boost(0.0, 0.01) - 1.0) < 0.012


def test_growth_vs_scipy_oracle():
    from cosmoprimo_tpu.models.hmcode import mead_growth_ratios
    import jax.numpy as jnp
    g_fn, G_fn = growth_scipy(0.3)
    z = np.array([0.0, 0.5, 1.0, 2.0])
    a = 1.0 / (1.0 + z)
    x, y = mead_growth_ratios(jnp.asarray(z), 0.3)
    # tolerance budget: the traced path solves on a 64-step ln a grid
    # (Magnus discretization ~2e-4) and linearly interpolates u = g/a
    # between nodes; the Mead fits feel that at the sub-permille level on
    # Delta_v — far below the fit's own accuracy. The anchor still checks
    # a ~22% physical deviation from EdS (x ~ 0.78) against scipy's ODE.
    np.testing.assert_allclose(np.asarray(x), g_fn(a) / a, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(y), G_fn(a) / a, rtol=1e-3)


@pytest.mark.slow
def test_hmcode_vs_scipy_oracle(cosmo, linear):
    from cosmoprimo_tpu.models.hmcode import hmcode_pk_interpolator
    k, pks = linear
    fo = cosmo.get_fourier()
    h = PARAMS['h']
    omega_m = float(np.asarray(cosmo['Omega_m'])) * h ** 2
    for z, logT in ((0.0, None), (1.0, None), (0.0, 7.8)):
        params = dict(fo._hm_params)
        if logT is not None:
            params['logT_AGN'] = logT
        pk2d = fo.pk_interpolator(z=np.array([z]))
        ours = np.asarray(hmcode_pk_interpolator(pk2d, cosmo.get_background(), params)(k, z))
        oracle = hmcode_scipy(k, pks[z], z, omega_m / h ** 2, omega_m,
                              PARAMS['omega_b'], h, 2.7255 / 2.7, PARAMS['n_s'],
                              logT_AGN=logT)
        band = (k > 1e-3) & (k < 20.0)
        err = np.abs(ours[band] / oracle[band] - 1).max()
        assert err < 0.03, f'z={z} logT={logT}: max rel dev {err:.4f}'


def test_hmcode_boost_literature_bands(cosmo):
    """HMcode-2020 tracks halofit to tens of percent on quasi/mid
    non-linear scales for LCDM (the two are independent fits to overlapping
    simulation suites) — combined with the halofit absolute bands above
    this anchors the HMcode amplitude too."""
    fo = cosmo.get_fourier()
    z = np.array([0.0])
    k = np.geomspace(0.05, 10.0, 64)
    lin = np.asarray(fo.pk_interpolator(z=z)(k, 0.0))
    hm = np.asarray(fo.pk_interpolator(non_linear='mead', z=z)(k, 0.0))
    boost = hm / lin
    i1 = int(np.argmin(np.abs(k - 1.0)))
    assert 3.0 < boost[i1] < 5.5
    i03 = int(np.argmin(np.abs(k - 0.3)))
    assert 1.0 < boost[i03] < 1.7
