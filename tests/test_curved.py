"""Non-flat geometries through the native Boltzmann engine.

The reference only reaches curved linear P(k) through an external CLASS
build (its analytic engines carry curved BACKGROUNDS only:
/root/reference/cosmoprimo/cosmology.py Omega_k handling); no curved
truth table ships in-image. Validation therefore uses structurally
independent anchors:

- flat continuity (Omega_k -> 0 reproduces the flat solve);
- the background growth-factor ODE (cosmology.py _growth_tables: Magnus
  2x2 propagators on Omega_m(z)/Omega_k(z)/Omega_de(z), a completely
  separate code path from the Boltzmann hierarchy) against the solver's
  sub-horizon P(k, z) ratios, for open and closed models;
- curved background distances are already parity-tested against the
  reference library (test_reference_parity).
"""

import numpy as np
import pytest

from cosmoprimo_tpu import Cosmology, CosmologyInputError
from cosmoprimo_tpu.fiducial import DESI

# smallest stable step tier (kmax <= 0.9/Mpc) keeps CI tractable
KW = dict(engine='native', kmax_pk=0.6, extra_params={'nk_pk': 48})
K_GRID = np.geomspace(1e-3, 0.5, 24)


@pytest.fixture(scope='module')
def flat_pk():
    cosmo = DESI(**KW)
    return np.asarray(cosmo.get_fourier().pk_interpolator()(K_GRID, z=0.0))


@pytest.mark.slow
def test_flat_continuity(flat_pk):
    # Omega_k = 0 passed explicitly is bit-exact with the flat default;
    # an infinitesimal Omega_k only moves binary branch thresholds
    # (TCA/Poisson-pin/RSA switches) by a ULP, bounded at the few-1e-4
    # level (scripts/dev_curved.py measured 4e-4 at Omega_k = 1e-9,
    # NON-monotone in Omega_k - branch noise, not amplification)
    pk0 = np.asarray(DESI(Omega_k=0.0, **KW).get_fourier().pk_interpolator()(K_GRID, z=0.0))
    np.testing.assert_allclose(pk0, flat_pk, rtol=1e-12)
    pk_eps = np.asarray(DESI(Omega_k=1e-9, **KW).get_fourier().pk_interpolator()(K_GRID, z=0.0))
    np.testing.assert_allclose(pk_eps, flat_pk, rtol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize('Omega_k', [0.05, -0.05, 0.1])
def test_curved_growth_vs_background_ode(Omega_k):
    """P(k, z=1)/P(k, z=0) at sub-horizon k (where radiation/neutrino
    scale dependence is < 0.5%) must match the independent background
    growth ODE for open and closed models."""
    cosmo = DESI(Omega_k=Omega_k, **KW)
    fo = cosmo.get_fourier()
    pk0 = np.asarray(fo.pk_interpolator()(K_GRID, z=0.0))
    pk1 = np.asarray(fo.pk_interpolator()(K_GRID, z=1.0))
    D_ode = float(np.asarray(cosmo.get_background().growth_factor(1.0)))
    ksub = (K_GRID > 0.05) & (K_GRID < 0.3)
    D_solver = np.sqrt(pk1 / pk0)[ksub]
    # scale-independence of the ratio on the sub-horizon window
    assert D_solver.std() / D_solver.mean() < 5e-3
    assert abs(D_solver.mean() / D_ode - 1.0) < 1e-2, (D_solver.mean(), D_ode)


@pytest.mark.slow
def test_curved_pk_shape_is_sane():
    """Open/closed P(k) bracket the flat one in amplitude at fixed As
    (less/more growth), and sigma8 responds monotonically to Omega_k."""
    s8 = {}
    for ok in (-0.05, 0.0, 0.05):
        cosmo = DESI(Omega_k=ok, **KW) if ok else DESI(**KW)
        s8[ok] = float(np.asarray(cosmo.get_fourier().sigma8_m))
        assert np.isfinite(s8[ok]) and 0.3 < s8[ok] < 1.5
    assert s8[-0.05] != s8[0.0] != s8[0.05]
    # monotone in Omega_k at fixed (omega_b, omega_cdm, H0, As)
    assert (s8[-0.05] - s8[0.0]) * (s8[0.0] - s8[0.05]) > 0


@pytest.mark.slow
def test_curved_transfers_vs_bdf_oracle():
    """Anchor the curved transfer path to the structurally independent
    stiff-BDF oracle (tests/boltzmann_oracle.py), which now integrates the
    exact Hu & Eisenstein 1998 curved constraints with NO tight-coupling
    approximation, no RSA switch, no Poisson pin and no closed-model
    clamps.  Two assertions per geometry at k in {0.05, 0.2} h/Mpc, z = 0:

    - direct parity of delta_cdm (production vs oracle) within 1.2e-2 —
      the bound is set by the shared FLAT-limit late-time residual
      (measured -0.1%/-0.75%, identical in all three geometries: the
      oracle's own lmax=24 free-streaming truncation at k eta_0 >> lmax);
    - the pure curvature RESPONSE, curved/flat transfer ratio, within
      2e-3 (measured 2e-4) — this cancels the shared truncation residual
      and is the discriminating test: a k-dependent curvature error in the
      production solver's s_l/G2/s2sq terms cannot hide in it."""
    import jax.numpy as jnp
    from cosmoprimo_tpu.boltzmann import perturbations as P
    from boltzmann_oracle import run_oracle

    k_h = np.array([0.05, 0.2])
    res = {}
    for omk in (0.0, 0.05, -0.05):
        cosmo = DESI(Omega_k=omk, **KW) if omk else DESI(**KW)
        th = cosmo.get_thermodynamics().table
        pp = cosmo.engine._perturbation_params()
        k_mpc = k_h * float(cosmo['h'])
        tabs = P.build_tables(pp, th)
        eta0 = float(np.exp(np.interp(0.0, np.asarray(tabs['lna']),
                                      np.asarray(tabs['lneta']))))
        prod = np.asarray(P.linear_pk(pp, th, jnp.asarray(k_h),
                                      [0.0])['transfers']['delta_cdm'])[0]
        Hc0 = float(np.asarray(P._fetch(tabs, jnp.asarray([eta0]))['Hc'])[0])
        orc = []
        for kk in k_mpc:
            o = run_oracle(pp, th, float(kk), np.array([eta0 * (1 - 1e-9)]),
                           lmax_g=24, lmax_pol=24, lmax_ur=24)
            # Newtonian -> CDM-comoving, as the production harvest
            orc.append(float(o['dc'][0]) + 3.0 * Hc0 * float(o['tc'][0]) / kk ** 2)
        res[omk] = (prod, np.array(orc))
        np.testing.assert_allclose(prod, res[omk][1], rtol=1.2e-2)
    for omk in (0.05, -0.05):
        ratio_prod = res[omk][0] / res[0.0][0]
        ratio_orc = res[omk][1] / res[0.0][1]
        # the curvature response itself is ~5%: assert it and its parity
        assert np.all(np.abs(ratio_prod - 1.0) > 0.03)
        np.testing.assert_allclose(ratio_prod, ratio_orc, rtol=2e-3)


@pytest.mark.slow
def test_curved_harmonic_raises():
    """Beyond the certified |Omega_k| <= 0.12 window the Harmonic section
    refuses; inside it the section is served (Cl-level certification lives
    in tests/test_curved_harmonic.py)."""
    with pytest.raises(CosmologyInputError):
        DESI(Omega_k=0.2, **KW).get_harmonic()
    cosmo = DESI(Omega_k=0.05, **KW)
    cosmo.get_harmonic()  # inside the window: no raise
    # Transfer and Perturbations sections are served as well
    tr = cosmo.get_transfer().table(z=0.0)
    assert np.all(np.isfinite(np.asarray(tr['d_cdm'])))
