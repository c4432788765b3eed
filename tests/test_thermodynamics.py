"""Native recombination thermodynamics vs external truth.

Anchors:
- CLASS v3.1.1 background table for the AbacusSummit base cosmology
  (= the DESI fiducial), archived by the reference at
  cosmoprimo/tests/fiducial/abacus_cosm000_CLASSv3.1.1.00_background.dat
  (provenance: CLASS output shipped in the cosmodesi/cosmoprimo test
  suite); rows downsampled into CLASS_BACKGROUND below.
- Planck 2018 (arXiv:1807.06209, table 2, TT,TE,EE+lowE+lensing) published
  z_drag = 1059.94 and z_* = 1089.92 for the same parameter values.

The reference itself cannot produce any of these numbers without CLASS or
CAMB installed; its analytic engines use EH98/HS96 fits (rs_drag ~2% off
CLASS truth). The native engine must land within a few 1e-3.
"""

import jax
import numpy as np
import pytest

from cosmoprimo_tpu.fiducial import DESI

# (z, conformal time [Mpc], H [1/Mpc], comoving sound horizon [Mpc])
CLASS_BACKGROUND = np.array([
    (100000.00, 4.596110e+00, 2.194010e+04, 2.649093e+00),
    (10000.00, 4.295764e+01, 2.498324e+02, 2.440443e+01),
    (3000.00, 1.255238e+02, 2.838580e+01, 6.900153e+01),
    (1500.00, 2.199686e+02, 8.787154e+00, 1.162359e+02),
    (1089.90, 2.804663e+02, 5.212027e+00, 1.444356e+02),
    (1059.94, 2.863443e+02, 4.982105e+00, 1.470933e+02),
    (800.00, 3.516321e+02, 3.171872e+00, 1.756710e+02),
    (200.00, 8.808277e+02, 3.693542e-01, 3.566346e+02),
    (10.00, 4.519814e+03, 4.612339e-03, 8.409045e+02),
    (1.00, 1.075071e+04, 4.024144e-04, 1.131928e+03),
    (0.00, 1.415325e+04, 2.246888e-04, 1.222239e+03),
])
ETA0_CLASS = 1.415325e+04  # Mpc

Z_DRAG_PLANCK = 1059.94
Z_STAR_PLANCK = 1089.92
# CLASS comoving sound horizon at the Planck z_drag, from the table above
RS_DRAG_CLASS = 1.470933e2 * 0.6736  # Mpc/h = 99.082 (2 Mpc/h below HS96 fit)


@pytest.fixture(scope='module')
def cosmo():
    return DESI(engine='native')


def test_background_vs_class_table(cosmo):
    """H(z), chi(z) and rs(z) against the archived CLASS background."""
    ba = cosmo.get_background()
    h = float(cosmo['h'])
    z = CLASS_BACKGROUND[:, 0]
    H_class = CLASS_BACKGROUND[:, 2]
    H_ours = np.asarray(ba.hubble_function(z)) / 299792.458  # km/s/Mpc -> 1/Mpc
    np.testing.assert_allclose(H_ours, H_class, rtol=5e-5)

    # chi / rs checked inside the background tables' z-range (z <= 3000)
    sel = (z > 0) & (z <= 3000)
    chi_class = (ETA0_CLASS - CLASS_BACKGROUND[:, 1]) * h  # Mpc/h
    chi_ours = np.asarray(ba.comoving_radial_distance(z[sel]))
    np.testing.assert_allclose(chi_ours, chi_class[sel], rtol=5e-5)

    # rs over the recombination-relevant range (the romberg tolerance is
    # tuned for the pre/near-recombination epoch, not z ~ 0)
    sel = (z >= 200) & (z <= 3000)
    rs_class = CLASS_BACKGROUND[:, 3] * h  # Mpc/h
    rs_ours = np.array([float(ba.rs(zz)) for zz in z[sel]])
    np.testing.assert_allclose(rs_ours, rs_class[sel], rtol=1e-4)


def test_thermodynamics_scalars(cosmo):
    th = cosmo.get_thermodynamics()
    # recombination / drag epochs within 0.2% of the published CLASS/CAMB
    # values for this cosmology (EH98's z_drag fit is ~1% off, HS96 ~0.5%)
    assert abs(float(th.z_drag) - Z_DRAG_PLANCK) < 2.0
    assert abs(float(th.z_star_noreion) - Z_STAR_PLANCK) < 2.5
    # sound horizon at drag: CLASS truth, NOT the EH/HS fit (those are ~2% high)
    assert abs(float(th.rs_drag) / RS_DRAG_CLASS - 1.0) < 1.5e-3
    # reionization: tanh history reproducing tau_reio; Planck-like z_reio
    assert abs(float(th.tau_reio) - float(cosmo['tau_reio'])) < 1e-6
    assert 7.0 < float(th.z_reio) < 9.0
    # freeze-out and reionized electron fractions
    x0 = float(th.x_e(0.0))
    assert 1.1 < x0 < 1.25  # 1 + 2 f_He: H + doubly reionized He today
    xrec = float(np.asarray(th.table.x_e_rec)[-1])
    assert 1.0e-4 < xrec < 3.5e-4
    # matter temperature: tracks T_gamma tightly before decoupling, then a^-2
    assert abs(float(th.T_b(800.0)) / (2.7255 * 801.0) - 1.0) < 1e-2
    assert float(th.T_b(0.0)) < 0.1


def test_thermodynamics_history_shape(cosmo):
    """x_e is monotone through recombination and the visibility epoch is
    where it should be."""
    th = cosmo.get_thermodynamics().table
    z = np.asarray(th.z_grid)
    xe = np.asarray(th.x_e_rec)
    band = (z > 500) & (z < 2500)
    # the grid runs early -> today, so x_e decreases along the array
    # (up to the < 1e-4 Saha -> ODE handoff kink at z ~ 1560)
    assert np.all(np.diff(xe[band]) <= 1e-4)
    # half-ionization close to z ~ 1200 (Saha-shifted by the bottleneck)
    zhalf = np.interp(-0.5, -xe[band], z[band])
    assert 1150 < zhalf < 1350


def test_thermodynamics_contracts(cosmo):
    """jit / vmap / jacfwd through the full recombination scan."""
    from cosmoprimo_tpu.boltzmann import compute_thermodynamics
    import jax.numpy as jnp

    ba = cosmo.get_background()

    def rs_drag_of(omega_b):
        th = compute_thermodynamics(omega_b, 0.6736, 2.7255, ba.efunc, tau_reio=0.0544)
        return th.z_drag

    z1 = float(jax.jit(rs_drag_of)(0.02237))
    assert abs(z1 - Z_DRAG_PLANCK) < 2.5
    zb = jax.vmap(rs_drag_of)(jnp.array([0.021, 0.02237, 0.024]))
    assert np.all(np.isfinite(np.asarray(zb)))
    # more baryons -> earlier drag release (z_drag increases with omega_b)
    assert float(zb[2]) > float(zb[0])
    g = float(jax.jacfwd(rs_drag_of)(0.02237))
    assert np.isfinite(g) and g > 0.0
