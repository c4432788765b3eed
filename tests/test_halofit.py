"""Native halofit (Takahashi 2012 + Bird 2012 nu-corrections) tests: the
sigma^2(R) matmul vs scipy quad, the non-linear scale root, physical
behavior of the enhancement, batching and differentiability. The reference
library has no halofit of its own (it forwards non_linear to CLASS/CAMB),
so the oracle here is the published fitting formulas + scipy integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosmoprimo_tpu.cosmology import Cosmology
from cosmoprimo_tpu.models.halofit import halofit, sigma_gauss2, _nonlinear_scale


@pytest.fixture(scope='module')
def cosmo():
    return Cosmology(engine='eisenstein_hu', omega_cdm=0.12, omega_b=0.02237, h=0.6736,
                     A_s=2.083e-9, n_s=0.9649)


@pytest.fixture(scope='module')
def lin(cosmo):
    return cosmo.get_fourier().pk_interpolator()


def test_sigma_gauss2_vs_quad(lin):
    from scipy import integrate
    k = np.asarray(lin.k)
    pk = np.asarray(lin(k, z=0.0))
    R = jnp.asarray([0.5, 2.0, 8.0])
    ours = np.asarray(sigma_gauss2(jnp.asarray(k), jnp.asarray(pk)[:, None], R))[:, 0]
    for iR, r in enumerate(np.asarray(R)):
        f = lambda lnk: np.interp(np.exp(lnk), k, k ** 3 * pk / (2 * np.pi ** 2)) \
            * np.exp(-(np.exp(lnk) * r) ** 2)
        truth, _ = integrate.quad(f, np.log(k[0]), np.log(k[-1]), limit=400)
        assert abs(ours[iR] / truth - 1) < 1e-4


def test_nonlinear_scale_is_root(lin):
    k = jnp.asarray(lin.k)
    pk = jnp.asarray(lin(lin.k, z=np.array([0.0, 1.0]), grid=True))
    R = jnp.asarray(np.geomspace(1e-3, 1e3, 128))
    sig2 = sigma_gauss2(k, pk, R)
    lnRs, neff, C = _nonlinear_scale(jnp.log(R), jnp.log(sig2))
    # re-evaluate sigma^2 exactly at the claimed root
    at_root = sigma_gauss2(k, pk, jnp.exp(lnRs))
    for iz in range(2):
        assert abs(float(at_root[iz, iz]) - 1.0) < 1e-3
    # effective slope in the physically expected range
    assert np.all(np.asarray(neff) > -3) and np.all(np.asarray(neff) < 0)
    assert np.all(np.asarray(C) > 0)


def test_halofit_physical_behavior(cosmo, lin):
    nl = cosmo.get_fourier().pk_interpolator(non_linear='halofit')
    k = np.geomspace(1e-3, 10.0, 50)
    for z, kmax_ratio in [(0.0, 10.0), (1.0, 5.0)]:
        r = np.asarray(nl(k, z=z)) / np.asarray(lin(k, z=z))
        assert np.all(np.isfinite(r)) and np.all(r > 0)
        # linear regime untouched, quasi-linear few-percent, strongly
        # non-linear strongly enhanced, all decreasing with z
        assert abs(r[0] - 1) < 2e-2
        np.testing.assert_allclose(r[k < 0.05], 1.0, atol=3e-2)
        assert 1.2 < float(np.interp(0.3, k, r)) < 2.5
        assert float(np.interp(5.0, k, r)) > kmax_ratio
    r0 = np.asarray(nl(k, z=0.0)) / np.asarray(lin(k, z=0.0))
    r1 = np.asarray(nl(k, z=1.0)) / np.asarray(lin(k, z=1.0))
    assert np.all(r0[k > 0.5] > r1[k > 0.5])
    # sigma8 enhancement ~10-15% at z=0 for a Planck-like cosmology
    boost = float(nl.sigma8_z(0.0)) / float(lin.sigma8_z(0.0))
    assert 1.05 < boost < 1.25


def test_halofit_linear_regime_passthrough():
    # tiny amplitude: sigma^2 < 1 everywhere -> 'no collapse' branch serves
    # exactly the linear spectrum
    k = np.geomspace(1e-4, 50.0, 300)
    pk = 1e-12 * k ** 0.9649 / (1 + (k / 0.1) ** 3)
    out = np.asarray(halofit(jnp.asarray(k), jnp.asarray(pk)[:, None],
                             jnp.asarray([0.3]), jnp.asarray([0.7]), jnp.asarray([-1.0])))
    np.testing.assert_allclose(out[:, 0], pk, rtol=1e-12)


def test_halofit_neutrino_correction(lin, cosmo):
    k = jnp.asarray(lin.k)
    pk = jnp.asarray(lin(lin.k, z=0.0))[:, None]
    args = (k, pk, jnp.asarray([0.316]), jnp.asarray([0.684]), jnp.asarray([-1.0]))
    p0 = np.asarray(halofit(*args, fnu=0.0))
    pnu = np.asarray(halofit(*args, fnu=0.01, Omega_m0=0.316))
    ik = np.searchsorted(np.asarray(lin.k), 1.0)
    # Bird correction suppresses/perturbs the small-scale power at the % level
    assert 1e-4 < abs(pnu[ik, 0] / p0[ik, 0] - 1) < 0.2
    ik_lin = np.searchsorted(np.asarray(lin.k), 1e-3)
    assert abs(pnu[ik_lin, 0] / p0[ik_lin, 0] - 1) < 1e-6


def test_halofit_jit_vmap_grad():
    def nl_pk(omega_cdm):
        c = Cosmology(engine='eisenstein_hu', omega_cdm=omega_cdm, omega_b=0.02237,
                      h=0.6736, A_s=2.083e-9, n_s=0.9649)
        nl = c.get_fourier().pk_interpolator(non_linear='halofit')
        return nl(jnp.asarray([0.1, 1.0]), z=0.0)

    base = jax.jit(nl_pk)(0.12)
    assert np.all(np.isfinite(np.asarray(base)))
    batch = jax.vmap(nl_pk)(jnp.linspace(0.11, 0.13, 4))
    assert batch.shape == (4, 2) and np.all(np.isfinite(np.asarray(batch)))
    np.testing.assert_allclose(np.asarray(batch[2]), np.asarray(nl_pk(float(jnp.linspace(0.11, 0.13, 4)[2]))), rtol=1e-10)
    jac = np.asarray(jax.jacfwd(nl_pk)(0.12))
    assert np.all(np.isfinite(jac)) and np.all(jac != 0)


def test_halofit_variants_engine():
    c = Cosmology(engine='eisenstein_hu_nowiggle_variants', m_ncdm=[0.06])
    fo = c.get_fourier()
    lin = fo.pk_interpolator()
    nl = fo.pk_interpolator(non_linear='halofit')
    k = np.array([1e-3, 1.0])
    r = np.asarray(nl(k, z=0.0)) / np.asarray(lin(k, z=0.0))
    assert abs(r[0] - 1) < 2e-2 and r[1] > 2.0


def test_non_linear_cosmology_param(cosmo, lin):
    # non_linear=True defers to the cosmology's calculation parameter
    c2 = cosmo.clone(non_linear='halofit')
    nl_a = c2.get_fourier().pk_interpolator(non_linear=True)
    nl_b = cosmo.get_fourier().pk_interpolator(non_linear='halofit')
    k = np.array([0.1, 1.0])
    np.testing.assert_allclose(np.asarray(nl_a(k, z=0.0)), np.asarray(nl_b(k, z=0.0)), rtol=1e-12)
    from cosmoprimo_tpu.cosmology import CosmologyInputError
    with pytest.raises(CosmologyInputError):
        cosmo.get_fourier().pk_interpolator(non_linear='no_such_transform')

def test_halofit_emulated_roundtrip(tmp_path):
    # non-linear tables flow through the emulator train->serve loop
    # (reference emulated.py pk_non_linear quantities)
    from cosmoprimo_tpu.emulators import Emulator, PointEmulatorEngine, Samples, get_calculator
    c = Cosmology(engine='eisenstein_hu', non_linear='halofit', omega_cdm=0.12, omega_b=0.02237,
                  h=0.6736, A_s=2.083e-9, n_s=0.9649)
    calc = get_calculator(c, section=['fourier'])
    s1, s2 = calc(omega_cdm=0.12), calc(omega_cdm=0.121)
    assert 'fourier.pk_non_linear.delta_m.delta_m' in s1
    data = {'X.omega_cdm': np.array([0.12, 0.121])}
    for name in s1:
        data['Y.' + name] = np.stack([np.asarray(s1[name]), np.asarray(s2[name])])
    emu = Emulator(engine=PointEmulatorEngine())
    emu.set_samples(samples=Samples(data))
    emu.fit()
    path = str(tmp_path / 'emu_nl.npy')
    emu.write(path)
    ce = Cosmology(engine='emulated', extra_params={'path': path}, omega_cdm=0.12,
                   omega_b=0.02237, h=0.6736, A_s=2.083e-9, n_s=0.9649)
    k = np.array([0.1, 1.0])
    served = np.asarray(ce.get_fourier().pk_interpolator(non_linear=True)(k, z=0.0))
    direct = np.asarray(c.get_fourier().pk_interpolator(non_linear=True)(k, z=0.0))
    np.testing.assert_allclose(served, direct, rtol=1e-10)

if __name__ == '__main__':
    import sys
    sys.exit(pytest.main([__file__, '-q']))
