"""BASELINE-config contract tests: the batched pipelines jit/vmap/jacfwd
end to end (BASELINE.json configs #1, #2, #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from cosmoprimo_tpu.pipelines import make_distance_pipeline, make_pk_to_xi_pipeline


def test_pk_to_xi_pipeline_batch():
    fn, k, s = make_pk_to_xi_pipeline(nk=256)
    batched = jax.jit(jax.vmap(fn))
    rng = np.random.default_rng(0)
    n = 16
    args = (jnp.asarray(rng.uniform(0.11, 0.13, n)), jnp.asarray(rng.uniform(0.021, 0.023, n)),
            jnp.asarray(rng.uniform(0.65, 0.70, n)), jnp.asarray(rng.uniform(0.94, 0.98, n)),
            jnp.asarray(rng.uniform(2.9, 3.1, n)))
    xi, chi, s8 = batched(*args)
    assert np.isfinite(np.asarray(xi)).all()
    assert np.isfinite(np.asarray(chi)).all()
    assert np.all((np.asarray(s8) > 0.3) & (np.asarray(s8) < 1.5))


def test_fisher_jacfwd():
    """Config #4: Fisher derivatives of distances + pk over (omega_cdm, h,
    n_s) via one jacfwd, vmapped over a batch of cosmologies."""
    fn, zq = make_distance_pipeline()

    def observables(theta):
        omega_cdm, h, n_s = theta
        from cosmoprimo_tpu.cosmology import Cosmology
        cosmo = Cosmology(omega_cdm=omega_cdm, omega_b=0.02237, h=h, n_s=n_s,
                          logA=3.0, engine='eisenstein_hu')
        chi = cosmo.get_background().comoving_radial_distance(jnp.array([0.5, 1.0, 2.0]))
        pk = cosmo.get_fourier().pk_interpolator()(jnp.array([0.05, 0.2]), 0.5)
        return jnp.concatenate([chi, pk.ravel()])

    jac = jax.jacfwd(observables)

    rng = np.random.default_rng(1)
    thetas = jnp.asarray(np.column_stack([rng.uniform(0.11, 0.13, 4),
                                          rng.uniform(0.65, 0.70, 4),
                                          rng.uniform(0.94, 0.98, 4)]))
    J = jax.jit(jax.vmap(jac))(thetas)
    J = np.asarray(J)
    assert J.shape == (4, 5, 3)
    assert np.isfinite(J).all()
    # every parameter moves at least one observable (distances are
    # n_s-independent, so not every entry is nonzero)
    assert (np.abs(J).max(axis=1) > 0).all()
    # Fisher matrices are symmetric positive definite for invertible J^T J
    F = np.einsum('bij,bik->bjk', J, J)
    for f in F:
        evals = np.linalg.eigvalsh(f)
        assert evals.min() > 0


def test_pipeline_non_linear():
    import jax
    from cosmoprimo_tpu.pipelines import make_pk_to_xi_pipeline
    fn_lin, k, s = make_pk_to_xi_pipeline(nk=256, engine='eisenstein_hu')
    fn_nl, _, _ = make_pk_to_xi_pipeline(nk=256, engine='eisenstein_hu', non_linear='halofit')
    args = (0.12, 0.02237, 0.6736, 0.9649, 3.036)
    xi_l, chi_l, s8_l = jax.jit(fn_lin)(*args)
    xi_n, chi_n, s8_n = jax.jit(fn_nl)(*args)
    assert np.all(np.isfinite(np.asarray(xi_n)))
    np.testing.assert_allclose(np.asarray(chi_n), np.asarray(chi_l), rtol=1e-12)
    # sigma8 stays the LINEAR amplitude by definition
    np.testing.assert_allclose(float(s8_n), float(s8_l), rtol=1e-12)
    # small-scale xi strongly enhanced, BAO-scale xi barely moves
    xi_l, xi_n = np.asarray(xi_l)[0], np.asarray(xi_n)[0]
    i1 = np.argmin(np.abs(s - 1.0)); i50 = np.argmin(np.abs(s - 50.0))
    assert xi_n[i1] / xi_l[i1] > 2.0
    assert abs(xi_n[i50] / xi_l[i50] - 1) < 0.05
    # batched
    import jax.numpy as jnp
    batch = jax.vmap(fn_nl)(*[jnp.full(4, a) for a in args])
    assert np.all(np.isfinite(np.asarray(batch[0])))
