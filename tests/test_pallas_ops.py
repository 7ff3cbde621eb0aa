"""Pallas kernels (interpret mode on CPU): batch-in-lanes Cholesky and the
masked Gaussian-density kernel vs the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gprf_tpu.kernels.covfn import cross_kernel_matrix
from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.linalg.masked import masked_gaussian_ll, pad_kernel_matrix
from gprf_tpu.ops.pallas_mvn import batched_cholesky_pallas, batched_mvn_ll_pallas


def _spd_batch(rng, B, m):
    A = rng.normal(size=(B, m, m))
    return np.einsum("bij,bkj->bik", A, A) + m * np.eye(m)


def test_pallas_cholesky_matches_xla(rng):
    K = _spd_batch(rng, 5, 24)
    L = np.asarray(batched_cholesky_pallas(jnp.asarray(K), interpret=True))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, rtol=1e-10, atol=1e-12)


def test_pallas_cholesky_batch_padding(rng):
    # batch not a multiple of the lane tile
    K = _spd_batch(rng, 3, 16)
    L = np.asarray(batched_cholesky_pallas(jnp.asarray(K), interpret=True))
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", L, L), K, rtol=1e-9, atol=1e-10
    )


def _masked_setup(rng, B=4, m=20, dy=6, n_active=17):
    K = _spd_batch(rng, B, m)
    mask = np.zeros((B, m), dtype=bool)
    mask[:, :n_active] = True
    Y = rng.normal(size=(B, m, dy))
    Kp = np.stack(
        [
            np.asarray(pad_kernel_matrix(jnp.asarray(K[b]), jnp.asarray(mask[b])))
            for b in range(B)
        ]
    )
    Ym = Y * mask[:, :, None]
    nact = mask.sum(axis=1).astype(np.float64)
    return K, Kp, Y, Ym, mask, nact


def test_pallas_mvn_ll_matches_reference(rng):
    K, Kp, Y, Ym, mask, nact = _masked_setup(rng)
    ll = np.asarray(
        batched_mvn_ll_pallas(jnp.asarray(Kp), jnp.asarray(Ym), jnp.asarray(nact), True)
    )
    ll_ref = np.array(
        [
            float(masked_gaussian_ll(jnp.asarray(K[b]), jnp.asarray(Y[b]), jnp.asarray(mask[b])))
            for b in range(len(K))
        ]
    )
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-10)


def test_pallas_mvn_end_to_end_gradient(rng):
    """The custom VJP returns the *symmetrized* dK (autodiff's raw cotangent
    through cholesky is asymmetric); since K is always a symmetric function
    of X, the end-to-end X-gradients must agree exactly."""
    n, dy = 18, 4
    X = rng.uniform(size=(n, 2))
    Y = jnp.asarray(rng.normal(size=(1, n, dy)))
    cov = GPCov.create([1.0], [0.3, 0.3])
    mask = jnp.ones((1, n), dtype=bool)
    nact = jnp.asarray([float(n)])

    def f_pallas(X):
        K = cross_kernel_matrix(cov, X, X) + 0.05 * jnp.eye(n)
        return jnp.sum(batched_mvn_ll_pallas(K[None], Y, nact, True))

    def f_ref(X):
        K = cross_kernel_matrix(cov, X, X) + 0.05 * jnp.eye(n)
        return masked_gaussian_ll(K, Y[0], mask[0])

    assert np.isclose(float(f_pallas(jnp.asarray(X))), float(f_ref(jnp.asarray(X))), rtol=1e-12)
    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(X)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(X)))
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-12)


def test_pallas_mvn_symmetrized_dK(rng):
    """dK from the custom VJP equals the symmetrization of autodiff's dK."""
    K, Kp, Y, Ym, mask, nact = _masked_setup(rng, B=2, m=12, dy=3, n_active=10)

    def f_pallas(Kp):
        return jnp.sum(batched_mvn_ll_pallas(Kp, jnp.asarray(Ym), jnp.asarray(nact), True))

    def f_ref(Kp):
        return jnp.sum(jax.vmap(masked_gaussian_ll)(Kp, jnp.asarray(Ym), jnp.asarray(mask)))

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(Kp)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(Kp)))
    act = mask[:, :, None] & mask[:, None, :]
    np.testing.assert_allclose(
        g1 * act, 0.5 * (g2 + np.transpose(g2, (0, 2, 1))) * act, rtol=1e-9, atol=1e-12
    )
