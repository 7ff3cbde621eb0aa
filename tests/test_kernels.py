"""Kernel / distance unit tests vs closed forms and the reference doctests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gprf_tpu.kernels.covfn import cross_kernel_matrix, kernel_matrix
from gprf_tpu.kernels.distances import _haversine_km, safe_sqrt, sq_euclidean, sq_lld
from gprf_tpu.kernels.gpcov import GPCov, full_cov_to_gpcov, gpcov_to_full_cov

from reference_impl import dist_km, kernel_np


def test_haversine_matches_reference_doctests():
    # the dist_deg doctest cases from run_seismic.py:24-33
    cases = [
        ((10, 0), (20, 0), 10.0),
        ((10, 0), (10, 45), 45.0),
        ((-78, -12), (-10.25, 52), 86.0),
    ]
    for loc1, loc2, deg in cases:
        d = _haversine_km(np.array([loc1], float), np.array([loc2], float))[0, 0]
        assert int(np.degrees(d / 6371.0)) == int(deg)
    # coincident points
    for loc in [(132.86521, -0.45606493), (127.20443, 2.8123965)]:
        d = _haversine_km(np.array([loc]), np.array([loc]))[0, 0]
        assert abs(float(d)) < 1e-2  # km


def test_haversine_matches_numpy_oracle(rng):
    A = rng.uniform(low=[-180, -80], high=[180, 80], size=(5, 2))
    B = rng.uniform(low=[-180, -80], high=[180, 80], size=(4, 2))
    D = np.asarray(_haversine_km(A, B))
    for i in range(5):
        for j in range(4):
            assert np.isclose(D[i, j], dist_km(A[i], B[j]), rtol=1e-10)


def test_sq_euclidean_lengthscales(rng):
    X1 = rng.normal(size=(6, 3))
    X2 = rng.normal(size=(4, 3))
    ls = np.array([0.5, 1.0, 2.0])
    r2 = np.asarray(sq_euclidean(X1, X2, ls))
    for a in range(6):
        for b in range(4):
            expect = np.sum(((X1[a] - X2[b]) / ls) ** 2)
            assert np.isclose(r2[a, b], expect, rtol=1e-9)


@pytest.mark.parametrize("wfn", ["se", "matern32"])
def test_kernel_matrix_vs_oracle(rng, wfn):
    X = rng.uniform(size=(8, 2))
    sv = 1.3
    ls = np.array([0.2, 0.3])
    cov = GPCov.create([sv], ls, "euclidean", wfn)
    K = np.asarray(cross_kernel_matrix(cov, X, X))
    K_ref = kernel_np(X, X, sv, ls, dfn="euclidean", wfn=wfn)
    np.testing.assert_allclose(K, K_ref, rtol=1e-10)


@pytest.mark.parametrize("wfn", ["se", "matern32"])
def test_lld_kernel_vs_oracle(rng, wfn):
    X = np.column_stack(
        [
            rng.uniform(120, 140, size=7),
            rng.uniform(-10, 10, size=7),
            rng.uniform(0, 600, size=7),
        ]
    )
    sv = 0.9
    ls = np.array([40.0, 35.0])
    cov = GPCov.create([sv], ls, "lld", wfn)
    K = np.asarray(cross_kernel_matrix(cov, X, X))
    K_ref = kernel_np(X, X, sv, ls, dfn="lld", wfn=wfn)
    np.testing.assert_allclose(K, K_ref, rtol=1e-8)


def test_kernel_matrix_adds_noise(rng):
    X = rng.uniform(size=(5, 2))
    cov = GPCov.create([1.0], [0.1, 0.1])
    K0 = np.asarray(cross_kernel_matrix(cov, X, X))
    K1 = np.asarray(kernel_matrix(cov, X, noise_var=0.07))
    np.testing.assert_allclose(K1 - K0, 0.07 * np.eye(5), atol=1e-12)


def test_safe_sqrt_grad_zero_at_zero():
    g = jax.grad(lambda x: safe_sqrt(x))(0.0)
    assert g == 0.0
    g2 = jax.grad(lambda x: safe_sqrt(x))(4.0)
    assert np.isclose(g2, 0.25)


@pytest.mark.parametrize("dfn,wfn", [("euclidean", "se"), ("euclidean", "matern32"), ("lld", "matern32")])
def test_kernel_grads_finite_at_coincident_points(dfn, wfn):
    if dfn == "lld":
        X = jnp.array([[130.0, 2.0, 10.0], [130.0, 2.0, 10.0], [131.0, 2.5, 20.0]])
        ls = jnp.array([40.0, 35.0])
    else:
        X = jnp.array([[0.3, 0.4], [0.3, 0.4], [0.5, 0.6]])
        ls = jnp.array([0.1, 0.1])
    cov = GPCov.create([1.0], ls, dfn, wfn)

    def f(X):
        return jnp.sum(cross_kernel_matrix(cov, X, X))

    g = jax.grad(f)(X)
    assert np.all(np.isfinite(np.asarray(g)))


def test_full_cov_roundtrip():
    cov = GPCov.create([2.0], [0.1, 0.2, 0.3])
    FC = gpcov_to_full_cov(cov, 0.05)
    np.testing.assert_allclose(np.asarray(FC), [[0.05, 2.0, 0.1, 0.2, 0.3]])
    cov2, nv = full_cov_to_gpcov(FC)
    assert np.isclose(float(nv), 0.05)
    np.testing.assert_allclose(np.asarray(cov2.dfn_params), [0.1, 0.2, 0.3])


def test_gpcov_is_pytree():
    cov = GPCov.create([1.0], [0.1, 0.1])
    leaves = jax.tree_util.tree_leaves(cov)
    assert len(leaves) == 2
    mapped = jax.tree.map(lambda x: x * 2, cov)
    assert mapped.dfn_str == "euclidean"
    np.testing.assert_allclose(np.asarray(mapped.wfn_params), [2.0])


def test_host_numpy_kernel_parity(rng):
    """hostnp mirrors must match the device kernel definitions exactly."""
    import jax.numpy as jnp
    from gprf_tpu.kernels.hostnp import cross_kernel_matrix_np

    X = rng.uniform(size=(9, 2))
    for wfn in ["se", "matern32"]:
        cov = GPCov.create([1.2], [0.2, 0.3], "euclidean", wfn)
        np.testing.assert_allclose(
            cross_kernel_matrix_np(cov, X, X),
            np.asarray(cross_kernel_matrix(cov, jnp.asarray(X), jnp.asarray(X))),
            rtol=1e-12,
        )
    Xl = np.column_stack(
        [rng.uniform(120, 140, 7), rng.uniform(-10, 10, 7), rng.uniform(0, 600, 7)]
    )
    for wfn in ["se", "matern32"]:
        cov = GPCov.create([0.9], [40.0, 35.0], "lld", wfn)
        np.testing.assert_allclose(
            cross_kernel_matrix_np(cov, Xl, Xl),
            np.asarray(cross_kernel_matrix(cov, jnp.asarray(Xl), jnp.asarray(Xl))),
            rtol=1e-10, atol=1e-12,
        )


def test_haversine_grad_no_simd_tail_nans(rng):
    """Regression: XLA:CPU fused backward of the central-angle composition
    produced NaNs in the last SIMD tail lanes for jitted f32 gradients
    (fixed by the _central_angle custom_jvp)."""
    for n in [48, 50, 100]:
        X = np.column_stack(
            [rng.uniform(120, 155, n), rng.uniform(-10, 35, n)]
        ).astype(np.float32)
        C = jnp.asarray(rng.uniform(size=(n, n)).astype(np.float32))

        def f(Xs):
            from gprf_tpu.kernels.distances import _haversine_km

            return jnp.sum(C * _haversine_km(Xs, Xs))

        g = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(X)))
        assert np.all(np.isfinite(g)), f"non-finite grads at n={n}"
