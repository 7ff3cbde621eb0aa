"""Native sparse layer tests: range query vs brute force, sparse Cholesky
vs dense, sparse prior sampling covariance."""

import numpy as np
import pytest
import scipy.sparse

from gprf_tpu.kernels.gpcov import GPCov

native = pytest.importorskip("gprf_tpu.sparse.native")
from gprf_tpu.sparse.native import NativeCholesky, range_pairs, rcm_order  # noqa: E402
from gprf_tpu.sparse.ops import SparseFactor, sample_y_sparse, sparse_kernel_matrix  # noqa: E402


def test_range_pairs_matches_bruteforce(rng):
    X = rng.uniform(size=(300, 2))
    r = 0.15
    rows, cols = range_pairs(X, r)
    got = set(zip(rows.tolist(), cols.tolist()))
    D = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=-1)
    expect = {(i, j) for i in range(300) for j in range(i + 1) if D[i, j] <= r}
    assert got == expect


def test_range_pairs_3d(rng):
    X = rng.uniform(size=(150, 3))
    rows, cols = range_pairs(X, 0.3)
    D = np.linalg.norm(X[rows] - X[cols], axis=1)
    assert np.all(D <= 0.3 + 1e-12)
    # diagonal present
    assert np.sum(rows == cols) == 150


def _rand_sparse_spd(rng, n, density=0.02):
    A = scipy.sparse.random(n, n, density=density, random_state=np.random.RandomState(0))
    A = (A + A.T) * 0.5
    A = A + scipy.sparse.eye(n) * (abs(A).sum(axis=1).max() + 1.0)
    return A.tocsc()


def test_native_cholesky_matches_dense(rng):
    n = 80
    A = _rand_sparse_spd(rng, n)
    lower = scipy.sparse.tril(A, format="csc")
    F = NativeCholesky(n, lower.indptr, lower.indices, lower.data)
    Ad = A.toarray()
    _, logdet_ref = np.linalg.slogdet(Ad)
    assert np.isclose(F.logdet(), logdet_ref, rtol=1e-10)
    b = rng.normal(size=(n, 3))
    x = F.solve(b)
    np.testing.assert_allclose(Ad @ x, b, rtol=1e-8, atol=1e-10)
    # L L^T = A
    L = F.L().toarray()
    np.testing.assert_allclose(L @ L.T, Ad, rtol=1e-9, atol=1e-10)
    # lmult: L z
    z = rng.normal(size=n)
    np.testing.assert_allclose(F.lmult(z), L @ z, rtol=1e-9)


def test_rcm_reduces_bandwidth(rng):
    # random permutation of a path graph: RCM should recover low bandwidth
    n = 120
    perm0 = rng.permutation(n)
    rows, cols = [], []
    for k in range(n - 1):
        i, j = perm0[k], perm0[k + 1]
        rows += [i, j]
        cols += [j, i]
    A = scipy.sparse.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n)).tocsc()
    perm = rcm_order(n, A.indptr.astype(np.int64), A.indices.astype(np.int32))
    assert sorted(perm.tolist()) == list(range(n))
    Ap = A[perm][:, perm].tocoo()
    bw = np.max(np.abs(Ap.row - Ap.col))
    assert bw <= 2


def test_sparse_kernel_matrix_matches_dense(rng):
    X = rng.uniform(size=(100, 2))
    cov = GPCov.create([1.0], [0.2, 0.2])
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=10.0, noise_var=0.05)
    # with a huge support radius the sparse matrix is the dense matrix
    from reference_impl import kernel_np

    K_ref = kernel_np(X, X, 1.0, np.array([0.2, 0.2])) + 0.05 * np.eye(100)
    np.testing.assert_allclose(K.toarray(), K_ref, rtol=1e-10, atol=1e-12)


def test_sparse_factor_solve_logdet(rng):
    X = rng.uniform(size=(200, 2))
    cov = GPCov.create([1.0], [0.05, 0.05])
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=4.0, noise_var=0.1)
    F = SparseFactor(K)
    Kd = K.toarray()
    _, logdet_ref = np.linalg.slogdet(Kd)
    assert np.isclose(F.logdet(), logdet_ref, rtol=1e-9)
    b = rng.normal(size=200)
    np.testing.assert_allclose(Kd @ F.solve(b), b, rtol=1e-8, atol=1e-9)


def test_sample_y_sparse_covariance(rng):
    # empirical covariance of sparse-sampled Y approaches K
    X = rng.uniform(size=(40, 2))
    cov = GPCov.create([1.0], [0.3, 0.3])
    yd = 4000
    np.random.seed(0)
    Y = sample_y_sparse(X, cov, noise_var=0.1, yd=yd, max_scaled_dist=8.0)
    emp = Y @ Y.T / yd
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=8.0, noise_var=0.1).toarray()
    assert np.max(np.abs(emp - K)) < 0.15


def test_sample_y_blocked_covariance(rng):
    """Blocked Vecchia sampler reproduces the prior covariance closely when
    the conditioning window spans everything."""
    from gprf_tpu.data.synthetic import sample_y_blocked
    from gprf_tpu.kernels.hostnp import kernel_matrix_np

    X = rng.uniform(size=(60, 2))
    cov = GPCov.create([1.0], [0.3, 0.3])
    yd = 4000
    Y = sample_y_blocked(X, cov, 0.1, yd, blocksize=16, n_condition=60,
                         rng=np.random.default_rng(0))
    emp = Y @ Y.T / yd
    K = kernel_matrix_np(cov, X, noise_var=0.1)
    assert np.max(np.abs(emp - K)) < 0.15


def test_sample_y_banded_exact_transform(rng):
    """The banded sampler's linear map z -> y satisfies M M^T = K exactly
    (it IS a Cholesky factorization of the truncated kernel, so the draw is
    exact, matching the reference's CHOLMOD draw distributionally)."""
    from gprf_tpu.sparse.ops import sample_y_banded

    X = rng.uniform(size=(120, 2))
    cov = GPCov.create([1.0], [0.2, 0.2])

    class _IdentityRng:
        def standard_normal(self, shape):
            return np.eye(shape[0])

    M = sample_y_banded(X, cov, noise_var=0.05, yd=120, rng=_IdentityRng(),
                        max_scaled_dist=4.0)
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=4.0, noise_var=0.05).toarray()
    np.testing.assert_allclose(M @ M.T, K, rtol=1e-9, atol=1e-10)


def test_sample_y_banded_covariance(rng):
    from gprf_tpu.sparse.ops import sample_y_banded

    X = rng.uniform(size=(40, 2))
    cov = GPCov.create([1.0], [0.3, 0.3])
    yd = 4000
    Y = sample_y_banded(X, cov, noise_var=0.1, yd=yd, max_scaled_dist=8.0,
                        rng=np.random.default_rng(0))
    emp = Y @ Y.T / yd
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=8.0, noise_var=0.1).toarray()
    assert np.max(np.abs(emp - K)) < 0.15
