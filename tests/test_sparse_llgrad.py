"""Sparse (truncated-support) llgrad path vs the dense masked path, and the
Takahashi selected inverse vs a dense inverse."""

import numpy as np
import pytest

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.model.gprf import GPRF

pytest.importorskip("gprf_tpu.sparse.native")
from gprf_tpu.model.sparse_llgrad import gaussian_llgrad_sparse  # noqa: E402
from gprf_tpu.sparse.ops import SparseFactor, sparse_kernel_matrix  # noqa: E402


def test_sparse_term_matches_dense_euclid_se(rng):
    X = rng.uniform(size=(40, 2))
    Y = rng.normal(size=(40, 3))
    cov = GPCov.create([1.3], [0.3, 0.25])
    g = GPRF(X, Y, None, cov, 0.05, block_idxs=[np.arange(40)], neighbors=[])
    ll_d, gX_d, gC_d = g.gaussian_llgrad(X, Y, grad_X=True, grad_cov=True)
    # huge support radius => the sparse path is exact
    ll_s, gX_s, gC_s = gaussian_llgrad_sparse(
        X, Y, cov, 0.05, grad_X=True, grad_cov=True, max_distance=100.0
    )
    assert np.isclose(ll_s, ll_d, rtol=1e-10)
    np.testing.assert_allclose(gX_s, gX_d, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(gC_s, gC_d.reshape(-1), rtol=1e-8)


def test_sparse_term_matches_dense_lld_matern(rng):
    X = np.column_stack(
        [rng.uniform(120, 125, 30), rng.uniform(-5, 5, 30), rng.uniform(0, 100, 30)]
    )
    Y = rng.normal(size=(30, 4))
    cov = GPCov.create([1.0], [40.0, 35.0], "lld", "matern32")
    g = GPRF(X, Y, None, cov, 0.1, block_idxs=[np.arange(30)], neighbors=[])
    ll_d, gX_d, gC_d = g.gaussian_llgrad(X, Y, grad_X=True, grad_cov=True)
    ll_s, gX_s, gC_s = gaussian_llgrad_sparse(
        X, Y, cov, 0.1, grad_X=True, grad_cov=True, max_distance=1000.0
    )
    assert np.isclose(ll_s, ll_d, rtol=1e-10)
    np.testing.assert_allclose(gX_s, gX_d, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(gC_s, gC_d.reshape(-1), rtol=1e-7)


def test_gprf_sparse_flag_matches_dense(rng):
    from gprf_tpu.partition.grid import Blocker, grid_centers

    X = rng.uniform(size=(40, 2))
    Y = rng.normal(size=(40, 3))
    cov = GPCov.create([1.3], [0.3, 0.25])
    b = Blocker(grid_centers(4))
    blocks = b.block_clusters(X)
    g = GPRF(X, Y, None, cov, 0.05, block_idxs=blocks, neighbors=b.neighbors())
    ll_d, gX_d, gC_d = g.llgrad(grad_X=True, grad_cov=True)
    ll_s, gX_s, gC_s = g.llgrad(grad_X=True, grad_cov=True, sparse=True)
    assert np.isclose(ll_s, ll_d, rtol=1e-9)
    np.testing.assert_allclose(gX_s, gX_d, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(gC_s, gC_d, rtol=1e-7)


def test_truncation_is_actually_sparse_and_close(rng):
    """With a realistic support radius the matrix is sparse and the ll is
    close to (not identical to) the dense value."""
    X = rng.uniform(size=(200, 2))
    Y = rng.normal(size=(200, 2))
    cov = GPCov.create([1.0], [0.05, 0.05])
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=5.0, noise_var=0.1)
    assert K.nnz < 200 * 200 * 0.6
    g = GPRF(X, Y, None, cov, 0.1, block_idxs=[np.arange(200)], neighbors=[])
    ll_d = g.gaussian_llgrad(X, Y)[0]
    ll_s = gaussian_llgrad_sparse(X, Y, cov, 0.1, max_distance=5.0)[0]
    assert abs(ll_s - ll_d) / abs(ll_d) < 1e-4


def test_selected_inverse_exact_on_pattern(rng):
    X = rng.uniform(size=(60, 2))
    cov = GPCov.create([1.0], [0.1, 0.1])
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=4.0, noise_var=0.1)
    F = SparseFactor(K)
    Z = F.selected_inverse().tocoo()
    Kinv = np.linalg.inv(K.toarray())
    err = np.max(np.abs(Z.data - Kinv[Z.row, Z.col]))
    assert err < 1e-10
