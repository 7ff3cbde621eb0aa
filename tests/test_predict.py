"""Predictor tests: single-block GPRF predictor must equal the exact GP
posterior; multi-block BCM combination must be consistent."""

import numpy as np

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.model.gprf import GPRF
from gprf_tpu.partition.grid import Blocker, grid_centers

from reference_impl import kernel_np


def _exact_posterior(X, Y, Xstar, sv, ls, nv, test_noise_var=0.0):
    K = kernel_np(X, X, sv, ls) + nv * np.eye(len(X))
    Ks = kernel_np(Xstar, X, sv, ls)
    Kss = kernel_np(Xstar, Xstar, sv, ls)
    if test_noise_var > 0:
        Kss = Kss + np.eye(len(Xstar)) * nv
    Kinv = np.linalg.inv(K)
    mean = Ks @ (Kinv @ Y)
    cov = Kss - Ks @ Kinv @ Ks.T
    return mean, cov


def test_single_block_predictor_is_exact_gp(rng):
    n, dy = 30, 3
    X = rng.uniform(size=(n, 2))
    Y = rng.normal(size=(n, dy))
    Xstar = rng.uniform(size=(5, 2))
    cov = GPCov.create([1.0], [0.3, 0.3])
    g = GPRF(
        X,
        Y,
        block_fn=lambda XX: [np.arange(len(XX))],
        cov=cov,
        noise_var=0.05,
        block_idxs=[np.arange(n)],
        neighbors=[],
    )
    p = g.train_predictor()
    mean, covp = p(Xstar, test_noise_var=0.0)
    mean_ref, cov_ref = _exact_posterior(X, Y, Xstar, 1.0, np.array([0.3, 0.3]), 0.05)

    # With one block: message_prec = inv(post_cov) - inv(Kss);
    # final_prec = inv(Kss) + message_prec = inv(post_cov) => exact posterior.
    np.testing.assert_allclose(covp, cov_ref, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(mean, mean_ref, rtol=1e-6, atol=1e-9)


def test_multi_block_predictor_reasonable(rng):
    n, dy = 60, 2
    X = rng.uniform(size=(n, 2))
    cov = GPCov.create([1.0], [0.3, 0.3])
    # sample Y from the actual prior so prediction is meaningful
    K = kernel_np(X, X, 1.0, np.array([0.3, 0.3])) + 0.01 * np.eye(n)
    L = np.linalg.cholesky(K)
    Y = L @ rng.normal(size=(n, dy))
    b = Blocker(grid_centers(4))
    blocks = b.block_clusters(X)
    g = GPRF(
        X,
        Y,
        block_fn=lambda XX: b.block_clusters(XX),
        cov=cov,
        noise_var=0.01,
        block_idxs=blocks,
        neighbors=b.neighbors(),
    )
    p = g.train_predictor()
    Xstar = rng.uniform(size=(8, 2))
    mean, covp = p(Xstar, test_noise_var=0.01)
    mean_ref, _ = _exact_posterior(
        X, Y, Xstar, 1.0, np.array([0.3, 0.3]), 0.01, test_noise_var=0.01
    )
    # BCM approximation should be much better than the trivial zero-mean
    # baseline prediction
    err_bcm = np.mean((mean - mean_ref) ** 2)
    err_zero = np.mean(mean_ref**2)
    assert err_bcm < 0.5 * err_zero
    assert np.all(np.isfinite(covp))
    # posterior covariance should be PSD-ish
    ev = np.linalg.eigvalsh((covp + covp.T) / 2)
    assert ev.min() > -1e-8
