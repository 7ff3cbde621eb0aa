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


def test_device_combine_matches_host_loop(rng):
    """The batched one-dispatch BCM combination equals the reference-shaped
    host loop (same experts, same precision pooling)."""
    from gprf_tpu.model.predict import train_predictor

    n, dy = 80, 3
    X = rng.uniform(size=(n, 2))
    K = kernel_np(X, X, 1.0, np.array([0.3, 0.3])) + 0.01 * np.eye(n)
    L = np.linalg.cholesky(K)
    Y = L @ rng.normal(size=(n, dy))
    cov = GPCov.create([1.0], [0.3, 0.3])
    b = Blocker(grid_centers(4))
    g = GPRF(X, Y, b.block_clusters, cov, 0.01,
             block_idxs=b.block_clusters(X), neighbors=b.neighbors())
    Xstar = rng.uniform(size=(7, 2))

    p_dev = train_predictor(g, combine="device")
    p_host = train_predictor(g, combine="host")
    for tnv in (0.0, 0.02):
        m_d, c_d = p_dev(Xstar, test_noise_var=tnv)
        m_h, c_h = p_host(Xstar, test_noise_var=tnv)
        np.testing.assert_allclose(m_d, m_h, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(c_d, c_h, rtol=1e-8, atol=1e-10)


def test_device_combine_with_test_cov(rng):
    """Prior built from test_cov, experts from the model cov (the reference
    distinction at gprf.py:621 vs 649) survives the batched path."""
    from gprf_tpu.model.predict import train_predictor

    n, dy = 50, 2
    X = rng.uniform(size=(n, 2))
    Y = rng.normal(size=(n, dy))
    cov = GPCov.create([1.0], [0.3, 0.3])
    test_cov = GPCov.create([1.3], [0.4, 0.4])
    b = Blocker(grid_centers(4))
    g = GPRF(X, Y, b.block_clusters, cov, 0.05,
             block_idxs=b.block_clusters(X), neighbors=b.neighbors())
    Xstar = rng.uniform(size=(6, 2))
    m_d, c_d = train_predictor(g, test_cov=test_cov, combine="device")(Xstar, 0.01)
    m_h, c_h = train_predictor(g, test_cov=test_cov, combine="host")(Xstar, 0.01)
    np.testing.assert_allclose(m_d, m_h, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(c_d, c_h, rtol=1e-8, atol=1e-10)


def test_block_predictor_matches_per_call(rng):
    """One-dispatch whole-test-set prediction == per-block host-oracle
    calls, across ragged block sizes, source-set sizes, and both padding
    axes (q to 8, S to >=2)."""
    from gprf_tpu.model.predict import train_block_predictor, train_predictor

    n, dy = 120, 3
    X = rng.uniform(size=(n, 2))
    Y = rng.normal(size=(n, dy))
    cov = GPCov.create([1.0], [0.25, 0.25])
    b = Blocker(grid_centers(9))
    g = GPRF(X, Y, b.block_clusters, cov, 0.05,
             block_idxs=b.block_clusters(X), neighbors=b.neighbors())

    Xtest = rng.uniform(size=(40, 2))
    test_blocks = b.block_clusters(Xtest)

    predict_blocks = train_block_predictor(g)
    results = predict_blocks(test_blocks, Xtest, test_noise_var=0.05)

    p_host = train_predictor(g, combine="host")
    for t, idxs in enumerate(test_blocks):
        if len(idxs) == 0:
            assert t not in results
            continue
        m_b, c_b = results[t]
        m_h, c_h = p_host(Xtest[idxs], test_noise_var=0.05)
        np.testing.assert_allclose(m_b, m_h, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(c_b, c_h, rtol=1e-6, atol=1e-8)
