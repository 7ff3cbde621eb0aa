"""Full-GP and sparse-GPLVM baseline tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.model.fullgp import GP, mcov, prior_sample
from gprf_tpu.model.sgplvm import fitc_mll, full_gplvm_mll, titsias_bound

from reference_impl import kernel_np, LOG_2PI


def _mll_dense(X, Y, sv, ls, nv):
    K = kernel_np(X, X, sv, ls) + nv * np.eye(len(X))
    Kinv = np.linalg.inv(K)
    _, logdet = np.linalg.slogdet(K)
    dy = Y.shape[1]
    return -0.5 * np.sum(Y * (Kinv @ Y)) - 0.5 * dy * logdet - 0.5 * dy * len(X) * LOG_2PI


def test_fullgp_predict_matches_closed_form(rng):
    X = rng.uniform(size=(20, 2))
    y = rng.normal(size=(20, 1))
    Xs = rng.uniform(size=(4, 2))
    cov = GPCov.create([1.0], [0.3, 0.3])
    gp = GP(X, y, cov, 0.05)
    K = kernel_np(X, X, 1.0, np.array([0.3, 0.3])) + 0.05 * np.eye(20)
    Ks = kernel_np(Xs, X, 1.0, np.array([0.3, 0.3]))
    Kss = kernel_np(Xs, Xs, 1.0, np.array([0.3, 0.3]))
    Kinv = np.linalg.inv(K)
    np.testing.assert_allclose(gp.predict(Xs), (Ks @ Kinv @ y)[:, 0], rtol=1e-8)
    np.testing.assert_allclose(
        gp.covariance(Xs), Kss - Ks @ Kinv @ Ks.T, rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        gp.covariance(Xs, include_obs=True),
        Kss - Ks @ Kinv @ Ks.T + 0.05 * np.eye(4),
        rtol=1e-6,
        atol=1e-10,
    )
    assert np.isclose(gp.log_likelihood(), _mll_dense(X, y, 1.0, np.array([0.3, 0.3]), 0.05), rtol=1e-9)


def test_mcov_and_prior_sample(rng):
    X = rng.uniform(size=(15, 2))
    cov = GPCov.create([1.0], [0.2, 0.2])
    K = mcov(X, cov, 0.1)
    np.testing.assert_allclose(
        K, kernel_np(X, X, 1.0, np.array([0.2, 0.2])) + 0.1 * np.eye(15), rtol=1e-9
    )
    s = prior_sample(X, cov, 0.1, rng=np.random.default_rng(0), n_samples=3)
    assert s.shape == (15, 3)


def test_full_gplvm_mll_matches_oracle(rng):
    X = rng.uniform(size=(18, 2))
    Y = rng.normal(size=(18, 3))
    cov = GPCov.create([1.0], [0.3, 0.3])
    ll = float(full_gplvm_mll(jnp.asarray(X), jnp.asarray(Y), cov, 0.05))
    assert np.isclose(ll, _mll_dense(X, Y, 1.0, np.array([0.3, 0.3]), 0.05), rtol=1e-10)


def test_fitc_exact_when_inducing_everywhere(rng):
    """FITC with Z = X: Qnn = Knn so g = nv and the FITC mll equals the
    exact marginal likelihood (up to jitter)."""
    X = rng.uniform(size=(25, 2))
    Y = rng.normal(size=(25, 3))
    cov = GPCov.create([1.0], [0.3, 0.3])
    ll_fitc = float(fitc_mll(jnp.asarray(X), jnp.asarray(X), jnp.asarray(Y), cov, 0.1))
    ll_exact = _mll_dense(X, Y, 1.0, np.array([0.3, 0.3]), 0.1)
    assert np.isclose(ll_fitc, ll_exact, rtol=1e-4)


def test_titsias_bound_below_exact(rng):
    X = rng.uniform(size=(40, 2))
    cov = GPCov.create([1.0], [0.3, 0.3])
    K = kernel_np(X, X, 1.0, np.array([0.3, 0.3])) + 0.1 * np.eye(40)
    Y = np.linalg.cholesky(K) @ rng.normal(size=(40, 2))
    Z = X[rng.choice(40, 10, replace=False)]
    bound = float(titsias_bound(jnp.asarray(X), jnp.asarray(Z), jnp.asarray(Y), cov, 0.1))
    exact = _mll_dense(X, Y, 1.0, np.array([0.3, 0.3]), 0.1)
    assert bound <= exact + 1e-6
    # with all points as inducing, the bound is tight
    tight = float(titsias_bound(jnp.asarray(X), jnp.asarray(X), jnp.asarray(Y), cov, 0.1))
    assert abs(tight - exact) < 1e-3 * abs(exact)


def test_do_sgplvm_driver(tmp_path, monkeypatch, rng):
    from gprf_tpu.data.sampled import SampledData
    from gprf_tpu.model.sgplvm import do_sgplvm
    from gprf_tpu.partition.grid import grid_centers

    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    sd = SampledData(n=60, ntrain=50, lscale=0.3, obs_std=0.03, yd=4, seed=1)
    sd.set_centers(grid_centers(4))
    d = str(tmp_path / "sgplvm")
    os.makedirs(d)
    do_sgplvm(d, sd.X_obs, None, sd, maxsec=60, gplvm_type="sparse", num_inducing=15)
    assert os.path.exists(os.path.join(d, "finished"))
    from gprf_tpu.optim.driver import load_log

    steps, times, lls = load_log(d)
    assert len(steps) >= 3
    assert lls[-1] > lls[0]
    assert os.path.exists(os.path.join(d, "step_%05d_IX.npy" % steps[-1]))


def test_prediction_error_gp_smoke(tmp_path, monkeypatch, rng):
    from gprf_tpu.data.sampled import SampledData

    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    sd = SampledData(n=50, ntrain=40, lscale=0.3, obs_std=0.03, yd=3, seed=1)
    ll_true = sd.prediction_error_gp(sd.SX.flatten())
    ll_obs = sd.prediction_error_gp(sd.X_obs.flatten())
    assert np.isfinite(ll_true) and np.isfinite(ll_obs)
    # test ll at the true latents should beat the noisy ones
    assert ll_true > ll_obs


def test_do_sgplvm_bayesian_and_basic(tmp_path, monkeypatch, rng):
    from gprf_tpu.data.sampled import SampledData
    from gprf_tpu.model.sgplvm import do_sgplvm
    from gprf_tpu.optim.driver import load_log
    from gprf_tpu.partition.grid import grid_centers

    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    sd = SampledData(n=50, ntrain=40, lscale=0.3, obs_std=0.03, yd=3, seed=1)
    sd.set_centers(grid_centers(4))
    for i, gtype in enumerate(["bayesian", "basic"]):
        d = str(tmp_path / gtype)
        os.makedirs(d)
        do_sgplvm(d, sd.X_obs, None, sd, maxsec=30, gplvm_type=gtype, num_inducing=10)
        steps, times, lls = load_log(d)
        assert len(steps) >= 2
        assert lls[-1] >= lls[0]


def test_fitc_f32_large_inducing_finite(rng):
    """Regression: f32 FITC at a dense inducing set.  With the old fixed
    1e-6 jitter the f32 chol(Kmm) NaN'd at reference scales (SE Kmm is
    numerically low-rank); the dtype-scaled jitter must keep value and
    gradients finite."""
    import jax
    import jax.numpy as jnp
    from gprf_tpu.kernels.gpcov import GPCov
    from gprf_tpu.model.sgplvm import fitc_mll

    n, m, dy = 1500, 500, 3
    X = jnp.asarray(rng.uniform(size=(n, 2)), dtype=jnp.float32)
    Z = X[:m]
    Y = jnp.asarray(rng.normal(size=(n, dy)), dtype=jnp.float32)
    cov = GPCov(
        wfn_params=jnp.asarray([1.0], jnp.float32),
        dfn_params=jnp.asarray([0.06, 0.06], jnp.float32),
    )

    def f(X, Z):
        return fitc_mll(X, Z, Y, cov, jnp.float32(0.01))

    v, (gX, gZ) = jax.value_and_grad(f, argnums=(0, 1))(X, Z)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(gX)))
    assert np.all(np.isfinite(np.asarray(gZ)))


def test_psi_statistics_degenerate_and_monte_carlo(rng):
    """Psi stats vs their definitions: exact kernels at S -> 0, Monte Carlo
    at finite S."""
    from gprf_tpu.model.sgplvm import psi_statistics

    n, k, d = 6, 4, 2
    mu = rng.uniform(size=(n, d))
    Z = rng.uniform(size=(k, d))
    sv, ls = 1.3, np.array([0.35, 0.5])

    # S -> 0: Psi1 == k(mu, Z), Psi2 == Knm^T Knm (per point, summed)
    psi0, P1, P2 = psi_statistics(
        jnp.asarray(mu), jnp.full((n, d), 1e-14), jnp.asarray(Z),
        sv, jnp.asarray(ls),
    )
    Knm = kernel_np(mu, Z, sv, ls)
    assert np.isclose(float(psi0), n * sv)
    np.testing.assert_allclose(np.asarray(P1), Knm, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(P2), Knm.T @ Knm, rtol=1e-6)

    # finite S: Monte Carlo over q(X)
    S = rng.uniform(0.01, 0.08, size=(n, d))
    _, P1s, P2s = psi_statistics(
        jnp.asarray(mu), jnp.asarray(S), jnp.asarray(Z), sv, jnp.asarray(ls)
    )
    draws = 200_000
    g = np.random.default_rng(7)
    P1_mc = np.zeros((n, k))
    P2_mc = np.zeros((k, k))
    for i in range(n):
        xs = mu[i] + g.standard_normal((draws, d)) * np.sqrt(S[i])
        Kxz = kernel_np(xs, Z, sv, ls)  # [draws, k]
        P1_mc[i] = Kxz.mean(axis=0)
        P2_mc += (Kxz[:, :, None] * Kxz[:, None, :]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(P1s), P1_mc, rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(P2s), P2_mc, rtol=3e-2, atol=1e-4)


def test_bgplvm_collapsed_F_reduces_to_titsias(rng):
    """At S -> 0 the variational collapsed F equals the point-estimate
    Titsias bound exactly (psi0 -> tr Knn, Psi1 -> Knm, Psi2 -> Knm^T Knm)."""
    from gprf_tpu.model.sgplvm import bgplvm_collapsed_F, titsias_bound

    n, k, dy, d = 14, 5, 3, 2
    X = rng.uniform(size=(n, d))
    Z = rng.uniform(size=(k, d))
    Y = rng.normal(size=(n, dy))
    cov = GPCov.create([1.0], [0.3, 0.4])
    F = float(
        bgplvm_collapsed_F(
            jnp.asarray(X), jnp.full((n, d), 1e-14), jnp.asarray(Z),
            jnp.asarray(Y), cov, 0.05,
        )
    )
    t = float(titsias_bound(jnp.asarray(X), jnp.asarray(Z), jnp.asarray(Y), cov, 0.05))
    assert np.isclose(F, t, rtol=1e-6), (F, t)


def test_bgplvm_bound_below_exact_marginal(rng):
    """F (the expected conditional part at q concentrated on X) never
    exceeds the exact GP marginal likelihood at that X."""
    from gprf_tpu.model.sgplvm import bgplvm_collapsed_F

    n, k, dy, d = 16, 6, 2, 2
    X = rng.uniform(size=(n, d))
    Z = X[rng.choice(n, size=k, replace=False)]
    Y = rng.normal(size=(n, dy))
    cov = GPCov.create([1.0], [0.3, 0.3])
    F = float(
        bgplvm_collapsed_F(
            jnp.asarray(X), jnp.full((n, d), 1e-14), jnp.asarray(Z),
            jnp.asarray(Y), cov, 0.05,
        )
    )
    exact = float(full_gplvm_mll(jnp.asarray(X), jnp.asarray(Y), cov, 0.05))
    assert F <= exact + 1e-6


def test_do_sgplvm_variational_bayesian(tmp_path, monkeypatch, rng):
    """End-to-end driver run of the true variational GP-LVM: the bound
    improves, q-variances are optimized (packed in theta), and the file
    protocol is written."""
    from gprf_tpu.data.sampled import SampledData
    from gprf_tpu.model.sgplvm import do_sgplvm
    from gprf_tpu.optim.driver import load_log
    from gprf_tpu.partition.grid import grid_centers

    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    sd = SampledData(n=50, ntrain=40, lscale=0.3, obs_std=0.03, yd=3, seed=1)
    sd.set_centers(grid_centers(4))
    d = str(tmp_path / "bayes")
    os.makedirs(d)
    do_sgplvm(d, sd.X_obs, None, sd, maxsec=60, gplvm_type="bayesian", num_inducing=10)
    steps, times, lls = load_log(d)
    assert len(steps) >= 2
    assert lls[-1] >= lls[0]
    assert os.path.exists(os.path.join(d, "finished"))
