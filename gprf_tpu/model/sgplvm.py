"""Inducing-point GPLVM baselines, native in JAX.

The reference compares GPRF against GPy 0.6.0 baselines
(``do_gpy_gplvm``, ``gprfopt.py:232-319``): ``SparseGPLVM`` (FITC-style),
``BayesianGPLVM`` (variational), and plain ``GPLVM`` (full GP).  GPy is not
part of this framework; instead the same baseline family is implemented
directly:

  * ``gplvm_type="sparse"``  — FITC collapsed marginal likelihood
    (Snelson & Ghahramani 2006) over ``num_inducing`` inducing inputs.
  * ``gplvm_type="bayesian"`` — Titsias (2009) collapsed variational lower
    bound (DTC + trace correction).  The reference's additional variational
    X-posterior is approximated by a point estimate under the same Gaussian
    X prior; this matches how the reference actually scores runs (on the
    latent means).
  * ``gplvm_type="basic"``   — exact full-GP marginal likelihood.

All bounds are computed with the numerically standard Cholesky/Woodbury
identities (never forming an n x n inverse for the sparse variants), jit
compiled, with gradients wrt X, Z, and log-lengthscale from autodiff.  The
driver :func:`do_sgplvm` replicates the reference's logging/checkpoint
protocol (``step_%05d_X.npy`` / ``step_%05d_IX.npy``, ``log.txt`` rows,
maxsec abort; ``gprfopt.py:269-318``).

Kernel convention note: the reference rescales GPy's RBF lengthscale by
sqrt(0.5) to match treegp (``gprfopt.py:239``); here both model and baseline
share one kernel definition, so no adjustment exists to make.
"""

from __future__ import annotations

import functools
import math
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsp_linalg
import scipy.optimize

from gprf_tpu.kernels.covfn import cross_kernel_matrix
from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.optim.driver import OutOfTimeError
from gprf_tpu.utils.io import save_step

_LOG_2PI = math.log(2.0 * math.pi)


def _rel_jitter(dtype):
    """Relative diagonal jitter for chol(Kmm).  1e-6 suffices in f64 but
    NaNs the f32 factorization at reference scales (m=2000 inducing points
    under an SE kernel is numerically low-rank): measured on v5e, jitter
    1e-6 -> NaN Cholesky, 1e-4 -> clean at either matmul precision."""
    return 1e-6 if jnp.finfo(dtype).bits >= 64 else 1e-4


def _common_sparse_terms(X, Z, Y, cov: GPCov, noise_var):
    """Shared Woodbury pieces for FITC/Titsias.

    Returns (n, dy, Kdiag, Qdiag, A, g-independent stuff is built by
    callers).  A = Lm^-1 Kmn  with Kmm = k(Z,Z) + jitter.
    """
    n = X.shape[0]
    dy = Y.shape[1]
    Kmm = cross_kernel_matrix(cov, Z, Z)
    Kmm = Kmm + _rel_jitter(Kmm.dtype) * cov.signal_var * jnp.eye(
        Z.shape[0], dtype=Kmm.dtype
    )
    Knm = cross_kernel_matrix(cov, X, Z)
    Lm = jsp_linalg.cholesky(Kmm, lower=True)
    A = jsp_linalg.solve_triangular(Lm, Knm.T, lower=True)  # [m, n]
    Qdiag = jnp.sum(A * A, axis=0)  # diag of Knm Kmm^-1 Kmn
    Kdiag = jnp.full((n,), cov.signal_var)  # stationary: k(x,x) = sv
    return n, dy, Kdiag, Qdiag, A


def _woodbury_mll(A, g, Y, dy, n):
    """log N(Y | 0, A^T A + diag(g)) summed over Y columns via Woodbury."""
    m = A.shape[0]
    Ag = A / g[None, :]
    B = jnp.eye(m, dtype=A.dtype) + Ag @ A.T
    LB = jsp_linalg.cholesky(B, lower=True)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB))) + jnp.sum(jnp.log(g))
    Yg = Y / g[:, None]
    c = jsp_linalg.solve_triangular(LB, A @ Yg, lower=True)  # [m, dy]
    quad = jnp.sum(Y * Yg) - jnp.sum(c * c)
    return -0.5 * quad - 0.5 * dy * logdet - 0.5 * dy * n * _LOG_2PI


def fitc_mll(X, Z, Y, cov: GPCov, noise_var):
    """FITC collapsed marginal likelihood."""
    n, dy, Kdiag, Qdiag, A = _common_sparse_terms(X, Z, Y, cov, noise_var)
    g = Kdiag - Qdiag + noise_var
    return _woodbury_mll(A, g, Y, dy, n)


def titsias_bound(X, Z, Y, cov: GPCov, noise_var):
    """Titsias (2009) collapsed variational lower bound: DTC marginal
    likelihood minus the trace correction dy/(2 sigma^2) tr(Knn - Qnn)."""
    n, dy, Kdiag, Qdiag, A = _common_sparse_terms(X, Z, Y, cov, noise_var)
    g = jnp.full((n,), noise_var, dtype=A.dtype)
    mll = _woodbury_mll(A, g, Y, dy, n)
    trace_term = jnp.sum(Kdiag - Qdiag)
    return mll - 0.5 * dy * trace_term / noise_var


def full_gplvm_mll(X, Y, cov: GPCov, noise_var):
    """Exact GP marginal likelihood (the 'basic' GPLVM objective)."""
    n = X.shape[0]
    dy = Y.shape[1]
    K = cross_kernel_matrix(cov, X, X) + noise_var * jnp.eye(n, dtype=X.dtype)
    L = jsp_linalg.cholesky(K, lower=True)
    alpha = jsp_linalg.cho_solve((L, True), Y)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * jnp.sum(Y * alpha) - 0.5 * dy * logdet - 0.5 * dy * n * _LOG_2PI


@functools.partial(jax.jit, static_argnames=("gplvm_type", "learn_lscale"))
def _objective_and_grads(X, Z, log_lscale, Y, sv, noise_var, gplvm_type, learn_lscale):
    def f(X, Z, log_lscale):
        dx = X.shape[1]
        ls = jnp.exp(log_lscale) * jnp.ones((dx,), dtype=X.dtype)
        cov = GPCov(wfn_params=jnp.asarray([sv], dtype=X.dtype), dfn_params=ls)
        # HIGHEST precision: the Woodbury solves/products feed log(g) and
        # the quad form; TPU's default bf16 matmul passes inject gradient
        # noise at n=10k scales that stalls L-BFGS
        with jax.default_matmul_precision("highest"):
            if gplvm_type == "sparse":
                return fitc_mll(X, Z, Y, cov, noise_var)
            elif gplvm_type == "bayesian":
                return titsias_bound(X, Z, Y, cov, noise_var)
            elif gplvm_type == "basic":
                return full_gplvm_mll(X, Y, cov, noise_var)
        raise ValueError(gplvm_type)

    ll, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(X, Z, log_lscale)
    gX, gZ, gl = grads
    if not learn_lscale:
        gl = jnp.zeros_like(gl)
    return ll, gX, gZ, gl


def do_sgplvm(d, X0, C0, sdata, method="l-bfgs-b", maxsec=3600, gplvm_type="sparse", num_inducing=100):
    """Baseline GPLVM driver with the reference's file protocol
    (``do_gpy_gplvm``, ``gprfopt.py:232-319``)."""
    X0 = np.asarray(X0, dtype=np.float64)
    n, xd = X0.shape
    Y = jnp.asarray(sdata.SY)
    sv = 1.0
    noise_var = sdata.noise_var
    learn_lscale = C0 is not None
    log_lscale0 = math.log(float(np.asarray(sdata.cov.dfn_params)[0]) if C0 is None else float(np.asarray(C0).reshape(-1)[0]))

    if gplvm_type == "basic":
        num_inducing = 0
    if num_inducing > 0:
        rng = np.random.default_rng(0)
        Z0 = X0[rng.choice(n, size=min(num_inducing, n), replace=False)].copy()
    else:
        Z0 = np.zeros((0, xd))

    nmeans = X0.size
    n_ix = Z0.size

    def pack(X, Z, log_l):
        return np.concatenate([X.flatten(), Z.flatten(), [log_l] if learn_lscale else []])

    def unpack(xx):
        X = xx[:nmeans].reshape(X0.shape)
        Z = xx[nmeans : nmeans + n_ix].reshape(Z0.shape)
        log_l = xx[-1] if learn_lscale else log_lscale0
        return X, Z, log_l

    sstep = [0]
    f_log = open(os.path.join(d, "log.txt"), "w")
    t0 = time.time()

    def llgrad_wrapper(xx):
        X, Z, log_l = unpack(xx)
        save_step(d, sstep[0], X=X)
        if n_ix:
            np.save(os.path.join(d, "step_%05d_IX.npy" % sstep[0]), Z)

        ll, gX, gZ, gl = _objective_and_grads(
            jnp.asarray(X), jnp.asarray(Z), jnp.asarray(log_l), Y,
            sv, noise_var, gplvm_type, learn_lscale,
        )
        nll = -float(ll)
        grad = -np.concatenate(
            [np.asarray(gX).flatten(), np.asarray(gZ).flatten(),
             [float(gl)] if learn_lscale else []]
        )

        prior_ll, prior_grad = sdata.x_prior(xx[:nmeans])
        nll -= prior_ll
        grad[:nmeans] -= prior_grad

        f_log.write("%d %.2f %.2f\n" % (sstep[0], time.time() - t0, -nll))
        f_log.flush()
        sstep[0] += 1
        if time.time() - t0 > maxsec:
            raise OutOfTimeError
        return nll, grad

    try:
        scipy.optimize.minimize(
            llgrad_wrapper,
            pack(X0, Z0, log_lscale0),
            jac=True,
            method=method,
            options={"ftol": 1e-6, "maxiter": 200},
        )
    except OutOfTimeError:
        print("terminated optimization for time")

    f_log.write("optimization finished after %.fs\n" % (time.time() - t0))
    f_log.close()
    with open(os.path.join(d, "finished"), "w") as f:
        f.write("")
