"""BCM-style prediction from a trained GPRF.

Rebuild of the reference ``GPRF.train_predictor`` (``gprf.py:593-672``): each
block acts as a local GP expert; a query is answered by the blocks containing
the query points plus their GPRF neighbors, combined in precision
(natural-parameter) space — a product-of-experts/Bayesian-committee-machine
correction against the shared prior:

    message_prec_i = inv(post_cov_i) - inv(Kss)
    final_prec     = inv(prior_cov) + sum_i message_prec_i
    final_mean     = inv(final_prec) sum_i inv(post_cov_i) post_mean_i

Per-block training caches (K^-1, alpha) are computed in one batched masked
Cholesky pass on device; the query-time combination runs on host NumPy (it
is data-prep-scale work over a handful of source blocks).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsp_linalg

from gprf_tpu.kernels.covfn import cross_kernel_matrix
from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.linalg.masked import pad_kernel_matrix


def _block_caches(X, Y, assignment, mask, cov: GPCov, noise_var):
    """Batched per-block (K^-1, alpha) with padding masked to zero.

    Replaces the reference per-block ``np.linalg.inv`` loop
    (``gprf.py:606-617``).
    """

    def one(idx, msk):
        Xb = X[idx]
        Yb = Y[idx] * msk[:, None].astype(Y.dtype)
        K = cross_kernel_matrix(cov, Xb, Xb)
        K = K + noise_var * jnp.eye(K.shape[-1], dtype=K.dtype)
        Kp = pad_kernel_matrix(K, msk)
        L = jsp_linalg.cholesky(Kp, lower=True)
        eye = jnp.eye(K.shape[-1], dtype=K.dtype)
        Kinv = jsp_linalg.cho_solve((L, True), eye)
        maskf = msk.astype(K.dtype)
        Kinv = Kinv * (maskf[:, None] * maskf[None, :])
        alpha = jsp_linalg.cho_solve((L, True), Yb) * maskf[:, None]
        return Kinv, alpha

    return jax.jit(jax.vmap(one))(assignment, mask)


def symmetrize_neighbors(neighbors):
    ndict = defaultdict(set)
    for i, j in neighbors:
        ndict[i].add(j)
        ndict[j].add(i)
    return ndict


def train_predictor(gprf, test_cov: GPCov | None = None, Y=None):
    """Returns ``predict(Xstar, test_noise_var=0.0, local=False)`` giving the
    combined posterior (mean, cov) over Y at query locations Xstar."""
    if Y is None:
        Y = gprf.Y
    Y = np.asarray(Y)
    if test_cov is None:
        test_cov = gprf.cov

    arrays = gprf.layout.device_arrays()
    Kinvs, Alphas = _block_caches(
        jnp.asarray(gprf.X),
        jnp.asarray(Y),
        arrays["assignment"],
        arrays["mask"],
        gprf.cov,
        jnp.asarray(gprf.noise_var),
    )
    Kinvs = np.asarray(Kinvs)
    Alphas = np.asarray(Alphas)
    block_idxs = gprf.layout.block_idxs()
    sizes = gprf.layout.sizes
    neighbor_dict = symmetrize_neighbors(gprf.neighbors)

    # query-time kernel evaluations are tiny and looped on host; evaluating
    # them on device would pay one transport round-trip each (see
    # gprf_tpu.kernels.hostnp)
    from gprf_tpu.kernels.hostnp import cross_kernel_matrix_np

    def k_np(cov, X1, X2):
        return cross_kernel_matrix_np(cov, X1, X2)

    def predict(Xstar, test_noise_var: float = 0.0, local: bool = False):
        Xstar = np.asarray(Xstar)
        prior_cov = k_np(test_cov, Xstar, Xstar)
        prior_cov = prior_cov + np.eye(len(Xstar)) * test_noise_var
        prior_prec = np.linalg.inv(prior_cov)
        prior_mean = np.zeros((Xstar.shape[0], Y.shape[1]))

        test_block_idxs = gprf.block_fn(Xstar)
        source_blocks = set()
        for i, idxs in enumerate(test_block_idxs):
            if len(idxs) == 0:
                continue
            source_blocks.add(i)
            for j in neighbor_dict[i]:
                source_blocks.add(j)

        for i in sorted(source_blocks):
            nb = int(sizes[i])
            Xi = gprf.X[block_idxs[i]]
            Kinv = Kinvs[i, :nb, :nb]
            alpha = Alphas[i, :nb]
            Kstar = k_np(gprf.cov, Xstar, Xi)
            Kss = k_np(gprf.cov, Xstar, Xstar)
            if test_noise_var > 0:
                # reference quirk preserved: the per-expert Kss gets the
                # *model* noise variance when test noise is requested
                # (gprf.py:655-656)
                Kss = Kss + np.eye(Kss.shape[0]) * gprf.noise_var
            mean = Kstar @ alpha
            cov_post = Kss - Kstar @ (Kinv @ Kstar.T)
            prec = np.linalg.inv(cov_post)
            pp = np.linalg.inv(Kss)
            prior_prec += prec - pp
            prior_mean += prec @ mean

        final_cov = np.linalg.inv(prior_prec)
        final_mean = final_cov @ prior_mean
        return final_mean, final_cov

    return predict
