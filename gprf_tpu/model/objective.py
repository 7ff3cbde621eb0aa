"""The GPRF objective as one differentiable, jit-compiled function.

Implements the block-factored approximate log-likelihood of Moore & Russell
(2015), exactly the combination rule of the reference ``GPRF.llgrad``
(``gprf.py:206-296``):

    ll = sum_{(i,j) in E} log N(Y_ij | 0, K(X_ij))
         + sum_i (1 - |E_i|) log N(Y_i | 0, K(X_i))

where E is the block neighbor (edge) set and |E_i| the number of edges
touching block i.  Every unary/pair Gaussian term is a masked padded density
(:mod:`gprf_tpu.linalg.masked`) evaluated by a batched Cholesky; the two
batches (blocks ``[B, m, .]`` and stacked edge pairs ``[E, 2m, .]``) are each
one vmapped computation.  Gradients with respect to X, the kernel
hyperparameters, and the noise variance all come from ``jax.grad`` — the
gather of X into block slots transposes to exactly the scatter-add the
reference hand-codes at ``gprf.py:258-273``, and autodiff through the
Cholesky replaces the explicit ``pdinv`` precision matrices and per-row C++
derivative calls (``gprf.py:547-584``).

Edge chunking: for large edge sets the ``[E, 2m, 2m]`` kernel batch is
processed in ``lax.map`` chunks with rematerialization, bounding peak HBM at
``chunk * (2m)^2`` while keeping the MXU/VPU busy.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gprf_tpu.kernels.covfn import cross_kernel_matrix
from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.linalg.masked import masked_gaussian_ll


class GPRFParams(NamedTuple):
    """Differentiable parameters of the objective."""

    X: jnp.ndarray  # [n, dx] latent input locations
    wfn_params: jnp.ndarray  # [1] signal variance
    dfn_params: jnp.ndarray  # [k] lengthscales
    noise_var: jnp.ndarray  # [] observation noise variance


def _block_term(Xb, Yb, mask, cov: GPCov, noise_var):
    """Masked Gaussian log-density of one (possibly padded) block."""
    K = cross_kernel_matrix(cov, Xb, Xb)
    K = K + noise_var * jnp.eye(K.shape[-1], dtype=K.dtype)
    return masked_gaussian_ll(K, Yb, mask)


def _batch_terms(X, Y, assignment, mask, cov, noise_var, chunk_size):
    """Vector of masked block log-densities for a batch of gathers.

    assignment/mask: [Nb, m]; returns [Nb].
    """
    if assignment.shape[0] == 0:
        return jnp.zeros((0,), dtype=X.dtype)

    def one(args):
        idx, msk = args
        return _block_term(X[idx], Y[idx], msk, cov, noise_var)

    if chunk_size is None or assignment.shape[0] <= chunk_size:
        return jax.vmap(lambda idx, msk: one((idx, msk)))(assignment, mask)
    # lax.map with batch_size = chunked scan of vmapped chunks; remat the
    # chunk body so the backward pass recomputes kernels instead of storing
    # every [chunk, m, m] factorization.
    return jax.lax.map(jax.checkpoint(one), (assignment, mask), batch_size=chunk_size)


def _schur_ll(
    X, Y, assignment, mask, edges, unary_weights, pair_weights, cov, noise_var,
    pair_chunk=None,
):
    """GPRF objective with pair terms factored through the unary Cholesky.

    The joint pair covariance factors as

        chol([[Kii, Kij], [Kji, Kjj]]) = [[L_i, 0], [B^T, chol(S)]],
        B = L_i^-1 Kij,  S = Kjj - B^T B,

    so each edge needs one m-wide Cholesky (of the Schur complement S), one
    triangular solve, and one MXU matmul instead of a 2m-wide Cholesky —
    8x fewer factorization flops, and the L_i come free from the unary
    terms.  Mathematically identical to the joint form (tested to f64
    precision); autodiff flows through the shared factors.

    Matmuls run at HIGHEST precision: the Schur complement must stay
    numerically PSD, and TPU's default bf16 passes are not accurate enough.
    """
    import jax.scipy.linalg as jsp_linalg
    from gprf_tpu.linalg.masked import pad_kernel_matrix

    _LOG2PI = math.log(2.0 * math.pi)
    dy = Y.shape[-1]
    m = assignment.shape[1]
    eye = jnp.eye(m, dtype=X.dtype)

    with jax.default_matmul_precision("highest"):
        # ---- unary pass: masked Cholesky factors + per-block ll pieces
        def unary(idx, msk):
            Xb = X[idx]
            K = cross_kernel_matrix(cov, Xb, Xb) + noise_var * eye
            Kp = pad_kernel_matrix(K, msk)
            L = jsp_linalg.cholesky(Kp, lower=True)
            maskf = msk.astype(X.dtype)
            Ym = Y[idx] * maskf[:, None]
            z = jsp_linalg.solve_triangular(L, Ym, lower=True)
            quad = jnp.sum(z * z)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            nb = jnp.sum(maskf)
            ll = -0.5 * quad - 0.5 * dy * logdet - 0.5 * dy * nb * _LOG2PI
            return ll, L, z, quad, logdet, nb

        unary_ll, Ls, Zs, quads, logdets, nbs = jax.vmap(unary)(assignment, mask)
        total = jnp.sum(unary_weights * unary_ll)

        if edges.shape[0] == 0:
            return total

        # ---- pair pass: Schur complement against the i-side factor
        def pair(e):
            i = edges[e, 0]
            j = edges[e, 1]
            idx_i = assignment[i]
            idx_j = assignment[j]
            mi = mask[i].astype(X.dtype)
            mj = mask[j].astype(X.dtype)
            Xi = X[idx_i]
            Xj = X[idx_j]
            Kij = cross_kernel_matrix(cov, Xi, Xj) * (mi[:, None] * mj[None, :])
            Kjj = cross_kernel_matrix(cov, Xj, Xj) + noise_var * eye
            Kjj = pad_kernel_matrix(Kjj, mask[j])
            Li = Ls[i]
            Bm = jsp_linalg.solve_triangular(Li, Kij, lower=True)
            S = Kjj - Bm.T @ Bm
            Lsc = jsp_linalg.cholesky(S, lower=True)
            Yj = Y[idx_j] * mj[:, None]
            rhs = Yj - Bm.T @ Zs[i]
            z2 = jsp_linalg.solve_triangular(Lsc, rhs, lower=True)
            quad = quads[i] + jnp.sum(z2 * z2)
            logdet = logdets[i] + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lsc)))
            nb = nbs[i] + jnp.sum(mj)
            return -0.5 * quad - 0.5 * dy * logdet - 0.5 * dy * nb * _LOG2PI

        E = edges.shape[0]
        if pair_chunk is None or E <= pair_chunk:
            pair_ll = jax.vmap(pair)(jnp.arange(E))
        else:
            pair_ll = jax.lax.map(
                jax.checkpoint(pair), jnp.arange(E), batch_size=pair_chunk
            )
        return total + jnp.sum(pair_weights * pair_ll)


@functools.partial(
    jax.jit,
    static_argnames=("dfn_str", "wfn_str", "unary_chunk", "pair_chunk"),
)
def gprf_ll(
    params: GPRFParams,
    Y,
    assignment,
    mask,
    pair_assignment,
    pair_mask,
    unary_weights,
    pair_weights,
    dfn_str: str = "euclidean",
    wfn_str: str = "se",
    unary_chunk: int | None = None,
    pair_chunk: int | None = None,
):
    """Scalar GPRF log-likelihood.

    Arguments are the layout tensors from
    :meth:`gprf_tpu.partition.layout.BlockLayout.device_arrays`.
    """
    cov = GPCov(
        wfn_params=params.wfn_params,
        dfn_params=params.dfn_params,
        dfn_str=dfn_str,
        wfn_str=wfn_str,
    )
    unary = _batch_terms(
        params.X, Y, assignment, mask, cov, params.noise_var, unary_chunk
    )
    ll = jnp.sum(unary_weights * unary)
    if pair_assignment.shape[0] > 0:
        pair = _batch_terms(
            params.X, Y, pair_assignment, pair_mask, cov, params.noise_var, pair_chunk
        )
        ll = ll + jnp.sum(pair_weights * pair)
    return ll


@functools.partial(
    jax.jit, static_argnames=("dfn_str", "wfn_str", "pair_chunk")
)
def gprf_ll_schur(
    params: GPRFParams,
    Y,
    assignment,
    mask,
    edges,
    unary_weights,
    pair_weights,
    dfn_str: str = "euclidean",
    wfn_str: str = "se",
    pair_chunk: int | None = None,
):
    """Scalar GPRF log-likelihood via the Schur-complement pair form
    (see :func:`_schur_ll`); numerically equal to :func:`gprf_ll`."""
    cov = GPCov(
        wfn_params=params.wfn_params,
        dfn_params=params.dfn_params,
        dfn_str=dfn_str,
        wfn_str=wfn_str,
    )
    return _schur_ll(
        params.X, Y, assignment, mask, edges, unary_weights, pair_weights,
        cov, params.noise_var, pair_chunk=pair_chunk,
    )


@functools.partial(
    jax.jit,
    static_argnames=("dfn_str", "wfn_str", "grad_X", "grad_cov", "unary_chunk", "pair_chunk"),
)
def gprf_value_and_grad(
    params: GPRFParams,
    Y,
    assignment,
    mask,
    pair_assignment,
    pair_mask,
    unary_weights,
    pair_weights,
    dfn_str: str = "euclidean",
    wfn_str: str = "se",
    grad_X: bool = True,
    grad_cov: bool = False,
    unary_chunk: int | None = None,
    pair_chunk: int | None = None,
):
    """(ll, gradX [n,dx], gradCov [1, 2+k]) — the reference ``llgrad`` tuple.

    gradCov layout matches the reference ``dKdi`` parameter order
    (``gprf.py:362-375``): [d/d noise_var, d/d signal_var, d/d lengthscales].
    When a gradient is not requested the corresponding output is zeros (the
    reference returns empty arrays; fixed shapes are jit-friendlier).
    """

    def f(p):
        return gprf_ll(
            p,
            Y,
            assignment,
            mask,
            pair_assignment,
            pair_mask,
            unary_weights,
            pair_weights,
            dfn_str=dfn_str,
            wfn_str=wfn_str,
            unary_chunk=unary_chunk,
            pair_chunk=pair_chunk,
        )

    if not (grad_X or grad_cov):
        ll = f(params)
        g = jax.tree.map(jnp.zeros_like, params)
    else:
        ll, g = jax.value_and_grad(f)(params)

    gradX = g.X if grad_X else jnp.zeros_like(params.X)
    if grad_cov:
        gradCov = jnp.concatenate(
            [jnp.reshape(g.noise_var, (1,)), g.wfn_params, g.dfn_params]
        ).reshape(1, -1)
    else:
        ncov = 1 + params.wfn_params.shape[0] + params.dfn_params.shape[0]
        gradCov = jnp.zeros((1, ncov), dtype=params.X.dtype)
    return ll, gradX, gradCov
