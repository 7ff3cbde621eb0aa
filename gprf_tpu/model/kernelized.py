"""Second-moment ("kernelized") observation objective.

Rebuild of the reference ``gaussian_llgrad_kernel`` (``gprf.py:674-736``):
instead of raw features Y, each block observes the Gram/second-moment matrix
``YY = Y Y^T`` and the Gaussian term becomes

    ll = -1/2 tr(K^-1 YY) - dy/2 logdet K - dy * n / 2 log 2pi.

As in the reference, this objective is stationary-only and reachable as an
optional mode (``kernelized=True``); the masked padded treatment mirrors
:mod:`gprf_tpu.model.objective`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsp_linalg

from gprf_tpu.kernels.covfn import cross_kernel_matrix
from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.linalg.masked import pad_kernel_matrix
from gprf_tpu.model.objective import GPRFParams

_LOG_2PI = math.log(2.0 * math.pi)


def _term(X, YY, idx, msk, cov, noise_var, dy):
    Xb = X[idx]
    YYb = YY[idx][:, idx]
    maskf = msk.astype(Xb.dtype)
    YYb = YYb * (maskf[:, None] * maskf[None, :])
    K = cross_kernel_matrix(cov, Xb, Xb)
    K = K + noise_var * jnp.eye(K.shape[-1], dtype=K.dtype)
    Kp = pad_kernel_matrix(K, msk)
    L = jsp_linalg.cholesky(Kp, lower=True)
    S = jsp_linalg.cho_solve((L, True), YYb)
    trace = jnp.trace(S)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    n_active = jnp.sum(maskf)
    return -0.5 * trace - 0.5 * dy * logdet - 0.5 * dy * n_active * _LOG_2PI


@functools.partial(
    jax.jit, static_argnames=("dy", "dfn_str", "wfn_str", "grad_X", "grad_cov")
)
def kernelized_value_and_grad(
    params: GPRFParams,
    YY,
    assignment,
    mask,
    pair_assignment,
    pair_mask,
    unary_weights,
    pair_weights,
    dy: int,
    dfn_str: str = "euclidean",
    wfn_str: str = "se",
    grad_X: bool = True,
    grad_cov: bool = False,
):
    def f(p):
        cov = GPCov(
            wfn_params=p.wfn_params,
            dfn_params=p.dfn_params,
            dfn_str=dfn_str,
            wfn_str=wfn_str,
        )
        unary = jax.vmap(lambda idx, msk: _term(p.X, YY, idx, msk, cov, p.noise_var, dy))(
            assignment, mask
        )
        ll = jnp.sum(unary_weights * unary)
        if pair_assignment.shape[0] > 0:
            pair = jax.vmap(
                lambda idx, msk: _term(p.X, YY, idx, msk, cov, p.noise_var, dy)
            )(pair_assignment, pair_mask)
            ll = ll + jnp.sum(pair_weights * pair)
        return ll

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
