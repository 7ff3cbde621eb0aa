"""GPRF edge (neighbor) discovery on device.

The reference loops over all B^2/2 block pairs in Python, building a dense
kernel matrix per pair and thresholding its max entry
(``GPRF.compute_neighbors``, ``gprf.py:119-150``).  Because every supported
covariance profile is a monotone decreasing, nonnegative function of the
scaled distance, ``max_ij k(x_i, x_j) = profile(min_ij r2)`` — so the whole
edge discovery collapses to one batched min-distance computation: for each
block, a vmapped masked pairwise-distance against all blocks, reduced to a
``[B, B]`` min matrix, mapped through the profile, thresholded on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gprf_tpu.kernels.covfn import cov_value
from gprf_tpu.kernels.distances import scaled_sq_distance
from gprf_tpu.kernels.gpcov import GPCov

_FAR = 1e20  # stands in for +inf so matern's (1 + r) exp(-r) stays finite


@functools.partial(jax.jit, static_argnames=("dfn_str", "wfn_str"))
def block_pair_max_corr(
    X, assignment, mask, wfn_params, dfn_params, dfn_str="euclidean", wfn_str="se"
):
    """[B, B] matrix of max_{a in i, b in j} k(x_a, x_b) / signal_var."""
    Xb = X[assignment]  # [B, m, dx]
    maskb = mask
    cov = GPCov(wfn_params=wfn_params, dfn_params=dfn_params, dfn_str=dfn_str, wfn_str=wfn_str)

    def min_r2_row(i):
        Xi = Xb[i]
        mi = maskb[i]

        def one(Xj, mj):
            r2 = scaled_sq_distance(dfn_str, Xi, Xj, dfn_params)
            valid = mi[:, None] & mj[None, :]
            return jnp.min(jnp.where(valid, r2, _FAR))

        return jax.vmap(one)(Xb, maskb)

    B = assignment.shape[0]
    min_r2 = jax.lax.map(min_r2_row, jnp.arange(B))
    maxk = cov_value(cov, jnp.minimum(min_r2, _FAR)) / cov.signal_var
    return maxk


def compute_neighbors(
    X, assignment, mask, cov: GPCov, threshold: float = 1e-3
) -> list[tuple[int, int]]:
    """Edge list [(i, j), i > j] with max cross-correlation above threshold.

    Matches reference semantics (``gprf.py:119-150``): ``threshold == 1.0``
    short-circuits to no edges (pure local GPs).
    """
    if threshold == 1.0:
        return []
    maxk = np.asarray(
        block_pair_max_corr(
            X,
            assignment,
            mask,
            cov.wfn_params,
            cov.dfn_params,
            dfn_str=cov.dfn_str,
            wfn_str=cov.wfn_str,
        )
    )
    B = maxk.shape[0]
    ii, jj = np.tril_indices(B, k=-1)
    keep = maxk[ii, jj] > threshold
    return [(int(i), int(j)) for i, j in zip(ii[keep], jj[keep])]
