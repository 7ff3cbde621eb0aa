"""Sparse per-block Gaussian log-likelihood and gradients.

Rebuild of the reference ``gaussian_llgrad_sparse`` (``gprf.py:378-494``)
for blocks too large for dense factorization: the kernel is truncated at
``max_distance`` scaled lengthscales (native kd-tree range query), factored
by the native sparse Cholesky, and the gradient trace terms
``tr(K^-1 dK)`` are evaluated with the Takahashi *selected inverse* — the
entries of K^-1 on the factor's pattern, which is exactly the subset the
elementwise products read (the reference gets these from CHOLMOD's
``factor.inv()``).

Pattern derivatives (the reference's ``sparse_kernel_deriv_wrt_xi`` /
``_wrt_i`` cover-tree calls, ``gprf.py:450,484``) are vectorized NumPy
closed forms for SE / Matern-3/2 over euclidean and lon-lat-depth
distances.
"""

from __future__ import annotations

import numpy as np

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.sparse.ops import (
    SparseFactor,
    _profile_np,
    _query_coords,
    _scaled_r2_pairs,
)
from gprf_tpu.sparse.native import range_pairs

AVG_EARTH_RADIUS_KM = 6371.0
_SQRT3 = np.sqrt(3.0)
LOG_2PI = np.log(2.0 * np.pi)


def _dprofile_dr2(cov: GPCov, r2, k_vals):
    """d k / d r2 on the pattern."""
    sv = float(np.asarray(cov.wfn_params)[0])
    if cov.wfn_str == "se":
        return -k_vals
    elif cov.wfn_str == "matern32":
        r = np.sqrt(np.maximum(r2, 0.0))
        return -1.5 * sv * np.exp(-_SQRT3 * r)
    elif cov.wfn_str == "compact2":
        r = np.sqrt(np.maximum(r2, 0.0))
        b = np.maximum(1.0 - r, 0.0)
        return -10.0 * sv * b**3
    raise ValueError(cov.wfn_str)


def _dr2_dx_rows(X, rows, cols, cov: GPCov):
    """[nnz, dx] array of d r2(x_rows, x_cols) / d x_rows[:, dim]."""
    dfn = np.asarray(cov.dfn_params, dtype=np.float64)
    Xi = X[rows]
    Xj = X[cols]
    if cov.dfn_str == "euclidean":
        return 2.0 * (Xi - Xj) / dfn**2
    elif cov.dfn_str == "lld":
        l1, l2 = dfn
        phi1, lam1 = np.radians(Xi[:, 1]), np.radians(Xi[:, 0])
        phi2, lam2 = np.radians(Xj[:, 1]), np.radians(Xj[:, 0])
        h = (
            np.sin((phi1 - phi2) / 2.0) ** 2
            + np.cos(phi1) * np.cos(phi2) * np.sin((lam1 - lam2) / 2.0) ** 2
        )
        # s = R * 2 asin(sqrt(h)); ds/dh = R / sqrt(h (1 - h)), guarded at
        # both singular ends (coincident / antipodal) like _central_angle
        tiny = 1e-300
        safe = (h > tiny) & (h < 1.0 - 1e-12)
        ds_dh = np.where(safe, AVG_EARTH_RADIUS_KM / np.sqrt(np.where(safe, h * (1 - h), 1.0)), 0.0)
        s = 2.0 * np.arcsin(np.minimum(np.sqrt(np.maximum(h, 0.0)), 1.0)) * AVG_EARTH_RADIUS_KM
        dh_dphi1 = 0.5 * np.sin(phi1 - phi2) - np.sin(phi1) * np.cos(phi2) * np.sin((lam1 - lam2) / 2.0) ** 2
        dh_dlam1 = 0.5 * np.cos(phi1) * np.cos(phi2) * np.sin(lam1 - lam2)
        deg = np.pi / 180.0
        dr2_ds = 2.0 * s / l1**2
        out = np.empty((len(rows), 3))
        out[:, 0] = dr2_ds * ds_dh * dh_dlam1 * deg  # lon
        out[:, 1] = dr2_ds * ds_dh * dh_dphi1 * deg  # lat
        out[:, 2] = 2.0 * (Xi[:, 2] - Xj[:, 2]) / l2**2  # depth
        return out
    raise ValueError(cov.dfn_str)


def _dr2_dlength(X, rows, cols, cov: GPCov, which: int):
    """d r2 / d lengthscale[which] on the pattern."""
    dfn = np.asarray(cov.dfn_params, dtype=np.float64)
    Xi = X[rows]
    Xj = X[cols]
    if cov.dfn_str == "euclidean":
        d = Xi[:, which] - Xj[:, which]
        return -2.0 * d * d / dfn[which] ** 3
    elif cov.dfn_str == "lld":
        if which == 0:
            from gprf_tpu.data.seismic import AVG_EARTH_RADIUS_KM as R

            phi1, lam1 = np.radians(Xi[:, 1]), np.radians(Xi[:, 0])
            phi2, lam2 = np.radians(Xj[:, 1]), np.radians(Xj[:, 0])
            h = (
                np.sin((phi1 - phi2) / 2.0) ** 2
                + np.cos(phi1) * np.cos(phi2) * np.sin((lam1 - lam2) / 2.0) ** 2
            )
            s = 2.0 * np.arcsin(np.minimum(np.sqrt(np.maximum(h, 0.0)), 1.0)) * R
            return -2.0 * s * s / dfn[0] ** 3
        else:
            dz = Xi[:, 2] - Xj[:, 2]
            return -2.0 * dz * dz / dfn[1] ** 3
    raise ValueError(cov.dfn_str)


def gaussian_llgrad_sparse(
    X,
    Y,
    cov: GPCov,
    noise_var,
    grad_X: bool = False,
    grad_cov: bool = False,
    max_distance: float = 5.0,
):
    """(ll, gradX, gradC) of one Gaussian block with truncated-support
    sparse linear algebra (reference ``gprf.py:378-494``)."""
    import scipy.sparse

    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    n, dx = X.shape
    dy = Y.shape[1]
    ncov = 2 + len(np.asarray(cov.dfn_params))
    if n == 0:
        return 0.0, np.zeros(X.shape), np.zeros((ncov,))

    # pattern within max_distance scaled lengthscales (full symmetric)
    coords, inflate = _query_coords(X, cov)
    lr, lc = range_pairs(coords, max_distance * inflate)
    r2l = _scaled_r2_pairs(X, lr, lc, cov)
    keep = r2l <= max_distance**2
    lr, lc, r2l = lr[keep], lc[keep], r2l[keep]
    offd = lr != lc
    rows = np.concatenate([lr, lc[offd]])
    cols = np.concatenate([lc, lr[offd]])
    r2 = np.concatenate([r2l, r2l[offd]])
    k_vals = _profile_np(cov, r2)
    diag = rows == cols
    K = scipy.sparse.csr_matrix(
        (k_vals + noise_var * diag, (rows, cols)), shape=(n, n)
    )

    factor = SparseFactor(K.tocsc())
    alpha = factor.solve(Y)
    logdet = factor.logdet()
    ll = -0.5 * np.sum(Y * alpha) - 0.5 * dy * logdet - 0.5 * dy * n * LOG_2PI

    gradX = np.zeros(())
    gradC = np.zeros(())
    if not (grad_X or grad_cov):
        return ll, gradX, gradC

    Z = factor.selected_inverse()  # K^-1 on the factor pattern (symmetric)
    dk_dr2 = _dprofile_dr2(cov, r2, k_vals)

    def _pattern_matrix(vals):
        return scipy.sparse.csr_matrix((vals, (rows, cols)), shape=(n, n))

    if grad_X:
        gradX = np.zeros((n, dx))
        dr2_dx = _dr2_dx_rows(X, rows, cols, cov)
        for i in range(dx):
            vals = dk_dr2 * dr2_dx[:, i]
            vals = np.where(diag, 0.0, vals)  # self-derivative zeroed (gprf.py:354)
            sdK = _pattern_matrix(vals)
            d_logdet = -dy * np.asarray(sdK.multiply(Z).sum(axis=1)).reshape(-1)
            dK_alpha = sdK @ alpha
            gradX[:, i] = d_logdet + np.sum(dK_alpha * alpha, axis=1)

    if grad_cov:
        gradC = np.zeros((ncov,))
        sv = float(np.asarray(cov.wfn_params)[0])
        for i in range(ncov):
            if i == 0:
                dKdi = scipy.sparse.eye(n, format="csr")
            elif i == 1:
                dKdi = _pattern_matrix(k_vals / sv)
            else:
                vals = dk_dr2 * _dr2_dlength(X, rows, cols, cov, i - 2)
                dKdi = _pattern_matrix(vals)
            dlldi = 0.5 * np.sum(alpha * (dKdi @ alpha))
            dlldi -= 0.5 * dy * dKdi.multiply(Z).sum()
            gradC[i] = dlldi

    return ll, gradX, gradC
