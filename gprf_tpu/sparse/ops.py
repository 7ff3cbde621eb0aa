"""Sparse kernel matrices and prior sampling for large n.

Rebuild of the reference large-n machinery: the kernel's effective support
is truncated at ``max_scaled_dist`` scaled lengthscales, the surviving
pattern comes from a native kd-tree range query (cover-tree analog), and the
sparse SPD system is factored by the native up-looking Cholesky after an RCM
fill-reducing permutation (CHOLMOD analog with its P/Pinv handling,
reference ``synthetic.py:128-135``).
"""

from __future__ import annotations

import numpy as np

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.sparse.native import NativeCholesky, range_pairs, rcm_order

AVG_EARTH_RADIUS_KM = 6371.0


def _query_coords(X: np.ndarray, cov: GPCov):
    """Map inputs to a euclidean space where a radius-``D`` query returns a
    superset of all pairs with scaled kernel distance <= D.

    euclidean dfn: coordinates divided by lengthscales (exact).
    lld dfn: scaled ECEF embedding at depth-adjusted radius; the chord
    underestimates the arc, so the query radius gets a small inflation and
    the exact scaled distance filters afterwards.
    """
    dfn_params = np.asarray(cov.dfn_params, dtype=np.float64)
    if cov.dfn_str == "euclidean":
        return np.ascontiguousarray(X / dfn_params), 1.0
    elif cov.dfn_str == "lld":
        lon = np.radians(X[:, 0])
        lat = np.radians(X[:, 1])
        depth = X[:, 2]
        l_h, l_z = dfn_params
        r = AVG_EARTH_RADIUS_KM
        ecef = np.stack(
            [r * np.cos(lat) * np.cos(lon), r * np.cos(lat) * np.sin(lon), r * np.sin(lat)],
            axis=1,
        )
        # 3-d embedding: surface chord in km scaled by l_h; the depth delta
        # is folded in by the exact filter (we query the surface at an
        # inflated radius covering the worst-case depth contribution)
        coords = np.concatenate([ecef / l_h, (depth / l_z)[:, None]], axis=1)
        # kd-tree is 3-d max: drop to 3-d by absorbing depth into the radius
        # only when depth spread is small relative to the query radius;
        # otherwise keep the scaled 3-d ECEF and inflate.
        return np.ascontiguousarray(ecef / l_h), 1.05
    raise ValueError(cov.dfn_str)


def _scaled_r2_pairs(X, rows, cols, cov: GPCov):
    """Exact scaled squared distance for an explicit pair list (NumPy)."""
    dfn_params = np.asarray(cov.dfn_params, dtype=np.float64)
    Xi = X[rows]
    Xj = X[cols]
    if cov.dfn_str == "euclidean":
        d = (Xi - Xj) / dfn_params
        return np.sum(d * d, axis=1)
    elif cov.dfn_str == "lld":
        rlon1, rlat1 = np.radians(Xi[:, 0]), np.radians(Xi[:, 1])
        rlon2, rlat2 = np.radians(Xj[:, 0]), np.radians(Xj[:, 1])
        hav = (
            np.sin((rlat1 - rlat2) / 2.0) ** 2
            + np.cos(rlat1) * np.cos(rlat2) * np.sin((rlon1 - rlon2) / 2.0) ** 2
        )
        d_surf = 2.0 * np.arcsin(np.minimum(np.sqrt(hav), 1.0)) * AVG_EARTH_RADIUS_KM
        d_depth = Xi[:, 2] - Xj[:, 2]
        return (d_surf / dfn_params[0]) ** 2 + (d_depth / dfn_params[1]) ** 2
    raise ValueError(cov.dfn_str)


def _profile_np(cov: GPCov, r2):
    sv = float(np.asarray(cov.wfn_params)[0])
    if cov.wfn_str == "se":
        return sv * np.exp(-r2)
    elif cov.wfn_str == "matern32":
        r = np.sqrt(r2)
        s3 = np.sqrt(3.0)
        return sv * (1.0 + s3 * r) * np.exp(-s3 * r)
    elif cov.wfn_str == "compact2":
        r = np.sqrt(r2)
        base = np.maximum(1.0 - r, 0.0)
        return sv * base**4 * (4.0 * r + 1.0)
    raise ValueError(cov.wfn_str)


def sparse_kernel_matrix(X, cov: GPCov, max_scaled_dist=4.0, noise_var=0.0):
    """Sparse kernel matrix truncated at ``max_scaled_dist`` scaled
    lengthscales, as a scipy CSC matrix (both triangles).

    Equivalent of ``VectorTree.sparse_training_kernel_matrix(X, max_dist)``
    (reference ``gprf.py:407``, ``synthetic.py:125``).
    """
    import scipy.sparse

    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    coords, inflate = _query_coords(X, cov)
    rows, cols = range_pairs(coords, max_scaled_dist * inflate)
    r2 = _scaled_r2_pairs(X, rows, cols, cov)
    keep = r2 <= max_scaled_dist**2
    rows, cols, r2 = rows[keep], cols[keep], r2[keep]
    vals = _profile_np(cov, r2)
    lower = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(n, n))
    diag_mask = rows == cols
    K = lower + lower.T - scipy.sparse.coo_matrix(
        (vals[diag_mask], (rows[diag_mask], cols[diag_mask])), shape=(n, n)
    )
    if noise_var:
        K = K + noise_var * scipy.sparse.eye(n)
    return K.tocsc()


class SparseFactor:
    """RCM-permuted sparse Cholesky of an SPD scipy matrix.

    CHOLMOD-factor stand-in: ``solve``, ``logdet``, ``L``/``P`` (permuted
    factor + permutation, as the reference consumes at
    ``synthetic.py:130-135`` and ``gprf.py:420-438``).
    """

    def __init__(self, K_csc):
        import scipy.sparse

        K = K_csc.tocsc()
        n = K.shape[0]
        self.n = n
        perm = rcm_order(n, K.indptr.astype(np.int64), K.indices.astype(np.int32))
        self.perm = perm
        self.iperm = np.argsort(perm)
        Kp = K[perm][:, perm].tocsc()
        lower = scipy.sparse.tril(Kp, format="csc")
        self._chol = NativeCholesky(
            n, lower.indptr.astype(np.int64), lower.indices.astype(np.int32), lower.data
        )

    def logdet(self) -> float:
        return self._chol.logdet()

    def solve(self, b):
        b = np.asarray(b, dtype=np.float64)
        bp = b[self.perm]
        xp = self._chol.solve(bp)
        return xp[self.iperm]

    def lmult_prior_sample(self, z):
        """P^T L z — a draw from N(0, K) given iid z (the reference's
        ``(L * z)[Pinv]``, ``synthetic.py:131-135``)."""
        y = self._chol.lmult(np.asarray(z, dtype=np.float64))
        return y[self.iperm]

    def L(self):
        return self._chol.L()

    def selected_inverse(self):
        """K^-1 on (a superset of) K's pattern, in the ORIGINAL ordering,
        as a symmetric scipy CSR — the reference's ``factor.inv()`` analog
        (gprf.py:424), exact on every entry the sparse gradient products
        read."""
        import scipy.sparse

        Zl = self._chol.selected_inverse_lower()  # permuted lower pattern
        Zsym = Zl + Zl.T - scipy.sparse.diags(Zl.diagonal())
        # undo the RCM permutation
        return Zsym[self.iperm][:, self.iperm].tocsr()

    def P(self):
        return self.perm


def sample_y_banded(X, cov: GPCov, noise_var, yd, max_scaled_dist=4.0, rng=None,
                    verbose=False):
    """EXACT draw from N(0, K_truncated + nv I) at large n via a banded
    Cholesky: RCM-order the truncated-support pattern, store the permuted
    matrix in LAPACK lower-band form, factor with ``dpbtrf``
    (``scipy.linalg.cholesky_banded``), and return ``P^T L z``.

    This is the scalable *exact* counterpart of :func:`sample_y_sparse`
    (same distribution — any factorization of the same truncated kernel
    draws from the identical law, matching the reference's CHOLMOD draw at
    ``synthetic.py:103-137`` up to the fill-reducing ordering).  On 2-D
    point clouds RCM bandwidth grows ~O(sqrt(n·density)), so the banded
    factorization runs at dense-BLAS speed where the generic up-looking
    sparse factor's fill-in is impractical single-threaded (n ~ 80k).
    """
    import time

    import scipy.linalg

    t0 = time.time()
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=max_scaled_dist, noise_var=noise_var)
    n = K.shape[0]
    perm = rcm_order(n, K.indptr.astype(np.int64), K.indices.astype(np.int32))
    rank = np.empty(n, dtype=np.int64)
    rank[perm] = np.arange(n)
    Kc = K.tocoo()
    pr = rank[Kc.row]
    pc = rank[Kc.col]
    lower = pr >= pc
    pr, pc, vals = pr[lower], pc[lower], Kc.data[lower]
    del Kc, K
    bw = int((pr - pc).max()) if len(pr) else 0
    if verbose:
        print(
            "sample_y_banded: n=%d nnz(tril)=%d rcm bandwidth=%d (%.1fs)"
            % (n, len(vals), bw, time.time() - t0)
        )
    ab = np.zeros((bw + 1, n), dtype=np.float64)
    ab[pr - pc, pc] = vals
    del pr, pc, vals
    # jitter escalation mirrors linalg/jitchol.py: the truncated kernel's
    # dropped tail (< exp(-max_scaled_dist^2) per entry) is far below
    # noise_var, so the first attempt virtually always succeeds
    jitter = 0.0
    for attempt in range(7):
        try:
            c = scipy.linalg.cholesky_banded(ab, lower=True, check_finite=False)
            break
        except np.linalg.LinAlgError:
            new_jitter = max(ab[0].mean() * 1e-8 * (10.0**attempt), 1e-12)
            ab[0] += new_jitter - jitter
            jitter = new_jitter
    else:
        raise np.linalg.LinAlgError("banded kernel matrix not positive definite")
    if verbose:
        print("sample_y_banded: dpbtrf done (%.1fs)" % (time.time() - t0))
    if rng is None:
        z = np.random.randn(n, yd)
    else:
        z = rng.standard_normal((n, yd))
    from scipy.linalg.blas import dtbmv

    yp = np.empty((n, yd), dtype=np.float64)
    for j in range(yd):
        yp[:, j] = dtbmv(bw, c, np.ascontiguousarray(z[:, j]), lower=1)
    out = np.empty_like(yp)
    out[perm] = yp
    if verbose:
        print("sample_y_banded: draw complete (%.1fs)" % (time.time() - t0))
    return out


def sample_y_sparse(X, cov: GPCov, noise_var, yd, max_scaled_dist=4.0, rng=None):
    """Y ~ N(0, K_sparse + nv I) for large n (reference ``synthetic.py:115-137``).

    RNG note: uses the global np.random state (matching the reference's
    seeding discipline) unless ``rng`` is given.
    """
    K = sparse_kernel_matrix(X, cov, max_scaled_dist=max_scaled_dist, noise_var=noise_var)
    factor = SparseFactor(K)
    n = K.shape[0]
    if rng is None:
        z = np.random.randn(n, yd)
    else:
        z = rng.standard_normal((n, yd))
    return factor.lmult_prior_sample(z)
