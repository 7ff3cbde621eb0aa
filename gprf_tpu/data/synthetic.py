"""Synthetic GP-LVM data generation.

Rebuild of the reference ``synthetic.py``: latent locations X are sampled
uniformly or from structured "crazy shapes" selected by seed ranges
(``synthetic.py:91-100``: <1000 uniform, 1000-1099 fault, 1100-1199 X,
1200-1299 diamond, 1300-1349 crazy-lines, 1350-1399 tight crazy-lines), and
outputs Y are drawn from the GP prior.

Prior sampling strategy: the reference uses a dense ``jitchol`` below 40k
points and CHOLMOD sparse factorization above (``synthetic.py:103-137``).
Here the dense path runs as one host jitchol, moderate n uses the native
sparse factorization in :mod:`gprf_tpu.sparse` (kd-tree range query + C++
sparse Cholesky), and very large n uses sequential block-conditional
(Vecchia-style) sampling (:func:`sample_y_blocked`).
RNG: seeding matches the reference's ``np.random.seed(seed)`` global-state
convention so seeds map to the same shape families.
"""

from __future__ import annotations

import numpy as np

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.linalg.jitchol import jitchol

DENSE_SAMPLING_LIMIT = 12000  # reference used 40000 (synthetic.py:106); host
# dense cholesky above ~12k costs minutes, so the sparse/blocked samplers
# take over earlier


def sample_points_line(n, x1, x2, std=0.005):
    x1 = np.asarray(x1, dtype=float)
    x2 = np.asarray(x2, dtype=float)
    v = x2 - x1
    rs = np.random.rand(int(n))
    pts = x1[None, :] + rs[:, None] * v[None, :]
    return pts + np.random.randn(*pts.shape) * std


def sample_crazy_shape(seed, n, std=0.005):
    """Structured latent point clouds selected by seed range
    (``synthetic.py:4-100``)."""
    np.random.seed(seed)
    if seed % 1000 > 4:
        std = 0.27386127875258309 / np.sqrt(n)

    def sample_X(n):
        X1 = sample_points_line(n // 2, (0.1, 0.1), (0.9, 0.9))
        X2 = sample_points_line(n - n // 2, (0.1, 0.9), (0.9, 0.1))
        return np.vstack([X1, X2])

    def sample_diamond(n):
        q = n // 4
        X1 = sample_points_line(q, (0.5, 0.9), (0.9, 0.5))
        X2 = sample_points_line(q, (0.5, 0.9), (0.1, 0.5))
        X3 = sample_points_line(q, (0.1, 0.5), (0.5, 0.1))
        X4 = sample_points_line(n - 3 * q, (0.5, 0.1), (0.9, 0.5))
        return np.vstack([X1, X2, X3, X4])

    def sample_star(points=10, n=1000):
        Xs = []
        angles = (2 * np.pi) / points
        for i in range(points):
            x1 = np.array((0.5, 0.5))
            theta = i * angles
            v = np.array((np.cos(theta), np.sin(theta)))
            v = 0.4 * v / np.linalg.norm(v)
            Xs.append(sample_points_line(n // 4, x1, x1 + v))
        return np.vstack(Xs)

    def sample_crazy_lines(n, std=0.005):
        seg_npts = 250
        segments = max(n // seg_npts, 1)
        segment_len = 41.10960958218894 / np.sqrt(n)  # length 1.3 at 1000 pts
        Xs = []
        remaining = n
        for i in range(segments):
            npts = seg_npts if i < segments - 1 else remaining
            while True:
                x1 = np.random.rand(2)
                v = np.random.rand(2)
                v /= np.linalg.norm(v)
                x2 = x1 + v * segment_len
                if 0 < x2[0] < 1 and 0 < x2[1] < 1:
                    Xs.append(sample_points_line(npts, x1, x2, std=std))
                    remaining -= npts
                    break
        return np.vstack(Xs)

    def sample_fault(n, std=0.005):
        sn = n // 10
        pts = [
            ((0.1, 0.1), (0.2, 0.2)),
            ((0.2, 0.2), (0.2, 0.5)),
            ((0.2, 0.2), (0.3, 0.3)),
            ((0.3, 0.3), (0.5, 0.1)),
            ((0.3, 0.3), (0.4, 0.45)),
            ((0.4, 0.45), (0.2, 0.8)),
            ((0.4, 0.45), (0.5, 0.6)),
            ((0.5, 0.6), (0.9, 0.4)),
            ((0.5, 0.6), (0.8, 0.9)),
            ((0.9, 0.4), (0.8, 0.1)),
        ]
        Xs = [sample_points_line(sn, a, b, std=std) for a, b in pts[:-1]]
        Xs.append(sample_points_line(n - 9 * sn, *pts[-1], std=std))
        return np.vstack(Xs)

    if seed < 1100:
        return sample_fault(n=n)
    elif seed < 1200:
        return sample_X(n=n)
    elif seed < 1300:
        return sample_diamond(n=n)
    elif seed < 1350:
        return sample_crazy_lines(n=n, std=0.005)
    elif seed < 1400:
        return sample_crazy_lines(n=n, std=0.00005)
    raise ValueError(f"seed {seed} outside crazy-shape ranges")


def sample_y(X, cov: GPCov, noise_var, yd, sparse_lscales=4.0):
    """Draw Y ~ N(0, K(X) + noise_var I), [n, yd].

    Dense jitchol below :data:`DENSE_SAMPLING_LIMIT`; above it, sparse
    factorization with support truncated at ``sparse_lscales`` scaled
    lengthscales (reference ``synthetic.py:103-137``).
    """
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n < DENSE_SAMPLING_LIMIT:
        from gprf_tpu.kernels.covfn import kernel_matrix
        import jax.numpy as jnp

        KK = np.asarray(kernel_matrix(cov, jnp.asarray(X), noise_var=noise_var), dtype=np.float64)
        L = jitchol(KK)
        Z = np.random.randn(n, yd)
        return L @ Z
    import os

    sampler = os.environ.get("GPRF_SAMPLER", "")
    if sampler == "hi":
        # high-fidelity Vecchia: ~4x conditioning points / kNN
        return sample_y_blocked(X, cov, noise_var, yd, n_condition=8192, knn=96)
    if sampler == "vecchia" or (not sampler and n <= 20000):
        if n <= 20000 and sampler != "vecchia":
            from gprf_tpu.sparse import sample_y_sparse

            return sample_y_sparse(
                X, cov, noise_var, yd, max_scaled_dist=sparse_lscales
            )
        # legacy approximate sampler (rounds 1-4 drew the large-n datasets
        # this way); kept for reproducing those runs
        return sample_y_blocked(X, cov, noise_var, yd)
    # DEFAULT at large n (round 5, was Vecchia): EXACT truncated-support
    # draw via RCM + LAPACK banded Cholesky — distributionally identical to
    # the reference's CHOLMOD draw (synthetic.py:115-137).  The round-5
    # sampler-fidelity control measured the Vecchia approximation DEPRESSING
    # the 80k GPRF family by ~11% latent error (0.000730 vs 0.000652 at
    # GPRF-100, reference 0.000640) while leaving Local rows at parity —
    # the GPRF objective is exactly the estimator that exploits the
    # cross-block consistency the approximate draw weakens (docs/RESULTS.md).
    from gprf_tpu.sparse import sample_y_banded

    return sample_y_banded(
        X, cov, noise_var, yd, max_scaled_dist=sparse_lscales, verbose=True
    )


def sampler_suffix(n) -> str:
    """Cache-key / run-dir suffix identifying the effective large-n prior
    sampler (different samplers = different data realizations).  The legacy
    Vecchia draws keep the historical unsuffixed names; the round-5 exact
    default and the explicit variants get tagged."""
    import os

    sampler = os.environ.get("GPRF_SAMPLER", "")
    if sampler == "vecchia":
        return ""
    if not sampler:
        sampler = "exact" if n > 20000 else ""
    return "_y%s" % sampler if sampler else ""


def sample_synthetic(seed=1, n=400, xd=2, yd=10, lscale=0.1, noise_var=0.01):
    """(X, Y, cov): latent locations + GP-prior outputs + the generating cov
    (reference ``synthetic.py:139-153``)."""
    if seed < 1000:
        np.random.seed(seed)
        X = np.random.rand(n, xd)
    else:
        X = sample_crazy_shape(seed, n)
        assert X.shape[0] == n
    cov = GPCov.create([1.0], [lscale] * xd, "euclidean", "se")
    y = sample_y(X, cov, noise_var, yd)
    return X, y, cov


def sample_y_blocked(X, cov: GPCov, noise_var, yd, blocksize=512, n_condition=1536,
                     knn=24, rng=None):
    """Vecchia sequential block sampling from the GP prior for very large n:
    Morton-order the points, partition into consecutive blocks, and draw
    each block from its exact conditional given the *nearest*
    previously-sampled points (k-NN per new point, unioned and capped at
    ``n_condition``).

    Nearest-among-previous conditioning matters: a contiguous
    Morton-window is spatially one-sided and leaves kernel-inconsistent
    seams in the sampled field (observed as the true-X GPRF objective
    scoring far below the optimum).  This is the scalable complement to the
    truncated-support sparse sampler (reference ``synthetic.py:115-137``),
    with dense block-conditional Cholesky factorizations instead of one
    global sparse factor (whose fill-in is impractical at n ~ 80k
    single-threaded).
    """
    from scipy.spatial import cKDTree

    from gprf_tpu.kernels.hostnp import cross_kernel_matrix_np
    from gprf_tpu.partition.morton import sort_morton

    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    if rng is None:
        rng = np.random
    Xs, perm = sort_morton(X)
    Y = np.zeros((n, yd))
    start = 0
    while start < n:
        end = min(start + blocksize, n)
        Xb = Xs[start:end]
        Kbb = cross_kernel_matrix_np(cov, Xb, Xb) + noise_var * np.eye(end - start)
        if start == 0:
            L = jitchol(Kbb)
            Y[start:end] = L @ rng.standard_normal((end - start, yd))
        else:
            # nearest previously-sampled points (union of per-point k-NN)
            tree = cKDTree(Xs[:start])
            k = min(knn, start)
            _, idx = tree.query(Xb, k=k)
            cond = np.unique(np.asarray(idx).reshape(-1))
            if len(cond) > n_condition:
                # keep the closest by distance to the block centroid
                dc = np.linalg.norm(Xs[cond] - Xb.mean(axis=0), axis=1)
                cond = cond[np.argsort(dc)[:n_condition]]
            Xc = Xs[cond]
            Kcb = cross_kernel_matrix_np(cov, Xc, Xb)
            Kcc = cross_kernel_matrix_np(cov, Xc, Xc) + noise_var * np.eye(len(cond))
            Lc = jitchol(Kcc)
            A = np.linalg.solve(Lc, Kcb)          # Lc^-1 Kcb
            mean = A.T @ np.linalg.solve(Lc, Y[cond])
            Sigma = Kbb - A.T @ A
            Ls = jitchol(Sigma)
            Y[start:end] = mean + Ls @ rng.standard_normal((end - start, yd))
        start = end
    # undo the morton permutation
    out = np.empty_like(Y)
    out[perm] = Y
    return out
