"""NumPy oracle: an independent implementation of the reference math.

This is the test oracle called for by SURVEY.md §4 — the Gaussian block
log-likelihood and its analytic gradients (the math of reference
``gaussian_llgrad``, ``gprf.py:496-591``) and the GPRF combination rule
(``gprf.py:206-296``), written directly from the formulas in plain NumPy.
Everything here is float64 and deliberately naive (explicit inverses, Python
loops) so it is easy to audit.
"""

from __future__ import annotations

import numpy as np

LOG_2PI = np.log(2.0 * np.pi)
SQRT3 = np.sqrt(3.0)
AVG_EARTH_RADIUS_KM = 6371.0


# ----- kernels -------------------------------------------------------------


def dist_deg(loc1, loc2):
    """Great-circle distance in degrees (spec: run_seismic.py:19-49)."""
    lon1, lat1 = loc1
    lon2, lat2 = loc2
    rlon1, rlat1, rlon2, rlat2 = map(np.radians, (lon1, lat1, lon2, lat2))
    dist_rad = 2 * np.arcsin(
        np.sqrt(
            np.sin((rlat1 - rlat2) / 2.0) ** 2
            + np.cos(rlat1) * np.cos(rlat2) * np.sin((rlon1 - rlon2) / 2.0) ** 2
        )
    )
    return np.degrees(dist_rad)


def dist_km(loc1, loc2):
    return np.radians(dist_deg(loc1, loc2)) * AVG_EARTH_RADIUS_KM


def scaled_r2(X1, X2, lscales, dfn="euclidean"):
    n1, n2 = len(X1), len(X2)
    r2 = np.zeros((n1, n2))
    if dfn == "euclidean":
        for a in range(n1):
            for b in range(n2):
                r2[a, b] = np.sum(((X1[a] - X2[b]) / lscales) ** 2)
    elif dfn == "lld":
        for a in range(n1):
            for b in range(n2):
                ds = dist_km((X1[a, 0], X1[a, 1]), (X2[b, 0], X2[b, 1]))
                dz = X1[a, 2] - X2[b, 2]
                r2[a, b] = (ds / lscales[0]) ** 2 + (dz / lscales[1]) ** 2
    else:
        raise ValueError(dfn)
    return r2


def kernel_np(X1, X2, sv, lscales, dfn="euclidean", wfn="se"):
    r2 = scaled_r2(X1, X2, lscales, dfn=dfn)
    if wfn == "se":
        return sv * np.exp(-r2)
    elif wfn == "matern32":
        r = np.sqrt(r2)
        return sv * (1.0 + SQRT3 * r) * np.exp(-SQRT3 * r)
    raise ValueError(wfn)


# ----- single Gaussian term with analytic gradients (SE/euclidean) ---------


def gaussian_llgrad_np(X, Y, sv, lscales, noise_var, dfn="euclidean", wfn="se"):
    """(ll, gradX, gradCov) for one dense block; gradCov = [d/dnv, d/dsv,
    d/dl...]. Analytic gradients implemented for the SE/euclidean case."""
    n, dx = X.shape
    dy = Y.shape[1]
    K = kernel_np(X, X, sv, lscales, dfn=dfn, wfn=wfn) + noise_var * np.eye(n)
    Kinv = np.linalg.inv(K)
    alpha = Kinv @ Y
    sign, logdet = np.linalg.slogdet(K)
    assert sign > 0
    ll = -0.5 * np.sum(Y * alpha) - 0.5 * dy * logdet - 0.5 * dy * n * LOG_2PI

    def dll_given_dK(dK):
        return 0.5 * np.sum(alpha * (dK @ alpha)) - 0.5 * dy * np.sum(Kinv * dK)

    # gradX: dK/dX[p,i] = e_p v^T + v e_p^T, v_q = dk(x_p, x_q)/dx_p[i], v_p = 0
    gradX = np.zeros((n, dx))
    if dfn == "euclidean" and wfn == "se":
        Knl = K - noise_var * np.eye(n)  # noiseless kernel values
        for p in range(n):
            for i in range(dx):
                v = Knl[p, :] * (-2.0 * (X[p, i] - X[:, i]) / lscales[i] ** 2)
                v[p] = 0.0
                dK = np.zeros((n, n))
                dK[p, :] += v
                dK[:, p] += v
                gradX[p, i] = dll_given_dK(dK)
    else:
        gradX[:] = np.nan  # use finite differences instead

    # gradCov
    ncov = 2 + len(lscales)
    gradC = np.zeros(ncov)
    gradC[0] = dll_given_dK(np.eye(n))  # d/d noise_var
    Knl = K - noise_var * np.eye(n)
    gradC[1] = dll_given_dK(Knl / sv)  # d/d signal_var
    if dfn == "euclidean" and wfn == "se":
        for i in range(len(lscales)):
            D2 = np.subtract.outer(X[:, i], X[:, i]) ** 2
            dK = Knl * (2.0 * D2 / lscales[i] ** 3)
            gradC[2 + i] = dll_given_dK(dK)
    else:
        gradC[2:] = np.nan
    return ll, gradX, gradC


# ----- GPRF combination ----------------------------------------------------


def gprf_llgrad_np(
    X, Y, block_idxs, neighbors, sv, lscales, noise_var, dfn="euclidean", wfn="se"
):
    """Full GPRF objective + gradients via the combination rule of
    gprf.py:206-296, built on the per-term oracle above."""
    n, dx = X.shape
    neighbor_count = {i: 0 for i in range(len(block_idxs))}
    for i, j in neighbors:
        neighbor_count[i] += 1
        neighbor_count[j] += 1

    ll = 0.0
    gradX = np.zeros((n, dx))
    ncov = 2 + len(lscales)
    gradC = np.zeros(ncov)

    for bi, idxs in enumerate(block_idxs):
        ull, ugX, ugC = gaussian_llgrad_np(
            X[idxs], Y[idxs], sv, lscales, noise_var, dfn=dfn, wfn=wfn
        )
        w = 1.0 - neighbor_count[bi]
        ll += w * ull
        gradX[idxs] += w * ugX
        gradC += w * ugC

    for i, j in neighbors:
        idxs = np.concatenate([block_idxs[i], block_idxs[j]])
        pll, pgX, pgC = gaussian_llgrad_np(
            X[idxs], Y[idxs], sv, lscales, noise_var, dfn=dfn, wfn=wfn
        )
        ll += pll
        gradX[idxs] += pgX
        gradC += pgC

    return ll, gradX, gradC


def fd_grad(f, x, eps=1e-6):
    """Central finite differences of scalar f at flat array x."""
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        old = flat[i]
        flat[i] = old + eps
        fp = f(x)
        flat[i] = old - eps
        fm = f(x)
        flat[i] = old
        gf[i] = (fp - fm) / (2 * eps)
    return g
