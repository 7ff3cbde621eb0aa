"""Covariance (weight) functions over scaled distances.

Replaces treegp's ``wfn_str`` dispatch ("se", "matern32"; reference call
sites ``gprf.py:109``, ``synthetic.py:149``, ``run_seismic.py:299``).  All
functions are pure JAX: kernel matrices come out of one fused
distance+profile evaluation that XLA folds into the surrounding computation,
and every derivative the reference hand-codes in C++
(``kernel_deriv_wrt_xi_row``, ``kernel_deriv_wrt_i``; ``gprf.py:345-375``)
is obtained by autodiff through these definitions.
"""

from __future__ import annotations

import jax.numpy as jnp

from gprf_tpu.kernels.distances import (
    safe_sqrt,
    scaled_sq_distance,
)
from gprf_tpu.kernels.gpcov import GPCov

_SQRT3 = 1.7320508075688772


def _profile(wfn_str: str, r2, wfn_params):
    """Covariance profile as a function of the scaled squared distance.

    SE is expressed directly in r^2 (no sqrt -> smooth gradient through
    coincident points); Matern-3/2 needs r and goes through safe_sqrt.
    """
    sv = wfn_params[0]
    if wfn_str == "se":
        return sv * jnp.exp(-r2)
    elif wfn_str == "matern32":
        r = safe_sqrt(r2)
        return sv * (1.0 + _SQRT3 * r) * jnp.exp(-_SQRT3 * r)
    elif wfn_str == "compact2":
        # Wendland-type compactly supported profile (order 2, 3d):
        # sv * max(1 - r, 0)^4 * (4 r + 1); used by the sparse path where
        # exact zeros outside one scaled lengthscale give true sparsity.
        r = safe_sqrt(r2)
        base = jnp.maximum(1.0 - r, 0.0)
        return sv * base**4 * (4.0 * r + 1.0)
    raise ValueError(f"unknown weight function {wfn_str!r}")


def cov_value(cov: GPCov, r2):
    """Covariance profile applied to a scaled squared distance array."""
    return _profile(cov.wfn_str, r2, cov.wfn_params)


def cross_kernel_matrix(cov: GPCov, X1, X2):
    """Dense kernel matrix k(X1, X2), no noise term.

    Equivalent of ``VectorTree.kernel_matrix(X1, X2, False)``
    (reference ``gprf.py:339-343``).
    """
    r2 = scaled_sq_distance(cov.dfn_str, X1, X2, cov.dfn_params)
    return cov_value(cov, r2)


def kernel_matrix(cov: GPCov, X, noise_var=0.0):
    """Symmetric kernel matrix k(X, X) + noise_var * I.

    Equivalent of the reference ``GPRF.kernel(X)`` (``gprf.py:333-343``),
    which always adds observation noise on the diagonal for the one-argument
    form.
    """
    K = cross_kernel_matrix(cov, X, X)
    n = X.shape[0]
    return K + noise_var * jnp.eye(n, dtype=K.dtype)
