"""Blocked (panel) Cholesky and triangular solve in pure JAX.

XLA's monolithic cholesky/triangular_solve kernels exceed the TPU's scoped
VMEM for wide matrices at float64 (observed at m ~ 1056 f64: "exceeded
scoped vmem limit").  These right-looking panel versions keep every XLA
primitive at panel width — the trailing updates become large MXU matmuls,
which is also the better layout for wide-matrix f32.  Static Python loops
over panels (shapes are static), batched over leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def blocked_cholesky(K, panel: int = 256):
    """Lower Cholesky of SPD [..., m, m] via right-looking panels."""
    m = K.shape[-1]
    if m <= panel:
        return jnp.linalg.cholesky(K)
    L = jnp.zeros_like(K)
    A = K
    with jax.default_matmul_precision("highest"):
        for s in range(0, m, panel):
            e = min(s + panel, m)
            Ld = jnp.linalg.cholesky(A[..., s:e, s:e])
            L = L.at[..., s:e, s:e].set(Ld)
            if e < m:
                B = A[..., e:, s:e]
                # Lb = B Ld^-T  (rows of the panel column below the diagonal)
                Lb = jax.lax.linalg.triangular_solve(
                    Ld, B, left_side=False, lower=True, transpose_a=True
                )
                L = L.at[..., e:, s:e].set(Lb)
                A = A.at[..., e:, e:].add(
                    -jnp.einsum("...ik,...jk->...ij", Lb, Lb)
                )
    return L


def blocked_tri_solve(L, B, panel: int = 256):
    """Solve L X = B (L lower-triangular [..., m, m], B [..., m, k]) by
    forward panels."""
    m = L.shape[-1]
    if m <= panel:
        return jax.lax.linalg.triangular_solve(
            L, B, left_side=True, lower=True, transpose_a=False
        )
    parts = []
    with jax.default_matmul_precision("highest"):
        for s in range(0, m, panel):
            e = min(s + panel, m)
            rhs = B[..., s:e, :]
            if parts:
                X_done = jnp.concatenate(parts, axis=-2)
                rhs = rhs - jnp.einsum(
                    "...ij,...jk->...ik", L[..., s:e, :s], X_done
                )
            parts.append(
                jax.lax.linalg.triangular_solve(
                    L[..., s:e, s:e], rhs, left_side=True, lower=True,
                    transpose_a=False,
                )
            )
    return jnp.concatenate(parts, axis=-2)
