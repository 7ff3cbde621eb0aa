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
    """Lower Cholesky of SPD [..., m, m] via recursive 2x2 panel blocks.

    Built from slices and concatenations only — no scatter updates, whose
    autodiff transposes allocate whole-matrix scatter-adds that exceed the
    TPU scoped-VMEM limit at wide shapes.
    """
    m = K.shape[-1]
    if m <= panel:
        return jnp.linalg.cholesky(K)
    with jax.default_matmul_precision("highest"):
        A11 = K[..., :panel, :panel]
        A21 = K[..., panel:, :panel]
        A22 = K[..., panel:, panel:]
        L11 = jnp.linalg.cholesky(A11)
        # L21 = A21 L11^-T
        L21 = jax.lax.linalg.triangular_solve(
            L11, A21, left_side=False, lower=True, transpose_a=True
        )
        S = A22 - jnp.einsum("...ik,...jk->...ij", L21, L21)
        L22 = blocked_cholesky(S, panel)
        top = jnp.concatenate(
            [L11, jnp.zeros(K.shape[:-2] + (panel, m - panel), K.dtype)], axis=-1
        )
        bot = jnp.concatenate([L21, L22], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)


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
