"""Wide-matrix Cholesky/solves: lanes-kernel panels + MXU trailing updates.

The batch-in-lanes Pallas kernels (:mod:`gprf_tpu.ops.pallas_mvn`) are
VMEM-bounded at m <= ~168, so the paper's widest blocks (80k points / 100
blocks => m ~ 888) previously fell back to XLA's monolithic batched
Cholesky, whose m sequential panel steps run the batch in an outer loop
(~0.1% of peak).  These right-looking panel versions put each kind of work
on the right unit:

  * diagonal p x p panel factorizations -> the lanes Cholesky kernel
    (sequential in p, vectorized over the whole batch in lanes);
  * panel inversions -> the lanes triangular-inverse kernel, which turns
    every off-diagonal panel solve into a plain matmul;
  * off-diagonal panels and trailing updates -> large MXU einsums.

Recursive 2x2 blocking from slices and concatenations only (scatter-update
transposes allocate whole-matrix buffers that blow scoped VMEM at these
widths — same constraint as :mod:`gprf_tpu.linalg.blocked`).  All matmuls
run at HIGHEST precision: the Schur complements must stay numerically PSD.

Autodiff note: the composite K-cotangent of ``blocked_cholesky_lanes``
agrees with XLA's Cholesky VJP in its *symmetric part* (the recursion
assigns cross-block mass to the lower triangle; XLA symmetrizes).  That is
the standard Cholesky-gradient contract — valid whenever K is produced by
a symmetric-valued function of the upstream parameters, which holds for
every kernel-matrix caller in this codebase.

f32-only (the lanes kernels are f32 on TPU); f64 refinement keeps using
:mod:`gprf_tpu.linalg.blocked`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_to_panel(K, panel: int):
    """Extend [B, m, m] to the next panel multiple with an identity block
    (block-diagonal, zero cross terms): chol/inverse of the extension is the
    identity, so the factor/solution just carries the padding through."""
    m = K.shape[-1]
    mp = -(-m // panel) * panel
    if mp == m:
        return K, m
    B = K.shape[0]
    pad = mp - m
    right = jnp.zeros((B, m, pad), K.dtype)
    bottom = jnp.concatenate(
        [
            jnp.zeros((B, pad, m), K.dtype),
            jnp.broadcast_to(jnp.eye(pad, dtype=K.dtype), (B, pad, pad)),
        ],
        axis=2,
    )
    Kp = jnp.concatenate([jnp.concatenate([K, right], axis=2), bottom], axis=1)
    return Kp, m


def blocked_cholesky_lanes(K, panel: int = 128, interpret: bool = False):
    """Lower Cholesky of SPD [B, m, m] with lanes-kernel panels."""
    from gprf_tpu.ops.pallas_mvn import (
        batched_cholesky_pallas,
        batched_tri_inv_pallas,
    )

    Kp, m = _pad_to_panel(K, panel)

    def rec(A):
        mm = A.shape[-1]
        if mm <= panel:
            return batched_cholesky_pallas(A, interpret)
        p = panel
        A11 = A[:, :p, :p]
        A21 = A[:, p:, :p]
        A22 = A[:, p:, p:]
        with jax.default_matmul_precision("highest"):
            L11 = batched_cholesky_pallas(A11, interpret)
            W11 = batched_tri_inv_pallas(L11, interpret)
            # L21 = A21 L11^-T = A21 W11^T  (MXU)
            L21 = jnp.einsum("bij,bkj->bik", A21, W11)
            S = A22 - jnp.einsum("bik,bjk->bij", L21, L21)
        L22 = rec(S)
        top = jnp.concatenate(
            [L11, jnp.zeros((A.shape[0], p, mm - p), A.dtype)], axis=2
        )
        bot = jnp.concatenate([L21, L22], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    L = rec(Kp)
    return L[:, :m, :m]


def blocked_tri_solve_lanes(L, B_rhs, panel: int = 128, interpret: bool = False):
    """Solve L X = B (L lower [B, m, m], B [B, m, k]) with lanes-kernel
    panel inverses: every panel solve is W11 @ rhs on the MXU."""
    from gprf_tpu.ops.pallas_mvn import batched_tri_inv_pallas

    m = L.shape[-1]

    def rec(Lm, Bm):
        mm = Lm.shape[-1]
        if mm <= panel:
            W = batched_tri_inv_pallas(Lm, interpret)
            with jax.default_matmul_precision("highest"):
                return jnp.einsum("bij,bjk->bik", W, Bm)
        p = panel
        L11 = Lm[:, :p, :p]
        L21 = Lm[:, p:, :p]
        L22 = Lm[:, p:, p:]
        X1 = rec(L11, Bm[:, :p, :])
        with jax.default_matmul_precision("highest"):
            rhs2 = Bm[:, p:, :] - jnp.einsum("bij,bjk->bik", L21, X1)
        X2 = rec(L22, rhs2)
        return jnp.concatenate([X1, X2], axis=1)

    # m here always matches L from blocked_cholesky_lanes (already cropped),
    # so re-pad consistently: identity extension on L, zero rows on B.
    mp = -(-m // panel) * panel
    if mp != m:
        Lp, _ = _pad_to_panel(L, panel)
        Bp = jnp.concatenate(
            [B_rhs, jnp.zeros((B_rhs.shape[0], mp - m, B_rhs.shape[-1]), B_rhs.dtype)],
            axis=1,
        )
        return rec(Lp, Bp)[:, :m, :]
    return rec(L, B_rhs)
