"""Block-2x2 Schur-split compositions over the batch-in-lanes kernels.

The lanes kernels (:mod:`gprf_tpu.ops.pallas_mvn`) are VPU-sequential in the
matrix width m: the factorization runs ~m recurrence steps of [m, m, T] VPU
work and the triangular substitution ~m*ncp steps, so their wall time grows
~m^3 with no MXU participation — and their VMEM scratch caps them at
m <= 168 (chol) / 144 (MVN).  This module splits a width-m problem once (or
recursively) into half-width leaf problems glued by MXU matmuls:

    K = [[A, K12], [K21, C]],   chol(K) = [[L_A, 0], [L21, L_C']]
    L21 = K21 W_A^T,  C' = C - L21 L21^T,  W_A = L_A^-1

Each split quarters the leaves' sequential VPU work (half the steps at a
quarter of the per-step area) and moves the coupling onto the MXU — the
opposite trade from :mod:`gprf_tpu.linalg.doubling`, which was measured to
lose because it pushes *all* the work into HIGHEST-precision matmuls; here
the leaves stay on the lanes kernels and only the two coupling products pay
the multi-pass matmul cost.  The split also lifts the VMEM cap: one level
reaches m <= 2*168, which covers the seismic partition (m = 192 -> 96/96
leaves) that round 2 left on the XLA fallback (VERDICT.md round 2, weak #3).

Everything here is a pure composition of custom-VJP leaf primitives and
einsums, so autodiff (and vmap, via the leaves' custom_vmap folding)
composes with no new backward rules.  Identity-padded masking (see
:func:`gprf_tpu.linalg.masked.pad_kernel_matrix`) passes through the split
exactly: a padded row in the A part stays an identity row of L_A, and a
padded row in the C part has zero K21/L21 rows, so C' keeps its identity
row and the leaf semantics are unchanged.

Split points are rounded to multiples of 8 so every leaf keeps the f32
sublane tiling the lanes kernels assume.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# late-bound module reference: the leaf primitives are looked up at call
# time so test harnesses that monkeypatch gprf_tpu.ops.pallas_mvn (to force
# interpret mode on CPU) reach the leaves through this composition too
from gprf_tpu.ops import pallas_mvn as _pm
from gprf_tpu.ops.pallas_mvn import MAX_M_CHOL, MAX_M_MVN

# leaf-width caps.  Default 96, from the round-3 v5e A/B sweep (in-scan
# ablation, docs/RESULTS.md): at the flagship m=136 the 72/64 split beats
# the single-kernel path 4.28 vs 4.62 ms/eval (leaf 64 reached 4.11 but
# REGRESSED the seismic m=192 step 8.6 -> 16.6 via its deeper backward
# einsum chains — 96 wins on both workloads).  Override via env for A/B;
# read once at import like every measurement toggle here — A/B in fresh
# processes (the jit cache is not keyed on env vars).
def _env_leaf(name: str, default: int) -> int:
    v = os.environ.get(name, "")
    return int(v) if v else default


LEAF_CHOL = min(_env_leaf("GPRF_SPLIT_LEAF_CHOL", _env_leaf("GPRF_SPLIT_LEAF", 96)),
                MAX_M_CHOL)
LEAF_MVN = min(_env_leaf("GPRF_SPLIT_LEAF_MVN", _env_leaf("GPRF_SPLIT_LEAF", 96)),
               MAX_M_MVN)
# Opt-in: route MVN leaves through the fused MVN+inverse kernel (ll + W +
# z in one dispatch, einsum-only VJP — no Pallas tri-inv recompute in the
# backward) whenever its tighter VMEM budget admits the (m, dy) shape.
# Measured 4.30 -> 4.05 ms/eval at the flagship but VETOED as default
# (docs/RESULTS.md): the flagship QoR run deterministically lands mad
# 0.00384 vs 0.00325 for the control on the identical config — a
# trajectory effect, not a gradient bug (on-chip parity vs an f64 oracle:
# dK relerr 3.0e-5 for BOTH paths, scripts/check_mvninv_parity.py) — and
# the seismic step is neutral (7.16 vs 7.12).  Same methodology as the
# GPRF_SCHUR_PRECISION=high veto.  Read once at import, like every toggle
# here; A/B in fresh processes.
MVN_INV = os.environ.get("GPRF_MVN_INV", "0") == "1"

# widest m the split path accepts.  Raised 512 -> 1024 after the round-3
# 80k A/B (m=888: full step 342 -> 232 ms/eval vs the XLA blocked panels;
# docs/RESULTS.md) — the recursive split with lanes leaves is NOT the
# measured-lost lanes_blocked construction (that one serialized many small
# dispatches per panel; this one is one kernel per leaf + MXU couplings).
SPLIT_MAX_M = _env_leaf("GPRF_SPLIT_MAX_M", 1024)


def _split_point(m: int) -> int:
    """Upper-half width: ceil(m/2) rounded up to a multiple of 8."""
    return (((m + 1) // 2) + 7) // 8 * 8


def split_supported(m: int, for_mvn: bool = False) -> bool:
    """True when width m is reachable by recursive 2x2 splitting into
    lanes-kernel leaves (within the configured engagement bound)."""
    if m % 8 != 0 or m > SPLIT_MAX_M:
        return m <= (LEAF_MVN if for_mvn else LEAF_CHOL)
    cap = LEAF_MVN if for_mvn else LEAF_CHOL
    while m > cap:
        h = _split_point(m)
        if h >= m:  # cannot shrink further
            return False
        # A-side leaves are always chol+inv; only the final Schur leaf is
        # an MVN leaf, and h >= m - h, so checking the larger half suffices
        if not split_supported(h, for_mvn=False):
            return False
        m = m - h
    return True


def chol_inv_split(K, interpret: bool = False, leaf: int | None = None):
    """(L, W = L^-1) for SPD [B, m, m] via recursive 2x2 split with
    :func:`batched_chol_inv_pallas` leaves and MXU coupling."""
    m = K.shape[-1]
    if leaf is None:
        leaf = LEAF_CHOL
    if m <= leaf:
        return _pm.batched_chol_inv_pallas(K, interpret)
    h = _split_point(m)
    A = K[:, :h, :h]
    K21 = K[:, h:, :h]
    C = K[:, h:, h:]
    La, Wa = chol_inv_split(A, interpret, leaf)
    L21 = jnp.einsum("bij,bkj->bik", K21, Wa)  # K21 @ Wa^T
    Cs = C - jnp.einsum("bik,bjk->bij", L21, L21)
    Lc, Wc = chol_inv_split(Cs, interpret, leaf)
    W21 = -jnp.einsum("bij,bjk,bkl->bil", Wc, L21, Wa)
    zt = jnp.zeros((K.shape[0], h, m - h), dtype=K.dtype)
    L = jnp.concatenate(
        [
            jnp.concatenate([La, zt], axis=2),
            jnp.concatenate([L21, Lc], axis=2),
        ],
        axis=1,
    )
    W = jnp.concatenate(
        [
            jnp.concatenate([Wa, zt], axis=2),
            jnp.concatenate([W21, Wc], axis=2),
        ],
        axis=1,
    )
    return L, W


def tri_inv_split(L, interpret: bool = False, leaf: int | None = None):
    """W = L^-1 for lower-triangular [B, m, m] via one-or-more 2x2 splits
    with :func:`batched_tri_inv_pallas` leaves:
    inv([[A,0],[B,C]]) = [[Wa,0],[-Wc B Wa, Wc]]."""
    m = L.shape[-1]
    if leaf is None:
        leaf = LEAF_CHOL
    if m <= leaf:
        return _pm.batched_tri_inv_pallas(L, interpret)
    h = _split_point(m)
    A = L[:, :h, :h]
    B21 = L[:, h:, :h]
    C = L[:, h:, h:]
    Wa = tri_inv_split(A, interpret, leaf)
    Wc = tri_inv_split(C, interpret, leaf)
    W21 = -jnp.einsum("bij,bjk,bkl->bil", Wc, B21, Wa)
    zt = jnp.zeros((L.shape[0], h, m - h), dtype=L.dtype)
    return jnp.concatenate(
        [
            jnp.concatenate([Wa, zt], axis=2),
            jnp.concatenate([W21, Wc], axis=2),
        ],
        axis=1,
    )


def mvn_ll_split(Kp, Ym, n_active, interpret: bool = False,
                 leaf_mvn: int | None = None, leaf_chol: int | None = None):
    """Masked Gaussian log-density [B] (same contract as
    :func:`batched_mvn_ll_pallas`) via the Schur split:

        ll = [-1/2 |Wa Y1|^2 - dy/2 logdet A]  (A-side pieces)
             + MVN(C', Y2 - L21 Wa Y1, n_active)  (carries the 2pi term)

    exactly the factorization the GPRF pair term already uses one level up
    (:func:`gprf_tpu.model.objective._schur_ll`)."""
    m = Kp.shape[-1]
    if leaf_mvn is None:
        leaf_mvn = LEAF_MVN
    if leaf_chol is None:
        leaf_chol = LEAF_CHOL
    if m <= leaf_mvn:
        if MVN_INV and _pm.mvn_inv_supported(m, Ym.shape[-1]):
            return _pm.batched_mvn_ll_inv_pallas(Kp, Ym, n_active, interpret)
        return _pm.batched_mvn_ll_pallas(Kp, Ym, n_active, interpret)
    dy = Ym.shape[-1]
    h = _split_point(m)
    A = Kp[:, :h, :h]
    K21 = Kp[:, h:, :h]
    C = Kp[:, h:, h:]
    La, Wa = chol_inv_split(A, interpret, leaf_chol)
    z1 = jnp.einsum("bij,bjd->bid", Wa, Ym[:, :h, :])
    L21 = jnp.einsum("bij,bkj->bik", K21, Wa)
    Cs = C - jnp.einsum("bik,bjk->bij", L21, L21)
    rhs2 = Ym[:, h:, :] - jnp.einsum("bik,bkd->bid", L21, z1)
    quad1 = jnp.sum(z1 * z1, axis=(1, 2))
    logdet1 = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(La, axis1=1, axis2=2)), axis=1
    )
    ll2 = mvn_ll_split(Cs, rhs2, n_active, interpret, leaf_mvn, leaf_chol)
    return ll2 - 0.5 * quad1 - 0.5 * dy * logdet1
