"""Recursive-doubling batched triangular inverse in pure XLA.

The lanes-kernel forward substitution (:func:`gprf_tpu.ops.pallas_mvn.
batched_tri_inv_pallas`) is sequential in m: ~m steps per column panel,
~m * ncp short VPU ops per lane tile, and that sequential depth — not
FLOPs — dominates its wall time at GPRF shapes (m ~ 136).  This module
computes W = L^-1 with O(log m) sequential depth instead:

    inv([[A, 0], [B, C]]) = [[A^-1, 0], [-C^-1 B A^-1, C^-1]]

Split L into its largest odd count of 8-aligned diagonal blocks, invert
every base block in parallel with a short unrolled substitution (batched
over B x nblocks — VPU elementwise, batch-parallel), then combine pairs
level by level: each level is two batched MXU matmuls over all pairs at
once.  Total work ~B m^3 (vs m^3/3 for substitution) but it rides the MXU
with ~2 log2(m/base) sequential ops instead of ~m VPU recurrence steps.

Exact same arithmetic as forward substitution up to summation order; pure
jnp, so it runs on any backend and differentiates natively.

Measured and LOST at the flagship config (kept opt-in for re-measurement
on other shapes/hardware): as the W-producer inside the custom VJPs
(``GPRF_TRI_DOUBLING=1``) bench.py measures 5.63 ms/eval, and also
replacing the unary fused chol+inv kernel (``GPRF_UNARY_DOUBLING=1``)
6.20 ms/eval, vs 4.83 ms/eval for the lanes kernels — the HIGHEST-
precision multi-pass matmuls of the level combines cost more than the
sequential-depth saving buys at m=136, B<=180.  The lanes substitution
kernels stay the default.
"""

from __future__ import annotations

import jax.numpy as jnp


def _doubling_split(m: int, base_max: int = 32) -> tuple[int, int]:
    """(base, levels) with base * 2**levels == m, base <= base_max if
    possible (base is m with its factors of two peeled off, re-doubled
    until the level count isn't wasteful for tiny m)."""
    base, levels = m, 0
    while base % 2 == 0 and base // 2 >= 8:
        base //= 2
        levels += 1
    while base > base_max and base % 2 == 0:  # pragma: no cover - safety
        base //= 2
        levels += 1
    return base, levels


def _diag_blocks(L, s: int):
    """[B, m/s, s, s] diagonal blocks of [B, m, m]."""
    B, m, _ = L.shape
    nb = m // s
    Lr = L.reshape(B, nb, s, nb, s)
    d = jnp.diagonal(Lr, axis1=1, axis2=3)  # [B, s, s, nb]
    return jnp.moveaxis(d, -1, 1)


def _subdiag_blocks(L, s: int):
    """[B, m/(2s), s, s] blocks at block positions (2p+1, 2p)."""
    B, m, _ = L.shape
    nb2 = m // (2 * s)
    Lr = L.reshape(B, nb2, 2 * s, nb2, 2 * s)
    d = jnp.moveaxis(jnp.diagonal(Lr, axis1=1, axis2=3), -1, 1)
    return d[:, :, s:, :s]


def _base_inv(Ld):
    """Unrolled forward substitution: W = L^-1 for [N, s, s], s small."""
    N, s, _ = Ld.shape
    if s == 1:
        return 1.0 / Ld
    rows = [1.0 / Ld[:, 0, 0:1] * jnp.eye(s, dtype=Ld.dtype)[0][None]]
    for k in range(1, s):
        Wk = jnp.stack(rows, axis=1)  # [N, k, s]
        acc = jnp.einsum("nl,nls->ns", Ld[:, k, :k], Wk)
        ek = jnp.eye(s, dtype=Ld.dtype)[k]
        rows.append((ek[None] - acc) / Ld[:, k, k][:, None])
    return jnp.stack(rows, axis=1)


def batched_tri_inv_doubling(L):
    """W = L^-1 for a batch of lower-triangular [B, m, m] (m % 8 == 0).

    O(log m) sequential depth: parallel base-block inverses + levelwise
    pair combination via batched matmuls.  Run under
    ``jax.default_matmul_precision("highest")`` on TPU (callers in the
    custom-VJP rules already do)."""
    B, m, _ = L.shape
    base, levels = _doubling_split(m)
    s = base
    Ld = _diag_blocks(L, s)  # [B, nb, s, s]
    nb = m // s
    W = _base_inv(Ld.reshape(B * nb, s, s)).reshape(B, nb, s, s)
    for _ in range(levels):
        A = W[:, 0::2]  # [B, nb/2, s, s]
        C = W[:, 1::2]
        L21 = _subdiag_blocks(L, s)
        W21 = -jnp.einsum("bpij,bpjk,bpkl->bpil", C, L21, A)
        nb //= 2
        top = jnp.concatenate([A, jnp.zeros_like(A)], axis=3)
        bot = jnp.concatenate([W21, C], axis=3)
        W = jnp.concatenate([top, bot], axis=2)  # [B, nb, 2s, 2s]
        s *= 2
    return W.reshape(B, m, m)
