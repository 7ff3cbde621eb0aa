"""Pallas kernels (interpret mode on CPU): batch-in-lanes Cholesky and the
masked Gaussian-density kernel vs the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gprf_tpu.kernels.covfn import cross_kernel_matrix
from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.linalg.masked import masked_gaussian_ll, pad_kernel_matrix
from gprf_tpu.ops.pallas_mvn import batched_cholesky_pallas, batched_mvn_ll_pallas


def _spd_batch(rng, B, m):
    A = rng.normal(size=(B, m, m))
    return np.einsum("bij,bkj->bik", A, A) + m * np.eye(m)


def test_pallas_cholesky_matches_xla(rng):
    K = _spd_batch(rng, 5, 24)
    L = np.asarray(batched_cholesky_pallas(jnp.asarray(K), interpret=True))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, rtol=1e-10, atol=1e-12)


def test_pallas_cholesky_batch_padding(rng):
    # batch not a multiple of the lane tile
    K = _spd_batch(rng, 3, 16)
    L = np.asarray(batched_cholesky_pallas(jnp.asarray(K), interpret=True))
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", L, L), K, rtol=1e-9, atol=1e-10
    )


def _masked_setup(rng, B=4, m=20, dy=6, n_active=17):
    K = _spd_batch(rng, B, m)
    mask = np.zeros((B, m), dtype=bool)
    mask[:, :n_active] = True
    Y = rng.normal(size=(B, m, dy))
    Kp = np.stack(
        [
            np.asarray(pad_kernel_matrix(jnp.asarray(K[b]), jnp.asarray(mask[b])))
            for b in range(B)
        ]
    )
    Ym = Y * mask[:, :, None]
    nact = mask.sum(axis=1).astype(np.float64)
    return K, Kp, Y, Ym, mask, nact


def test_pallas_mvn_ll_matches_reference(rng):
    K, Kp, Y, Ym, mask, nact = _masked_setup(rng)
    ll = np.asarray(
        batched_mvn_ll_pallas(jnp.asarray(Kp), jnp.asarray(Ym), jnp.asarray(nact), True)
    )
    ll_ref = np.array(
        [
            float(masked_gaussian_ll(jnp.asarray(K[b]), jnp.asarray(Y[b]), jnp.asarray(mask[b])))
            for b in range(len(K))
        ]
    )
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-10)


def test_pallas_mvn_end_to_end_gradient(rng):
    """The custom VJP returns the *symmetrized* dK (autodiff's raw cotangent
    through cholesky is asymmetric); since K is always a symmetric function
    of X, the end-to-end X-gradients must agree exactly."""
    n, dy = 18, 4
    X = rng.uniform(size=(n, 2))
    Y = jnp.asarray(rng.normal(size=(1, n, dy)))
    cov = GPCov.create([1.0], [0.3, 0.3])
    mask = jnp.ones((1, n), dtype=bool)
    nact = jnp.asarray([float(n)])

    def f_pallas(X):
        K = cross_kernel_matrix(cov, X, X) + 0.05 * jnp.eye(n)
        return jnp.sum(batched_mvn_ll_pallas(K[None], Y, nact, True))

    def f_ref(X):
        K = cross_kernel_matrix(cov, X, X) + 0.05 * jnp.eye(n)
        return masked_gaussian_ll(K, Y[0], mask[0])

    assert np.isclose(float(f_pallas(jnp.asarray(X))), float(f_ref(jnp.asarray(X))), rtol=1e-12)
    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(X)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(X)))
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-12)


def test_pallas_mvn_symmetrized_dK(rng):
    """dK from the custom VJP equals the symmetrization of autodiff's dK."""
    K, Kp, Y, Ym, mask, nact = _masked_setup(rng, B=2, m=12, dy=3, n_active=10)

    def f_pallas(Kp):
        return jnp.sum(batched_mvn_ll_pallas(Kp, jnp.asarray(Ym), jnp.asarray(nact), True))

    def f_ref(Kp):
        return jnp.sum(jax.vmap(masked_gaussian_ll)(Kp, jnp.asarray(Ym), jnp.asarray(mask)))

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(Kp)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(Kp)))
    act = mask[:, :, None] & mask[:, None, :]
    np.testing.assert_allclose(
        g1 * act, 0.5 * (g2 + np.transpose(g2, (0, 2, 1))) * act, rtol=1e-9, atol=1e-12
    )


# ---- triangular inverse + wide-m lanes-blocked primitives ----


def test_pallas_tri_inv_matches_solve(rng):
    K = _spd_batch(rng, 4, 20)
    L = np.linalg.cholesky(K)
    from gprf_tpu.ops.pallas_mvn import batched_tri_inv_pallas

    W = np.asarray(batched_tri_inv_pallas(jnp.asarray(L), True))
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", W, L),
        np.broadcast_to(np.eye(20), (4, 20, 20)),
        rtol=1e-9, atol=1e-10,
    )


def test_pallas_tri_inv_grad(rng):
    K = _spd_batch(rng, 2, 12)
    L = jnp.asarray(np.linalg.cholesky(K))
    from gprf_tpu.ops.pallas_mvn import batched_tri_inv_pallas

    def f(L):
        return jnp.sum(jnp.sin(batched_tri_inv_pallas(L, True)))

    def fref(L):
        eye = jnp.broadcast_to(jnp.eye(12, dtype=L.dtype), L.shape)
        return jnp.sum(jnp.sin(jax.lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(L)), np.asarray(jax.grad(fref)(L)),
        rtol=1e-9, atol=1e-11,
    )


def test_blocked_cholesky_lanes_matches_xla(rng):
    """Wide-m panel factorization (incl. non-multiple-of-panel padding)."""
    from gprf_tpu.linalg.lanes_blocked import blocked_cholesky_lanes

    for m in (40, 52):  # panel=16 -> multi-level recursion + padding
        K = _spd_batch(rng, 3, m)
        L = np.asarray(
            blocked_cholesky_lanes(jnp.asarray(K), panel=16, interpret=True)
        )
        np.testing.assert_allclose(L, np.linalg.cholesky(K), rtol=1e-8, atol=1e-9)


def test_blocked_tri_solve_lanes_matches_xla(rng):
    from gprf_tpu.linalg.lanes_blocked import (
        blocked_cholesky_lanes,
        blocked_tri_solve_lanes,
    )

    m = 52
    K = _spd_batch(rng, 3, m)
    L = blocked_cholesky_lanes(jnp.asarray(K), panel=16, interpret=True)
    B = jnp.asarray(rng.normal(size=(3, m, 7)))
    X = np.asarray(blocked_tri_solve_lanes(L, B, panel=16, interpret=True))
    Xref = np.asarray(jax.lax.linalg.triangular_solve(
        L, B, left_side=True, lower=True))
    np.testing.assert_allclose(X, Xref, rtol=1e-8, atol=1e-9)


def test_blocked_lanes_gradients(rng):
    """End-to-end autodiff through the panel recursion (custom VJPs inside).

    The composite's K-cotangent matches XLA's in its *symmetric part* only
    (the recursion concentrates cross-block mass in the lower triangle,
    XLA symmetrizes) — so compare through a symmetric parametrization
    K = A A^T + c I, the regime of every caller (kernel matrices)."""
    from gprf_tpu.linalg.lanes_blocked import (
        blocked_cholesky_lanes,
        blocked_tri_solve_lanes,
    )

    m = 36
    A = jnp.asarray(rng.normal(size=(2, m, m)))
    Y = jnp.asarray(rng.normal(size=(2, m, 3)))

    def make_K(A):
        return jnp.einsum("bij,bkj->bik", A, A) + m * jnp.eye(m, dtype=A.dtype)

    def f_lanes(A):
        L = blocked_cholesky_lanes(make_K(A), panel=16, interpret=True)
        Z = blocked_tri_solve_lanes(L, Y, panel=16, interpret=True)
        return jnp.sum(Z * Z) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=1, axis2=2))
        )

    def f_ref(A):
        L = jnp.linalg.cholesky(make_K(A))
        Z = jax.lax.linalg.triangular_solve(L, Y, left_side=True, lower=True)
        return jnp.sum(Z * Z) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=1, axis2=2))
        )

    np.testing.assert_allclose(float(f_lanes(A)), float(f_ref(A)), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_lanes)(A)), np.asarray(jax.grad(f_ref)(A)),
        rtol=1e-7, atol=1e-9,
    )


def test_pallas_tri_inv_multi_panel(rng):
    """m large enough that the column-paneled kernel runs ncp > 1 panels."""
    m = 136  # flagship width; cols=32 -> 5 panels incl. a padded one
    K = _spd_batch(rng, 2, m)
    L = np.linalg.cholesky(K)
    from gprf_tpu.ops.pallas_mvn import batched_tri_inv_pallas

    W = np.asarray(batched_tri_inv_pallas(jnp.asarray(L), True))
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", W, L),
        np.broadcast_to(np.eye(m), (2, m, m)),
        rtol=1e-8, atol=1e-9,
    )


def test_pallas_chol_inv_matches_xla(rng):
    """Fused chol+inv kernel: both outputs, multi-panel width, odd batch."""
    from gprf_tpu.ops.pallas_mvn import batched_chol_inv_pallas

    m = 136  # 5 column panels at cols=32 (incl. a padded one)
    K = _spd_batch(rng, 3, m)
    L, W = batched_chol_inv_pallas(jnp.asarray(K), True)
    L, W = np.asarray(L), np.asarray(W)
    np.testing.assert_allclose(L, np.linalg.cholesky(K), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", W, L),
        np.broadcast_to(np.eye(m), (3, m, m)),
        rtol=1e-8, atol=1e-9,
    )


def test_pallas_chol_inv_end_to_end_gradient(rng):
    """The einsum-only custom VJP must match autodiff through the XLA
    cholesky/triangular_solve formulation end-to-end (the unary objective
    shape: quad form through W plus logdet through diag(L))."""
    from gprf_tpu.ops.pallas_mvn import batched_chol_inv_pallas

    m, dy = 22, 5
    A = jnp.asarray(rng.normal(size=(2, m, m)))
    Y = jnp.asarray(rng.normal(size=(2, m, dy)))

    def make_K(A):
        return jnp.einsum("bij,bkj->bik", A, A) + m * jnp.eye(m, dtype=A.dtype)

    def f_fused(A):
        L, W = batched_chol_inv_pallas(make_K(A), True)
        Z = jnp.einsum("bij,bjd->bid", W, Y)
        return jnp.sum(Z * Z) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=1, axis2=2))
        )

    def f_ref(A):
        L = jnp.linalg.cholesky(make_K(A))
        Z = jax.lax.linalg.triangular_solve(L, Y, left_side=True, lower=True)
        return jnp.sum(Z * Z) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=1, axis2=2))
        )

    np.testing.assert_allclose(float(f_fused(A)), float(f_ref(A)), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_fused)(A)), np.asarray(jax.grad(f_ref)(A)),
        rtol=1e-7, atol=1e-9,
    )


def test_pallas_mvn_inv_matches_reference(rng):
    """Fused MVN+inverse kernel: ll parity with the masked reference and the
    plain MVN kernel, including multi-panel W widths and batch padding."""
    from gprf_tpu.ops.pallas_mvn import batched_mvn_ll_inv_pallas

    K, Kp, Y, Ym, mask, nact = _masked_setup(rng, B=3, m=20, dy=6, n_active=17)
    ll = np.asarray(
        batched_mvn_ll_inv_pallas(
            jnp.asarray(Kp), jnp.asarray(Ym), jnp.asarray(nact), True
        )
    )
    ll_ref = np.array(
        [
            float(masked_gaussian_ll(jnp.asarray(K[b]), jnp.asarray(Y[b]), jnp.asarray(mask[b])))
            for b in range(len(K))
        ]
    )
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-10)


def test_pallas_mvn_inv_end_to_end_gradient(rng):
    """The einsum-only VJP of the saved (W, z) residuals must reproduce the
    autodiff gradient of the masked reference exactly (symmetric K path)."""
    from gprf_tpu.ops.pallas_mvn import batched_mvn_ll_inv_pallas

    n, dy = 18, 4
    X = rng.uniform(size=(n, 2))
    Y = jnp.asarray(rng.normal(size=(1, n, dy)))
    cov = GPCov.create([1.0], [0.3, 0.3])
    mask = jnp.ones((1, n), dtype=bool)
    nact = jnp.asarray([float(n)])

    def f_pallas(X):
        K = cross_kernel_matrix(cov, X, X) + 0.05 * jnp.eye(n)
        return jnp.sum(batched_mvn_ll_inv_pallas(K[None], Y, nact, True))

    def f_ref(X):
        K = cross_kernel_matrix(cov, X, X) + 0.05 * jnp.eye(n)
        return masked_gaussian_ll(K, Y[0], mask[0])

    assert np.isclose(float(f_pallas(jnp.asarray(X))), float(f_ref(jnp.asarray(X))), rtol=1e-12)
    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(X)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(X)))
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-12)


def test_pallas_mvn_inv_y_gradient(rng):
    """dY (and the masked-dK symmetry) through the fused kernel's VJP."""
    from gprf_tpu.ops.pallas_mvn import batched_mvn_ll_inv_pallas

    K, Kp, Y, Ym, mask, nact = _masked_setup(rng, B=2, m=12, dy=3, n_active=10)

    def f_fused(Kp, Ym):
        return jnp.sum(
            batched_mvn_ll_inv_pallas(Kp, Ym, jnp.asarray(nact), True)
        )

    def f_ref(Kp, Ym):
        return jnp.sum(jax.vmap(masked_gaussian_ll)(Kp, Ym, jnp.asarray(mask)))

    gK1, gY1 = jax.grad(f_fused, argnums=(0, 1))(jnp.asarray(Kp), jnp.asarray(Ym))
    gK2, gY2 = jax.grad(f_ref, argnums=(0, 1))(jnp.asarray(Kp), jnp.asarray(Ym))
    act = mask[:, :, None] & mask[:, None, :]
    np.testing.assert_allclose(
        np.asarray(gK1) * act,
        0.5 * (np.asarray(gK2) + np.transpose(np.asarray(gK2), (0, 2, 1))) * act,
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(gY1) * mask[:, :, None], np.asarray(gY2) * mask[:, :, None],
        rtol=1e-9, atol=1e-12,
    )


def test_mvn_inv_support_predicate():
    """The fused kernel must decline shapes whose L + residual + panel
    scratch exceed VMEM (m=144 at dy=50 measured over budget) and accept
    every default split leaf."""
    from gprf_tpu.ops.pallas_mvn import mvn_inv_supported

    assert mvn_inv_supported(64, 50)
    assert mvn_inv_supported(96, 50)
    assert not mvn_inv_supported(144, 50)
    assert not mvn_inv_supported(200, 1)


def test_pallas_chol_inv_wide_fallback(rng):
    """Beyond the VMEM cap the primitive falls back to XLA; the custom VJP
    formula must still hold there."""
    from gprf_tpu.ops.pallas_mvn import MAX_M_CHOL, batched_chol_inv_pallas

    m = 12
    A = jnp.asarray(rng.normal(size=(1, m, m)))

    def make_K(A):
        return jnp.einsum("bij,bkj->bik", A, A) + m * jnp.eye(m, dtype=A.dtype)

    import gprf_tpu.ops.pallas_mvn as pm

    def f(A, fused):
        if fused:
            L, W = batched_chol_inv_pallas(make_K(A), True)
        else:
            L = jnp.linalg.cholesky(make_K(A))
            W = jax.lax.linalg.triangular_solve(
                L, jnp.broadcast_to(jnp.eye(m, dtype=L.dtype), L.shape),
                left_side=True, lower=True,
            )
        return jnp.sum(W * W) + jnp.sum(jnp.log(jnp.diagonal(L, axis1=1, axis2=2)))

    old = pm.MAX_M_CHOL
    pm.MAX_M_CHOL = 8  # force the fallback branch
    try:
        v, g = jax.value_and_grad(lambda A: f(A, True))(A)
    finally:
        pm.MAX_M_CHOL = old
    v_ref, g_ref = jax.value_and_grad(lambda A: f(A, False))(A)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-7, atol=1e-9)
