"""Block-2x2 Schur-split compositions (interpret mode on CPU) vs the dense
references — values, end-to-end gradients, masking across the split
boundary, and vmap batch folding."""

import numpy as np
import jax
import jax.numpy as jnp

from gprf_tpu.kernels.covfn import cross_kernel_matrix
from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.linalg.masked import masked_gaussian_ll, pad_kernel_matrix
from gprf_tpu.ops.split_mvn import (
    _split_point,
    chol_inv_split,
    mvn_ll_split,
    split_supported,
    tri_inv_split,
)


def _spd_batch(rng, B, m):
    A = rng.normal(size=(B, m, m))
    return np.einsum("bij,bkj->bik", A, A) + m * np.eye(m)


def test_split_point_alignment():
    for m in (136, 192, 224, 288, 512):
        h = _split_point(m)
        assert h % 8 == 0 and (m - h) % 8 == 0 and 0 < h < m


def test_split_supported_covers_seismic_gap():
    # the round-2 gap: 144 < m <= 512 ran on the XLA fallback; the bound
    # was raised to 1024 after the 80k A/B (m=888 split beat the panels)
    for m in (152, 192, 216, 288, 336, 512, 888, 1024):
        assert split_supported(m, for_mvn=True), m
        assert split_supported(m, for_mvn=False), m
    assert not split_supported(1032)  # beyond the engagement bound
    assert not split_supported(196)  # not 8-aligned


def test_chol_inv_split_matches_dense(rng):
    # leaf=16 forces two recursion levels at m=40 (40 -> 24/16 -> 16/8)
    K = _spd_batch(rng, 3, 40)
    L, W = chol_inv_split(jnp.asarray(K), interpret=True, leaf=16)
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", np.asarray(W), L_ref),
        np.broadcast_to(np.eye(40), K.shape),
        rtol=1e-9,
        atol=1e-9,
    )


def test_tri_inv_split_matches_dense(rng):
    K = _spd_batch(rng, 4, 48)
    L = np.linalg.cholesky(K)
    W = tri_inv_split(jnp.asarray(L), interpret=True, leaf=16)
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", np.asarray(W), L),
        np.broadcast_to(np.eye(48), K.shape),
        rtol=1e-9,
        atol=1e-9,
    )


def _masked_setup(rng, B, m, dy, n_actives):
    K = _spd_batch(rng, B, m)
    mask = np.zeros((B, m), dtype=bool)
    for b, na in enumerate(n_actives):
        mask[b, :na] = True
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


def test_mvn_ll_split_matches_reference_across_boundary(rng):
    # n_active above, below, and exactly at the split point h = 24 of m=40:
    # a block fully masked past the boundary exercises the identity-Schur
    # leaf (L21 = 0, C' = I)
    m, dy = 40, 5
    n_actives = [40, 30, 24, 17, 8]
    K, Kp, Y, Ym, mask, nact = _masked_setup(rng, len(n_actives), m, dy, n_actives)
    ll = np.asarray(
        mvn_ll_split(
            jnp.asarray(Kp), jnp.asarray(Ym), jnp.asarray(nact),
            interpret=True, leaf_mvn=16, leaf_chol=16,
        )
    )
    ll_ref = np.array(
        [
            float(
                masked_gaussian_ll(
                    jnp.asarray(K[b]), jnp.asarray(Y[b]), jnp.asarray(mask[b])
                )
            )
            for b in range(len(K))
        ]
    )
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-9)


def test_mvn_ll_split_end_to_end_gradient(rng):
    """Gradients through the split composition (leaf custom VJPs + einsum
    autodiff) must match autodiff through the dense masked reference."""
    n, dy = 32, 4
    X = rng.uniform(size=(n, 2))
    Y = jnp.asarray(rng.normal(size=(1, n, dy)))
    cov = GPCov.create([1.0], [0.3, 0.3])
    mask = jnp.ones((1, n), dtype=bool)
    nact = jnp.asarray([float(n)])

    def f_split(X):
        K = cross_kernel_matrix(cov, X, X) + 0.05 * jnp.eye(n)
        return jnp.sum(
            mvn_ll_split(K[None], Y, nact, True, leaf_mvn=16, leaf_chol=16)
        )

    def f_ref(X):
        K = cross_kernel_matrix(cov, X, X) + 0.05 * jnp.eye(n)
        return masked_gaussian_ll(K, Y[0], mask[0])

    Xj = jnp.asarray(X)
    v1, g1 = jax.value_and_grad(f_split)(Xj)
    v2, g2 = jax.value_and_grad(f_ref)(Xj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-7, atol=1e-9)


def test_chol_inv_split_gradient_matches_dense(rng):
    K = jnp.asarray(_spd_batch(rng, 2, 32))
    Cot = jnp.asarray(rng.normal(size=(2, 32, 32)))

    def f_split(K):
        L, W = chol_inv_split(K, interpret=True, leaf=16)
        return jnp.sum(L * Cot) + jnp.sum(W * Cot)

    def f_ref(K):
        L = jnp.linalg.cholesky(K)
        W = jax.lax.linalg.triangular_solve(
            L, jnp.broadcast_to(jnp.eye(32, dtype=K.dtype), K.shape),
            left_side=True, lower=True,
        )
        return jnp.sum(L * Cot) + jnp.sum(W * Cot)

    g1 = jax.grad(f_split)(K)
    g2 = jax.grad(f_ref)(K)
    # the leaves return symmetrized K-cotangents; the dense reference's raw
    # cholesky cotangent is one-sided — compare symmetrized
    s1 = np.asarray(g1) + np.swapaxes(np.asarray(g1), 1, 2)
    s2 = np.asarray(g2) + np.swapaxes(np.asarray(g2), 1, 2)
    np.testing.assert_allclose(s1, s2, rtol=1e-7, atol=1e-9)


def test_mvn_ll_split_vmaps(rng):
    """The multi-start optimizer vmaps the whole loss; the split composition
    must fold through the leaves' custom_vmap rules."""
    m, dy, R = 40, 3, 2
    K, Kp, Y, Ym, mask, nact = _masked_setup(rng, 3, m, dy, [40, 30, 20])
    Kps = jnp.asarray(np.stack([Kp, Kp * 1.1]))
    Yms = jnp.asarray(np.stack([Ym, Ym]))
    nacts = jnp.asarray(np.stack([nact, nact]))

    def one(Kp, Ym, nact):
        return mvn_ll_split(Kp, Ym, nact, True, leaf_mvn=16, leaf_chol=16)

    out_v = jax.vmap(one)(Kps, Yms, nacts)
    for r in range(R):
        out_r = one(Kps[r], Yms[r], nacts[r])
        np.testing.assert_allclose(
            np.asarray(out_v[r]), np.asarray(out_r), rtol=1e-9
        )
