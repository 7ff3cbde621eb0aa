"""On-chip gradient accuracy check: fused MVN+inverse leaf vs the old MVN
leaf, both against an f64 host oracle, at the flagship leaf shape.

The round-3 flagship QoR A/B showed GPRF_MVN_INV=1 landing mad 0.00384 vs
0.00325 for the control on the identical config; this script discriminates
"the new kernel's gradient is numerically worse on TPU" from "trajectory
sensitivity": it evaluates both custom-VJP primitives on the real chip at
m=64/dy=50 (the flagship split's MVN leaf) and reports each one's error
against an explicit-inverse float64 oracle.
"""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gprf_tpu.ops.pallas_mvn import (
    batched_mvn_ll_inv_pallas,
    batched_mvn_ll_pallas,
)

LOG_2PI = float(np.log(2.0 * np.pi))


def make_problem(B, m, dy, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(B, m, 3).astype(np.float64)
    D2 = ((X[:, :, None, :] - X[:, None, :, :]) ** 2).sum(-1)
    K = np.exp(-D2 / (2 * 0.6**2)) + 0.01 * np.eye(m)
    nact = rng.randint(m - 14, m + 1, size=B)
    Y = rng.randn(B, m, dy) * 0.5
    for b in range(B):
        n = nact[b]
        K[b, n:, :] = 0.0
        K[b, :, n:] = 0.0
        K[b, range(n, m), range(n, m)] = 1.0
        Y[b, n:, :] = 0.0
    return K, Y, nact.astype(np.float64)


def oracle_ll_grads(K, Y, nact):
    B, m, dy = Y.shape
    ll = np.zeros(B)
    dK = np.zeros_like(K)
    dY = np.zeros_like(Y)
    for b in range(B):
        Ki = np.linalg.inv(K[b])
        s, logdet = np.linalg.slogdet(K[b])
        alpha = Ki @ Y[b]
        ll[b] = (
            -0.5 * np.sum(alpha * Y[b])
            - 0.5 * dy * logdet
            - 0.5 * dy * nact[b] * LOG_2PI
        )
        dK[b] = 0.5 * (alpha @ alpha.T - dy * Ki)
        dY[b] = -alpha
    return ll, dK, dY


def run(primitive, K, Y, nact):
    Kj = jnp.asarray(K, jnp.float32)
    Yj = jnp.asarray(Y, jnp.float32)
    nj = jnp.asarray(nact, jnp.float32)

    def loss(Kp, Ym):
        return jnp.sum(primitive(Kp, Ym, nj, False))

    val, (dK, dY) = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(Kj, Yj)
    return np.asarray(val), np.asarray(dK), np.asarray(dY)


def relerr(a, ref):
    return np.abs(a - ref).max() / (np.abs(ref).max() + 1e-30)


def main():
    B, m, dy = 180, 64, 50
    K, Y, nact = make_problem(B, m, dy)
    ll_ref, dK_ref, dY_ref = oracle_ll_grads(K, Y, nact)
    tot_ref = ll_ref.sum()

    for name, prim in [("old mvn_ll", batched_mvn_ll_pallas),
                       ("new mvn_ll_inv", batched_mvn_ll_inv_pallas)]:
        val, dK, dY = run(prim, K, Y, nact)
        print(
            f"{name:16s} val relerr {abs(val - tot_ref) / abs(tot_ref):.3e}  "
            f"dK relerr {relerr(dK, dK_ref):.3e}  "
            f"dY relerr {relerr(dY, dY_ref):.3e}"
        )
    print("PARITY DONE")


if __name__ == "__main__":
    main()
