"""Fully-fused single-dispatch GPRF evaluation.

The reference pays per-evaluation Python/C++ crossing costs per block
(``gprf.py:236-241``); the batched path in :mod:`gprf_tpu.model.objective`
already collapses that to one device program, but still splits one optimizer
evaluation into host re-blocking + device objective + result fetch — three
host<->device transitions.  On a tunneled/remote TPU each dispatch costs
tens of milliseconds, and even locally each costs ~100us.  This module puts
the *entire* evaluation in one jit:

    X  ->  [device] nearest-center re-block (argmin + stable argsort +
           scatter into the padded layout), gather, masked batched
           objective, Gaussian X-prior, autodiff gradient  ->  (nll, grad)

Re-blocking is differentiation-safe: block membership is piecewise constant
in X, so gradients flow only through the gathers (identical to the
reference's treatment, where ``update_X`` re-blocks and gradients are
computed for the fixed partition).

A capacity flag is returned: if any block outgrows the padded slot count m,
the extra points are dropped from the objective and ``overflow`` is True —
the host driver must rebuild with a larger m (this mirrors the static-shape
contract of the layout).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.model.objective import GPRFParams, gprf_ll


@functools.partial(
    jax.jit,
    static_argnames=("m", "dfn_str", "wfn_str", "grad_cov"),
)
def fused_grid_value_and_grad(
    params: GPRFParams,
    Y,
    centers,          # [B, dx]
    edges,            # [E, 2] int32 (static contents not required)
    unary_weights,    # [B]
    X_obs_flat,       # [n*dx] prior means
    obs_std,          # scalar
    m: int,
    dfn_str: str = "euclidean",
    wfn_str: str = "se",
    grad_cov: bool = False,
):
    """(nll, ngrad_flat, overflow): one-dispatch objective+gradient
    evaluation with on-device nearest-center re-blocking and Gaussian
    X-prior — the complete per-step work of the reference synthetic driver
    (``gprfopt.py:377-417``) as a single device program."""

    n = params.X.shape[0]
    B = centers.shape[0]

    def assemble(X):
        # HIGHEST precision: the TPU default bf16 matmul pass misassigns
        # points whose two nearest centers are close
        scores = -2.0 * jnp.dot(
            X, centers.T, precision=jax.lax.Precision.HIGHEST
        ) + jnp.sum(centers * centers, axis=1)
        blocks = jnp.argmin(scores, axis=1)
        order = jnp.argsort(blocks, stable=True)
        sorted_blocks = blocks[order]
        counts = jnp.bincount(blocks, length=B)
        starts = jnp.cumsum(counts) - counts
        pos = jnp.arange(n) - starts[sorted_blocks]
        assignment = (
            jnp.zeros((B, m), dtype=jnp.int32)
            .at[sorted_blocks, pos]
            .set(order.astype(jnp.int32), mode="drop")
        )
        mask = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1) < counts[:, None]
        overflow = jnp.max(counts) > m
        return assignment, mask, overflow

    # membership is a function of X but piecewise constant: compute it
    # outside the differentiated closure
    assignment, mask, overflow = assemble(jax.lax.stop_gradient(params.X))
    pair_assignment = jnp.concatenate(
        [assignment[edges[:, 0]], assignment[edges[:, 1]]], axis=1
    )
    pair_mask = jnp.concatenate([mask[edges[:, 0]], mask[edges[:, 1]]], axis=1)
    pair_weights = jnp.ones((edges.shape[0],), dtype=params.X.dtype)

    def objective(p):
        ll = gprf_ll(
            p,
            Y,
            assignment,
            mask,
            pair_assignment,
            pair_mask,
            unary_weights,
            pair_weights,
            dfn_str=dfn_str,
            wfn_str=wfn_str,
        )
        r = (p.X.reshape(-1) - X_obs_flat) / obs_std
        n_flat = X_obs_flat.shape[0]
        prior = -0.5 * jnp.sum(r * r) - 0.5 * n_flat * jnp.log(
            2 * jnp.pi * obs_std**2
        )
        return ll + prior

    ll, g = jax.value_and_grad(objective)(params)
    if grad_cov:
        gC = jnp.concatenate(
            [jnp.reshape(g.noise_var, (1,)), g.wfn_params, g.dfn_params]
        )
    else:
        gC = jnp.zeros((1 + g.wfn_params.shape[0] + g.dfn_params.shape[0],), dtype=params.X.dtype)
    return -ll, -g.X.reshape(-1), gC, overflow


class FusedGridGPRF:
    """Host wrapper for the fused path: one device round-trip per eval.

    Drop-in for the scipy L-BFGS closure of the synthetic task=x workload.
    """

    def __init__(self, X0, Y, centers, edges, X_obs, obs_std, cov: GPCov, noise_var, m=None):
        self.Y = jnp.asarray(Y)
        self.centers = jnp.asarray(np.asarray(centers))
        edges = np.asarray(edges, dtype=np.int32).reshape(-1, 2)
        self.edges = jnp.asarray(edges)
        B = len(centers)
        counts = np.zeros(B, dtype=np.int64)
        for i, j in edges:
            counts[i] += 1
            counts[j] += 1
        self.unary_weights = jnp.asarray(1.0 - counts.astype(np.float64), dtype=self.Y.dtype)
        self.X_obs_flat = jnp.asarray(np.asarray(X_obs).reshape(-1), dtype=self.Y.dtype)
        self.obs_std = float(obs_std)
        self.cov = cov
        self.noise_var = float(noise_var)
        self.shape = np.asarray(X0).shape
        if m is None:
            # initial capacity: the current max block size padded to 8;
            # compute cost scales with m^3, so no speculative headroom —
            # overflow (rare membership drift) triggers a grow+recompile
            from gprf_tpu.partition.grid import Blocker

            b = Blocker(np.asarray(centers))
            sizes = [len(ix) for ix in b.block_clusters(np.asarray(X0))]
            m = (max(sizes) + 7) // 8 * 8
        self.m = m

    def value_and_grad(self, x_flat):
        """(nll, ngrad) for the scipy driver; grows capacity on overflow."""
        X = jnp.asarray(np.asarray(x_flat).reshape(self.shape), dtype=self.Y.dtype)
        params = GPRFParams(
            X=X,
            wfn_params=jnp.asarray(self.cov.wfn_params, dtype=self.Y.dtype),
            dfn_params=jnp.asarray(self.cov.dfn_params, dtype=self.Y.dtype),
            noise_var=jnp.asarray(self.noise_var, dtype=self.Y.dtype),
        )
        while True:
            nll, ngrad, _, overflow = jax.device_get(
                fused_grid_value_and_grad(
                    params,
                    self.Y,
                    self.centers,
                    self.edges,
                    self.unary_weights,
                    self.X_obs_flat,
                    self.obs_std,
                    m=self.m,
                    dfn_str=self.cov.dfn_str,
                    wfn_str=self.cov.wfn_str,
                )
            )
            if not overflow:
                return float(nll), np.array(ngrad, dtype=np.float64)
            self.m += 16  # modest capacity growth; recompiles at the new m
