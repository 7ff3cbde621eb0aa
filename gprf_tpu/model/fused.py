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
from gprf_tpu.model.objective import GPRFParams, gprf_ll, gprf_ll_schur


def fused_grid_objective(
    params: GPRFParams,
    Y,
    centers,          # [B, dx]
    edges,            # [E, 2] int32
    unary_weights,    # [B]
    X_obs_flat,       # [n*dx] prior means
    obs_std,          # scalar
    m: int,
    dfn_str: str = "euclidean",
    wfn_str: str = "se",
    pair_mode: str = "schur",
):
    """(ll + prior, overflow): pure-jax fused objective with on-device
    nearest-center re-blocking — the complete per-step objective of the
    reference synthetic driver (``gprfopt.py:377-417``)."""
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
    # outside the differentiated graph
    assignment, mask, overflow = assemble(jax.lax.stop_gradient(params.X))
    pair_weights = jnp.ones((edges.shape[0],), dtype=params.X.dtype)

    if pair_mode.startswith("schur"):
        ll = gprf_ll_schur(
            params, Y, assignment, mask, edges, unary_weights, pair_weights,
            dfn_str=dfn_str, wfn_str=wfn_str,
            use_pallas=(pair_mode == "schur_pallas"),
        )
    else:
        pair_assignment = jnp.concatenate(
            [assignment[edges[:, 0]], assignment[edges[:, 1]]], axis=1
        )
        pair_mask = jnp.concatenate([mask[edges[:, 0]], mask[edges[:, 1]]], axis=1)
        ll = gprf_ll(
            params,
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
    r = (params.X.reshape(-1) - X_obs_flat) / obs_std
    n_flat = X_obs_flat.shape[0]
    prior = -0.5 * jnp.sum(r * r) - 0.5 * n_flat * jnp.log(2 * jnp.pi * obs_std**2)
    return ll + prior, overflow


@functools.partial(
    jax.jit,
    static_argnames=("m", "dfn_str", "wfn_str", "grad_cov", "pair_mode"),
)
def fused_grid_value_and_grad(
    params: GPRFParams,
    Y,
    centers,
    edges,
    unary_weights,
    X_obs_flat,
    obs_std,
    m: int,
    dfn_str: str = "euclidean",
    wfn_str: str = "se",
    grad_cov: bool = False,
    pair_mode: str = "schur",
):
    """(nll, ngrad_flat, ngradCov, overflow): one-dispatch objective plus
    gradient evaluation."""

    def objective(p):
        ll, overflow = fused_grid_objective(
            p, Y, centers, edges, unary_weights, X_obs_flat, obs_std,
            m=m, dfn_str=dfn_str, wfn_str=wfn_str, pair_mode=pair_mode,
        )
        return ll, overflow

    (ll, overflow), g = jax.value_and_grad(objective, has_aux=True)(params)
    if grad_cov:
        gC = jnp.concatenate(
            [jnp.reshape(g.noise_var, (1,)), g.wfn_params, g.dfn_params]
        )
    else:
        gC = jnp.zeros(
            (1 + g.wfn_params.shape[0] + g.dfn_params.shape[0],), dtype=params.X.dtype
        )
    return -ll, -g.X.reshape(-1), gC, overflow


class FusedGridGPRF:
    """Host wrapper for the fused path: one device round-trip per eval.

    Drop-in for the scipy L-BFGS closure of the synthetic task=x workload;
    ``loss_fn()`` exposes the pure scalar loss for fully on-device
    optimizers (:mod:`gprf_tpu.optim.device_lbfgs`).
    """

    def __init__(self, X0, Y, centers, edges, X_obs, obs_std, cov: GPCov,
                 noise_var, m=None, pair_mode: str | None = None, dtype=None):
        if dtype is None:
            dtype = jnp.result_type(float)  # f32, or f64 under jax_enable_x64
        if pair_mode is None:
            # the Pallas pair kernel needs a real TPU backend and f32; CPU
            # (tests, virtual meshes) and f64 refinement use the XLA path
            on_tpu = jax.default_backend() == "tpu"
            pair_mode = "schur_pallas" if (on_tpu and dtype == jnp.float32) else "schur"
        self.pair_mode = pair_mode
        self.Y = jnp.asarray(Y, dtype=dtype)
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

    def _params(self, x_flat):
        dtype = self.Y.dtype
        return GPRFParams(
            X=jnp.asarray(np.asarray(x_flat).reshape(self.shape), dtype=dtype),
            wfn_params=jnp.asarray(self.cov.wfn_params, dtype=dtype),
            dfn_params=jnp.asarray(self.cov.dfn_params, dtype=dtype),
            noise_var=jnp.asarray(self.noise_var, dtype=dtype),
        )

    def loss_fn(self):
        """Pure scalar loss x_flat -> nll for in-jit optimizers.  Closes
        over the current capacity m; rebuild after capacity growth."""
        Y, centers, edges = self.Y, self.centers, self.edges
        unary_weights, X_obs_flat = self.unary_weights, self.X_obs_flat
        obs_std, m, shape = self.obs_std, self.m, self.shape
        dtype = Y.dtype
        wfn_params = jnp.asarray(self.cov.wfn_params, dtype=dtype)
        dfn_params = jnp.asarray(self.cov.dfn_params, dtype=dtype)
        noise_var = jnp.asarray(self.noise_var, dtype=dtype)
        dfn_str, wfn_str = self.cov.dfn_str, self.cov.wfn_str

        pair_mode = self.pair_mode

        def loss(x_flat):
            params = GPRFParams(
                X=x_flat.reshape(shape),
                wfn_params=wfn_params,
                dfn_params=dfn_params,
                noise_var=noise_var,
            )
            ll, _ = fused_grid_objective(
                params, Y, centers, edges, unary_weights, X_obs_flat, obs_std,
                m=m, dfn_str=dfn_str, wfn_str=wfn_str, pair_mode=pair_mode,
            )
            return -ll

        return loss

    def check_capacity(self, x_flat) -> bool:
        """True if the current capacity m holds all blocks at x_flat."""
        from gprf_tpu.partition.grid import Blocker

        b = Blocker(np.asarray(self.centers))
        sizes = [len(ix) for ix in b.block_clusters(np.asarray(x_flat).reshape(self.shape))]
        return max(sizes) <= self.m

    def grow_capacity(self):
        self.m += 16

    def value_and_grad(self, x_flat):
        """(nll, ngrad) for the scipy driver; grows capacity on overflow."""
        params = self._params(x_flat)
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
                    pair_mode=self.pair_mode,
                )
            )
            if not overflow:
                return float(nll), np.array(ngrad, dtype=np.float64)
            self.grow_capacity()  # recompiles at the new m
