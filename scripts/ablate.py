"""In-scan ablation microbench at the flagship shape (n=10k, 100 blocks).

The tunneled runtime result-caches identical dispatches and adds ~30 ms
transport per dispatch, so isolated one-shot timings are unreliable
(docs/RESULTS.md "measurement caveat").  Authoritative methodology: run the
variant inside one lax.scan with evolving state, time S iterations per
dispatch, average over several dispatches.

Variants:
  default    full L-BFGS step on the current build (what bench.py reports)
  twokernel  same, but the fused chol+inv primitive split back into the
             round-1 two-kernel path (chol -> tri_inv), for A/B
  gradeval   objective+gradient only (no optimizer update)
  lossonly   objective only
  unary      objective+gradient with an empty edge set (unary pass alone)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablate.py [variants...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

STEPS = 25
NRUNS = 4


def scan_time(step_fn, x0):
    """ms per step of x -> step_fn(x) run STEPS times inside one scan."""

    @jax.jit
    def run(x):
        def body(x, _):
            return step_fn(x), ()

        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return out

    x = run(x0)  # compile + warm
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(NRUNS):
        x = run(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / (NRUNS * STEPS) * 1e3


def main():
    from bench import build_problem
    from gprf_tpu.model.fused import FusedGridGPRF
    from gprf_tpu.partition.grid import Blocker, grid_centers

    variants = sys.argv[1:] or [
        "default", "twokernel", "gradeval", "lossonly", "unary", "reblock"
    ]

    gprf, X_obs, obs_std = build_problem()
    b = Blocker(grid_centers(100))
    edges = b.neighbors(diag_connections=False)

    def make_fused(edge_set):
        return FusedGridGPRF(
            X_obs, gprf.Y, b.block_centers, edge_set,
            X_obs, obs_std, gprf.cov, gprf.noise_var,
        )

    fused = make_fused(edges)
    x0 = jnp.asarray(X_obs.flatten(), dtype=fused.Y.dtype)
    loss = fused.loss_fn()

    import gprf_tpu.ops.pallas_mvn as pm

    orig_cinv = pm.batched_chol_inv_pallas

    def twokernel_cinv(K, interpret=False):
        L = pm.batched_cholesky_pallas(K, interpret)
        W = pm.batched_tri_inv_pallas(L, interpret)
        return L, W

    results = {}
    for v in variants:
        # the jit cache keys on function identity, not on monkeypatched
        # internals — force a retrace per variant
        jax.clear_caches()
        if v == "default" or v == "twokernel":
            if v == "twokernel":
                pm.batched_chol_inv_pallas = twokernel_cinv
            try:
                from gprf_tpu.optim.device_lbfgs import make_scan_lbfgs_runner

                init_fn, run_fn = make_scan_lbfgs_runner(loss, num_steps=STEPS)
                carry = init_fn(x0)
                carry, _ = run_fn(carry)
                jax.block_until_ready(carry["v"])
                t0 = time.time()
                for _ in range(NRUNS):
                    carry, _ = run_fn(carry)
                jax.block_until_ready(carry["v"])
                ms = (time.time() - t0) / (NRUNS * STEPS) * 1e3
            finally:
                pm.batched_chol_inv_pallas = orig_cinv
        elif v == "gradeval":
            g = jax.grad(loss)
            ms = scan_time(lambda x: x - 1e-9 * g(x), x0)
        elif v == "lossonly":
            ms = scan_time(lambda x: x - 1e-12 * loss(x), x0)
        elif v == "unary_lossonly":
            fu = make_fused(np.zeros((0, 2), dtype=np.int32))
            lu = fu.loss_fn()
            ms = scan_time(lambda x: x - 1e-12 * lu(x), x0)
        elif v == "unary":
            fu = make_fused(np.zeros((0, 2), dtype=np.int32))
            lu = fu.loss_fn()
            gu = jax.grad(lu)
            ms = scan_time(lambda x: x - 1e-9 * gu(x), x0)
        elif v.startswith("multistart"):
            # R on-chip replicas: ms per L-BFGS iteration ACROSS ALL replicas
            # (each iteration advances R independent optimizations)
            R = int(v[len("multistart"):] or "8")
            from gprf_tpu.optim.device_lbfgs import make_multistart_runner

            rngp = np.random.default_rng(1)
            x0s = jnp.stack(
                [x0]
                + [
                    x0 + jnp.asarray(
                        rngp.standard_normal(x0.shape) * obs_std, dtype=x0.dtype
                    )
                    for _ in range(R - 1)
                ]
            )
            init_fn, run_fn = make_multistart_runner(loss, num_steps=STEPS)
            carry = init_fn(x0s)
            carry, _ = run_fn(carry)
            jax.block_until_ready(carry["v"])
            t0 = time.time()
            for _ in range(NRUNS):
                carry, _ = run_fn(carry)
            jax.block_until_ready(carry["v"])
            ms = (time.time() - t0) / (NRUNS * STEPS) * 1e3
        elif v == "reblock":
            # isolate the on-device re-block (argmin + stable argsort +
            # scatter) that runs every iteration inside the fused loss
            from gprf_tpu.model.fused import assemble_layout

            centers = jnp.asarray(np.asarray(b.block_centers), dtype=x0.dtype)

            def reblock_step(x):
                X = x.reshape(-1, 2)
                scores = -2.0 * jnp.dot(
                    X, centers.T, precision=jax.lax.Precision.HIGHEST
                ) + jnp.sum(centers * centers, axis=1)
                blocks = jnp.argmin(scores, axis=1)
                assignment, mask, _ = assemble_layout(blocks, centers.shape[0], fused.m)
                # consume the outputs so nothing is DCE'd
                return x + 1e-20 * (
                    jnp.sum(mask.astype(x.dtype)) + jnp.sum(assignment).astype(x.dtype)
                )

            ms = scan_time(reblock_step, x0)
        else:
            raise SystemExit(f"unknown variant {v}")
        results[v] = ms
        print(f"{v:10s} {ms:8.2f} ms/eval", flush=True)

    print(results)


if __name__ == "__main__":
    main()
