"""Headline benchmark: GPRF objective+gradient evaluation wall time.

Reproduces the reference's flagship configuration — synthetic n=10k latent
points, 100 grid blocks, GPRF neighbor edges, task=x — and times one full
L-BFGS-style objective+gradient evaluation (host re-blocking + device
llgrad + prior, exactly what the optimizer pays per step).  The reference
does this in 7.30 s on one CPU core (BASELINE.md: `gprf_results.tgz:
10000_10500_100_..._0.1000_..._gprf0/results.txt`).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import sys
import time

import numpy as np


BASELINE_SEC_PER_EVAL = 7.30  # reference CPU (BASELINE.md row 1)


def build_problem(n=10000, nblocks=100, yd=50, lscale=0.06, obs_std=0.02, seed=0):
    from gprf_tpu.kernels.gpcov import GPCov
    from gprf_tpu.model.gprf import GPRF
    from gprf_tpu.partition.grid import Blocker, grid_centers

    rng = np.random.default_rng(seed)
    SX = rng.uniform(size=(n, 2))
    X_obs = SX + rng.standard_normal(SX.shape) * obs_std
    # Y from iid noise: the timing of the objective does not depend on Y's
    # distribution, and sampling a 10k-point GP prior is not what we bench.
    Y = rng.standard_normal((n, yd))
    cov = GPCov.create([1.0], [lscale, lscale])
    b = Blocker(grid_centers(nblocks))
    blocks = b.block_clusters(X_obs)
    gprf = GPRF(
        X_obs,
        Y,
        block_fn=lambda XX: b.block_clusters(XX),
        cov=cov,
        noise_var=0.01,
        block_idxs=blocks,
        neighbors=b.neighbors(diag_connections=True),
    )
    return gprf, X_obs, obs_std


def main():
    from gprf_tpu.model.fused import FusedGridGPRF
    from gprf_tpu.partition.grid import Blocker, grid_centers

    gprf, X_obs, obs_std = build_problem()
    sizes = gprf.layout.sizes
    sys.stderr.write(
        f"blocks={gprf.n_blocks} pad={gprf.layout.block_pad} "
        f"max={sizes.max()} edges={len(gprf.neighbors)}\n"
    )

    b = Blocker(grid_centers(100))
    fused = FusedGridGPRF(
        X_obs, gprf.Y, b.block_centers, b.neighbors(), X_obs, obs_std,
        gprf.cov, gprf.noise_var,
    )
    flat_obs = X_obs.flatten()

    def one_eval(x):
        # the complete reference per-step work (gprfopt.py:377-417) —
        # re-block, objective+gradient, Gaussian prior — as one fused
        # device dispatch
        return fused.value_and_grad(x)

    # warmup / compile
    t0 = time.time()
    one_eval(flat_obs)
    compile_time = time.time() - t0
    for _ in range(2):
        one_eval(flat_obs)

    iters = 20
    rng = np.random.default_rng(1)
    t0 = time.time()
    for i in range(iters):
        x = flat_obs + rng.standard_normal(flat_obs.shape) * 1e-4
        one_eval(x)
    sec_per_eval = (time.time() - t0) / iters

    sys.stderr.write(f"compile {compile_time:.1f}s, steady {sec_per_eval*1e3:.1f} ms/eval\n")
    print(
        json.dumps(
            {
                "metric": "gprf_obj_grad_eval_n10k_100blocks",
                "value": round(sec_per_eval * 1e3, 3),
                "unit": "ms/eval",
                "vs_baseline": round(BASELINE_SEC_PER_EVAL / sec_per_eval, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
