"""In-scan ablation at the 80k wide-m config (n=80k, 100 blocks, m=872).

Same evolving-state methodology as scripts/ablate.py.  The wide path is
XLA blocked panels by default; A/B the block-2x2 split composition with

  GPRF_SPLIT_MAX_M=1024 PYTHONPATH=... python scripts/ablate_wide.py ...

Variants: default (full L-BFGS step), gradeval, lossonly, unary.
Uses the cached 80k synthetic dataset (run the 80k CLI once to create it).
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

STEPS = 10
NRUNS = 3


def scan_time(step_fn, x0):
    @jax.jit
    def run(x):
        def body(x, _):
            return step_fn(x), ()

        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return out

    x = run(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(NRUNS):
        x = run(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / (NRUNS * STEPS) * 1e3


def main():
    from gprf_tpu.data.sampled import sample_data
    from gprf_tpu.model.fused import FusedGridGPRF
    from gprf_tpu.partition.grid import Blocker, grid_centers

    import os

    variants = sys.argv[1:] or ["default", "lossonly", "unary"]
    # GPRF_ABLATE_BLOCKS / GPRF_ABLATE_DIAG parametrize the shape (e.g. the
    # B=900 diagnosis); defaults reproduce the round-3/4 roofline rows.
    # GPRF_ABLATE_LOCAL_DIST switches edge discovery to the production
    # kernel-correlation threshold (what the CLI's --local_dist uses), so
    # the ablation shape matches the committed suite rows exactly.
    nblocks = int(os.environ.get("GPRF_ABLATE_BLOCKS", "100"))
    diag = os.environ.get("GPRF_ABLATE_DIAG", "0") == "1"
    local_dist = os.environ.get("GPRF_ABLATE_LOCAL_DIST")
    centers = np.asarray(grid_centers(nblocks))
    data = sample_data(
        n=80500, ntrain=80000, lscale=0.021213, obs_std=0.007071, yd=50,
        seed=0, centers=centers, noise_var=0.01,
    )
    if local_dist is not None:
        gprf = data.build_gprf(local_dist=float(local_dist))
        edges = gprf.neighbors
    else:
        b = Blocker(centers)
        edges = b.neighbors(diag_connections=diag)
    # GPRF_ABLATE_MAX_E truncates the edge set (perf-shape sweep only —
    # the objective changes, the per-step cost vs E curve is the point)
    max_e = os.environ.get("GPRF_ABLATE_MAX_E")
    if max_e:
        edges = edges[: int(max_e)]

    def make_fused(edge_set):
        return FusedGridGPRF(
            data.X_obs, data.SY, centers, edge_set, data.X_obs,
            data.obs_std, data.cov, data.noise_var,
        )

    fused = make_fused(edges)
    sys.stderr.write(f"m={fused.m} blocks={fused.n_blocks} edges={len(edges)}\n")
    x0 = jnp.asarray(data.X_obs.flatten(), dtype=fused.dtype)
    loss = fused.loss_fn()

    from gprf_tpu.utils.flops import model_flops_per_eval, roofline_str

    def variant_flops(v):
        E = len(edges) if v != "unary" else 0
        passes = 1.0 if v == "lossonly" else 3.0
        return model_flops_per_eval(
            B=fused.n_blocks, m=fused.m, E=E, dy=data.SY.shape[1], dx=2,
            passes=passes,
        )

    for v in variants:
        jax.clear_caches()
        if v == "default":
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
        elif v == "gradeval":
            g = jax.grad(loss)
            ms = scan_time(lambda x: x - 1e-9 * g(x), x0)
        elif v == "lossonly":
            ms = scan_time(lambda x: x - 1e-12 * loss(x), x0)
        elif v == "unary":
            fu = make_fused(np.zeros((0, 2), dtype=np.int32))
            gu = jax.grad(fu.loss_fn())
            ms = scan_time(lambda x: x - 1e-9 * gu(x), x0)
        else:
            raise SystemExit(f"unknown variant {v}")
        print(
            f"{v:10s} {ms:8.2f} ms/eval   "
            f"{roofline_str(variant_flops(v), ms / 1e3)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
