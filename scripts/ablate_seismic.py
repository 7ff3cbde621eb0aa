"""In-scan ablation of the seismic device engine (full 12k catalog).

Same methodology as scripts/ablate.py (evolving-state scan; the tunneled
runtime result-caches identical dispatches).  Variants:
  default    full L-BFGS step on the seismic fused xcov loss
  gradeval   objective+gradient only
  lossonly   objective only
  unary      objective+gradient with an empty edge set
  reblock    the on-device PD-tree re-block alone

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablate_seismic.py [variants...]
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
NRUNS = 4


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
    from gprf_tpu.data.seismic import COL_DEPTH, COL_LAT, COL_LON, load_data
    from gprf_tpu.model.fused_seismic import FusedSeismicGPRF
    from gprf_tpu.model.gprf import GPRF
    from gprf_tpu.partition.pdtree import PDTree, pdtree_cluster, wrap_lon

    variants = sys.argv[1:] or ["default", "gradeval", "lossonly", "unary", "reblock"]

    sorted_isc, SY, cov = load_data(40.0, 0, data_dir="/root/repo")
    X_true = sorted_isc[:, (COL_LON, COL_LAT, COL_DEPTH)]
    rng = np.random.RandomState(0)
    prior_std = 20.0 * np.array([0.01, 0.01, 1.0])
    means = X_true + rng.randn(*X_true.shape) * prior_std
    cluster_idxs, reblock = pdtree_cluster(means, blocksize=210)
    nf = "/root/repo/neighbors_%d_%d_%.3f_%.3f.npy" % (len(means), 210, 0.6, 20.0)
    try:
        neighbors = np.load(nf)
    except (IOError, OSError):
        # fresh checkout: derive the edge set the same way the CLI does
        g = GPRF(means, SY, reblock, cov, 0.1, neighbor_threshold=0.6,
                 block_idxs=cluster_idxs)
        neighbors = np.asarray(g.neighbors, dtype=np.int32).reshape(-1, 2)
        np.save(nf, neighbors)

    X2 = means[:, :2].copy()
    X2[:, 0] = wrap_lon(X2[:, 0])
    tree = PDTree(X2, minsize=210)

    def make_fused(edge_set):
        return FusedSeismicGPRF(
            means, SY, tree, edge_set, means, prior_std, cov, 0.1, task="xcov"
        )

    fused = make_fused(neighbors)
    sys.stderr.write(f"m={fused.m} blocks={fused.n_blocks} edges={len(neighbors)}\n")
    C0 = np.array([[0.1, float(np.asarray(cov.wfn_params)[0])]
                   + list(np.asarray(cov.dfn_params))])
    theta0 = jnp.asarray(fused.theta0(means, C0), dtype=fused.dtype)
    loss = fused.loss_fn()

    for v in variants:
        jax.clear_caches()
        if v == "default":
            from gprf_tpu.optim.device_lbfgs import make_scan_lbfgs_runner

            init_fn, run_fn = make_scan_lbfgs_runner(loss, num_steps=STEPS)
            carry = init_fn(theta0)
            carry, _ = run_fn(carry)
            jax.block_until_ready(carry["v"])
            t0 = time.time()
            for _ in range(NRUNS):
                carry, _ = run_fn(carry)
            jax.block_until_ready(carry["v"])
            ms = (time.time() - t0) / (NRUNS * STEPS) * 1e3
        elif v == "gradeval":
            g = jax.grad(loss)
            ms = scan_time(lambda x: x - 1e-9 * g(x), theta0)
        elif v == "lossonly":
            ms = scan_time(lambda x: x - 1e-12 * loss(x), theta0)
        elif v == "unary":
            fu = make_fused(np.zeros((0, 2), dtype=np.int32))
            gu = jax.grad(fu.loss_fn())
            ms = scan_time(lambda x: x - 1e-9 * gu(x), theta0)
        elif v == "reblock":
            from gprf_tpu.model.fused import assemble_layout
            from gprf_tpu.partition.pdtree_device import assign_blocks_pdtree

            arrays, depth = fused.tree_arrays, fused.depth
            B, m, n = fused.n_blocks, fused.m, means.shape[0]

            def step(x):
                X = x[: n * 3].reshape(n, 3)
                blocks = assign_blocks_pdtree(X[:, :2], arrays, depth)
                _, mask, _ = assemble_layout(blocks, B, m)
                return x + 1e-20 * jnp.sum(mask.astype(x.dtype))

            ms = scan_time(step, theta0)
        else:
            raise SystemExit(f"unknown variant {v}")
        if v == "reblock":
            print(f"{v:10s} {ms:8.2f} ms/eval", flush=True)
        else:
            from gprf_tpu.utils.flops import model_flops_per_eval, roofline_str

            flops = model_flops_per_eval(
                B=fused.n_blocks, m=fused.m,
                E=len(neighbors) if v != "unary" else 0,
                dy=SY.shape[1], dx=3,
                passes=1.0 if v == "lossonly" else 3.0,
            )
            print(
                f"{v:10s} {ms:8.2f} ms/eval   {roofline_str(flops, ms / 1e3)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
