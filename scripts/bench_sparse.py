"""Benchmark the --sparse truncated-support path (VERDICT round-3 item 6).

Times one full objective+gradient evaluation of the seismic problem at
rpc_blocksize=810 (the shape the reference leaned on --sparse for,
``gprf.py:378-494``) through:

  sparse   the host loop over the native sparse Cholesky + Takahashi
           selected inverse (gprf_tpu/model/sparse_llgrad.py, CPU)
  dense    the same GPRF.llgrad through the batched dense device path
           (one host dispatch per eval)
  fused    the fused single-dispatch device evaluator in an in-scan loop
           (the production engine's per-eval cost at this shape)

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_sparse.py [sparse|dense|fused ...]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

BLOCKSIZE = 810
THRESHOLD = 0.6


def build():
    from gprf_tpu.data.seismic import COL_DEPTH, COL_LAT, COL_LON, load_data
    from gprf_tpu.model.gprf import GPRF
    from gprf_tpu.partition.pdtree import pdtree_cluster

    sorted_isc, SY, cov = load_data(40.0, 0, data_dir="/root/repo")
    X_true = sorted_isc[:, (COL_LON, COL_LAT, COL_DEPTH)]
    rng = np.random.RandomState(0)
    prior_std = 20.0 * np.array([0.01, 0.01, 1.0])
    X0 = X_true + rng.randn(*X_true.shape) * prior_std
    cluster_idxs, reblock = pdtree_cluster(X0, blocksize=BLOCKSIZE)
    cov_true = np.array(
        [0.1, float(np.asarray(cov.wfn_params)[0])]
        + list(np.asarray(cov.dfn_params))
    ).reshape((1, -1))
    gprf = GPRF(
        X0, SY, reblock, cov, cov_true[0, 0],
        neighbor_threshold=THRESHOLD, block_idxs=cluster_idxs,
    )
    return gprf, cov_true


def main():
    which = sys.argv[1:] or ["sparse", "dense", "fused"]
    gprf, cov_true = build()
    print(
        "n=%d blocks=%d edges=%d"
        % (gprf.X.shape[0], gprf.n_blocks, len(gprf.neighbors))
    )

    if "sparse" in which:
        t0 = time.time()
        ll, gX, gC = gprf.llgrad(grad_X=True, grad_cov=True, sparse=True)
        t1 = time.time() - t0
        t0 = time.time()
        gprf.llgrad(grad_X=True, grad_cov=True, sparse=True)
        t2 = time.time() - t0
        print("sparse host path: %.2f s / %.2f s per eval (ll %.2f)" % (t1, t2, ll))

    if "dense" in which:
        ll, gX, gC = gprf.llgrad(grad_X=True, grad_cov=True)  # compile
        t0 = time.time()
        for _ in range(5):
            ll, gX, gC = gprf.llgrad(grad_X=True, grad_cov=True)
        t = (time.time() - t0) / 5
        print("dense batched path: %.3f s per eval (ll %.2f)" % (t, ll))

    if "fused" in which:
        import jax.numpy as jnp
        from gprf_tpu.model.fused_seismic import FusedSeismicGPRF
        from gprf_tpu.partition.pdtree import PDTree, wrap_lon
        from gprf_tpu.data.seismic import make_x_prior

        X0 = gprf.X
        X2 = X0[:, :2].copy()
        X2[:, 0] = wrap_lon(X2[:, 0])
        tree = PDTree(X2, minsize=BLOCKSIZE)
        prior_std = 20.0 * np.array([0.01, 0.01, 1.0])
        fused = FusedSeismicGPRF(
            X0, gprf.Y, tree, gprf.neighbors, X0, prior_std, gprf.cov,
            0.1, task="xcov",
        )
        loss = fused.loss_fn()
        theta0 = jnp.asarray(fused.theta0(X0, cov_true), dtype=fused.dtype)
        grad = jax.grad(loss)

        def step(x):
            return x - 1e-9 * grad(x)

        @jax.jit
        def run(x):
            def body(x, _):
                return step(x), ()

            out, _ = jax.lax.scan(body, x, None, length=10)
            return out

        x = run(theta0)
        jax.block_until_ready(x)
        t0 = time.time()
        for _ in range(4):
            x = run(x)
        jax.block_until_ready(x)
        t = (time.time() - t0) / 40
        print("fused in-scan: %.2f ms per obj+grad eval" % (t * 1e3))


if __name__ == "__main__":
    main()
