"""From-scratch float64 GPRF-100 run at n=80k on the CPU backend.

VERDICT round-4 item 2: f32 forward factorizations are the last unexcluded
*code* systematic behind the 80k GPRF QoR plateau (0.00073 vs the
reference's 0.00064) — the reference pipeline is f64 end-to-end
(``/root/reference/gpy_linalg.py:77-104``).  This runs the flagship 80k
GPRF-100 optimization ENTIRELY in f64 from the observed-X init (not a
refine from the f32 optimum — that was measured round 3 with no QoR gain,
``docs/runs/gprf80k_refine_f64``), producing a mad-vs-iteration trajectory
directly comparable, step for step, against the committed f32 runs.

Checkpoint-resumable: re-running picks up from the latest step_*_X.npy in
the run dir (fresh L-BFGS memory on resume — acceptable for crash
recovery; intended use is one long process).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo nice -n 10 \
      python scripts/run_f64_scratch.py --maxsec 32000 --iters 400
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp  # noqa: E402

from gprf_tpu.data.sampled import exp_base_dir, sample_data  # noqa: E402
from gprf_tpu.model.fused import FusedSyntheticGPRF  # noqa: E402
from gprf_tpu.optim.device_lbfgs import refine_f64  # noqa: E402
from gprf_tpu.partition.grid import grid_centers  # noqa: E402
from gprf_tpu.utils.io import mkdir_p  # noqa: E402


def main():
    # this control isolates PRECISION: it must run on the same legacy
    # Vecchia draw as the committed f32 runs (the round-5 exact sampler is
    # a different realization), including across crash-resumes
    os.environ["GPRF_SAMPLER"] = "vecchia"
    p = argparse.ArgumentParser()
    p.add_argument("--maxsec", type=float, default=32000.0)
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--run_name", default="gprf80k_100_f64scratch")
    args = p.parse_args()

    centers = np.asarray(grid_centers(100))
    data = sample_data(
        n=80500, ntrain=80000, lscale=0.021213, obs_std=0.007071, yd=50,
        seed=0, centers=centers, noise_var=0.01,
    )
    gprf = data.build_gprf(local_dist=0.1)
    edges = gprf.neighbors

    d = os.path.join(exp_base_dir(), args.run_name)
    mkdir_p(d)
    steps = sorted(glob.glob(os.path.join(d, "step_*_X.npy")))
    if steps:
        X0 = np.load(steps[-1])
        it0 = int(os.path.basename(steps[-1]).split("_")[1]) + 1
        print("resuming %s from step %d" % (d, it0 - 1))
    else:
        X0 = data.X_obs
        it0 = 0
        print("fresh from-scratch f64 run in %s" % d)

    # block capacity: the on-device grid re-block shifts occupancy as X
    # moves; refine_f64's loop has no capacity-growth path, so pad the max
    # observed occupancy (over both the obs anchor and the resume point)
    def max_occ(X):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        return int(np.bincount(np.argmin(d2, axis=1), minlength=len(centers)).max())

    m = (max(max_occ(data.X_obs), max_occ(X0)) + 7) // 8 * 8 + 16
    print("block capacity m=%d" % m)

    def make_fused(dtype=jnp.float64):
        return FusedSyntheticGPRF(
            data.X_obs, data.SY, edges, data.X_obs, data.obs_std,
            gprf.cov, gprf.noise_var, task="x", C0=None, dtype=dtype,
            centers=centers, m=m,
        )

    os.environ.setdefault("GPRF_REFINE_MAX_M", str(m))
    x_final = refine_f64(
        d, make_fused, np.asarray(X0, dtype=np.float64).reshape(-1), it0,
        iters=args.iters, maxsec=args.maxsec,
    )
    print("final mean latent error: %.6f" % data.mean_distance(x_final))


if __name__ == "__main__":
    main()
