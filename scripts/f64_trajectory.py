"""Compare the from-scratch f64 80k GPRF-100 trajectory (scripts/
run_f64_scratch.py) against the committed f32 run at matched iterations.

The decisive read does NOT require full f64 convergence: the committed f32
runs provide mad-vs-iteration curves (docs/runs/gprf80k_device), so if the
f64 trajectory tracks the f32 curve at matched iteration counts, f32
forward factorizations are exonerated as a *trajectory* systematic; if it
runs materially below, they are implicated.  Both runs use the SAME legacy
Vecchia draw (the f64 control isolates precision, not data).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/f64_trajectory.py
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np

os.environ["GPRF_SAMPLER"] = "vecchia"

from gprf_tpu.data.sampled import exp_base_dir, sample_data  # noqa: E402
from gprf_tpu.partition.grid import grid_centers  # noqa: E402


def f32_curve(path="docs/runs/gprf80k_device/results.txt"):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] == "trueX":
                continue
            rows.append((int(parts[0]), float(parts[2]), float(parts[4])))
    return rows  # (iter, ll, mad)


def main():
    data = sample_data(
        n=80500, ntrain=80000, lscale=0.021213, obs_std=0.007071, yd=50,
        seed=0, centers=np.asarray(grid_centers(100)), noise_var=0.01,
    )
    d = os.path.join(exp_base_dir(), "gprf80k_100_f64scratch")
    lls = {}
    logp = os.path.join(d, "log.txt")
    if os.path.exists(logp):
        with open(logp) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 3 and parts[0].isdigit():
                    lls[int(parts[0])] = float(parts[2])
    f32 = {it: (ll, mad) for it, ll, mad in f32_curve()}
    print("%6s %12s %12s %14s %14s" % ("iter", "f64 mad", "f32 mad", "f64 ll", "f32 ll"))
    for p in sorted(glob.glob(os.path.join(d, "step_*_X.npy"))):
        it = int(re.search(r"step_(\d+)_X", p).group(1))
        X = np.load(p)
        mad = data.mean_distance(X)
        # nearest f32 row at or below this iteration
        f32_it = max((k for k in f32 if k <= it), default=None)
        if f32_it is None:
            print("%6d %12.6f %12s %14.2f %14s" % (it, mad, "-", lls.get(it, np.nan), "-"))
        else:
            print(
                "%6d %12.6f %12.6f %14.2f %14.2f"
                % (it, mad, f32[f32_it][1], lls.get(it, np.nan), f32[f32_it][0])
            )


if __name__ == "__main__":
    main()
