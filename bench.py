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
import os
import sys
import time

import numpy as np

import jax

# persistent compile cache: the driver runs this in a fresh process and the
# remote-compile path is the dominant cold cost
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


BASELINE_SEC_PER_EVAL = 7.30  # reference CPU (BASELINE.md row 1)

from gprf_tpu.utils.flops import PEAK_F32_FLOPS, model_flops_per_eval  # noqa: E402


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
    # axis-only edges: the reference's diag_connections=True numerically
    # collapses to axis-only at this grid (self-distance roundoff poisons
    # its threshold — reproduced from /root/reference/block_clustering.py:4
    # arithmetic verbatim: 180 edges), so the BASELINE 7.30 s/eval timed the
    # 180-edge workload.  Our neighbors() fixes the intent; the bench pins
    # the reference-matched workload for an apples-to-apples rate.
    gprf = GPRF(
        X_obs,
        Y,
        block_fn=lambda XX: b.block_clusters(XX),
        cov=cov,
        noise_var=0.01,
        block_idxs=blocks,
        neighbors=b.neighbors(diag_connections=False),
    )
    return gprf, X_obs, obs_std


def main():
    # Two observed tunnel failure modes, two guards:
    #  (1) tunnel DOWN: the axon plugin raises UNAVAILABLE or hangs in
    #      backend *init*.  Probe `jax.devices()` in a subprocess with a
    #      timeout and fall back to the CPU backend, tagging the metric
    #      name (the number is then NOT the TPU headline).
    #  (2) tunnel UP but a remote *compile* hangs (observed once >40 min):
    #      the probe passes, then the bench never returns and the driver
    #      records no artifact at all.  So the bench body itself runs in a
    #      watchdog subprocess (GPRF_BENCH_MAXSEC, default 2100 s — above
    #      the slow-but-healthy 10-25 min remote-compile tail); on expiry
    #      the child is killed and the bench reruns forced to CPU.
    # GPRF_BENCH_PROBE_SEC=0 skips the probe; GPRF_BENCH_MAXSEC=0 disables
    # the watchdog (runs the body in-process, the pre-round-3 behavior).
    import subprocess

    if not os.environ.get("_GPRF_BENCH_CHILD"):
        maxsec = float(os.environ.get("GPRF_BENCH_MAXSEC", "3000"))
        if maxsec > 0:
            env = dict(os.environ, _GPRF_BENCH_CHILD="1")
            try:
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, timeout=maxsec, check=True,
                )
                return
            except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
                sys.stderr.write(
                    "bench child failed or hung (%s); forced-CPU rerun\n"
                    % type(e).__name__
                )
            env["_GPRF_BENCH_FORCE_CPU"] = "1"
            subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=maxsec, check=True,
            )
            return

    backend_tag = ""
    if os.environ.get("_GPRF_BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        backend_tag = "_cpu_fallback"
        probe_sec = 0.0
    else:
        probe_sec = float(os.environ.get("GPRF_BENCH_PROBE_SEC", "300"))

    if probe_sec > 0:
        # Poll the tunnel for a bounded window before giving up: a transient
        # outage at capture time cost round 3 its on-chip artifact.  Each
        # probe runs devices()+a tiny computation in a subprocess (first
        # touch costs ~2-3 min of session establishment, hence the generous
        # per-probe timeout); failures back off and retry until the window
        # (GPRF_BENCH_PROBE_WINDOW, default 15 min) is exhausted.
        window = float(os.environ.get("GPRF_BENCH_PROBE_WINDOW", "900"))
        deadline = time.time() + window
        backoff = 30.0
        while True:
            try:
                subprocess.run(
                    [
                        sys.executable,
                        "-c",
                        "import jax, jax.numpy as jnp; jax.devices(); "
                        "jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))",
                    ],
                    timeout=probe_sec,
                    check=True,
                    capture_output=True,
                )
                break
            except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
                remaining = deadline - time.time()
                if remaining <= 0:
                    sys.stderr.write(
                        "default backend unavailable (%s) after full probe "
                        "window; CPU fallback\n" % type(e).__name__
                    )
                    jax.config.update("jax_platforms", "cpu")
                    backend_tag = "_cpu_fallback"
                    break
                sys.stderr.write(
                    "backend probe failed (%s); retrying in %.0fs "
                    "(%.0fs left in window)\n"
                    % (type(e).__name__, min(backoff, remaining), remaining)
                )
                time.sleep(min(backoff, remaining))
                backoff = min(backoff * 2, 240.0)

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
        X_obs, gprf.Y, b.block_centers, b.neighbors(diag_connections=False),
        X_obs, obs_std, gprf.cov, gprf.noise_var,
    )
    flat_obs = X_obs.flatten()

    # --- single-dispatch eval (the scipy-driver granularity), for context
    t0 = time.time()
    fused.value_and_grad(flat_obs)
    compile_time = time.time() - t0
    fused.value_and_grad(flat_obs)
    t0 = time.time()
    for _ in range(10):
        fused.value_and_grad(flat_obs)
    dispatch_eval_ms = (time.time() - t0) / 10 * 1e3

    # --- headline: the real optimization loop fully on device; one
    # objective+gradient evaluation per L-BFGS iteration (the same unit the
    # reference's log counts); S iterations run per dispatch.
    import jax.numpy as jnp
    from gprf_tpu.optim.device_lbfgs import make_scan_lbfgs_runner

    loss = fused.loss_fn()
    steps_per_dispatch = 25
    init_fn, run_fn = make_scan_lbfgs_runner(loss, num_steps=steps_per_dispatch)
    carry = init_fn(jnp.asarray(flat_obs, dtype=fused.Y.dtype))
    carry, _ = run_fn(carry)  # compile + warm
    jax.block_until_ready(carry["v"])
    t0 = time.time()
    nruns = 4
    v_first = float(carry["v"])
    for _ in range(nruns):
        carry, traj = run_fn(carry)
    jax.block_until_ready(carry["v"])
    wall = time.time() - t0
    total_evals = nruns * steps_per_dispatch  # exactly one eval per iteration
    sec_per_eval = wall / total_evals
    values = np.asarray(traj[0])
    assert float(carry["v"]) <= v_first, "optimization not progressing"

    flops = model_flops_per_eval(
        B=100, m=fused.m, E=int(fused.edges.shape[0]), dy=gprf.Y.shape[1],
        dx=2,
    )
    gflops = flops / sec_per_eval / 1e9
    mfu = flops / sec_per_eval / PEAK_F32_FLOPS

    sys.stderr.write(
        f"compile {compile_time:.1f}s; single-dispatch eval {dispatch_eval_ms:.1f} ms; "
        f"device loop: {total_evals} evals in {wall:.2f}s -> "
        f"{sec_per_eval*1e3:.1f} ms/eval; obj {v_first:.1f} -> {float(carry['v']):.1f}; "
        f"model {flops/1e9:.1f} GFLOP/eval -> {gflops:.0f} GFLOP/s ({mfu*100:.2f}% f32 MFU)\n"
    )
    record = {
        "metric": "gprf_obj_grad_eval_n10k_100blocks" + backend_tag,
        "value": round(sec_per_eval * 1e3, 3),
        "unit": "ms/eval",
        "vs_baseline": round(BASELINE_SEC_PER_EVAL / sec_per_eval, 2),
        "gflops": round(gflops, 1),
        "mfu": round(mfu, 4),
    }
    if backend_tag:
        # not the headline: the TPU tunnel was unreachable at bench time
        record["note"] = (
            "CPU-backend fallback (TPU tunnel down); last on-chip headline "
            "3.78 ms/eval = ~1930x (docs/RESULTS.md, docs/runs/)"
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
