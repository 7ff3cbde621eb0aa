"""On-device L-BFGS tests (CPU): convergence and driver protocol."""

import os

import numpy as np
import jax.numpy as jnp

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.model.fused import FusedGridGPRF
from gprf_tpu.optim.device_lbfgs import do_optimization_fused, make_lbfgs_runner
from gprf_tpu.partition.grid import Blocker, grid_centers


def test_lbfgs_runner_quadratic():
    A = jnp.diag(jnp.asarray([1.0, 10.0, 100.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])

    def loss(x):
        return 0.5 * x @ (A @ x) - b @ x

    init_fn, run_fn = make_lbfgs_runner(loss, num_steps=30)
    x = jnp.zeros(3)
    state = init_fn(x)
    x, state, (values, ls_steps, gnorms) = run_fn(x, state)
    x_opt = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_opt, rtol=1e-4)
    assert np.all(np.asarray(ls_steps) >= 1)
    # values monotone-ish decreasing overall
    v = np.asarray(values)
    assert v[-1] < v[0]


def test_device_lbfgs_gprf(tmp_path, rng):
    n = 150
    from gprf_tpu.kernels.hostnp import kernel_matrix_np

    SX = rng.uniform(size=(n, 2))
    cov = GPCov.create([1.0], [0.1, 0.1])
    K = kernel_matrix_np(cov, SX, noise_var=0.01)
    Y = np.linalg.cholesky(K) @ rng.standard_normal((n, 10))
    obs_std = 0.02
    X_obs = SX + rng.standard_normal(SX.shape) * obs_std
    b = Blocker(grid_centers(9))
    fused = FusedGridGPRF(
        X_obs, Y, b.block_centers, b.neighbors(), X_obs, obs_std, cov, 0.01
    )
    d = str(tmp_path / "run")
    os.makedirs(d)
    x_final = do_optimization_fused(
        d, fused, X_obs, maxsec=120, max_iters=60, steps_per_dispatch=15
    )
    # protocol files
    assert os.path.exists(os.path.join(d, "finished"))
    from gprf_tpu.optim.driver import load_log

    steps, times, lls = load_log(d)
    assert len(steps) >= 15
    assert lls[-1] > lls[0]
    # recovered latents closer to truth than the noisy observations
    err0 = np.mean(np.linalg.norm(X_obs - SX, axis=1))
    err1 = np.mean(np.linalg.norm(x_final.reshape(n, 2) - SX, axis=1))
    assert err1 < err0


def test_optimizer_state_resume(tmp_path, rng):
    """Interrupted run resumes from the optimizer-state checkpoint with an
    identical trajectory to an uninterrupted run."""
    import jax.numpy as jnp

    from gprf_tpu.optim.device_lbfgs import (
        load_optimizer_state,
        make_scan_lbfgs_runner,
        save_optimizer_state,
    )

    A = jnp.asarray(np.diag([1.0, 5.0, 25.0]), dtype=jnp.float64)
    b = jnp.asarray([1.0, -1.0, 2.0], dtype=jnp.float64)

    def loss(x):
        return 0.5 * x @ (A @ x) - b @ x

    init_fn, run_fn = make_scan_lbfgs_runner(loss, num_steps=10)
    c = init_fn(jnp.zeros(3, dtype=jnp.float64))
    c1, _ = run_fn(c)
    save_optimizer_state(str(tmp_path), c1, 10)
    c_loaded, it = load_optimizer_state(str(tmp_path))
    assert it == 10
    c2_direct, _ = run_fn(c1)
    c2_resumed, _ = run_fn(c_loaded)
    np.testing.assert_allclose(
        np.asarray(c2_direct["x"]), np.asarray(c2_resumed["x"]), rtol=1e-14
    )


def test_fused_driver_capacity_growth(tmp_path, rng):
    """If optimization drives points across block boundaries past capacity,
    the driver grows m and continues rather than silently dropping points."""
    import os

    from gprf_tpu.kernels.gpcov import GPCov
    from gprf_tpu.model.fused import FusedGridGPRF
    from gprf_tpu.optim.device_lbfgs import do_optimization_fused
    from gprf_tpu.partition.grid import Blocker, grid_centers

    n = 80
    SX = rng.uniform(size=(n, 2))
    cov = GPCov.create([1.0], [0.15, 0.15])
    Y = rng.normal(size=(n, 4))
    obs_std = 0.02
    # X_obs (the prior mean) squashed into a corner so the optimizer pulls
    # points across block boundaries and overflows the initial capacity
    X0 = SX
    X_target = SX * 0.2
    b = Blocker(grid_centers(4))
    fused = FusedGridGPRF(X0, Y, b.block_centers, b.neighbors(), X_target, obs_std, cov, 0.01)
    m0 = fused.m
    d = str(tmp_path / "grow")
    os.makedirs(d)
    do_optimization_fused(d, fused, X0, maxsec=60, max_iters=45, steps_per_dispatch=15)
    assert fused.m > m0  # capacity grew
    assert os.path.exists(os.path.join(d, "finished"))


def test_multistart_matches_single_runs(rng, tmp_path):
    """Replica trajectories of the vmapped multi-start runner must match
    running each start alone (up to reduction reassociation under vmap —
    dots become batched matmuls), and per-replica state stays independent."""
    import jax.numpy as jnp
    from gprf_tpu.optim.device_lbfgs import (
        make_multistart_runner,
        make_scan_lbfgs_runner,
    )

    n = 12

    def loss(x):
        # quartic bowl with two local minima along the first coordinate
        return jnp.sum((x - 1.0) ** 2) + 0.5 * jnp.sum(x**4)

    init_b, run_b = make_multistart_runner(loss, num_steps=8)
    init_s, run_s = make_scan_lbfgs_runner(loss, num_steps=8)

    x0s = jnp.asarray(rng.normal(size=(3, n)))
    carry_b = init_b(x0s)
    carry_b, (vals_b, _, _) = run_b(carry_b)
    for r in range(3):
        carry = init_s(x0s[r])
        carry, (vals, _, _) = run_s(carry)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(vals_b)[r], rtol=1e-12, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(carry["x"]), np.asarray(carry_b["x"])[r],
            rtol=1e-10, atol=1e-12,
        )


def test_multistart_driver_selects_best(rng, tmp_path):
    """End-to-end multi-start over a real fused GPRF loss: the driver logs
    the per-replica matrix and returns the replica with the lowest final
    nll; the winner must be at least as good as every replica."""
    from gprf_tpu.kernels.gpcov import GPCov
    from gprf_tpu.model.fused import FusedGridGPRF
    from gprf_tpu.optim.device_lbfgs import do_optimization_multistart
    from gprf_tpu.partition.grid import Blocker, grid_centers

    n = 60
    SX = rng.uniform(size=(n, 2))
    X_obs = SX + rng.standard_normal(SX.shape) * 0.05
    Y = rng.standard_normal((n, 4))
    b = Blocker(grid_centers(4))
    cov = GPCov.create([1.0], [0.3, 0.3])
    fused = FusedGridGPRF(
        X_obs, Y, b.block_centers, b.neighbors(), X_obs, 0.05, cov, 0.01
    )
    X0s = np.stack(
        [X_obs + rng.standard_normal(X_obs.shape) * 0.02 * r for r in range(3)]
    )
    d = str(tmp_path)
    best_x, best_v, final_v = do_optimization_multistart(
        d, fused, X0s, max_iters=12, steps_per_dispatch=6
    )
    assert np.isfinite(best_v) and best_v == final_v.min()
    assert best_x.shape == (n * 2,)
    import os

    assert os.path.exists(os.path.join(d, "multistart.txt"))
    with open(os.path.join(d, "multistart.txt")) as f:
        row = f.readline().split()
    assert len(row) == 2 + 3  # step, time, one column per replica


def test_multistart_theta_driver(rng, tmp_path):
    """Theta-packed multi-start (xcov): winner selection + the covs.txt /
    multistart.txt protocol."""
    import os

    from gprf_tpu.kernels.gpcov import GPCov
    from gprf_tpu.model.fused import FusedSyntheticGPRF
    from gprf_tpu.optim.device_lbfgs import do_optimization_multistart_theta
    from gprf_tpu.partition.grid import Blocker, grid_centers

    n = 60
    SX = rng.uniform(size=(n, 2))
    X_obs = SX + rng.standard_normal(SX.shape) * 0.05
    Y = rng.standard_normal((n, 4))
    b = Blocker(grid_centers(4))
    cov = GPCov.create([1.0], [0.3, 0.3])
    fused = FusedSyntheticGPRF(
        X_obs, Y, b.neighbors(), X_obs, 0.05, cov, 0.01,
        task="xcov", C0=np.array([[0.3]]), centers=np.asarray(b.block_centers),
    )
    theta0 = fused.theta0()
    theta0s = np.stack(
        [theta0, theta0 + rng.standard_normal(theta0.shape) * 0.01]
    )
    d = str(tmp_path)
    best_t, best_v, final_v = do_optimization_multistart_theta(
        d, fused, theta0s, max_iters=12, steps_per_dispatch=6
    )
    assert np.isfinite(best_v) and best_v == final_v.min()
    assert os.path.exists(os.path.join(d, "multistart.txt"))
    assert os.path.exists(os.path.join(d, "covs.txt"))
    X, FC = fused.unpack_host(best_t)
    assert X.shape == (n, 2) and FC.shape == (1, 4)
    # the hyperparameter trajectory stays dense: one covs.txt row per
    # dispatch (12 iters / 6 per dispatch = 2 rows), matching the
    # single-start theta driver — not throttled to the checkpoint cadence
    with open(os.path.join(d, "covs.txt")) as f:
        rows = [line for line in f if line.strip()]
    assert len(rows) == 2
    # each row decodes from the theta tail: step index then the FC matrix
    assert rows[0].split()[0] == "5" and rows[1].split()[0] == "11"


def test_multistart_sanitize_restarts_diverged_replica(rng):
    """A replica whose proposal goes non-finite is restarted from its last
    evaluated point with cleared optimizer memory; healthy replicas are
    untouched; all-dead raises."""
    import jax.numpy as jnp
    import pytest
    from gprf_tpu.optim.device_lbfgs import (
        _sanitize_replicas,
        make_multistart_runner,
    )

    def loss(x):
        return jnp.sum((x - 1.0) ** 2)

    init_b, run_b = make_multistart_runner(loss, num_steps=3)
    x0s = jnp.asarray(rng.normal(size=(2, 6)))
    carry, _ = run_b(init_b(x0s))

    # poison replica 1's proposal
    bad = {k: np.array(v) for k, v in carry.items()}
    bad["x"][1] = np.nan
    bad["v"][1] = np.nan
    poisoned = {k: jnp.asarray(v) for k, v in bad.items()}
    fixed, n = _sanitize_replicas(poisoned)
    assert n == 1
    f = {k: np.asarray(v) for k, v in fixed.items()}
    np.testing.assert_array_equal(f["x"][0], bad["x"][0])  # healthy untouched
    np.testing.assert_array_equal(f["x"][1], bad["x_prev"][1])  # restarted
    assert np.isinf(f["v"][1]) and bool(f["first"][1]) and not f["valid"][1].any()
    # the restarted state must run and recover a finite value
    carry2, (vals, _, _) = run_b(fixed)
    assert np.all(np.isfinite(np.asarray(carry2["v"])))

    # every replica dead -> raises
    bad["x"][0] = np.nan
    bad["v"][0] = np.nan
    bad["x_prev"][:] = np.nan
    with pytest.raises(FloatingPointError):
        _sanitize_replicas({k: jnp.asarray(v) for k, v in bad.items()})


def test_scan_runner_aux_fn_surfaces_flag(rng):
    """aux_fn output rides the dispatch outputs (used for in-program
    capacity-overflow detection without a host round trip)."""
    import jax.numpy as jnp
    from gprf_tpu.optim.device_lbfgs import (
        make_multistart_runner,
        make_scan_lbfgs_runner,
    )

    def loss(x):
        return jnp.sum((x - 1.0) ** 2)

    def aux(x):
        return jnp.max(x) > 0.9  # trips as the optimizer approaches 1

    init_fn, run_fn = make_scan_lbfgs_runner(loss, num_steps=30, aux_fn=aux)
    carry = init_fn(jnp.zeros(4))
    carry, outs = run_fn(carry)
    assert len(outs) == 4
    assert bool(np.asarray(outs[3]))

    # and through the vmapped multistart wrapper: per-replica flags
    init_b, run_b = make_multistart_runner(loss, num_steps=30, aux_fn=aux)
    carry_b = init_b(jnp.stack([jnp.zeros(4), jnp.full(4, -50.0)]))
    carry_b, outs_b = run_b(carry_b)
    flags = np.asarray(outs_b[3])
    assert flags.shape == (2,) and flags[0]


def test_theta_driver_covs_protocol(rng, tmp_path):
    """The single-start theta driver writes one covs.txt row per dispatch
    (decoded from only the ncov-sized theta tail off-cadence), and writes
    NO covs.txt at all for a task=x evaluator."""
    from gprf_tpu.model.fused import FusedSyntheticGPRF
    from gprf_tpu.optim.device_lbfgs import (
        _fc_from_tail,
        do_optimization_fused_theta,
    )

    n = 60
    SX = rng.uniform(size=(n, 2))
    X_obs = SX + rng.standard_normal(SX.shape) * 0.05
    Y = rng.standard_normal((n, 4))
    b = Blocker(grid_centers(4))
    cov = GPCov.create([1.0], [0.3, 0.3])

    fused = FusedSyntheticGPRF(
        X_obs, Y, b.neighbors(), X_obs, 0.05, cov, 0.01,
        task="xcov", C0=np.array([[0.3]]), centers=np.asarray(b.block_centers),
    )
    assert fused.ncov == 1
    theta0 = fused.theta0()
    # the tail-only decode matches the full unpack
    np.testing.assert_allclose(
        _fc_from_tail(fused, theta0[-1:], theta0.size),
        fused.unpack_host(theta0)[1],
    )
    d = str(tmp_path / "xcov")
    os.makedirs(d)
    do_optimization_fused_theta(d, fused, theta0, max_iters=12,
                                steps_per_dispatch=6)
    with open(os.path.join(d, "covs.txt")) as f:
        rows = [line for line in f if line.strip()]
    assert [r.split()[0] for r in rows] == ["5", "11"]

    fused_x = FusedSyntheticGPRF(
        X_obs, Y, b.neighbors(), X_obs, 0.05, cov, 0.01,
        task="x", C0=None, centers=np.asarray(b.block_centers),
    )
    assert fused_x.ncov == 0
    d2 = str(tmp_path / "x")
    os.makedirs(d2)
    do_optimization_fused_theta(d2, fused_x, X_obs.ravel(), max_iters=6,
                                steps_per_dispatch=6)
    assert not os.path.exists(os.path.join(d2, "covs.txt"))


def test_multistart_capacity_growth(tmp_path, rng):
    """Capacity overflow mid-multistart grows m for ALL replicas, keeps the
    run alive, and still returns the best replica (the in-program overflow
    flag + curvature-preserving carry merge path)."""
    from gprf_tpu.optim.device_lbfgs import do_optimization_multistart

    n = 80
    SX = rng.uniform(size=(n, 2))
    cov = GPCov.create([1.0], [0.15, 0.15])
    Y = rng.normal(size=(n, 4))
    obs_std = 0.02
    # prior mean squashed into a corner (as in the single-start growth
    # test): the optimizer pulls points across block boundaries and
    # overflows the initial per-block capacity
    X0 = SX
    X_target = SX * 0.2
    b = Blocker(grid_centers(4))
    fused = FusedGridGPRF(
        X0, Y, b.block_centers, b.neighbors(), X_target, obs_std, cov, 0.01
    )
    m0 = fused.m
    X0s = np.stack([X0, X0 + rng.standard_normal(X0.shape) * 0.01])
    d = str(tmp_path / "msgrow")
    os.makedirs(d)
    best_x, best_v, final_v = do_optimization_multistart(
        d, fused, X0s, max_iters=45, steps_per_dispatch=15
    )
    assert fused.m > m0
    assert np.isfinite(best_v) and best_v == final_v.min()
    assert os.path.exists(os.path.join(d, "finished"))


def test_truncate_log_rows(tmp_path):
    """On resume, log rows at/after the resumed iteration (and trailer
    lines) are dropped so the re-executed dispatches append a monotone
    trajectory (ADVICE r3: state snapshots ride a wall-clock cadence while
    log rows are per-dispatch, so the snapshot can lag the log)."""
    from gprf_tpu.optim.device_lbfgs import _truncate_log_rows

    p = tmp_path / "log.txt"
    p.write_text(
        "0 0.10 -5.00\n1 0.20 -4.00\n2 0.30 -3.50\n3 0.40 -3.40\n"
        "optimization finished after 1s\n"
    )
    _truncate_log_rows(str(p), 2)
    assert p.read_text() == "0 0.10 -5.00\n1 0.20 -4.00\n"
    # missing file is a no-op
    _truncate_log_rows(str(tmp_path / "covs.txt"), 2)


def test_aux_flag_masked_on_nonfinite_point(rng):
    """A non-finite proposal must NOT raise the capacity-overflow flag
    (NaN coords route all points into one block -> spurious permanent
    capacity growth + cold recompile for a replica the driver is about to
    sanitize).  The aux flag is finiteness-masked inside the runner."""
    import jax.numpy as jnp
    from gprf_tpu.optim.device_lbfgs import make_scan_lbfgs_runner

    def loss(x):
        # finite value but NaN gradient at x=0 (grad of sqrt(|x|) is
        # inf * sign(0) = NaN), so the first accepted step proposes NaN x
        return jnp.sum(jnp.sqrt(jnp.abs(x)))

    def aux(x):
        # an "overflow" check that, like the real block-count check,
        # trips on NaN-routed garbage (NaN comparisons are false)
        return ~(jnp.max(jnp.abs(x)) < 10.0)

    init_fn, run_fn = make_scan_lbfgs_runner(loss, num_steps=3, aux_fn=aux)
    carry = init_fn(jnp.zeros(4))
    carry, outs = run_fn(carry)
    x = np.asarray(carry["x"])
    assert not np.isfinite(x).all()  # the proposal really went NaN
    assert bool(np.asarray(aux(carry["x"])))  # unmasked check would trip
    assert not bool(np.asarray(outs[3]))  # ...but the surfaced flag is down
