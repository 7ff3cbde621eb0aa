"""Driver tests: file protocol, optimization progress, analysis output."""

import os

import numpy as np
import pytest

from gprf_tpu.analysis.results import (
    RESULT_COLS,
    analyze_run,
    load_final_results,
    load_results,
)
from gprf_tpu.cli.gprfopt import build_run_name, do_run
from gprf_tpu.data.sampled import SampledData
from gprf_tpu.optim.driver import do_optimization, load_log
from gprf_tpu.partition.grid import grid_centers


@pytest.fixture
def sdata(tmp_path, monkeypatch):
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    sd = SampledData(n=80, ntrain=60, lscale=0.3, obs_std=0.03, yd=5, seed=1, noise_var=0.01)
    sd.set_centers(grid_centers(4))
    return sd


def test_do_optimization_task_x(tmp_path, sdata):
    d = str(tmp_path / "run")
    os.makedirs(d)
    gprf = sdata.build_gprf(local_dist=0.001)
    do_optimization(d, gprf, X0=sdata.X_obs, C0=None, sdata=sdata, maxsec=120)
    # file protocol
    assert os.path.exists(os.path.join(d, "finished"))
    steps, times, lls = load_log(d)
    assert len(steps) >= 3
    assert os.path.exists(os.path.join(d, "step_%05d_X.npy" % steps[-1]))
    # objective improved
    assert lls[-1] > lls[0]
    # latent error improved vs observed init
    Xfinal = np.load(os.path.join(d, "step_%05d_X.npy" % steps[-1]))
    assert sdata.mean_distance(Xfinal.flatten()) < sdata.mean_distance(sdata.X_obs.flatten())


def test_do_optimization_task_cov(tmp_path, sdata):
    d = str(tmp_path / "runc")
    os.makedirs(d)
    gprf = sdata.build_gprf(local_dist=0.001)
    gprf.update_X(sdata.SX)
    C0 = np.array((0.05, 1.0, 0.1, 0.1)).reshape(1, -1)
    do_optimization(d, gprf, X0=None, C0=C0, sdata=sdata, maxsec=120)
    steps, times, lls = load_log(d)
    assert lls[-1] > lls[0]
    FC = np.load(os.path.join(d, "step_%05d_cov.npy" % steps[-1]))
    # learned lengthscale should move toward the true 0.3 from 0.1
    assert abs(FC[0, 2] - 0.3) < abs(0.1 - 0.3)


def test_analyze_run_writes_results(tmp_path, sdata):
    d = str(tmp_path / "runa")
    os.makedirs(d)
    gprf = sdata.build_gprf(local_dist=0.001)
    do_optimization(d, gprf, X0=sdata.X_obs, C0=None, sdata=sdata, maxsec=30)
    analyze_run(d, sdata, local_dist=0.001, predict=True)
    R = load_results(d)
    assert R.shape[1] == len(RESULT_COLS)
    final, true_row = load_final_results(d)
    assert "mad" in final
    # the oracle (trueX) row has mad == 0
    assert true_row["mad"] == 0.0
    # predictive scores present and sane: SMSE in (0, 1) for a real model
    assert 0.0 < final["smse"] < 1.0


def test_build_run_name_stable():
    name = build_run_name(
        dict(ntrain=1000, ntest=500, nblocks=20, lscale=0.06, obs_std=0.02)
    )
    assert name.startswith("1000_1500_20_0.060000_0.020000_")
    assert "l-bfgs-b_x" in name


def test_build_run_name_default_obs_std():
    # obs_std defaults to None on the CLI; the run name must resolve it to
    # the sampler's lscale/10 default instead of crashing on %f-of-None
    name = build_run_name(
        dict(ntrain=1000, ntest=500, nblocks=20, lscale=0.06, obs_std=None)
    )
    assert name.startswith("1000_1500_20_0.060000_0.006000_")


def test_do_run_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    d = str(tmp_path / "run_e2e")
    os.makedirs(d)
    do_run(
        d,
        lscale=0.3,
        n=70,
        ntrain=50,
        nblocks=4,
        yd=4,
        seed=1,
        local_dist=0.01,
        maxsec=30,
        task="x",
        obs_std=0.03,
    )
    assert os.path.exists(os.path.join(d, "results.txt"))
    assert os.path.exists(os.path.join(d, "finished"))


def test_maxsec_abort(tmp_path, sdata):
    d = str(tmp_path / "runt")
    os.makedirs(d)
    gprf = sdata.build_gprf(local_dist=0.001)
    do_optimization(d, gprf, X0=sdata.X_obs, C0=None, sdata=sdata, maxsec=0)
    # aborts immediately but still writes the protocol files
    assert os.path.exists(os.path.join(d, "finished"))


def test_do_run_device_engine(tmp_path, monkeypatch):
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    d = str(tmp_path / "run_dev")
    os.makedirs(d)
    do_run(
        d,
        lscale=0.3,
        n=70,
        ntrain=50,
        nblocks=4,
        yd=4,
        seed=1,
        local_dist=0.01,
        maxsec=60,
        task="x",
        obs_std=0.03,
        engine="device",
    )
    assert os.path.exists(os.path.join(d, "results.txt"))
    assert os.path.exists(os.path.join(d, "optimizer_state.npz"))


def test_do_run_task_xcov(tmp_path, monkeypatch):
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    d = str(tmp_path / "run_xcov")
    os.makedirs(d)
    do_run(
        d, lscale=0.3, n=60, ntrain=45, nblocks=4, yd=4, seed=1,
        local_dist=0.01, maxsec=25, task="xcov", obs_std=0.03,
    )
    import numpy as _np

    steps = sorted(
        f for f in os.listdir(d) if f.startswith("step") and f.endswith("_cov.npy")
    )
    assert steps  # cov checkpoints written
    FC = _np.load(os.path.join(d, steps[-1]))
    assert FC.shape == (1, 4)


def test_do_run_task_cov_with_init_seed(tmp_path, monkeypatch):
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    d = str(tmp_path / "run_cov")
    os.makedirs(d)
    do_run(
        d, lscale=0.3, n=60, ntrain=45, nblocks=4, yd=4, seed=1,
        local_dist=0.01, maxsec=25, task="cov", obs_std=0.03, init_seed=3,
    )
    assert os.path.exists(os.path.join(d, "finished"))


def test_do_run_init_x_continuation(tmp_path, monkeypatch):
    """--init_x warm-starts task=x from a saved checkpoint (continuation
    workflow; used to escape the Local-900 basin trap by initializing a
    local-GP run from a GPRF solution — docs/RESULTS.md)."""
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    d0 = str(tmp_path / "run_first")
    os.makedirs(d0)
    do_run(
        d0, lscale=0.3, n=70, ntrain=50, nblocks=4, yd=4, seed=1,
        local_dist=0.01, maxsec=30, task="x", obs_std=0.03, engine="device",
    )
    import numpy as _np

    steps = sorted(
        f for f in os.listdir(d0) if f.startswith("step") and f.endswith("_X.npy")
    )
    assert steps
    ckpt = os.path.join(d0, steps[-1])
    X_ck = _np.load(ckpt)

    d1 = str(tmp_path / "run_cont")
    os.makedirs(d1)
    do_run(
        d1, lscale=0.3, n=70, ntrain=50, nblocks=4, yd=4, seed=1,
        local_dist=1.0, maxsec=30, task="x", obs_std=0.03, engine="device",
        init_x=ckpt,
    )
    assert os.path.exists(os.path.join(d1, "results.txt"))
    # the continuation really started from the checkpoint: its first saved
    # X must be closer to the warm start than the observed-X cold start is
    first = _np.load(os.path.join(
        d1,
        sorted(f for f in os.listdir(d1)
               if f.startswith("step") and f.endswith("_X.npy"))[0],
    ))
    from gprf_tpu.data.sampled import sample_data
    from gprf_tpu.partition.grid import grid_centers

    data = sample_data(n=70, ntrain=50, lscale=0.3, obs_std=0.03, yd=4,
                       seed=1, centers=grid_centers(4), noise_var=0.01,
                       rpc_blocksize=-1)
    assert _np.abs(first - X_ck).mean() < _np.abs(first - data.X_obs).mean()

    # a wrong-shape init is rejected loudly
    bad = str(tmp_path / "bad_init.npy")
    _np.save(bad, X_ck[:-1])
    d2 = str(tmp_path / "run_bad")
    os.makedirs(d2)
    with pytest.raises(ValueError, match="init_x shape"):
        do_run(
            d2, lscale=0.3, n=70, ntrain=50, nblocks=4, yd=4, seed=1,
            local_dist=1.0, maxsec=30, task="x", obs_std=0.03,
            engine="device", init_x=bad,
        )


def test_exp_dir_init_x_suffix(tmp_path, monkeypatch):
    """Continuation runs must not clobber the fresh run's cache dir."""
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    import argparse

    from gprf_tpu.cli.gprfopt import build_parser, exp_dir

    argv = ["--ntrain=50", "--ntest=20", "--nblocks=4", "--lscale=0.3",
            "--obs_std=0.03", "--task=x"]
    args_plain = build_parser().parse_args(argv)
    args_cont = build_parser().parse_args(argv + ["--init_x=/tmp/some_X.npy"])
    d_plain = exp_dir(args_plain)
    d_cont = exp_dir(args_cont)
    assert d_plain != d_cont
    assert d_cont.startswith(d_plain + "_i")


def test_do_run_device_engine_with_f64_refinement(tmp_path, monkeypatch):
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    d = str(tmp_path / "run_refine")
    os.makedirs(d)
    do_run(
        d, lscale=0.3, n=70, ntrain=50, nblocks=4, yd=4, seed=1,
        local_dist=0.01, maxsec=30, task="x", obs_std=0.03,
        engine="device", refine_iters=10,
    )
    from gprf_tpu.optim.driver import load_log

    steps, times, lls = load_log(d)
    assert len(steps) >= 10
    # refinement appended rows and did not regress the objective
    assert lls[-1] >= lls[0]
    assert os.path.exists(os.path.join(d, "results.txt"))


def test_do_run_device_engine_xcov_with_f64_refinement(tmp_path, monkeypatch):
    """--refine_iters on a theta-packed task (VERDICT round 2 #8): the f64
    tail must continue the run, write cov checkpoints through unpack_host,
    and not regress the objective."""
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    d = str(tmp_path / "run_refine_xcov")
    os.makedirs(d)
    do_run(
        d, lscale=0.3, n=60, ntrain=45, nblocks=4, yd=4, seed=1,
        local_dist=0.01, maxsec=30, task="xcov", obs_std=0.03,
        engine="device", refine_iters=10,
    )
    from gprf_tpu.optim.driver import load_log

    steps, times, lls = load_log(d)
    assert len(steps) >= 10
    assert lls[-1] >= lls[0]
    import numpy as _np

    covs = sorted(
        f for f in os.listdir(d) if f.startswith("step") and f.endswith("_cov.npy")
    )
    assert covs
    FC = _np.load(os.path.join(d, covs[-1]))
    assert FC.shape == (1, 4) and _np.all(_np.isfinite(FC))


def test_refine_f64_width_cap_env(tmp_path, monkeypatch):
    """GPRF_REFINE_MAX_M gates the f64 tail on block width: below the cap
    the phase is skipped (x returned unchanged, no refinement log rows);
    the default 512 admits narrow blocks.  The knob exists so wide-m runs
    (m>512, minutes per f64 eval on the host) can opt in deliberately."""
    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    monkeypatch.setenv("GPRF_REFINE_MAX_M", "2")
    d = str(tmp_path / "run_refine_capped")
    os.makedirs(d)
    do_run(
        d, lscale=0.3, n=70, ntrain=50, nblocks=4, yd=4, seed=1,
        local_dist=0.01, maxsec=30, task="x", obs_std=0.03,
        engine="device", refine_iters=10,
    )
    with open(os.path.join(d, "log.txt")) as f:
        log = f.read()
    # the f32 loop ran but the capped refinement did not
    assert "optimization finished" in log
    assert "f64 refinement finished" not in log


def test_init_x_xcov_and_cov_semantics(tmp_path, monkeypatch):
    """--init_x warm-starts the X segment of task=xcov (applied before task
    dispatch, like the seismic CLI) and is rejected for task=cov where X is
    not optimized."""
    import numpy as _np

    monkeypatch.setenv("GPRF_EXPERIMENTS", str(tmp_path / "exp"))
    # a deterministic fake checkpoint: the observed X shifted by a constant
    from gprf_tpu.data.sampled import sample_data
    from gprf_tpu.partition.grid import grid_centers

    data = sample_data(n=60, ntrain=45, lscale=0.3, obs_std=0.03, yd=4,
                       seed=1, centers=grid_centers(4), noise_var=0.01,
                       rpc_blocksize=-1)
    ckpt = str(tmp_path / "warm_X.npy")
    _np.save(ckpt, data.X_obs + 0.015)

    # capture the theta handed to the optimizer: the X segment must be the
    # warm checkpoint, not the observed locations (the bug this guards:
    # init_x consulted only in the task=="x" branch)
    import gprf_tpu.optim.device_lbfgs as dl

    seen = {}
    real = dl.do_optimization_fused_theta

    def spy(d_, fused_, theta0_, **kw):
        seen["theta0"] = _np.asarray(theta0_)
        return real(d_, fused_, theta0_, **kw)

    monkeypatch.setattr(dl, "do_optimization_fused_theta", spy)
    d = str(tmp_path / "run_xcov_cont")
    os.makedirs(d)
    do_run(
        d, lscale=0.3, n=60, ntrain=45, nblocks=4, yd=4, seed=1,
        local_dist=0.01, maxsec=25, task="xcov", obs_std=0.03,
        engine="device", init_x=ckpt, max_iters=6,
    )
    nflat = data.X_obs.size
    _np.testing.assert_allclose(
        seen["theta0"][:nflat].reshape(data.X_obs.shape), data.X_obs + 0.015
    )

    d2 = str(tmp_path / "run_cov_bad")
    os.makedirs(d2)
    with pytest.raises(ValueError, match="task=cov"):
        do_run(
            d2, lscale=0.3, n=60, ntrain=45, nblocks=4, yd=4, seed=1,
            local_dist=0.01, maxsec=25, task="cov", obs_std=0.03,
            init_x=ckpt,
        )
