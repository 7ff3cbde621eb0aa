"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.model.gprf import GPRF
from gprf_tpu.model.objective import GPRFParams
from gprf_tpu.parallel.sharding import (
    make_mesh,
    shard_layout_arrays,
    sharded_gprf_value_and_grad,
)
from gprf_tpu.partition.grid import Blocker, grid_centers


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh()


def _problem(rng, n=60, nblocks=9):
    X = rng.uniform(size=(n, 2))
    Y = rng.normal(size=(n, 3))
    b = Blocker(grid_centers(nblocks))
    blocks = b.block_clusters(X)
    cov = GPCov.create([1.0], [0.25, 0.25])
    g = GPRF(X, Y, None, cov, 0.01, block_idxs=blocks, neighbors=b.neighbors())
    return g


def test_sharded_matches_single_device(rng, mesh):
    g = _problem(rng)
    ll_ref, gX_ref, gC_ref = g.llgrad(grad_X=True, grad_cov=True)
    arrays = shard_layout_arrays(g.layout, mesh)
    # batches padded to a multiple of the mesh size
    assert arrays["assignment"].shape[0] % mesh.devices.size == 0
    params = GPRFParams(
        X=jnp.asarray(g.X),
        wfn_params=jnp.asarray(g.cov.wfn_params),
        dfn_params=jnp.asarray(g.cov.dfn_params),
        noise_var=jnp.asarray(g.noise_var),
    )
    ll, gX, gC = sharded_gprf_value_and_grad(
        params, jnp.asarray(g.Y), arrays, mesh, grad_X=True, grad_cov=True
    )
    assert np.isclose(float(ll), ll_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gX), gX_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(gC), gC_ref, rtol=1e-8)


def test_sharded_inputs_actually_sharded(rng, mesh):
    g = _problem(rng)
    arrays = shard_layout_arrays(g.layout, mesh)
    shard_sizes = {
        len(s.data) for s in arrays["assignment"].addressable_shards
    }
    assert len(shard_sizes) == 1  # even split
    assert arrays["assignment"].sharding.is_fully_replicated is False


def test_sharded_training_step(rng, mesh):
    """One full optimizer step (the dryrun_multichip path) on the mesh."""
    import optax

    g = _problem(rng)
    arrays = shard_layout_arrays(g.layout, mesh)
    params = GPRFParams(
        X=jnp.asarray(g.X),
        wfn_params=jnp.asarray(g.cov.wfn_params),
        dfn_params=jnp.asarray(g.cov.dfn_params),
        noise_var=jnp.asarray(g.noise_var),
    )
    opt = optax.adam(1e-3)

    from gprf_tpu.model.objective import gprf_ll

    def loss(X):
        p = params._replace(X=X)
        return -gprf_ll(
            p,
            jnp.asarray(g.Y),
            arrays["assignment"],
            arrays["mask"],
            arrays["pair_assignment"],
            arrays["pair_mask"],
            arrays["unary_weights"],
            arrays["pair_weights"],
        )

    @jax.jit
    def step(X, opt_state):
        l, grad = jax.value_and_grad(loss)(X)
        updates, opt_state = opt.update(grad, opt_state)
        return optax.apply_updates(X, updates), opt_state, l

    X = params.X
    opt_state = opt.init(X)
    X1, opt_state, l0 = step(X, opt_state)
    X2, opt_state, l1 = step(X1, opt_state)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert not np.allclose(np.asarray(X2), np.asarray(X))
