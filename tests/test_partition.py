"""Partitioner tests: grid blocker, RPC replay, PD-tree replay, layout,
morton order."""

import numpy as np

from gprf_tpu.partition.grid import Blocker, grid_centers, pair_distances
from gprf_tpu.partition.layout import BlockLayout
from gprf_tpu.partition.morton import morton_codes, sort_morton
from gprf_tpu.partition.pdtree import PDTree, pdtree_cluster
from gprf_tpu.partition.rpc import cluster_rpc


def _is_partition(blocks, n):
    got = np.sort(np.concatenate([b for b in blocks if len(b)]))
    return np.array_equal(got, np.arange(n))


def test_grid_centers_count():
    c = grid_centers(9)
    assert len(c) == 9
    c = grid_centers(100)
    assert len(c) == 100


def test_blocker_partition(rng):
    X = rng.uniform(size=(50, 2))
    b = Blocker(grid_centers(4))
    blocks = b.block_clusters(X)
    assert _is_partition(blocks, 50)
    # every point nearer to its own center than any other
    for i, ix in enumerate(blocks):
        for p in ix:
            d = np.linalg.norm(X[p] - b.block_centers, axis=1)
            assert np.argmin(d) == i


def test_blocker_neighbors_grid():
    b = Blocker(grid_centers(9))  # 3x3 grid
    edges = b.neighbors(diag_connections=True)
    # 3x3 grid with diagonal connections: 12 axis + 8 diagonal = 20
    assert len(edges) == 20
    edges_ax = b.neighbors(diag_connections=False)
    assert len(edges_ax) == 12
    assert all(i > j for i, j in edges)


def test_rpc_partition_and_replay(rng):
    np.random.seed(3)
    X = np.random.rand(200, 2)
    idxs = np.arange(200)
    blocks, splits = cluster_rpc(X, idxs, target_size=30)
    assert _is_partition(blocks, 200)
    assert all(len(b) < 30 for b in blocks)
    # replay on identical X reproduces the same partition
    blocks2, _ = cluster_rpc(X, idxs, target_size=30, fixed_split=splits)
    for b1, b2 in zip(blocks, blocks2):
        np.testing.assert_array_equal(b1, b2)
    # replay on perturbed X is still a valid partition with same #blocks
    X2 = X + np.random.randn(*X.shape) * 0.001
    blocks3, _ = cluster_rpc(X2, idxs, target_size=30, fixed_split=splits)
    assert _is_partition(blocks3, 200)
    assert len(blocks3) == len(blocks)


def test_pdtree_partition_and_replay(rng):
    X = rng.normal(size=(300, 2))
    t = PDTree(X, minsize=40)
    blocks = t.leaf_idx()
    assert _is_partition(blocks, 300)
    assert all(len(b) < 40 for b in blocks)
    blocks2 = t.recluster(X)
    for b1, b2 in zip(blocks, blocks2):
        np.testing.assert_array_equal(np.sort(b1), np.sort(b2))


def test_pdtree_cluster_lon_wrap(rng):
    # points straddling the date line should cluster together after wrap
    lons = np.concatenate([rng.uniform(175, 180, 50), rng.uniform(-180, -175, 50)])
    lats = rng.uniform(-5, 5, 100)
    depths = rng.uniform(0, 100, 100)
    X = np.column_stack([lons, lats, depths])
    blocks, reblock = pdtree_cluster(X, blocksize=200)
    assert len(blocks) == 1  # all 100 points within one wrapped region
    blocks2 = reblock(X.copy())
    assert _is_partition(blocks2, 100)
    # reblock must not mutate its input (reference restores lons in place)
    X2 = X.copy()
    reblock(X2)
    np.testing.assert_array_equal(X2, X)


def test_layout_roundtrip(rng):
    X = rng.uniform(size=(37, 2))
    b = Blocker(grid_centers(4))
    blocks = b.block_clusters(X)
    layout = BlockLayout.from_blocks(blocks, n=37, edges=b.neighbors())
    back = layout.block_idxs()
    for b1, b2 in zip(blocks, back):
        np.testing.assert_array_equal(b1, b2)
    assert layout.mask.sum() == 37
    # neighbor counts consistent with edges
    for i, j in layout.edges:
        assert layout.neighbor_count[i] >= 1
        assert layout.neighbor_count[j] >= 1
    assert layout.neighbor_count.sum() == 2 * layout.n_edges
    # pair gathers line up
    if layout.n_edges:
        e0 = layout.edges[0]
        m = layout.block_pad
        np.testing.assert_array_equal(layout.pair_assignment[0, :m], layout.assignment[e0[0]])
        np.testing.assert_array_equal(layout.pair_assignment[0, m:], layout.assignment[e0[1]])


def test_layout_edge_padding(rng):
    X = rng.uniform(size=(20, 2))
    b = Blocker(grid_centers(4))
    blocks = b.block_clusters(X)
    layout = BlockLayout.from_blocks(blocks, n=20, edges=[(1, 0), (2, 1)])
    arrays = layout.device_arrays(pad_edges_to=8)
    assert arrays["pair_assignment"].shape[0] == 8
    assert float(arrays["pair_weights"].sum()) == 2.0


def test_morton_locality():
    # on a grid, morton-adjacent points are spatially nearby
    g = np.stack(np.meshgrid(np.arange(16), np.arange(16)), -1).reshape(-1, 2).astype(float)
    codes = morton_codes(g)
    assert len(np.unique(codes)) == 256
    Xs, perm = sort_morton(g)
    steps = np.linalg.norm(np.diff(Xs, axis=0), axis=1)
    assert np.median(steps) <= 2.0


def test_sort_morton_parallel_arrays(rng):
    X = rng.uniform(size=(40, 3))
    y = rng.normal(size=(40, 2))
    Xs, ys, perm = sort_morton(X, y)
    np.testing.assert_array_equal(Xs, X[perm])
    np.testing.assert_array_equal(ys, y[perm])


def test_pair_distances(rng):
    A = rng.normal(size=(5, 2))
    B = rng.normal(size=(3, 2))
    D = pair_distances(A, B)
    for i in range(5):
        for j in range(3):
            assert np.isclose(D[i, j], np.linalg.norm(A[i] - B[j]), atol=1e-12)
