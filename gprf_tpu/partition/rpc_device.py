"""Device-side RPC replay: recursive-projection block assignment in JAX.

The RPC partitioner's replay semantics (reference ``block_clustering.py:48-98``,
rebuilt in :mod:`gprf_tpu.partition.rpc`) differ from the PD-tree's: each
inner node stores a fixed projection line (direction, origin) but the split
*threshold is recomputed as the median projection of the node's current
members* on every re-block — that is what keeps block sizes balanced as the
latent X moves.  So a device replay cannot be a pure root-to-leaf threshold
traversal (:mod:`gprf_tpu.partition.pdtree_device`); it must compute one
median per tree node per level.

This module flattens the host split tree into arrays and evaluates the
replay level-by-level: at each level, project every point onto its current
node's line, sort (node, projection) lexicographically, read the per-node
medians out of the sorted order (exact ``np.median`` semantics: the mean of
the two middle order statistics), and route points left/right.  The whole
assignment is O(depth * n log n) sorts — a few fused device ops per level,
keeping the complete synthetic RPC evaluation a single device program.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class FlatRPCTree:
    """Array form of the nested-tuple split tree returned by
    :func:`gprf_tpu.partition.rpc.cluster_rpc`.

    Node arrays (N nodes, node 0 = root):
      direction [N, d], origin [N, d],
      left/right [N] (child node ids; self-loops at leaves),
      leaf_block [N] (block id at leaves, -1 at inner nodes),
      depth: max root-to-leaf length.

    Leaf block numbering follows the host recursion order (left subtree
    first), so device block ids equal the host ``cluster_rpc`` list order.
    """

    def __init__(self, split_tree, d: int):
        nodes = []

        def walk(node, depth):
            my_id = len(nodes)
            nodes.append(None)
            if node == () or node is None:
                nodes[my_id] = ("leaf", depth)
                return my_id, depth
            (nx1, x2), fs1, fs2 = node
            lid, dl = walk(fs1, depth + 1)
            rid, dr = walk(fs2, depth + 1)
            nodes[my_id] = ("inner", np.asarray(nx1), np.asarray(x2), lid, rid)
            return my_id, max(dl, dr)

        _, self.depth = walk(split_tree, 0)
        N = len(nodes)
        self.n_nodes = N
        self.direction = np.zeros((N, d))
        self.origin = np.zeros((N, d))
        self.left = np.arange(N, dtype=np.int32)
        self.right = np.arange(N, dtype=np.int32)
        self.leaf_block = np.full((N,), -1, dtype=np.int32)
        n_blocks = 0
        for i, rec in enumerate(nodes):
            if rec[0] == "leaf":
                self.leaf_block[i] = n_blocks
                n_blocks += 1
            else:
                _, nx1, x2, lid, rid = rec
                self.direction[i] = nx1
                self.origin[i] = x2
                self.left[i] = lid
                self.right[i] = rid
        self.n_blocks = n_blocks

    def device_arrays(self, dtype=jnp.float32):
        return dict(
            direction=jnp.asarray(self.direction, dtype=dtype),
            origin=jnp.asarray(self.origin, dtype=dtype),
            left=jnp.asarray(self.left),
            right=jnp.asarray(self.right),
            leaf_block=jnp.asarray(self.leaf_block),
        )


def assign_blocks_rpc(X, arrays, depth: int, n_nodes: int):
    """Block id per point for X [n, d] by median-replay traversal.

    Mirrors host ``cluster_rpc(X, idxs, ., fixed_split=tree)``: the split
    value at each node is the median projection of the node's current
    members (``np.median``: mean of the two middle order statistics).
    """
    n = X.shape[0]
    cur = jnp.zeros((n,), dtype=jnp.int32)
    left = arrays["left"]
    right = arrays["right"]

    def level(_, cur):
        vec = arrays["direction"][cur]  # [n, d]
        org = arrays["origin"][cur]
        alpha = jnp.sum((X - org) * vec, axis=1)  # [n]
        # per-node median: sort by (node, alpha), index the middle entries
        order = jnp.lexsort((alpha, cur))
        sa = alpha[order]
        counts = jnp.bincount(cur, length=n_nodes)
        starts = jnp.cumsum(counts) - counts
        c = jnp.maximum(counts, 1)
        i1 = starts + (c - 1) // 2
        i2 = starts + c // 2
        med = 0.5 * (sa[i1] + sa[i2])  # [n_nodes]; garbage at empty nodes (unused)
        go_left = alpha < med[cur]
        # leaves self-loop, so finished points stay put regardless of median
        return jnp.where(go_left, left[cur], right[cur])

    cur = jax.lax.fori_loop(0, depth, level, cur)
    return arrays["leaf_block"][cur]
