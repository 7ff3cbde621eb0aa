"""Static padded block layout: the bridge from ragged host partitions to
fixed-shape device tensors.

The reference keeps blocks as a Python list of index arrays
(``GPRF.block_idxs``, ``gprf.py:98-102``) and loops over them.  For a
jit-compiled TPU objective everything must be static-shaped: a layout holds
an ``[B, m]`` assignment matrix (padded with index 0 + a validity mask), the
edge list ``[E, 2]``, per-block neighbor counts, and the precomputed pair
gather ``[E, 2m]`` — so the whole objective is two vmapped batched Gaussian
densities over gathers of (X, Y), with `jax.grad`'s gather-transpose doing
the gradX scatter-add the reference hand-codes at ``gprf.py:258-273``.

Block membership is recomputed on the host only when the partitioner says so
(the reference's ``reblock`` closures replay *fixed* splits, so membership
is a deterministic function of X; see ``block_clustering.py:81-82``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@dataclasses.dataclass(frozen=True)
class BlockLayout:
    """Padded layout of a partition of n points into B blocks with E edges.

    Attributes (all NumPy on host; ``device_arrays()`` returns jnp views):
      assignment: [B, m] int32, global point index per slot (0-padded)
      mask:       [B, m] bool, True where the slot holds a real point
      sizes:      [B] int32 true block sizes
      edges:      [E, 2] int32 block-index pairs (i, j), i > j
      neighbor_count: [B] int32, number of edges touching each block
      pair_assignment: [E, 2m] int32 gather for the stacked pair blocks
      pair_mask:  [E, 2m] bool
      n:          number of points
    """

    assignment: np.ndarray
    mask: np.ndarray
    sizes: np.ndarray
    edges: np.ndarray
    neighbor_count: np.ndarray
    pair_assignment: np.ndarray
    pair_mask: np.ndarray
    n: int

    @property
    def n_blocks(self) -> int:
        return self.assignment.shape[0]

    @property
    def block_pad(self) -> int:
        return self.assignment.shape[1]

    @property
    def n_edges(self) -> int:
        return self.edges.shape[0]

    @staticmethod
    def from_blocks(
        block_idxs: Sequence[np.ndarray],
        n: int,
        edges: Sequence[tuple[int, int]] | np.ndarray | None = None,
        pad_multiple: int = 8,
        pad_to: int | None = None,
    ) -> "BlockLayout":
        """Build a layout from a ragged partition + edge list.

        ``pad_multiple`` rounds the per-block slot count up for TPU tiling
        (sublane granularity); ``pad_to`` forces an exact slot count.
        """
        B = len(block_idxs)
        sizes = np.array([len(ix) for ix in block_idxs], dtype=np.int32)
        maxsz = int(sizes.max()) if B else 0
        m = pad_to if pad_to is not None else max(_round_up(max(maxsz, 1), pad_multiple), pad_multiple)
        if m < maxsz:
            raise ValueError(f"pad_to={m} smaller than largest block {maxsz}")

        assignment = np.zeros((B, m), dtype=np.int32)
        mask = np.zeros((B, m), dtype=bool)
        for b, ix in enumerate(block_idxs):
            k = len(ix)
            assignment[b, :k] = np.asarray(ix, dtype=np.int32)
            mask[b, :k] = True

        if edges is None:
            edges_arr = np.zeros((0, 2), dtype=np.int32)
        else:
            edges_arr = np.asarray(edges, dtype=np.int32).reshape(-1, 2)

        neighbor_count = np.zeros((B,), dtype=np.int32)
        for i, j in edges_arr:
            neighbor_count[i] += 1
            neighbor_count[j] += 1

        if len(edges_arr):
            pair_assignment = np.concatenate(
                [assignment[edges_arr[:, 0]], assignment[edges_arr[:, 1]]], axis=1
            )
            pair_mask = np.concatenate([mask[edges_arr[:, 0]], mask[edges_arr[:, 1]]], axis=1)
        else:
            pair_assignment = np.zeros((0, 2 * m), dtype=np.int32)
            pair_mask = np.zeros((0, 2 * m), dtype=bool)

        return BlockLayout(
            assignment=assignment,
            mask=mask,
            sizes=sizes,
            edges=edges_arr,
            neighbor_count=neighbor_count,
            pair_assignment=pair_assignment,
            pair_mask=pair_mask,
            n=n,
        )

    def block_idxs(self) -> list[np.ndarray]:
        """Back to the ragged representation (reference ``block_idxs``)."""
        return [self.assignment[b, : self.sizes[b]].copy() for b in range(self.n_blocks)]

    def unary_weights(self) -> np.ndarray:
        """Per-block weight of the unary term in the GPRF combination:
        ``(1 - neighbor_count_i)`` (reference ``gprf.py:253-254``)."""
        return (1.0 - self.neighbor_count.astype(np.float64))

    def device_arrays(self, pad_edges_to: int | None = None):
        """jnp versions of the gather/mask/weight tensors for the objective.

        ``pad_edges_to`` optionally pads the edge batch (with zero-weight
        dummy edges pointing at block 0) so the edge count is a static
        multiple of e.g. the device-mesh size.
        """
        assignment = jnp.asarray(self.assignment)
        mask = jnp.asarray(self.mask)
        pair_assignment = jnp.asarray(self.pair_assignment)
        pair_mask = jnp.asarray(self.pair_mask)
        edges = jnp.asarray(self.edges)
        unary_w = jnp.asarray(self.unary_weights(), dtype=jnp.result_type(float))
        E = self.n_edges
        pair_w = jnp.ones((E,), dtype=unary_w.dtype)
        if pad_edges_to is not None and pad_edges_to > E:
            padn = pad_edges_to - E
            m2 = pair_assignment.shape[1] if E else 2 * self.block_pad
            pair_assignment = jnp.concatenate(
                [pair_assignment, jnp.zeros((padn, m2), dtype=jnp.int32)], axis=0
            )
            pair_mask = jnp.concatenate([pair_mask, jnp.zeros((padn, m2), dtype=bool)], axis=0)
            edges = jnp.concatenate([edges, jnp.zeros((padn, 2), dtype=jnp.int32)], axis=0)
            pair_w = jnp.concatenate([pair_w, jnp.zeros((padn,), dtype=pair_w.dtype)])
        return dict(
            assignment=assignment,
            mask=mask,
            pair_assignment=pair_assignment,
            pair_mask=pair_mask,
            edges=edges,
            unary_weights=unary_w,
            pair_weights=pair_w,
        )
