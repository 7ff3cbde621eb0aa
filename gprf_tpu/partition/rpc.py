"""Recursive projection clustering with replayable splits.

Rebuild of ``cluster_rpc`` (reference ``block_clustering.py:48-98``): split a
point set by projecting onto the line through two random member points and
cutting at the median projection, recursing until blocks are below
``target_size``.  The split tree (direction, origin, children) is returned so
the *same* splits replay on updated coordinates — this is what keeps block
membership a pure function of X across optimizer steps (``fixed_split``
semantics, reference lines 58-62 and 81-82; used by ``SampledData.cluster_rpc``
at ``gprfopt.py:48-53``).
"""

from __future__ import annotations

import numpy as np


def cluster_rpc(X, idxs, target_size, fixed_split=None, rng=None):
    """Partition ``idxs`` (into ``X``) into blocks of < target_size points.

    Returns ``(blocks, split_tree)`` where blocks is a list of index arrays
    and split_tree replays the same splits on new coordinates via
    ``fixed_split=split_tree``.
    """
    X = np.asarray(X)
    idxs = np.asarray(idxs)
    if rng is None:
        rng = np.random  # module-level state, matching reference seeding
    n = len(idxs)

    if fixed_split is not None and len(fixed_split) == 0:
        return [idxs], ()

    if fixed_split is None:
        if n < target_size:
            return [idxs], ()
        idx1 = rng.choice(idxs)
        idx2 = idx1
        while np.all(idx2 == idx1):
            idx2 = rng.choice(idxs)
        x1 = X[idx1, :]
        x2 = X[idx2, :]
        cx1 = x1 - x2
        nx1 = cx1 / np.linalg.norm(cx1)
        fs1 = None
        fs2 = None
    else:
        (nx1, x2), fs1, fs2 = fixed_split

    if n > 0:
        alphas = (X[idxs] - x2) @ nx1
        median = np.median(alphas)
        idxs1 = idxs[alphas < median]
        idxs2 = idxs[alphas >= median]
    else:
        idxs1 = idxs
        idxs2 = idxs

    L1, split1 = cluster_rpc(X, idxs1, target_size, fixed_split=fs1, rng=rng)
    L2, split2 = cluster_rpc(X, idxs2, target_size, fixed_split=fs2, rng=rng)
    return L1 + L2, ((nx1, x2), split1, split2)
