from gprf_tpu.partition.layout import BlockLayout
from gprf_tpu.partition.grid import Blocker, grid_centers
from gprf_tpu.partition.rpc import cluster_rpc
from gprf_tpu.partition.pdtree import PDTree, pdtree_cluster
from gprf_tpu.partition.morton import sort_morton, morton_codes

__all__ = [
    "BlockLayout",
    "Blocker",
    "grid_centers",
    "cluster_rpc",
    "PDTree",
    "pdtree_cluster",
    "sort_morton",
    "morton_codes",
]
