from gprf_tpu.parallel.sharding import (
    make_mesh,
    shard_layout_arrays,
    sharded_gprf_value_and_grad,
)

__all__ = ["make_mesh", "shard_layout_arrays", "sharded_gprf_value_and_grad"]
