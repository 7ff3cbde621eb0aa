from gprf_tpu.ops.pallas_mvn import batched_cholesky_pallas, batched_mvn_ll_pallas

__all__ = ["batched_cholesky_pallas", "batched_mvn_ll_pallas"]
