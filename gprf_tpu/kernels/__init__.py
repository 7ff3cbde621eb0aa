from gprf_tpu.kernels.gpcov import GPCov
from gprf_tpu.kernels.covfn import kernel_matrix, cross_kernel_matrix, cov_value

__all__ = ["GPCov", "kernel_matrix", "cross_kernel_matrix", "cov_value"]
