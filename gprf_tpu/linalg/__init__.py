from gprf_tpu.linalg.masked import (
    pad_kernel_matrix,
    masked_gaussian_ll,
    masked_gaussian_ll_cached,
)
from gprf_tpu.linalg.jitchol import jitchol

__all__ = [
    "pad_kernel_matrix",
    "masked_gaussian_ll",
    "masked_gaussian_ll_cached",
    "jitchol",
]
