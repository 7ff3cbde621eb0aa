from gprf_tpu.data.synthetic import sample_synthetic, sample_y, sample_crazy_shape
from gprf_tpu.data.sampled import SampledData, sample_data

__all__ = [
    "sample_synthetic",
    "sample_y",
    "sample_crazy_shape",
    "SampledData",
    "sample_data",
]
