from gprf_tpu.model.gprf import GPRF
from gprf_tpu.model.objective import gprf_ll, gprf_value_and_grad

__all__ = ["GPRF", "gprf_ll", "gprf_value_and_grad"]
