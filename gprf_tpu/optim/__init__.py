from gprf_tpu.optim.driver import OutOfTimeError, do_optimization, do_optimization_seismic
from gprf_tpu.optim.priors import synthetic_cov_prior, seismic_cov_prior

__all__ = [
    "OutOfTimeError",
    "do_optimization",
    "do_optimization_seismic",
    "synthetic_cov_prior",
    "seismic_cov_prior",
]
