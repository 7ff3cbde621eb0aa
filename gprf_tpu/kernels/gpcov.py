"""Kernel hyperparameter container, as a JAX pytree.

Plays the role of treegp's ``gp.GPCov(wfn_params, dfn_params, dfn_str,
wfn_str)`` (see reference call sites ``gprf.py:163``, ``synthetic.py:149``,
``run_seismic.py:299``): ``wfn_params = [signal_var]`` parameterizes the
weight (covariance) function and ``dfn_params = [lengthscales...]``
parameterizes the distance function.  Unlike the reference this is a pytree
dataclass, so a GPCov flows through jit/grad/vmap and hyperparameter
gradients come from autodiff rather than hand-coded ``dKdi`` chain rules
(reference ``gprf.py:362-375``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

DISTANCE_FNS = ("euclidean", "lld")
WEIGHT_FNS = ("se", "matern32", "compact2")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GPCov:
    """Stationary GP covariance: ``k(x, x') = wfn(dfn(x, x'))``.

    ``dfn_str`` selects the distance function:
      * ``"euclidean"``: per-dimension scaled euclidean distance,
        ``r = sqrt(sum_d ((x_d - x'_d) / l_d)^2)`` with one lengthscale per
        input dimension in ``dfn_params``.
      * ``"lld"``: (lon, lat, depth) geodetic distance —
        ``r = sqrt((d_surface_km / l_h)^2 + ((depth - depth') / l_z)^2)``
        where ``d_surface_km`` is the great-circle distance (reference
        pure-python spec at ``run_seismic.py:19-63``) and
        ``dfn_params = [l_h, l_z]`` are horizontal/vertical lengthscales in km.

    ``wfn_str`` selects the covariance profile applied to the scaled
    distance ``r``:
      * ``"se"``: ``sv * exp(-r^2)``.  (This matches the reference
        convention: ``gprfopt.py:239`` maps the treegp SE lengthscale ``l``
        to a GPy RBF lengthscale ``sqrt(0.5) * l``, i.e.
        ``exp(-0.5 d^2 / (0.5 l^2)) = exp(-(d/l)^2)``.)
      * ``"matern32"``: ``sv * (1 + sqrt(3) r) * exp(-sqrt(3) r)``.
    """

    wfn_params: jnp.ndarray  # [1] = [signal_var]
    dfn_params: jnp.ndarray  # [k] lengthscales
    dfn_str: str = dataclasses.field(default="euclidean", metadata=dict(static=True))
    wfn_str: str = dataclasses.field(default="se", metadata=dict(static=True))

    def __post_init__(self):
        if self.dfn_str not in DISTANCE_FNS:
            raise ValueError(f"unknown distance function {self.dfn_str!r}")
        if self.wfn_str not in WEIGHT_FNS:
            raise ValueError(f"unknown weight function {self.wfn_str!r}")

    @staticmethod
    def create(
        wfn_params: Sequence[float],
        dfn_params: Sequence[float],
        dfn_str: str = "euclidean",
        wfn_str: str = "se",
        dtype=None,
    ) -> "GPCov":
        dtype = dtype or jnp.result_type(float)
        return GPCov(
            wfn_params=jnp.asarray(wfn_params, dtype=dtype),
            dfn_params=jnp.asarray(dfn_params, dtype=dtype),
            dfn_str=dfn_str,
            wfn_str=wfn_str,
        )

    @property
    def signal_var(self) -> jnp.ndarray:
        return self.wfn_params[0]

    @property
    def n_params(self) -> int:
        """Number of cov hyperparameters in the reference's gradCov layout:
        [noise_var, signal_var, *lengthscales] (``gprf.py:578``)."""
        return 1 + len(self.wfn_params) + len(self.dfn_params)

    def with_params(self, wfn_params=None, dfn_params=None) -> "GPCov":
        return GPCov(
            wfn_params=self.wfn_params if wfn_params is None else jnp.asarray(wfn_params),
            dfn_params=self.dfn_params if dfn_params is None else jnp.asarray(dfn_params),
            dfn_str=self.dfn_str,
            wfn_str=self.wfn_str,
        )


def full_cov_to_gpcov(FC, dfn_str: str = "euclidean", wfn_str: str = "se"):
    """Split a reference-style full cov row ``[noise_var, signal_var, l1, l2, ...]``
    (``gprf.py:160-164`` ``update_covs`` semantics) into (GPCov, noise_var)."""
    FC = jnp.asarray(FC).reshape(-1)
    cov = GPCov(wfn_params=FC[1:2], dfn_params=FC[2:], dfn_str=dfn_str, wfn_str=wfn_str)
    return cov, FC[0]


def gpcov_to_full_cov(cov: GPCov, noise_var) -> jnp.ndarray:
    """Inverse of :func:`full_cov_to_gpcov`: ``[nv, sv, l1, l2, ...]`` row."""
    nv = jnp.asarray(noise_var).reshape(1)
    return jnp.concatenate([nv, cov.wfn_params, cov.dfn_params]).reshape(1, -1)
