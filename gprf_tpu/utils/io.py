"""Small host-side IO helpers (treegp ``util.mkdir_p`` analog and the
step-checkpoint naming protocol of the reference drivers)."""

from __future__ import annotations

import os

import numpy as np


def mkdir_p(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def step_x_path(d: str, step: int) -> str:
    """Checkpoint path convention of the reference (``gprfopt.py:388``)."""
    return os.path.join(d, "step_%05d_X.npy" % step)


def step_cov_path(d: str, step: int) -> str:
    return os.path.join(d, "step_%05d_cov.npy" % step)


def save_step(d: str, step: int, X=None, FC=None) -> None:
    if X is not None:
        np.save(step_x_path(d, step), np.asarray(X))
    if FC is not None:
        np.save(step_cov_path(d, step), np.asarray(FC))
