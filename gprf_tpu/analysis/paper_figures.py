"""Paper-figure data preparation.

Rebuild of the analysis logic in the reference's camera-ready notebook
(``gprf_camera_plot.ipynb``): best-so-far envelopes of the per-step mean
location error (cell 1's ``max_history`` over -mad), the sqrt(n)
mad-rescaling that converts unit-square error to the paper's normalized
units (cell 2), and assembly of {method-label: (time, error)} series from a
directory of finished runs for :func:`gprf_tpu.analysis.plots.write_plot`.
"""

from __future__ import annotations

import os

import numpy as np

from gprf_tpu.analysis.results import RESULT_COLS, load_results, max_history


def error_envelope(results, ntrain=None):
    """(times, best-so-far mad) from a results array; mad rescaled by
    sqrt(n) when ntrain is given (the notebook's normalization)."""
    t = results[:, RESULT_COLS["time"]]
    mad = results[:, RESULT_COLS["mad"]]
    best = -max_history(-mad)
    if ntrain is not None:
        best = best * np.sqrt(ntrain)
    return t, best


def suite_series(exp_base, runs_by_key, name_fn, ntrain=None):
    """{label: (times, error-envelope)} for every finished run of a suite.

    name_fn maps a run-param dict to its experiment dir name (use
    ``gprf_tpu.cli.gprfopt.build_run_name``).
    """
    series = {}
    for key, run_list in runs_by_key.items():
        for run in run_list:
            d = os.path.join(exp_base, name_fn(run))
            if not os.path.exists(os.path.join(d, "results.txt")):
                continue
            R = load_results(d)
            if len(R) == 0:
                continue
            series[key] = error_envelope(R, ntrain=ntrain or run.get("ntrain"))
    return series


def final_error_vs_time(exp_base, runs_by_key, name_fn):
    """{label: (total_time, final_mad)} scatter data (the paper's
    accuracy-vs-compute tradeoff plots)."""
    out = {}
    for key, run_list in runs_by_key.items():
        for run in run_list:
            d = os.path.join(exp_base, name_fn(run))
            if not os.path.exists(os.path.join(d, "results.txt")):
                continue
            R = load_results(d)
            if len(R) == 0:
                continue
            out[key] = (
                float(R[-1, RESULT_COLS["time"]]),
                float(R[-1, RESULT_COLS["mad"]]),
            )
    return out
