"""Analytic FLOP model for the fused GPRF objective+gradient.

Gives roofline context ("actually fast, or just correct?") for the timed
shapes: the flagship (B=100, m=136), the seismic partition (m=192), and the
80k wide-m step (m~888).  This is a *model* — it tracks arithmetic-intensity
regressions across ablations, not a hardware counter.  The counted terms
mirror the fused Schur evaluation (``gprf_tpu/model/objective.py``); the
reference implements the same math per-block on CPU LAPACK
(``/root/reference/gprf.py:496-591``).
"""

from __future__ import annotations

# v5e nominal peak: 197 TFLOP/s bf16; f32 via HIGHEST-precision multi-pass
# lands near 1/4 of that.  MFU is reported against the f32 figure (the
# objective's compute dtype).
PEAK_F32_FLOPS = 197e12 / 4


def model_flops_per_eval(B, m, E, dy, dx, passes=3.0):
    """Analytic FLOP count of one fused Schur objective(+gradient) eval.

    Forward terms (per batch element of width m):
      unary:  kernel build 2 m^2 dx (MXU quadratic expansion) + Cholesky
              m^3/3 + dy-rhs triangular solve m^2 dy
      pair:   Kij build 2 m^2 dx + wide triangular solve m^3 + Schur
              product 2 m^3 + chol(S) m^3/3 + two dy-rhs updates 3 m^2 dy

    ``passes``: 3.0 for objective+gradient (reverse-mode costs ~2x forward;
    the custom VJPs are in the same regime: two triangular solves + an
    outer product per factorization), 1.0 for objective-only.
    """
    unary = B * (m**3 / 3.0 + m * m * dy + 2.0 * m * m * dx)
    pair = E * ((10.0 / 3.0) * m**3 + 3.0 * m * m * dy + 2.0 * m * m * dx)
    return passes * (unary + pair)


def roofline_str(flops, sec):
    """'xx GFLOP/s (y.yy% f32 MFU)' for a measured wall time."""
    rate = flops / sec
    return "%.0f GFLOP/s (%.2f%% f32 MFU)" % (
        rate / 1e9,
        100.0 * rate / PEAK_F32_FLOPS,
    )
