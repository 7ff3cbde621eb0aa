"""Seismic relocation convergence: mean location error (km) vs wall-clock.

Ours (committed artifacts, synthetic ISC-style catalog) vs the reference's
shipped full-catalog trace (seismic_results.tgz; its real ISC catalog is
not shipped, so curves are comparable-structure, not identical-data —
stated on the figure).  Column format: step, cumulative seconds, ll,
dlscale, mean km error, median km error (run_seismic.py analyzer).

Usage: python scripts/seismic_figure.py [ref_extract_dir]
"""

import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
C_OURS = "#2a78d6"
C_REF = "#eb6834"
TEXT = "#1a1a19"
MUTED = "#6b6a5f"
GRID = "#e6e5dc"


def load_trace(path):
    ts, errs = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5 or parts[0] == "true":
                continue
            try:
                t, err = float(parts[1]), float(parts[4])
            except ValueError:
                continue
            if np.isfinite(t) and np.isfinite(err) and err > 0:
                ts.append(max(t, 1e-1))
                errs.append(err)
    return np.asarray(ts), np.minimum.accumulate(np.asarray(errs))


def main():
    ref_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refseis"
    fig, ax = plt.subplots(figsize=(6.2, 4.2), dpi=160)
    fig.patch.set_facecolor("white")
    for path, color, label in [
        (
            os.path.join(ref_dir, "-1_213_0.6000_default_xcov_40_20.0/results.txt"),
            C_REF,
            "reference (1 CPU core, real ISC catalog)",
        ),
        (
            os.path.join(REPO, "docs/runs/seismic_xcov_multistart/results.txt"),
            C_OURS,
            "gprf_tpu --multistart=4 (1 TPU v5e, synthetic catalog)",
        ),
    ]:
        t, e = load_trace(path)
        ax.plot(t, e, color=color, linewidth=2, label=label, zorder=3)
        ax.annotate(
            f"{e[-1]:.2f} km",
            (t[-1], e[-1]),
            textcoords="offset points",
            xytext=(-6, 8),
            fontsize=8,
            color=color,
        )
    ax.set_xscale("log")
    ax.set_title(
        "Seismic event relocation (12k events, GPRF xcov)",
        fontsize=10,
        color=TEXT,
    )
    ax.set_xlabel("wall-clock seconds (log)", fontsize=9, color=MUTED)
    ax.set_ylabel("mean location error (km)", fontsize=9, color=MUTED)
    ax.grid(True, which="major", color=GRID, linewidth=0.6, zorder=0)
    ax.tick_params(colors=MUTED, labelsize=8)
    for s in ax.spines.values():
        s.set_color(GRID)
    ax.legend(frameon=False, fontsize=8, loc="upper right")
    fig.text(
        0.5,
        0.01,
        "Catalogs differ (the reference's data blob is not shipped): curves are comparable-structure, not identical-data.",
        ha="center",
        fontsize=7,
        color=MUTED,
    )
    fig.tight_layout(rect=(0, 0.03, 1, 1))
    out = os.path.join(REPO, "docs/figures/seismic_convergence.png")
    fig.savefig(out, facecolor="white")
    print("wrote", out)


if __name__ == "__main__":
    main()
