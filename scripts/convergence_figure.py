"""Convergence figure: mean latent error vs wall-clock, ours vs reference.

Reads the committed run artifacts (docs/runs/*) and the reference's shipped
experiment traces (extracted from /root/reference/gprf_results.tgz — same
12-column results.txt format, gprfopt_analyze.py:20-22) and renders
docs/figures/convergence.png: two panels (n=10k flagship, n=80k), log-log
time vs error, one hue per system (fixed categorical order, direct labels).

Usage: python scripts/convergence_figure.py [ref_extract_dir]
"""

import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# categorical slots 1/2 of the validated default palette (skill reference
# instance): blue = this framework, orange = reference
C_OURS = "#2a78d6"
C_REF = "#eb6834"
TEXT = "#1a1a19"
MUTED = "#6b6a5f"
GRID = "#e6e5dc"


def load_trace(path):
    """(t, err) from a results.txt, skipping the trueX oracle row and
    rows with non-finite/zero error."""
    ts, errs = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] == "trueX" or parts[0] == "true":
                continue
            try:
                t, err = float(parts[1]), float(parts[4])
            except (ValueError, IndexError):
                continue
            if np.isfinite(t) and np.isfinite(err) and err > 0:
                ts.append(max(t, 1e-2))
                errs.append(err)
    return np.asarray(ts), np.asarray(errs)


def best_so_far(t, e):
    """Monotone envelope (the paper's max_history convention)."""
    return t, np.minimum.accumulate(e)


def main():
    ref_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refres"
    panels = [
        (
            "n = 10,000 (100 blocks, GPRF edges)",
            os.path.join(REPO, "docs/runs/gprf10k_device/results.txt"),
            os.path.join(
                ref_dir,
                "10000_10500_100_0.060000_0.020000_0.1000_50_l-bfgs-b_x_-1_0.0100_s0_gprf0/results.txt",
            ),
        ),
        (
            "n = 80,000 (100 blocks, GPRF edges)",
            os.path.join(REPO, "docs/runs/gprf80k_device/results.txt"),
            os.path.join(
                ref_dir,
                "80000_80500_100_0.021213_0.007071_0.1000_50_l-bfgs-b_x_-1_0.0100_s0_gprf0/results.txt",
            ),
        ),
    ]

    fig, axes = plt.subplots(1, 2, figsize=(10, 4.2), dpi=160)
    fig.patch.set_facecolor("white")
    for ax, (title, ours_path, ref_path) in zip(axes, panels):
        for path, color, label in [
            (ref_path, C_REF, "reference (1 CPU core, 2015)"),
            (ours_path, C_OURS, "gprf_tpu (1 TPU v5e chip)"),
        ]:
            t, e = best_so_far(*load_trace(path))
            ax.plot(t, e, color=color, linewidth=2, label=label, zorder=3)
            # direct label at the curve's end
            ax.annotate(
                f"{e[-1]:.5f}",
                (t[-1], e[-1]),
                textcoords="offset points",
                xytext=(4, -10),
                fontsize=8,
                color=color,
            )
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.set_title(title, fontsize=10, color=TEXT)
        ax.set_xlabel("wall-clock seconds (log)", fontsize=9, color=MUTED)
        ax.grid(True, which="major", color=GRID, linewidth=0.6, zorder=0)
        ax.tick_params(colors=MUTED, labelsize=8)
        for s in ax.spines.values():
            s.set_color(GRID)
    axes[0].set_ylabel("mean latent error (log)", fontsize=9, color=MUTED)
    axes[0].legend(frameon=False, fontsize=8, loc="upper right")
    fig.suptitle(
        "GPRF latent-inference convergence: same objective and accuracy in "
        "seconds/minutes instead of minutes/hours (1400x+ per evaluation)",
        fontsize=11,
        color=TEXT,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    out = os.path.join(REPO, "docs/figures/convergence.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, facecolor="white")
    print("wrote", out)


if __name__ == "__main__":
    main()
