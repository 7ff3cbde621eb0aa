"""Accuracy-vs-compute figure for the truegp 10k suite (VERDICT round-2 #9).

Reproduces the paper's model-family ordering (reference
``gprfopt_analyze.py:231-278`` series: GPRF-{9,25,49,100} vs
Local-{1,9,25,49,100} vs FITC) from our device-engine runs, side by side
with the reference's shipped results (``gprf_results.tgz``).

Chart design per the dataviz method (form: relationship scatter — final
error vs total optimization wall time, log-log; categorical identity =
model family in fixed slot order; ours-vs-reference is the secondary
encoding: filled-solid vs open-dashed, so identity is never color-alone).
Palette: slots 1-3 of the skill's pre-validated reference instance (the
palette validator is node-based and this image has no node; the instance
is shipped pre-validated and used in fixed order).

Usage:
  python scripts/truegp_figure.py [--ours DIR] [--ref DIR] [--out PNG]
"""

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# categorical slots 1-3 (blue, orange, aqua), fixed order
FAMILY_COLORS = {"GPRF": "#2a78d6", "Local": "#eb6834", "FITC": "#1baf7a"}
TEXT_PRIMARY, TEXT_SECONDARY = "#0b0b0b", "#52514e"
SURFACE = "#fcfcfb"


def final_row(d):
    """(total_seconds, final_mad) from a results.txt, skipping the trueX row."""
    path = os.path.join(d, "results.txt")
    if not os.path.exists(path):
        return None
    last = None
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] in ("trueX", "true"):
                continue
            last = parts
    if last is None:
        return None
    return float(last[1]), float(last[4])


def suite_points(base, fitc_extra=None):
    """{family: [(label, seconds, mad)]} for one experiment root."""
    out = {"GPRF": [], "Local": [], "FITC": []}

    def name(nb, ldist, tail="gprf0"):
        return (
            f"10000_10500_{nb}_0.060000_0.020000_{ldist:.4f}_50_"
            f"l-bfgs-b_x_-1_0.0100_s0_{tail}"
        )

    for nb in (9, 25, 49, 100):
        r = final_row(os.path.join(base, name(nb, 0.1)))
        if r:
            out["GPRF"].append((str(nb), *r))
    for nb in (1, 9, 25, 49, 100):
        r = final_row(os.path.join(base, name(nb, 1.0)))
        if r:
            out["Local"].append(("full GP" if nb == 1 else str(nb), *r))
    for ni in (200, 500, 1000, 2000, 4000):
        # prefer the VarDTC (titsias) run when present: GPy 0.6
        # SparseGPLVM — the reference's FITC baseline — defaults to
        # VarDTC inference (see docs/RESULTS.md round-4 FITC section)
        r = final_row(os.path.join(base, name(1, 1.0, f"titsias{ni}")))
        if not r:
            r = final_row(os.path.join(base, name(1, 1.0, f"sparse{ni}")))
        if r:
            out["FITC"].append((str(ni), *r))
    if fitc_extra:
        for label, d in fitc_extra:
            r = final_row(d)
            if r:
                out["FITC"].append((label, *r))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="/root/repo/.exp_truegp")
    ap.add_argument("--ref", default="/tmp/refres")
    ap.add_argument("--out", default="docs/figures/truegp_suite.png")
    args = ap.parse_args()

    # (the FITC-2000 row comes from the suite dir itself now — the VarDTC
    # run; the older FITC-proper run is docs/runs/fitc2000_10k)
    ours = suite_points(args.ours)
    ref = suite_points(args.ref)

    fig, ax = plt.subplots(figsize=(8.2, 5.4), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    for fam in ("GPRF", "Local", "FITC"):
        c = FAMILY_COLORS[fam]
        for pts, ours_flag in ((ref[fam], False), (ours[fam], True)):
            if not pts:
                continue
            pts_s = sorted(pts, key=lambda p: p[1])
            xs = [p[1] for p in pts_s]
            ys = [p[2] for p in pts_s]
            ax.plot(
                xs, ys,
                linestyle="-" if ours_flag else "--",
                marker="o",
                markersize=6,
                markerfacecolor=c if ours_flag else SURFACE,
                markeredgecolor=c,
                markeredgewidth=1.4,
                color=c,
                linewidth=2 if ours_flag else 1.4,
                alpha=1.0 if ours_flag else 0.75,
                label=f"{fam} ({'gprf_tpu' if ours_flag else 'reference CPU'})",
            )
            # selective direct labels: block / inducing counts, text ink
            for lbl, x, y in pts_s:
                ax.annotate(
                    lbl, (x, y), textcoords="offset points", xytext=(5, 5),
                    fontsize=7, color=TEXT_SECONDARY,
                )

    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("total optimization wall-clock (s, log)", color=TEXT_PRIMARY)
    ax.set_ylabel("final mean latent error (log)", color=TEXT_PRIMARY)
    ax.set_title(
        "Accuracy vs compute, truegp suite (n=10k): device engine vs the "
        "reference's shipped runs",
        color=TEXT_PRIMARY, fontsize=10,
    )
    ax.grid(True, which="both", color="#e7e6e2", linewidth=0.6, zorder=0)
    ax.tick_params(colors=TEXT_SECONDARY)
    for s in ax.spines.values():
        s.set_color("#e7e6e2")
    ax.legend(fontsize=8, framealpha=0.9, edgecolor="#e7e6e2")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print("wrote", args.out)

    # companion table view (accessibility: data is never color-alone)
    table = args.out.replace(".png", ".txt")
    with open(table, "w") as f:
        f.write("family label impl seconds mad\n")
        for fam in ("GPRF", "Local", "FITC"):
            for impl, pts in (("gprf_tpu", ours[fam]), ("reference", ref[fam])):
                for lbl, x, y in sorted(pts, key=lambda p: p[1]):
                    f.write(f"{fam} {lbl} {impl} {x:.1f} {y:.5f}\n")
    print("wrote", table)


if __name__ == "__main__":
    main()
