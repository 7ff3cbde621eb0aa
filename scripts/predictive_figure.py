"""Predictive-metrics (SMSE / MSLL) panel for the truegp 10k suite
(VERDICT round-4 weak #5 / round-5 item 6).

The reference defines the six predictive results.txt columns
(``gprfopt_analyze.py:20-22``) and implements the scoring
(``gprfopt.py:121-170``), but every shipped results.txt in
``gprf_results.tgz`` carries zeros there (verified across all 222 dirs) —
the fleet was generated without predictive analysis.  So the comparison
axes here are internal but reference-defined: (a) the true-latent oracle
rows (the reference's own end-to-end correctness oracle, SURVEY §4), and
(b) the cross-family orderings the paper argues (GPRF beats Local at
equal block count; both approach the full GP).

Chart design per the dataviz method (form: two relationship panels —
predictive score vs block count, log-x; categorical identity = model
family in fixed slot order, same palette slots as truegp_figure.py;
optimized-latents vs true-latent-oracle is the secondary encoding:
filled-solid vs open-dashed, so identity is never color-alone).

Usage:
  python scripts/predictive_figure.py [--runs docs/runs/truegp_full] [--out PNG]
"""

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

FAMILY_COLORS = {"GPRF": "#2a78d6", "Local": "#eb6834", "fullGP": "#1baf7a"}
TEXT_PRIMARY, TEXT_SECONDARY = "#0b0b0b", "#52514e"
SURFACE = "#fcfcfb"

SMSE_COL, MSLL_COL = 7, 9  # `smse`, `msll_block` (gprfopt_analyze.py:20-22)


def rows(d):
    """(final, trueX) rows (each a list of floats) from one results.txt."""
    path = os.path.join(d, "results.txt")
    if not os.path.exists(path):
        return None, None
    final, oracle = None, None
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] in ("trueX", "true"):
                oracle = [float(v) for v in parts[1:]]
            else:
                final = [float(v) for v in parts]
    return final, oracle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", default="docs/runs/truegp_full")
    p.add_argument("--out", default="docs/figures/predictive_suite.png")
    args = p.parse_args()

    series = {}  # family -> [(nblocks, smse, msll, smse_true, msll_true)]
    for fam, prefix, counts in (
        ("GPRF", "gprf", (9, 25, 49, 100)),
        ("Local", "local", (9, 25, 49, 100)),
        ("fullGP", "fullgp", (1,)),
    ):
        pts = []
        for nb in counts:
            name = "fullgp" if fam == "fullGP" else "%s%d" % (prefix, nb)
            final, oracle = rows(os.path.join(args.runs, name))
            if final is None:
                print("missing:", name)
                continue
            # trueX rows drop the step column, shifting indices by one
            pts.append(
                (
                    nb,
                    final[SMSE_COL],
                    final[MSLL_COL],
                    oracle[SMSE_COL - 1] if oracle else None,
                    oracle[MSLL_COL - 1] if oracle else None,
                )
            )
        if pts:
            series[fam] = pts

    fig, (ax_s, ax_m) = plt.subplots(1, 2, figsize=(10.5, 4.2), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    for ax, col_opt, col_true, label, better in (
        (ax_s, 1, 3, "SMSE (test)", "lower"),
        (ax_m, 2, 4, "MSLL vs mean/std baseline (nats)", "higher"),
    ):
        ax.set_facecolor(SURFACE)
        for fam, pts in series.items():
            c = FAMILY_COLORS[fam]
            xs = [q[0] for q in pts]
            marker = "D" if fam == "fullGP" else "o"
            ax.plot(
                xs, [q[col_opt] for q in pts], color=c, marker=marker,
                ms=5.5, lw=1.6, label="%s (optimized X)" % fam,
            )
            if all(q[col_true] is not None for q in pts):
                ax.plot(
                    xs, [q[col_true] for q in pts], color=c, marker=marker,
                    ms=5.5, lw=1.3, ls="--", mfc="none",
                    label="%s (true-X oracle)" % fam,
                )
        ax.set_xscale("log")
        ax.set_xticks([1, 9, 25, 49, 100])
        ax.set_xticklabels(["1\n(full GP)", "9", "25", "49", "100"])
        ax.set_xlabel("blocks", color=TEXT_SECONDARY)
        ax.set_ylabel("%s — %s is better" % (label, better), color=TEXT_SECONDARY)
        if ax is ax_s:
            ax.set_yscale("log")
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        ax.grid(True, which="major", lw=0.4, color="#d9d7d2", alpha=0.7)
        ax.tick_params(colors=TEXT_SECONDARY)
    ax_s.legend(fontsize=7.5, frameon=False, loc="upper left")
    fig.suptitle(
        "BCM block-predictor quality on the 10k suite (filled = optimized latents, "
        "open dashed = true-latent oracle)",
        fontsize=10, color=TEXT_PRIMARY,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, facecolor=SURFACE)
    print("wrote", args.out)

    # companion text table
    txt = args.out.replace(".png", ".txt")
    with open(txt, "w") as f:
        f.write("family nblocks smse smse_trueX msll msll_trueX\n")
        for fam, pts in series.items():
            for nb, s, m, st, mt in pts:
                f.write(
                    "%s %d %.4f %s %.4f %s\n"
                    % (
                        fam, nb, s,
                        "%.4f" % st if st is not None else "-",
                        m,
                        "%.4f" % mt if mt is not None else "-",
                    )
                )
    print("wrote", txt)


if __name__ == "__main__":
    main()
