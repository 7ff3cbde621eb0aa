"""Accuracy-vs-blocks figure for the 80k suite (VERDICT round-3 item 2).

Reproduces the paper's 80k experiment family (reference
``gprfopt_analyze.py:188-229``: Local-{16,36,100,196,400,900} vs
GPRF-{100,196,400,900} at local_dist=0.1) from our device-engine runs in
``docs/runs/``, against the reference's shipped results read directly from
``/root/reference/gprf_results.tgz``.

Left panel: final mean latent error vs number of blocks (the paper's
accuracy story).  Right panel: the same error vs optimization wall-clock
(the speed story).  Chart design follows the dataviz method (categorical
identity = model family in fixed slot order; ours-vs-reference encoded as
filled-solid vs open-dashed so identity is never color-alone).

Usage:
  python scripts/eighty_figure.py [--out docs/figures/eighty_suite.png]
"""

import argparse
import io
import os
import sys
import tarfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

FAMILY_COLORS = {"GPRF": "#2a78d6", "Local": "#eb6834"}
TEXT_PRIMARY, TEXT_SECONDARY = "#0b0b0b", "#52514e"
SURFACE = "#fcfcfb"

REF_TGZ = "/root/reference/gprf_results.tgz"

# our committed artifacts: family -> [(nblocks, [candidate dirs])].  The
# first existing dir wins: round-5 exact-draw rows (the reference-matched
# sampler, see RESULTS.md "sampler-fidelity control") preferred, legacy
# Vecchia-draw rows as fallback.
OURS = {
    "GPRF": [
        (100, ["gprf80k_100_yexact", "gprf80k_device"]),
        (196, ["gprf80k_196_yexact", "gprf80k_196"]),
        (400, ["gprf80k_400_yexact", "gprf80k_400"]),
        (900, ["gprf80k_900_yexact", "gprf80k_900"]),
    ],
    "Local": [
        (16, ["local80k_16_yexact", "local80k_16"]),
        (36, ["local80k_36_yexact", "local80k_36"]),
        (100, ["local80k_100_yexact", "local80k_100_device"]),
        (196, ["local80k_196_yexact", "local80k_196"]),
        (400, ["local80k_400_yexact", "local80k_400"]),
        (900, ["local80k_900_yexact"]),
    ],
}
# the legacy Vecchia-draw GPRF rows, overlaid faintly to show the round-5
# sampler-fidelity finding (approximate draw depressed the GPRF family)
OURS_VECCHIA = [
    (100, "gprf80k_device"),
    (196, "gprf80k_196"),
    (400, "gprf80k_400"),
    (900, "gprf80k_900"),
]
# best-of extras plotted as annotated points, not family lines (the cont
# rows warm-start from the GPRF-100 solution, so their wall excludes that
# stage — kept off the family lines for an honest wall panel)
OURS_EXTRA = [
    ("GPRF-900 cont", "gprf80k_900_cont_yexact"),
    ("Local-900 cont", "local80k_900_cont_yexact"),
]


def parse_results(lines):
    """(total_seconds, final_mad) from results.txt lines, skipping trueX."""
    last = None
    for line in lines:
        parts = line.split()
        if not parts or parts[0] in ("trueX", "true"):
            continue
        last = parts
    if last is None:
        return None
    return float(last[1]), float(last[4])


def _read_row(name):
    path = os.path.join("docs/runs", name, "results.txt")
    if os.path.exists(path):
        with open(path) as f:
            return parse_results(f)
    return None


def ours_rows():
    out = {}
    for fam, rows in OURS.items():
        pts = []
        for nb, names in rows:
            for name in names:
                r = _read_row(name)
                if r:
                    pts.append((nb, *r))
                    break
        out[fam] = pts
    vecchia = []
    for nb, name in OURS_VECCHIA:
        r = _read_row(name)
        if r:
            vecchia.append((nb, *r))
    extras = []
    for label, name in OURS_EXTRA:
        r = _read_row(name)
        if r:
            extras.append((label, *r))
    return out, vecchia, extras


def ref_rows():
    out = {"GPRF": [], "Local": []}
    if not os.path.exists(REF_TGZ):
        return out
    with tarfile.open(REF_TGZ) as t:
        for fam, ldist, nbs in (
            ("GPRF", "0.1000", (100, 196, 400, 900)),
            ("Local", "1.0000", (16, 36, 100, 196, 400, 900)),
        ):
            for nb in nbs:
                name = (
                    "./80000_80500_%d_0.021213_0.007071_%s_50_"
                    "l-bfgs-b_x_-1_0.0100_s0_gprf0/results.txt" % (nb, ldist)
                )
                try:
                    f = t.extractfile(name)
                except KeyError:
                    f = None
                if f is None:
                    continue
                r = parse_results(io.TextIOWrapper(f))
                if r:
                    out[fam].append((nb, *r))
    return out


def style(ax):
    ax.set_facecolor(SURFACE)
    ax.grid(True, which="both", color="#e7e6e2", linewidth=0.6, zorder=0)
    ax.tick_params(colors=TEXT_SECONDARY)
    for s in ax.spines.values():
        s.set_color("#e7e6e2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/figures/eighty_suite.png")
    args = ap.parse_args()

    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ours, vecchia, extras = ours_rows()
    ref = ref_rows()

    fig, (axa, axb) = plt.subplots(1, 2, figsize=(11.5, 4.8), dpi=160)
    fig.patch.set_facecolor(SURFACE)

    for fam in ("GPRF", "Local"):
        c = FAMILY_COLORS[fam]
        for pts, ours_flag in ((ref[fam], False), (ours[fam], True)):
            if not pts:
                continue
            pts_s = sorted(pts)
            kw = dict(
                marker="o", markersize=6, color=c,
                markerfacecolor=c if ours_flag else SURFACE,
                markeredgecolor=c, markeredgewidth=1.4,
                linestyle="-" if ours_flag else "--",
                linewidth=2 if ours_flag else 1.4,
                alpha=1.0 if ours_flag else 0.75,
                label=f"{fam} ({'gprf_tpu' if ours_flag else 'reference CPU'})",
            )
            axa.plot([p[0] for p in pts_s], [p[2] for p in pts_s], **kw)
            axb.plot([p[1] for p in pts_s], [p[2] for p in pts_s], **kw)
            for nb, secs, mad_v in pts_s:
                axb.annotate(
                    str(nb), (secs, mad_v), textcoords="offset points",
                    xytext=(5, 5), fontsize=7, color=TEXT_SECONDARY,
                )
    if vecchia:
        pts_s = sorted(vecchia)
        axa.plot(
            [p[0] for p in pts_s], [p[2] for p in pts_s],
            marker="o", markersize=4, color=FAMILY_COLORS["GPRF"],
            markerfacecolor=SURFACE, markeredgecolor=FAMILY_COLORS["GPRF"],
            linestyle=":", linewidth=1.1, alpha=0.45,
            label="GPRF (gprf_tpu, legacy Vecchia draw)",
        )
    for label, secs, mad_v in extras:
        axb.scatter([secs], [mad_v], marker="*", s=110,
                    color=FAMILY_COLORS["GPRF"], zorder=5)
        axb.annotate(label, (secs, mad_v), textcoords="offset points",
                     xytext=(6, -9), fontsize=7, color=TEXT_PRIMARY)

    for ax in (axa, axb):
        style(ax)
        ax.set_yscale("log")
        ax.set_ylabel("final mean latent error (log)", color=TEXT_PRIMARY)
    axa.set_xscale("log")
    axa.set_xlabel("number of blocks (log)", color=TEXT_PRIMARY)
    axb.set_xscale("log")
    axb.set_xlabel("total optimization wall-clock (s, log)", color=TEXT_PRIMARY)
    axa.set_title("80k suite: accuracy vs partition size", color=TEXT_PRIMARY, fontsize=10)
    axb.set_title("80k suite: accuracy vs compute", color=TEXT_PRIMARY, fontsize=10)
    axa.legend(fontsize=8, framealpha=0.9, edgecolor="#e7e6e2")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print("wrote", args.out)

    table = args.out.replace(".png", ".txt")
    with open(table, "w") as f:
        f.write("family nblocks impl seconds mad\n")
        for fam in ("GPRF", "Local"):
            for impl, pts in (("gprf_tpu", ours[fam]), ("reference", ref[fam])):
                for nb, secs, mad_v in sorted(pts):
                    f.write(f"{fam} {nb} {impl} {secs:.1f} {mad_v:.6f}\n")
        for nb, secs, mad_v in sorted(vecchia):
            f.write(f"GPRF {nb} gprf_tpu_vecchia {secs:.1f} {mad_v:.6f}\n")
        for label, secs, mad_v in extras:
            f.write(f"GPRF {label!r} gprf_tpu {secs:.1f} {mad_v:.6f}\n")
    print("wrote", table)


if __name__ == "__main__":
    main()
