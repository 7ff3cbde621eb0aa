"""Analysis CLI: visualization and fleet generation.

Rebuild of the reference ``gprfopt_analyze.py`` main (``:389-407``):
``vis`` renders per-step scatter plots + movie for a run directory;
default mode emits the experiment-suite launcher scripts.
"""

from __future__ import annotations

import argparse
import pickle


def main(argv=None):
    parser = argparse.ArgumentParser(description="gprf analysis")
    sub = parser.add_subparsers(dest="cmd")

    vis = sub.add_parser("vis", help="render step checkpoints of a run")
    vis.add_argument("run_dir")
    vis.add_argument("--sdata_file", default=None, help="pickled SampledData for coloring")
    vis.add_argument("--y_target", type=int, default=-1,
                     help="output dim to color by; -1 location error, -2 RPC blocks, -3 grid blocks")
    vis.add_argument("--seed", type=int, default=None)
    vis.add_argument("--blocksize", type=int, default=None)
    vis.add_argument("--highlight_block", type=int, default=None)
    vis.add_argument("--no_movie", action="store_true")

    gen = sub.add_parser("gen-runs", help="emit fleet launcher scripts")
    gen.add_argument("--out_dir", default=".")

    args = parser.parse_args(argv)
    if args.cmd == "vis":
        from gprf_tpu.analysis.plots import vis_points

        sdata = None
        if args.sdata_file:
            with open(args.sdata_file, "rb") as f:
                sdata = pickle.load(f)
        written = vis_points(
            args.run_dir,
            sdata=sdata,
            y_target=args.y_target,
            seed=args.seed,
            blocksize=args.blocksize,
            highlight_block=args.highlight_block,
            make_movie=not args.no_movie,
        )
        print(f"wrote {len(written)} frames")
    elif args.cmd == "gen-runs":
        from gprf_tpu.analysis.fleet import gen_runs

        gen_runs(out_dir=args.out_dir)
        print("wrote run_eighty.sh run_truegp.sh run_fitc.sh")
    else:
        parser.print_help()


if __name__ == "__main__":
    main()
