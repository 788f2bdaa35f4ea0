"""Loss/AUC curve visualization from saved meters.

(reference: deepards/visualize_results.py:16-80 — reads per-meter torch
files by start_time; here the meters live in one
``meters_deepards_start_<ts>.npz`` per run.)
"""
import argparse
import glob
import os

import numpy as np


def load_meters(results_dir, start_time=None):
    pattern = (
        "meters_deepards_start_{}.npz".format(start_time)
        if start_time
        else "meters_deepards_start_*.npz"
    )
    paths = sorted(glob.glob(os.path.join(results_dir, pattern)))
    if not paths:
        raise FileNotFoundError(
            "no meter files matching {} in {}".format(pattern, results_dir)
        )
    out = {}
    for p in paths:
        with np.load(p) as z:
            out[os.path.basename(p)] = {k: z[k] for k in z.files}
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-visualize-results")
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("--start-time", default=None)
    parser.add_argument("--metric", default="test_auc",
                        help="meter prefix to plot (e.g. loss, test_auc)")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args(argv)

    runs = load_meters(args.results_dir, args.start_time)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for run_name, meters in runs.items():
        for name, values in sorted(meters.items()):
            if name.startswith(args.metric + "_fold_"):
                ax.plot(values, label="{} {}".format(run_name[:20], name))
    ax.set_xlabel("update")
    ax.set_ylabel(args.metric)
    if ax.lines:
        ax.legend(fontsize=6)
    out = args.output or os.path.join(
        args.results_dir, "visualize_{}.png".format(args.metric)
    )
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print("saved", out)


if __name__ == "__main__":
    main()
