"""Disease-evolution and DTW visualization of test predictions.

Capability parity with the reference's plotting layer
(reference: deepards/metrics.py:396-570): expand window predictions to
per-breath hours, per-patient hourly ARDS-vote bar plots, optional DTW
overlay, and the tiled TP/TN/FP/FN grid.
"""
import os
from math import ceil, sqrt

import numpy as np
import pandas as pd


def _get_plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def process_pred_to_hour_for_dtw(pred_to_hour_frame, dataset):
    """Ensure a timestamp per-breath by repeating window-level predictions
    over the sub-batch axis (reference: metrics.py:396-423)."""
    frame = pred_to_hour_frame.copy()
    repeat_n = dataset.cache.data.shape[1]
    expanded = frame.loc[frame.index.repeat(repeat_n)].copy()
    hours = []
    for idx in frame.index:
        hrs = np.asarray(dataset.cache.hours[int(idx)], np.float64)
        hrs = np.resize(hrs, repeat_n)
        hours.extend(hrs.tolist())
    expanded["hour"] = hours
    return expanded


def perform_dtw_preprocessing(results, test_dataset, cache_dir="dtw_cache"):
    """Build (and cache) per-patient rolling DTW frames aligned with the
    final predictions (reference: metrics.py:425-450)."""
    from deepards_tpu.dtw.lib import analyze_patient

    preds_by_hour = process_pred_to_hour_for_dtw(
        results.pred_to_hour_frame, test_dataset
    )
    frames = {}
    for pt in preds_by_hour.patient.unique():
        frames[pt] = analyze_patient(
            pt, test_dataset, cache_dir, preds_by_hour
        )
    return frames


def plot_disease_evolution(pt_rows, ax=None, legend=True, fontsize=10,
                           xylabel=True, xy_visible=True):
    """Hourly ARDS-vote fraction bars for one patient
    (reference: metrics.py:452-480 style)."""
    plt = _get_plt()
    if ax is None:
        ax = plt.gca()
    hours = pt_rows.hour.to_numpy()
    preds = pt_rows.pred.to_numpy()
    bins = np.arange(0, 25)
    fracs = []
    for h0 in bins[:-1]:
        sel = preds[(hours >= h0) & (hours < h0 + 1)]
        fracs.append(sel.mean() if len(sel) else np.nan)
    colors = [
        "C1" if (not np.isnan(f) and f >= 0.5) else "C0" for f in fracs
    ]
    ax.bar(bins[:-1], [0 if np.isnan(f) else f for f in fracs],
           width=0.9, color=colors)
    ax.set_ylim(0, 1)
    if xylabel:
        ax.set_xlabel("hour", fontsize=fontsize)
        ax.set_ylabel("ARDS vote frac", fontsize=fontsize)
    if not xy_visible:
        ax.set_xticks([])
        ax.set_yticks([])
    if legend:
        ax.axhline(0.5, color="k", ls="--", lw=0.5)
    return ax


def perform_hourly_patient_plot(results, out_dir="prediction_plots",
                                dtw_frames=None):
    """One hourly plot per patient, optional DTW overlay
    (reference: metrics.py:482-540)."""
    plt = _get_plt()
    os.makedirs(out_dir, exist_ok=True)
    frame = results.pred_to_hour_frame
    outputs = []
    for pt, rows in frame.groupby("patient"):
        fig, ax = plt.subplots(figsize=(7, 3))
        plot_disease_evolution(rows, ax=ax)
        if dtw_frames and pt in dtw_frames and len(dtw_frames[pt]):
            dtw = dtw_frames[pt].dropna().sort_values("hour")
            ax2 = ax.twinx()
            ax2.plot(dtw.hour, dtw.dtw, "g-", alpha=0.6, lw=0.8)
            ax2.set_ylabel("DTW", color="g")
        y = int(rows.y.iloc[0])
        ax.set_title("patient {} ({})".format(
            pt, "ARDS" if y else "OTHER"
        ))
        path = os.path.join(out_dir, "{}.png".format(pt))
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        outputs.append(path)
    return outputs


def plot_tiled_disease_evol(results, test_dataset=None, out_path=None,
                            dtw_frames=None):
    """Tiled grid of per-patient evolutions grouped TP/TN/FP/FN
    (reference: metrics.py:543-570)."""
    plt = _get_plt()
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    frame = results.pred_to_hour_frame
    latest = results.results[
        results.results.epoch_num == results.results.epoch_num.max()
    ]
    groups = {
        "TP": latest[(latest.patho == 1) & (latest.prediction == 1)],
        "TN": latest[(latest.patho == 0) & (latest.prediction == 0)],
        "FP": latest[(latest.patho == 0) & (latest.prediction == 1)],
        "FN": latest[(latest.patho == 1) & (latest.prediction == 0)],
    }
    figs = []
    for title, rows in groups.items():
        pts = rows.patient.unique()
        if not len(pts):
            continue
        layout = int(ceil(sqrt(len(pts))))
        fig = plt.figure(figsize=(2.2 * layout, 2.0 * layout))
        fig.suptitle(title)
        for i, pt in enumerate(pts):
            ax = fig.add_subplot(layout, layout, i + 1)
            pt_rows = frame[frame.patient == pt]
            plot_disease_evolution(
                pt_rows, ax=ax, legend=False, fontsize=6, xylabel=False,
                xy_visible=False,
            )
            ax.set_title(str(pt), fontsize=6)
        if out_path:
            path = "{}_{}.png".format(os.path.splitext(out_path)[0], title)
            fig.savefig(path, dpi=120, bbox_inches="tight")
            figs.append(path)
        plt.close(fig)
    return figs
