"""Readers for the reference's LEGACY result artifacts
(reference: deepards/results.py — ModelCollection/ModelResults/
PatientResults, and the ``{time}_patient_results.pkl`` DataFrame pickles
its mean_metrics.py consumes at :64/:148/:218).

Two legacy formats exist on disk in old experiment dirs:

1. ``model_collection_results_*.pkl`` — a pickled ModelCollection OBJECT
   (results.py:433-440).  Loaded through a stub unpickler (the reference
   package is not importable here) and flattened to the canonical
   patient-results DataFrame.
2. ``{start_time}_patient_results.pkl`` — a plain pandas DataFrame with
   the legacy columns [patient_id, other_votes, ards_votes, frac_votes,
   majority_prediction, fold_idx, model_idx, ground_truth].

Both convert into the new store's schema (eval/metrics.py) so mean
metrics / visualize tooling can consume decade-old runs unchanged, and
the legacy aggregate statistics (count_predictions + calc_results,
results.py:113-243) are re-derivable for cross-checking old papers.
"""
import pickle

import numpy as np
import pandas as pd

LEGACY_COLUMNS = [
    "patient_id", "other_votes", "ards_votes", "frac_votes",
    "majority_prediction", "fold_idx", "model_idx", "ground_truth",
]


def load_model_collection(path):
    """Unpickle a reference ModelCollection object without the reference
    package and return the flattened legacy patient-results DataFrame
    (reference: results.py:151-183)."""

    class _Stub(object):
        def __init__(self, *a, **k):
            pass

    class _ShimUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("deepards"):
                return type(name, (_Stub,), {})
            return super().find_class(module, name)

    with open(path, "rb") as f:
        obj = _ShimUnpickler(f).load()

    rows = []
    for model in obj.__dict__.get("models", []):
        md = model.__dict__
        for pr in md.get("all_patient_results", []):
            p = pr.__dict__
            total = p["other_votes"] + p["ards_votes"]
            rows.append([
                p["patient_id"], p["other_votes"], p["ards_votes"],
                p["ards_votes"] / float(total) if total else np.nan,
                p["majority_prediction"], p["fold_idx"], p["model_idx"],
                p["ground_truth"],
            ])
    return pd.DataFrame(rows, columns=LEGACY_COLUMNS)


def load_legacy_patient_results(path):
    """Load a ``{time}_patient_results.pkl`` DataFrame pickle; both the
    legacy schema and the new store's schema are accepted (the new
    store's pickles pass through converted)."""
    df = pd.read_pickle(path)
    if "patient_id" in df.columns:
        return df[
            [c for c in LEGACY_COLUMNS if c in df.columns]
        ].reset_index(drop=True)
    # new-store frame -> legacy view
    return new_store_to_legacy(df)


def new_store_to_legacy(df):
    """Project the new store's per-(patient, epoch, fold) rows
    (eval/metrics.py DeepARDSResults.results) onto the legacy columns."""
    out = pd.DataFrame({
        "patient_id": df["patient"],
        "other_votes": df["other_votes"],
        "ards_votes": df["ards_votes"],
        "frac_votes": df["pred_frac"],
        "majority_prediction": df["prediction"],
        "fold_idx": df["fold_num"],
        "model_idx": df.get(
            "epoch_num", pd.Series(np.zeros(len(df)))
        ),
        "ground_truth": df["patho"],
    })
    return out.reset_index(drop=True)


def legacy_to_new_store(df):
    """Lift a legacy frame into the new store's schema so
    cli/mean_metrics + visualize tooling consume old runs unchanged."""
    gt = df["ground_truth"].astype(int)
    pred = df["majority_prediction"].astype(int)
    out = pd.DataFrame({
        "patient": df["patient_id"],
        "patho": gt,
        "other_votes": df["other_votes"],
        "ards_votes": df["ards_votes"],
        "prediction": pred,
        "pred_frac": df["frac_votes"],
        "epoch_num": df["model_idx"].astype(int),
        "fold_num": df["fold_idx"].astype(int),
    })
    for patho_int, patho in ((0, "other"), (1, "ards")):
        hit = pred == patho_int
        truth = gt == patho_int
        out["{}_tps".format(patho)] = (hit & truth).astype(int)
        out["{}_fps".format(patho)] = (hit & ~truth).astype(int)
        out["{}_tns".format(patho)] = (~hit & ~truth).astype(int)
        out["{}_fns".format(patho)] = (~hit & truth).astype(int)
    return out


def count_predictions(patient_results, threshold):
    """Per-patho tp/tn/fp/fn counts at a vote-fraction threshold — exact
    legacy semantics (reference: results.py:113-149, including >=/<
    threshold orientation per pathophysiology)."""
    rows = {}
    for patho_int, patho in ((0, "other"), (1, "ards")):
        if patho_int == 0:
            eq = patient_results.frac_votes < threshold
        else:
            eq = patient_results.frac_votes >= threshold
        gt_eq = patient_results.ground_truth == patho_int
        rows["{}_tps_{}".format(patho, threshold)] = int((eq & gt_eq).sum())
        rows["{}_tns_{}".format(patho, threshold)] = int(
            (~eq & ~gt_eq).sum()
        )
        rows["{}_fps_{}".format(patho, threshold)] = int(
            (eq & ~gt_eq).sum()
        )
        rows["{}_fns_{}".format(patho, threshold)] = int(
            (~eq & gt_eq).sum()
        )
    return rows


def calc_aggregate_stats(patient_results, threshold=0.5):
    """Legacy aggregate results table (reference: results.py:204-243):
    per-patho acc/recall/spec/prec/npv (+ binomial CIs) from per-model
    confusion counts, and the mean across-model patient-vote AUC."""
    from sklearn.metrics import auc, roc_curve

    if threshold > 1:
        threshold = threshold / 100.0
    per_model = []
    for _, model_pts in patient_results.groupby("model_idx"):
        per_model.append(count_predictions(model_pts, threshold))
    counts = pd.DataFrame(per_model)

    aucs = []
    for _, model_pts in patient_results.groupby("model_idx"):
        if model_pts.ground_truth.nunique() < 2:
            continue
        fpr, tpr, _ = roc_curve(
            model_pts.ground_truth, model_pts.frac_votes, pos_label=1
        )
        aucs.append(auc(fpr, tpr))
    uniq_pts = patient_results.patient_id.nunique()
    mean_auc = round(float(np.mean(aucs)), 3) if aucs else np.nan
    auc_ci = (
        round(float(1.96 * np.sqrt(mean_auc * (1 - mean_auc) / uniq_pts)), 3)
        if aucs else np.nan
    )

    stats_rows = []
    for patho in ("other", "ards"):
        tps = counts["{}_tps_{}".format(patho, threshold)]
        tns = counts["{}_tns_{}".format(patho, threshold)]
        fps = counts["{}_fps_{}".format(patho, threshold)]
        fns = counts["{}_fns_{}".format(patho, threshold)]
        stats = pd.concat([
            (tns + tps) / (tns + tps + fns + fps),
            tps / (tps + fns),
            tns / (tns + fps),
            tps / (fps + tps),
            tns / (tns + fns),
        ], axis=1)
        means = stats.mean().round(3)
        cis = (1.96 * np.sqrt(means * (1 - means) / uniq_pts)).round(3)
        stats_rows.append([
            patho, means.iloc[0], means.iloc[1], means.iloc[2],
            means.iloc[3], means.iloc[4],
            round(mean_auc, 2) if aucs else np.nan,
            cis.iloc[0], cis.iloc[1], cis.iloc[2], cis.iloc[3], cis.iloc[4],
            auc_ci,
        ])
    return pd.DataFrame(stats_rows, columns=[
        "patho", "acc", "recall", "spec", "prec", "npv", "auc",
        "acc_ci", "recall_ci", "spec_ci", "prec_ci", "npv_ci", "auc_ci",
    ])
