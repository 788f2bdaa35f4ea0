"""Metrics/results store: meters, patient-level vote aggregation, AUC.

Capability-parity rebuild of the reference metrics layer
(reference: deepards/metrics.py:125-657): append-only meters, the
``DeepARDSResults`` run store with per-patient TP/FP/TN/FN/vote rows,
majority-vote patient predictions, ``pred_frac`` ARDS-vote fraction,
patient-level ROC-AUC, max-AUC "maximals" tables, and predictions-by-hour
frames.  Pure numpy/pandas — this is host-side bookkeeping; the device only
produces the raw per-window predictions.
"""
import os
import pickle
import uuid

import numpy as np
import pandas as pd
from sklearn.metrics import roc_auc_score

PATHOS = {0: "OTHER", 1: "ARDS"}


class Meter:
    """Append-only series with running mean
    (reference: deepards/metrics.py:125-163)."""

    def __init__(self, name):
        self.name = name
        self.values = []

    def update(self, value):
        self.values.append(float(value))

    def peek(self):
        return self.values[-1] if self.values else 0.0

    @property
    def mean(self):
        return float(np.mean(self.values)) if self.values else 0.0

    def __len__(self):
        return len(self.values)

    def __repr__(self):
        return "{}: n={} mean={:.4f}".format(
            self.name, len(self.values), self.mean
        )


class Reporting:
    """Registry of meters persisted under a results dir
    (reference: deepards/metrics.py:166-247)."""

    def __init__(self, results_dir, suffix):
        self.results_dir = results_dir
        self.suffix = suffix
        self.meters = {}

    def does_meter_exist(self, name):
        return name in self.meters

    def new_meter(self, name):
        self.meters[name] = Meter(name)

    def update(self, name, value):
        self.meters[name].update(value)

    def save_all(self):
        os.makedirs(self.results_dir, exist_ok=True)
        arrays = {
            name: np.asarray(m.values, dtype=np.float64)
            for name, m in self.meters.items()
        }
        path = os.path.join(
            self.results_dir, "meters_{}.npz".format(self.suffix)
        )
        np.savez(path, **arrays)
        return path


def confusion_counts(actual, pred, cls):
    """Index-aligned confusion counts.  Like the reference helpers
    (reference: deepards/metrics.py:23-62), predictions indexed by window
    may carry several rows per actual row (per-breath classifiers) — each
    prediction row counts once against its window's label."""
    if isinstance(actual, pd.Series) and isinstance(pred, pd.Series):
        pos = actual[actual == cls]
        neg = actual[actual != cls]
        pos_pred = pred.loc[pred.index.intersection(pos.index)]
        neg_pred = pred.loc[pred.index.intersection(neg.index)]
        tp = int((pos_pred == cls).sum())
        fn = int((pos_pred != cls).sum())
        fp = int((neg_pred == cls).sum())
        tn = int((neg_pred != cls).sum())
        return tp, fp, tn, fn
    actual = np.asarray(actual)
    pred = np.asarray(pred)
    tp = int(((actual == cls) & (pred == cls)).sum())
    fp = int(((actual != cls) & (pred == cls)).sum())
    tn = int(((actual != cls) & (pred != cls)).sum())
    fn = int(((actual == cls) & (pred != cls)).sum())
    return tp, fp, tn, fn


def aggregate_stats(patient_results, fold_num, epoch_num):
    """Patient-level aggregate frame per patho
    (reference: deepards/metrics.py:317-351)."""
    rows = []
    for n, patho in PATHOS.items():
        pr = patient_results
        tps = float(((pr.patho == n) & (pr.prediction == n)).sum())
        tns = float(((pr.patho != n) & (pr.prediction != n)).sum())
        fps = float(((pr.patho != n) & (pr.prediction == n)).sum())
        fns = float(((pr.patho == n) & (pr.prediction != n)).sum())
        accuracy = round((tps + tns) / max(tps + tns + fps + fns, 1), 4)
        sensitivity = round(tps / (tps + fns), 4) if tps + fns else 0
        specificity = round(tns / (tns + fps), 4) if tns + fps else 0
        precision = round(tps / (tps + fps), 4) if tps + fps else 0
        try:
            auc = round(
                roc_auc_score(pr.patho.tolist(), pr.pred_frac.tolist()), 4
            )
        except ValueError:
            auc = np.nan
        f1 = (
            round(2 * precision * sensitivity / (precision + sensitivity), 4)
            if precision + sensitivity
            else 0
        )
        rows.append([
            patho, tps, tns, fps, fns, accuracy, sensitivity, specificity,
            precision, auc, f1, fold_num, epoch_num,
        ])
    return pd.DataFrame(
        rows,
        columns=[
            "patho", "tps", "tns", "fps", "fns", "accuracy", "sensitivity",
            "specificity", "precision", "auc", "f1", "fold_num", "epoch_num",
        ],
    )


class DeepARDSResults:
    """Run store keyed by start_time + uuid
    (reference: deepards/metrics.py:250-657)."""

    def __init__(self, start_time, experiment_name, results_dir="results",
                 **hyperparams):
        cols = ["patient", "patho"]
        for patho in PATHOS.values():
            cols += [
                "{}_tps".format(patho), "{}_fps".format(patho),
                "{}_tns".format(patho), "{}_fns".format(patho),
                "{}_votes".format(patho),
            ]
        cols += ["prediction", "pred_frac", "epoch_num", "fold_num"]
        self.results = pd.DataFrame([], columns=cols)
        self.results_dir = results_dir
        self.reporting = Reporting(
            results_dir, "deepards_start_{}".format(start_time)
        )
        self.hyperparams = dict(hyperparams)
        self.hyperparams["start_time"] = start_time
        self.uuid_name = uuid.uuid4()
        self.experiment_name = experiment_name
        self.all_pred_to_hour = pd.DataFrame(
            [], columns=["pred", "hour", "patient", "y", "epoch", "fold"]
        )

    # -- meters ---------------------------------------------------------------

    def update_meter(self, metric_name, fold_num, val):
        name = "{}_fold_{}".format(metric_name, fold_num)
        if not self.reporting.does_meter_exist(name):
            self.reporting.new_meter(name)
        self.reporting.update(name, val)

    def update_epoch_meter(self, metric_name, epoch_num, val):
        name = "{}_epoch_{}".format(metric_name, epoch_num)
        if not self.reporting.does_meter_exist(name):
            self.reporting.new_meter(name)
        self.reporting.update(name, val)

    def get_meter(self, metric_name, fold_num):
        name = "{}_fold_{}".format(metric_name, fold_num)
        if not self.reporting.does_meter_exist(name):
            self.reporting.new_meter(name)
        return self.reporting.meters[name]

    def update_loss(self, fold_num, loss):
        self.update_meter("loss", fold_num, loss)

    def update_accuracy(self, fold_num, accuracy):
        self.update_meter("test_accuracy", fold_num, accuracy)

    def update_r2(self, fold_num, r2):
        self.update_meter("test_r2", fold_num, r2)

    # -- patient predictions --------------------------------------------------

    def perform_patient_predictions(self, y_test, predictions, fold_num,
                                    epoch_num, verbose=True):
        """Vote aggregation: per-patient confusion counts and majority vote
        (reference: deepards/metrics.py:572-626).

        y_test: DataFrame(patient, y[, hour]) indexed by absolute window
        index; predictions: Series of per-window class predictions with the
        same index.
        """
        for pt in y_test.patient.unique():
            pt_rows = y_test[y_test.patient == pt]
            patho_n = int(pt_rows.y.unique()[0])
            pt_actual = pt_rows.y
            pt_pred = predictions.loc[pt_rows.index]

            row = [pt, patho_n]
            votes = {}
            for n in PATHOS:
                tp, fp, tn, fn = confusion_counts(pt_actual, pt_pred, n)
                votes[n] = int((np.asarray(pt_pred) == n).sum())
                row += [tp, fp, tn, fn, votes[n]]
            total = sum(votes.values())
            pred_frac = votes[1] / total if total else 0.0
            patho_pred = int(max(votes, key=lambda k: votes[k]))
            row += [patho_pred, pred_frac, epoch_num, fold_num]
            self.results.loc[len(self.results)] = row

        chunk = self.results[
            self.results.patient.isin(y_test.patient.unique())
            & (self.results.epoch_num == epoch_num)
            & (self.results.fold_num == fold_num)
        ]
        stats = aggregate_stats(chunk, fold_num, epoch_num)
        self.update_meter("test_auc", fold_num, stats.iloc[0].auc)
        for patho in PATHOS.values():
            prow = stats[stats.patho == patho].iloc[0]
            suffix = patho.lower()
            self.update_meter(
                "test_prec_{}".format(suffix), fold_num, prow.precision
            )
            self.update_meter(
                "test_sen_{}".format(suffix), fold_num, prow.sensitivity
            )
            self.update_meter("test_f1_{}".format(suffix), fold_num, prow.f1)
        self.update_meter(
            "test_patient_accuracy",
            fold_num,
            stats[stats.patho == "ARDS"].iloc[0].accuracy,
        )
        if verbose:
            self.print_results_report(stats)
            self.print_misclassified(chunk)
        return stats

    def print_results_report(self, stats):
        print("---- Patient-level stats ----")
        cols = ["patho", "accuracy", "sensitivity", "precision", "auc", "f1",
                "fold_num", "epoch_num"]
        print(stats[cols].to_string(index=False))

    def print_misclassified(self, chunk):
        bad = chunk[chunk.patho != chunk.prediction]
        print("Misclassified Patients")
        cols = ["patient", "patho", "prediction"] + [
            "{}_votes".format(p) for p in PATHOS.values()
        ]
        print(bad[cols].to_string(index=False))

    # -- aggregation ----------------------------------------------------------

    def aggregate_classification_results(self, verbose=True):
        """(reference: deepards/metrics.py:275-294)"""
        frames = []
        for fold_num in self.results.fold_num.unique():
            for epoch_num in self.results.epoch_num.unique():
                sub = self.results[
                    (self.results.epoch_num == epoch_num)
                    & (self.results.fold_num == fold_num)
                ]
                if len(sub):
                    frames.append(aggregate_stats(sub, fold_num, epoch_num))
        agg = pd.concat(frames, ignore_index=True) if frames else None
        if agg is None:
            return None
        if verbose:
            self.print_results_report(agg)
        os.makedirs(self.results_dir, exist_ok=True)
        self.results.to_pickle(os.path.join(
            self.results_dir, "{}_patient_results.pkl".format(self.uuid_name)
        ))
        agg.to_pickle(os.path.join(
            self.results_dir,
            "{}_aggregate_results.pkl".format(self.uuid_name),
        ))
        self.save_maximals(
            os.path.join(
                self.results_dir,
                "{}_maximal_results.pkl".format(self.uuid_name),
            ),
            agg,
            verbose,
        )
        return agg

    def save_maximals(self, output_filename, aggregate, verbose=True):
        """Per-fold rows at the max-AUC epoch
        (reference: deepards/metrics.py:296-315)."""
        maximals = []
        for fold_num in aggregate.fold_num.unique():
            fold_stats = aggregate[aggregate.fold_num == fold_num]
            if fold_stats.auc.notna().any():
                max_auc_idx = fold_stats.auc.idxmax()
            else:
                # degenerate fold (single-class test set -> AUC undefined):
                # fall back to the last epoch rather than crashing
                max_auc_idx = fold_stats.index[-1]
            epoch_max = aggregate.loc[max_auc_idx].epoch_num
            maximals.append(fold_stats[fold_stats.epoch_num == epoch_max])
        maximals = pd.concat(maximals, ignore_index=True)
        maximals.to_pickle(output_filename)
        if verbose:
            print("---- Max Stats ----")
            self.print_results_report(maximals)
        return maximals

    # -- predictions by hour --------------------------------------------------

    def save_predictions_by_hour(self, y_test, predictions, seq_hours,
                                 epoch_num, fold_num):
        """(reference: deepards/metrics.py:633-656).  seq_hours: mapping
        absolute index -> per-subsequence hour array."""
        frame = predictions.to_frame(name="pred")
        hours = []
        for idx in frame.index:
            hrs = np.atleast_1d(np.asarray(seq_hours[idx]))
            hours.append(float(hrs[0]))
        frame["hour"] = hours
        frame = frame.merge(
            y_test.drop(columns=["hour"], errors="ignore"),
            left_index=True, right_index=True,
        )
        self.pred_to_hour_frame = frame
        tmp = frame.copy()
        tmp["epoch"] = epoch_num
        tmp["fold"] = fold_num
        self.all_pred_to_hour = pd.concat(
            [self.all_pred_to_hour, tmp], ignore_index=True
        )

    # -- persistence ----------------------------------------------------------

    def save_all(self):
        """(reference: deepards/metrics.py:628-631)"""
        os.makedirs(self.results_dir, exist_ok=True)
        self.reporting.save_all()
        name = self.experiment_name or str(self.uuid_name)
        with open(
            os.path.join(
                self.results_dir, "{}_{}.pkl".format(name, self.uuid_name)
            ),
            "wb",
        ) as f:
            pickle.dump(self.hyperparams, f)
        with open(
            os.path.join(
                self.results_dir,
                "{}_results_{}.pkl".format(name, self.uuid_name),
            ),
            "wb",
        ) as f:
            pickle.dump(
                {
                    "results": self.results,
                    "all_pred_to_hour": self.all_pred_to_hour,
                    "hyperparams": self.hyperparams,
                    "meters": {
                        k: list(m.values)
                        for k, m in self.reporting.meters.items()
                    },
                },
                f,
            )
