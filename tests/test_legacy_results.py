"""Legacy results.py artifact compatibility
(reference: deepards/results.py + mean_metrics.py consumers)."""
import pickle

import numpy as np
import pandas as pd
import pytest


def _legacy_class(name):
    cls = type(name, (object,), {})
    cls.__module__ = "deepards.results"
    return cls


PatientResults = _legacy_class("PatientResults")
ModelResults = _legacy_class("ModelResults")
ModelCollection = _legacy_class("ModelCollection")

# pickle verifies classes resolve through their recorded module at dump
# time: register a fake deepards.results module carrying the stand-ins.
# Registered PER TEST (other test modules also shim "deepards" in
# sys.modules and tear it down, so module-level registration is racy).
import sys  # noqa: E402
import types  # noqa: E402


@pytest.fixture(autouse=True)
def _fake_deepards_modules(monkeypatch):
    pkg = types.ModuleType("deepards")
    mod = types.ModuleType("deepards.results")
    for cls in (PatientResults, ModelResults, ModelCollection):
        setattr(mod, cls.__name__, cls)
    pkg.results = mod
    monkeypatch.setitem(sys.modules, "deepards", pkg)
    monkeypatch.setitem(sys.modules, "deepards.results", mod)


def _make_collection():
    """Build an object graph shaped like the reference's ModelCollection
    (results.py:23-163) and values with known statistics."""
    coll = ModelCollection()
    coll.models = []
    coll.model_results = {"folds": {}, "aggregate": None}
    coll.model_idx = 2
    coll.experiment_name = "legacy_exp"
    specs = [
        # (model_idx, fold_idx, [(pt, other, ards, gt)])
        (0, 0, [("a", 8, 2, 0), ("b", 1, 9, 1)]),
        (1, 1, [("c", 7, 3, 0), ("d", 2, 8, 1)]),
    ]
    for model_idx, fold_idx, pts in specs:
        m = ModelResults()
        m.fold_idx = fold_idx
        m.model_idx = model_idx
        m.all_patient_results = []
        for pt, other, ards, gt in pts:
            p = PatientResults()
            p.patient_id = pt
            p.other_votes = other
            p.ards_votes = ards
            p.ground_truth = gt
            p.majority_prediction = 1 if ards >= other else 0
            p.fold_idx = fold_idx
            p.model_idx = model_idx
            p.hourly_preds = {i: [np.nan, np.nan] for i in range(24)}
            m.all_patient_results.append(p)
        coll.models.append(m)
    return coll


def test_load_model_collection(tmp_path):
    from deepards_tpu.eval.legacy_results import (
        LEGACY_COLUMNS,
        load_model_collection,
    )

    path = str(tmp_path / "model_collection_results_legacy_exp.pkl")
    with open(path, "wb") as f:
        pickle.dump(_make_collection(), f)

    df = load_model_collection(path)
    assert list(df.columns) == LEGACY_COLUMNS
    assert len(df) == 4
    a = df[df.patient_id == "a"].iloc[0]
    assert a.other_votes == 8 and a.ards_votes == 2
    np.testing.assert_allclose(a.frac_votes, 0.2)
    assert a.majority_prediction == 0 and a.ground_truth == 0


def test_calc_aggregate_stats_exact(tmp_path):
    from deepards_tpu.eval.legacy_results import (
        calc_aggregate_stats,
        load_model_collection,
    )

    path = str(tmp_path / "mc.pkl")
    with open(path, "wb") as f:
        pickle.dump(_make_collection(), f)
    df = load_model_collection(path)
    stats = calc_aggregate_stats(df, threshold=0.5)
    # every patient is classified correctly at thresh 0.5 -> acc 1.0,
    # per-model AUC 1.0 (frac separates classes perfectly)
    assert set(stats.patho) == {"other", "ards"}
    assert (stats.acc == 1.0).all()
    assert (stats.recall == 1.0).all()
    assert (stats.auc == 1.0).all()


def test_store_schema_round_trip():
    from deepards_tpu.eval.legacy_results import (
        legacy_to_new_store,
        new_store_to_legacy,
    )

    legacy = pd.DataFrame({
        "patient_id": ["a", "b"],
        "other_votes": [8, 1],
        "ards_votes": [2, 9],
        "frac_votes": [0.2, 0.9],
        "majority_prediction": [0, 1],
        "fold_idx": [0, 0],
        "model_idx": [0, 0],
        "ground_truth": [0, 1],
    })
    new = legacy_to_new_store(legacy)
    assert (new["other_tps"] == [1, 0]).all()
    assert (new["ards_tps"] == [0, 1]).all()
    back = new_store_to_legacy(new)
    pd.testing.assert_frame_equal(
        back[["patient_id", "other_votes", "ards_votes", "frac_votes"]],
        legacy[["patient_id", "other_votes", "ards_votes", "frac_votes"]],
        check_dtype=False,
    )


def test_legacy_patient_results_pickle(tmp_path):
    from deepards_tpu.eval.legacy_results import load_legacy_patient_results

    legacy = pd.DataFrame({
        "patient_id": ["a"], "other_votes": [3], "ards_votes": [7],
        "frac_votes": [0.7], "majority_prediction": [1],
        "fold_idx": [0], "model_idx": [0], "ground_truth": [1],
    })
    p = str(tmp_path / "123_patient_results.pkl")
    legacy.to_pickle(p)
    df = load_legacy_patient_results(p)
    assert df.iloc[0].frac_votes == pytest.approx(0.7)
