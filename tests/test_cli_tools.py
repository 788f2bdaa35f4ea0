"""CLI tool integration: evaluate-ensemble, predict, mean-metrics,
visualize, anonymize."""
import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml

from deepards_tpu.config import Configuration
from deepards_tpu.train.loop import make_trainer

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained_run(synthetic_cohort, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_run")
    saved = str(tmp / "saved_models")
    cache = str(tmp / "cache.npz")
    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="cnn_linear",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        epochs=1,
        batch_size=8,
        compute_dtype="float32",
        results_dir=str(tmp),
        save_model="model-run-0",
        save_model_per_epoch=True,
        saved_models_dir=saved,
        train_to_pickle=cache,
        seed=11,
    ))
    trainer = make_trainer(conf, verbose=False)
    trainer.train_and_test()
    return {"tmp": tmp, "saved": saved, "cache": cache, "conf": conf}


def test_evaluate_ensemble_cli(trained_run, monkeypatch):
    from deepards_tpu.cli.evaluate import main

    ckpts = sorted(os.listdir(trained_run["saved"]))
    per_fold = {
        f: [c for c in ckpts
            if c.endswith("fold{}".format(f)) and "epoch" in c]
        for f in (0, 1)
    }
    assert all(per_fold.values())
    eval_yml = trained_run["tmp"] / "eval.yml"
    eval_yml.write_text(yaml.dump({
        "network": "cnn_linear",
        "base_network": "densenet18",
        "dataset_type": "unpadded_centered_sequences",
        "batch_size": 8,
        "n_sub_batches": 4,
        "kfolds": 2,
        "compute_dtype": "float32",
        "results_dir": str(trained_run["tmp"] / "eval_results"),
        "train_from_pickle": trained_run["cache"],
        "models": per_fold,
    }))
    monkeypatch.chdir(trained_run["tmp"])
    main(["-co", str(eval_yml), "--saved-models-dir", trained_run["saved"]])


def test_predict_cli(trained_run, monkeypatch, synthetic_cohort):
    from deepards_tpu.cli.predict import predict

    ckpt = os.path.join(
        trained_run["saved"],
        [c for c in os.listdir(trained_run["saved"])
         if c.endswith("fold0") and "epoch" in c][0],
    )
    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="cnn_linear",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        only_fold=0,
        batch_size=8,
        compute_dtype="float32",
        seed=11,
    ))
    frame, votes = predict(conf, ckpt, batch_size=8)
    assert {"patient", "prob_ards", "prediction"} <= set(frame.columns)
    assert (frame.prob_ards + frame.prob_other).round(3).eq(1.0).all()
    assert len(votes) == frame.patient.nunique()
    assert votes.pred_frac.between(0, 1).all()


def test_patient_gradcam_cli(trained_run, tmp_path):
    """Full --ops surface entry point
    (reference: patient_gradcam.py:378-437)."""
    from deepards_tpu.cli.patient_gradcam import main

    ckpt = os.path.join(
        trained_run["saved"],
        [c for c in os.listdir(trained_run["saved"])
         if c.endswith("fold0") and "epoch" in c][0],
    )
    out = str(tmp_path / "gc")
    main([
        ckpt, "-pdp", trained_run["cache"], "--fold", "0",
        "--ops", "medians", "--results-base-dir", out,
        "--network", "cnn_linear", "--base-network", "densenet18",
    ])
    files = [f for _, _, fs in os.walk(out) for f in fs]
    assert files
    # dtw_clust restricted to one patient exercises the DTW kernel path
    from deepards_tpu.data.dataset import ARDSRawDataset

    ds = ARDSRawDataset.from_pickle(trained_run["cache"])
    ds = ARDSRawDataset.make_test_dataset_if_kfold(ds)
    ds.set_kfold_indexes_for_fold(0)
    pt = str(ds.get_ground_truth_df().patient.iloc[0])
    main([
        ckpt, "-pdp", trained_run["cache"], "--fold", "0",
        "--ops", "dtw_clust", "--results-base-dir", out,
        "--only-patient", pt,
    ])
    clust = [
        f for _, _, fs in os.walk(os.path.join(out, "dtw_clustering"))
        for f in fs
    ]
    assert any(f == "elbow.npz" for f in clust)


def test_mean_metrics_cli(trained_run, capsys):
    from deepards_tpu.cli.mean_metrics import main

    files = [
        str(trained_run["tmp"] / f)
        for f in os.listdir(trained_run["tmp"])
        if f.endswith("_patient_results.pkl")
    ]
    assert files
    out = main(files)
    assert {"fold", "max_epoch", "AUC"} <= set(out.columns)


def test_visualize_results_cli(trained_run, tmp_path):
    from deepards_tpu.cli.visualize_results import main

    out = str(tmp_path / "auc.png")
    main(["--results-dir", str(trained_run["tmp"]),
          "--metric", "test_auc", "-o", out])
    assert os.path.exists(out)


def test_anonymize_cohort_cli(tmp_path):
    from deepards_tpu.cli.anonymize_cohort import anonymize_cohort

    cohort = tmp_path / "cohort.csv"
    pd.DataFrame({
        "Patient Unique Identifier": ["0001RPI001", "0002RPI002"],
        "Pathophysiology": ["ARDS", "COPD"],
        "Date when Berlin criteria first met (m/dd/yyy)":
            ["2017-01-01 05:00:00", ""],
        "vent_start_time": ["2017-01-01 00:00:00", "2017-01-02 00:00:00"],
    }).to_csv(cohort, index=False)
    shifts = tmp_path / "shifts.csv"
    pd.DataFrame({
        "patient_id": ["0001RPI001", "0002RPI002"],
        "new_patient_id": [1, 2],
        "shift_hours": [5, -3],
    }).to_csv(shifts, index=False)
    out = anonymize_cohort(str(shifts), str(cohort),
                           str(tmp_path / "anon.csv"))
    anon = pd.read_csv(out)
    assert list(anon["Patient Unique Identifier"]) == [1, 2]
    # +5h shift applied
    assert anon.iloc[0]["vent_start_time"] == "2017-01-01 05:00:00"


def test_run_experiments_dry_run(capsys):
    from deepards_tpu.cli.run_experiments import main

    main(["expA.yml", "-n", "3", "--device-assignment", "0+1",
          "--dry-run"])
    out = capsys.readouterr().out
    assert out.count("run:") == 3
    assert "(device 0)" in out and "(device 1)" in out


def test_run_experiments_grid_sweep(capsys):
    """--grid reproduces the reference's shell-loop parameter sweeps
    (reference: scripts/exploratory/run_transformer_experiments.sh)."""
    from deepards_tpu.cli.run_experiments import main

    main([
        "exp.yml", "-n", "1", "--dry-run",
        "--grid", "base-network=resnet18,densenet18", "batch-size=16,32",
    ])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("run:")]
    assert len(lines) == 4
    assert any("--base-network resnet18 --batch-size 32" in l
               for l in lines)
    assert any("exp-densenet18-16-run0" in l for l in lines)


def test_dataset_figs_cli(synthetic_cohort, tmp_path):
    """main_graph-style window/filter figures
    (reference: aim2_dl_v_rf_compr/main_graph_code.py)."""
    from deepards_tpu.cli.dataset_figs import generate_all
    from deepards_tpu.data.dataset import ARDSRawDataset

    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    written = generate_all(ds, str(tmp_path), n_examples=2)
    # 2 window figs + 5 butter + 3 fft + 2 downsample
    assert len(written) == 12
    for path in written:
        assert os.path.exists(path) and os.path.getsize(path) > 0


def test_dl_vs_rf_pt_diffs():
    """Cross-model misprediction drill-down
    (reference: aim2_dl_v_rf_compr/dl_rf_pt_diffs.py)."""
    from deepards_tpu.cli.dl_vs_rf import pt_diffs

    def dl_frame(preds):
        return pd.DataFrame({
            "patient": list(preds),
            "patho": [1, 1, 0, 0],
            "prediction": list(preds.values()),
            "epoch_num": 9,
            "fold_num": 0,
        })

    # 3 DL runs: ptA always right, ptB wrong once, ptC always wrong,
    # ptD always right
    runs = [
        dl_frame({"A": 1, "B": 1, "C": 1, "D": 0}),
        dl_frame({"A": 1, "B": 0, "C": 1, "D": 0}),
        dl_frame({"A": 1, "B": 1, "C": 1, "D": 0}),
    ]
    rf = pd.DataFrame({
        "patient": ["A", "B", "C", "D"],
        "patho": [1, 1, 0, 0],
        "prediction": [0, 0, 1, 0],  # RF misses A, B, C
    })
    out = pt_diffs(runs, rf)
    # DL fixes A (0 mispreds) and B (1 misprediction < majority 1.5);
    # C is wrong in every DL run too
    assert set(out["improved_pts"]) == {"A", "B"}
    assert "C" in out["common_mispreds"]
    assert out["regressed_pts"] == []


def test_serve_inference(trained_run):
    """HTTP inference server: health + predict with patient votes
    (deploy-serving surface; reference analogue: build/Dockerfile
    eval-only runs)."""
    import json
    import threading
    import urllib.request

    from deepards_tpu.cli.serve import InferenceEngine, serve

    ckpt = os.path.join(
        trained_run["saved"],
        [c for c in os.listdir(trained_run["saved"])
         if c.endswith("fold0") and "epoch" in c][0],
    )
    engine = InferenceEngine(ckpt, n_sub_batches=4, batch_size=4)
    engine.warm()
    server = serve(engine, port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        base = "http://127.0.0.1:{}".format(port)
        health = json.load(urllib.request.urlopen(base + "/health"))
        assert health["status"] == "ok"
        assert health["network"] == "cnn_linear"

        data = np.random.default_rng(0).normal(
            size=(3, 4, 1, 224)).tolist()
        req = urllib.request.Request(
            base + "/predict",
            data=json.dumps(
                {"data": data, "patients": ["a", "a", "b"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        resp = json.load(urllib.request.urlopen(req))
        assert len(resp["predictions"]) == 3
        totals = np.asarray(resp["prob_other"]) + np.asarray(
            resp["prob_ards"])
        np.testing.assert_allclose(totals, 1.0, atol=1e-5)
        votes = resp["patient_votes"]
        assert set(votes) == {"a", "b"}
        assert votes["a"]["n_windows"] == 2
        assert votes["b"]["prediction"] in (0, 1)

        # serving BN is per-sequence (pad-immune): the same window must
        # score identically alone (padded with zeros to the warm batch)
        # and inside a larger request (ADVICE round-3 high #2)
        assert engine.bn_scope == "sequence"
        one = engine.predict(np.asarray(data, np.float32)[0])
        np.testing.assert_allclose(
            one[0],
            np.asarray([resp["prob_other"][0], resp["prob_ards"][0]]),
            atol=1e-5,
        )

        # the trained checkpoint carries its fold scaling sidecar so
        # main() can normalize without the dataset pickle
        from deepards_tpu.train.checkpoint import load_scaling
        sc = load_scaling(ckpt)
        assert sc is not None
        mu, std = sc
        assert np.all(np.asarray(std) > 0)

        # malformed request -> 400 with an error payload, not a crash
        bad = urllib.request.Request(
            base + "/predict", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.load(e)
    finally:
        server.shutdown()


def test_save_per_epoch_without_save_model_errors():
    """The reference raises when --save-model-per-epoch is given without
    --save-model (train_ards_detector.py:1587); silently dropping the
    per-epoch saves would lose checkpoints the user asked for."""
    import pytest

    from deepards_tpu.cli.train import main

    with pytest.raises(SystemExit, match="--save-model"):
        main(["--save-model-per-epoch", "-dp", "/nonexistent"])
