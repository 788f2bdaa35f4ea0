"""GradCAM + prototype explainability on tiny models."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cnn_linear_fitted():
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork

    model = CNNLinearNetwork(breath_block=densenet18())
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 2, 1, 224)), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, True,
    )
    return model, variables["params"]


def test_gradcam_maxmin(cnn_linear_fitted):
    from deepards_tpu.explain.gradcam import MaxMinNormCam

    model, params = cnn_linear_fitted
    cam_gen = MaxMinNormCam(model, params)
    window = np.random.default_rng(1).normal(size=(2, 1, 224)).astype(
        np.float32
    )
    cam, out = cam_gen.generate_cam(window, target=1)
    assert cam.shape == (7,)  # densenet18 feature length
    assert cam.dtype == np.uint8
    assert out.shape == (1, 2)
    cams, out = cam_gen.generate_read_cam(window, target=1)
    assert cams.shape == (2, 7)


def test_gradcam_fractotal_and_unnormalized(cnn_linear_fitted):
    from deepards_tpu.explain.gradcam import FracTotalNormCam, UnNormalizedCam

    model, params = cnn_linear_fitted
    window = np.random.default_rng(2).normal(size=(2, 1, 224)).astype(
        np.float32
    )
    frac = FracTotalNormCam(model, params)
    cams, _ = frac.generate_read_cam(window, target=0)
    assert cams.shape == (2, 7)
    un = UnNormalizedCam(model, params)
    cam, _ = un.generate_cam(window)
    assert cam.shape == (7,)
    assert (cam >= 0).all()


def test_cam_upsample():
    from deepards_tpu.explain.gradcam import upsample_cam

    cam = np.arange(7, dtype=np.float32)
    up = upsample_cam(cam, 224)
    assert up.shape == (224,)
    assert up[0] <= up[-1]


def test_patient_gradcam_ops(cnn_linear_fitted, synthetic_cohort, tmp_path):
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.patient_gradcam import PatientGradCam

    model, params = cnn_linear_fitted
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    pgc = PatientGradCam(model, params, ds, results_dir=str(tmp_path))
    pgc.do_medians()
    out = [
        f for root, _, files in os.walk(str(tmp_path)) for f in files
    ]
    assert len(out) >= 2  # one per patient, png or npz


def test_patient_gradcam_rand_sample(cnn_linear_fitted, synthetic_cohort,
                                     tmp_path):
    """Random stratified sample panes in both grouping modes
    (reference: patient_gradcam.py:293-306)."""
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.patient_gradcam import PatientGradCam

    model, params = cnn_linear_fitted
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    pgc = PatientGradCam(model, params, ds, results_dir=str(tmp_path))
    rng = np.random.default_rng(7)
    pgc.do_rand_sample(randomize_groups=False, rng=rng, panes_per_group=1)
    pgc.do_rand_sample(randomize_groups=True, rng=rng, panes_per_group=1)
    non_random = os.path.join(str(tmp_path), "rand_sample", "non_random")
    randomized = os.path.join(str(tmp_path), "rand_sample", "randomized")
    nr = sorted(os.listdir(non_random))
    rr = sorted(os.listdir(randomized))
    # one pane per patho group + a txt record each
    assert sum(f.endswith(".txt") for f in nr) == 2
    assert sum(f.endswith(".txt") for f in rr) == 2
    assert any(f.startswith("ards-sample") for f in nr)
    assert any(f.startswith("non_ards-sample") for f in nr)
    assert all(f.startswith("random-sample") for f in rr)
    # the txt record has 16 entries of (n, patho, sequence_idx, breath_idx)
    txt = [f for f in nr if f.endswith(".txt")][0]
    with open(os.path.join(non_random, txt)) as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0] == "n, patho, sequence_idx, breath_idx"
    assert len(lines) == 17
    gt = ds.get_ground_truth_df()
    for line in lines[1:]:
        _, patho, seq_idx, br_idx = [s.strip() for s in line.split(",")]
        assert patho in ("ards", "non_ards")
        assert int(seq_idx) in gt.index
        assert 0 <= int(br_idx) < 2


def test_patient_gradcam_cam_by_hour(cnn_linear_fitted, synthetic_cohort,
                                     tmp_path):
    """Per-hour cam sampling saves one pickle per (window, breath)
    (reference: patient_gradcam.py:138-159)."""
    import pandas as pd

    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.patient_gradcam import PatientGradCam

    model, params = cnn_linear_fitted
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    pgc = PatientGradCam(model, params, ds, results_dir=str(tmp_path))
    pgc.do_cam_by_hour(hour_start=0, hour_end=24, n_sequences_per_hour=1)
    root = os.path.join(str(tmp_path), "hour_sequences")
    pkls = [
        os.path.join(r, f)
        for r, _, files in os.walk(root) for f in files
        if f.endswith(".pkl")
    ]
    # 1 window per patient x 2 breaths each
    n_patients = pgc.gt.patient.nunique()
    assert len(pkls) == 2 * n_patients
    payload = pd.read_pickle(pkls[0])
    assert payload["breath"].shape == (224,)
    assert payload["cam"].shape == (224,)
    assert payload["model_output"].shape == (1, 2)
    assert payload["target"] in (0, 1)
    # layout: hour_sequences/<patho>/<patient>/<hour_start>/seq-*.pkl
    rel = os.path.relpath(pkls[0], root).split(os.sep)
    assert rel[0] in ("ards", "non_ards")
    assert rel[2] == "0"


def test_patient_gradcam_dtw_clust(cnn_linear_fitted, synthetic_cohort,
                                   tmp_path):
    """Cam-active span extraction -> batched DTW matrix -> KMedoids
    elbow (reference: patient_gradcam.py:308-362)."""
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.patient_gradcam import PatientGradCam

    model, params = cnn_linear_fitted
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    pgc = PatientGradCam(model, params, ds, results_dir=str(tmp_path))
    # restrict to one patient to keep the pairwise matrix small
    one_pt = pgc.gt.patient.iloc[0]
    pgc.gt = pgc.gt[pgc.gt.patient == one_pt]
    results = pgc.do_dtw_clust(sequence_thresh=0.9, seq_min_len=20)
    assert len(results) == 1
    (pt, target), res = next(iter(results.items()))
    assert pt == str(one_pt)
    n = res["n_sequences"]
    D = res["distance_matrix"]
    assert D.shape == (n, n)
    # symmetric with a zero diagonal
    np.testing.assert_allclose(D, D.T)
    assert np.all(np.diag(D) == 0)
    if n >= 2:
        assert len(res["distortions"]) == len(res["clusters"]) > 0
        d = np.asarray(res["distortions"])
        assert np.all(np.isfinite(d)) and np.all(d >= 0)
        # the elbow must trend down overall (local optima may wiggle)
        assert d[-1] <= d[0] + 1e-6
        out_dir = os.path.join(
            str(tmp_path), "dtw_clustering",
            "ards" if target == 1 else "non_ards", str(pt),
        )
        assert os.path.exists(os.path.join(out_dir, "elbow.npz"))


def test_patient_gradcam_targets_and_plot_grads(cnn_linear_fitted,
                                                synthetic_cohort,
                                                tmp_path):
    """Target-mode semantics (reference: patient_gradcam.py:46-54) and
    the grad-norm histogram (reference: patient_gradcam.py:365-375)."""
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.gradcam import MaxMinNormCam
    from deepards_tpu.explain.patient_gradcam import PatientGradCam

    model, params = cnn_linear_fitted
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    pgc = PatientGradCam(model, params, ds, results_dir=str(tmp_path),
                         target="both")
    assert pgc.get_target(0) == [0, 1]
    pgc.target = "ards"
    assert pgc.get_target(0) == [1]
    pgc.target = "other"
    assert pgc.get_target(1) == [0]
    pgc.target = 1
    assert pgc.get_target(0) == [1]

    def recording_cam(m, p):
        return MaxMinNormCam(m, p, record_grads=True)

    pgc2 = PatientGradCam(model, params, ds, results_dir=str(tmp_path),
                          cam_cls=recording_cam)
    pgc2.do_medians()
    png = str(tmp_path / "grads.png")
    ards, other = pgc2.plot_grads(out_path=png)
    assert len(ards) + len(other) == pgc2.gt.patient.nunique()
    assert np.all(np.concatenate([ards, other]) >= 0)


def test_patient_gradcam_cam_active_spans():
    """Span slicing: contiguous cam>=thresh runs of >= min_len samples
    become waveform subsequences (the documented intent of the
    reference's pandas groupby, patient_gradcam.py:328-340)."""
    from deepards_tpu.explain.patient_gradcam import PatientGradCam

    cam = np.zeros((1, 224), np.float32)
    cam[0, 10:30] = 255.0   # 20-sample active run
    cam[0, 50:53] = 255.0   # too short (3 < 5)
    cam[0, 200:224] = 230.0  # above 0.8*255=204 -> active, 24 samples
    br = np.arange(224, dtype=np.float32)[None]
    pgc = object.__new__(PatientGradCam)  # _cam_active_spans is pure
    spans = pgc._cam_active_spans(cam, br, sequence_thresh=0.8,
                                  seq_min_len=5)
    assert len(spans) == 2
    np.testing.assert_array_equal(spans[0], np.arange(10, 30))
    np.testing.assert_array_equal(spans[1], np.arange(200, 224))


def test_protopnet_analysis(synthetic_cohort, tmp_path):
    """Prototype-feature classifier probe, topk viz, random pane
    (reference: protopnet_analysis.py:26-184)."""
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.prototypes import ProtoPNetAnalysis
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.protopnet1d import construct_ppnet

    train = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    train.set_kfold_indexes_for_fold(0)
    test = ARDSRawDataset.make_test_dataset_if_kfold(train)
    test.set_kfold_indexes_for_fold(0)
    model = construct_ppnet(densenet18(), sub_batch_size=2, n_prototypes=2)
    x = jnp.asarray(train.cache.data[:2])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, True,
    )["params"]

    # batch_size spans the whole split: BN uses batch statistics
    # (reference parity), so the probe-vs-model check below must see the
    # same batch composition
    an = ProtoPNetAnalysis(model, params, train, test,
                           batch_size=len(test.current_indices()))
    S, P = 2, model.num_prototypes
    assert an.train_features.shape == (len(train.current_indices()), S * P)
    assert an.test_features.shape == (len(test.current_indices()), S * P)
    # feature naming: window-major "prototype {breath},{proto}"
    assert an.feature_names[0] == "prototype 0,0"
    assert an.feature_names[P] == "prototype 1,0"
    np.testing.assert_allclose(an.test_preds.sum(axis=1), 1.0, atol=1e-5)

    # the transplanted-linear probe IS the model head (bias-free Dense):
    # probe softmax must equal the model's own softmax on the same batch
    # of PIPELINE-NORMALIZED inputs (the scale training uses — the
    # analysis must never feed raw cache rows, ADVICE round-3)
    from deepards_tpu.data.pipeline import gather_pipeline

    idxs = test.current_indices()
    logits, _ = model.apply(
        {"params": params},
        jnp.asarray(gather_pipeline(test)(test.cache.data[idxs])),
        None, True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    want = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(an.test_preds, want, atol=1e-4)

    # topk viz returns a valid (window, breath, proto) triple
    idx, breath_n, proto_n = an.plot_random_proto_from_linear_with_topk(
        "ards", "ards", topk=4, rng=np.random.default_rng(5))
    assert idx in test.get_ground_truth_df().index
    assert 0 <= breath_n < S and 0 <= proto_n < P

    # random-sequence pane + record
    base = an.make_random_sequence_pane(
        str(tmp_path / "pane"), rng=np.random.default_rng(6))
    with open(base + ".txt") as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0] == "n, patho, gt_idx, breath_n, proto_n"
    assert len(lines) == 17


def test_prototype_viz_and_shap(synthetic_cohort, tmp_path):
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.prototypes import (
        PrototypeVisualizer,
        prototype_activation_frame,
        prototype_shap_values,
    )
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.protopnet1d import construct_ppnet

    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    model = construct_ppnet(densenet18(), sub_batch_size=2, n_prototypes=2)
    x = jnp.asarray(ds.cache.data[:2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, True,
    )
    params = variables["params"]

    viz = PrototypeVisualizer(model, ds, results_dir=str(tmp_path))
    push_info = [
        {"window_index": 0, "flat_pos": 3, "distance": 1.0},
        None,
        {"window_index": 1, "flat_pos": 9, "distance": 2.0},
        None,
    ]
    outputs = viz.viz_prototypes(push_info, epoch_num=1)
    assert len(outputs) == 2
    assert all(0 <= o["rf_lo"] < o["rf_hi"] <= 224 for o in outputs)

    frame = prototype_activation_frame(model, params, ds, batch_size=8)
    assert "proto_0" in frame.columns
    assert len(frame) == len(ds.current_indices())

    shap, base = prototype_shap_values(model, params, ds, batch_size=8)
    assert shap.shape[1] == model.num_prototypes
    # linear-model exactness: shap values sum to logit deviation from base
    assert np.isfinite(base)


def test_cam_analytics(cnn_linear_fitted, synthetic_cohort, tmp_path):
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.cam_analytics import (
        cluster_prototypes,
        collect_cams,
        frequency_band_analytics,
        kmean_clust_search,
        pca_2d,
        viz_pca_clustering,
    )
    from deepards_tpu.explain.gradcam import MaxMinNormCam

    model, params = cnn_linear_fitted
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    cam_gen = MaxMinNormCam(model, params)
    X, seq_map, pathos = collect_cams(cam_gen, ds, max_windows=16)
    assert X.shape == (16, 7)

    distortions, inertias, sil, best_k, gap_frame = kmean_clust_search(
        X, max_clusts=5
    )
    assert len(distortions) == 3
    assert 2 <= best_k < 5
    assert {"clusterCount", "gap"} <= set(gap_frame.columns)

    coords = pca_2d(X)
    assert coords.shape == (16, 2)
    out = viz_pca_clustering(X, str(tmp_path / "pca.png"), max_k=4)
    assert out

    protos = cluster_prototypes(X, 2, ds, seq_map)
    assert len(protos) == 2
    assert all(p["sequence"].shape == ds.cache.data[0].shape
               for p in protos)

    bands = frequency_band_analytics({
        0: X[pathos == 0], 1: X[pathos == 1]
    })
    assert len(bands) == 2
    assert (bands[["0-2Hz", "2-8Hz", "8-25Hz"]].to_numpy() >= 0).all()


def test_gradcam_batched_matches_loop(cnn_linear_fitted):
    """The one-dispatch batched cam API must reproduce the per-sequence
    loop exactly."""
    from deepards_tpu.explain.gradcam import MaxMinNormCam, UnNormalizedCam

    model, params = cnn_linear_fitted
    xs = np.random.default_rng(5).normal(size=(3, 2, 1, 224)).astype(
        np.float32
    )
    for cls in (MaxMinNormCam, UnNormalizedCam):
        gen = cls(model, params)
        batch_cams, batch_out = gen.generate_read_cams_batch(
            xs, np.array([1, 0, 1])
        )
        for i, t in enumerate((1, 0, 1)):
            cam, out = gen.generate_read_cam(xs[i], t)
            # uint8 cams may differ by 1 count at rounding boundaries
            np.testing.assert_allclose(
                np.asarray(batch_cams[i], np.float64),
                np.asarray(cam, np.float64), atol=1.0,
                err_msg="{} seq {}".format(cls.__name__, i),
            )
            np.testing.assert_allclose(
                np.asarray(batch_out[i]).ravel(),
                np.asarray(out).ravel(), atol=1e-4,
            )
