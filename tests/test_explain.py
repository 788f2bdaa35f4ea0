"""GradCAM + prototype explainability on tiny models."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


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
