"""Frequency-domain cam study suite (reference: gradcam.py:376-1062)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def fft_dataset(synthetic_cohort):
    from deepards_tpu.data.dataset import ARDSRawDataset

    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2, only_fft=True,
    )
    return ds


@pytest.fixture(scope="module")
def raw_dataset(synthetic_cohort):
    from deepards_tpu.data.dataset import ARDSRawDataset

    return ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )


@pytest.fixture(scope="module")
def fft_model_and_params(fft_dataset):
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork

    model = CNNLinearNetwork(breath_block=densenet18())
    x = jnp.asarray(fft_dataset.cache.data[:2])
    params_by_fold = {}
    for fold in range(2):
        variables = model.init(
            {"params": jax.random.PRNGKey(fold),
             "dropout": jax.random.PRNGKey(fold + 10)},
            x, None, True,
        )
        params_by_fold[fold] = variables["params"]
    return model, params_by_fold


def _factory(model):
    from deepards_tpu.explain.gradcam import UnNormalizedCam

    return lambda params: UnNormalizedCam(model, params)


def test_fft_roundtrip_helpers():
    from deepards_tpu.explain.frequency_analytics import (
        fft_to_ts,
        fft_to_ts_with_mask,
        get_fft,
        splice_frequencies,
    )

    rng = np.random.default_rng(0)
    signal = rng.normal(size=(3, 224))
    fft = np.fft.fftshift(np.fft.fft(signal, axis=-1), axes=-1)
    seq = np.stack([fft.real, fft.imag], axis=1).astype(np.float32)
    assert get_fft(seq).shape == (3, 224)
    recon = fft_to_ts(seq)
    np.testing.assert_allclose(recon.real, signal, atol=1e-3)
    # all-ones mask is identity
    recon2 = fft_to_ts_with_mask(seq, np.ones(224))
    np.testing.assert_allclose(recon2.real, signal, atol=1e-3)
    # splice: masked bins come from src, rest from dst
    src = seq.copy()
    dst = np.zeros_like(seq)
    mask = np.zeros(224, bool)
    mask[:50] = True
    out = splice_frequencies(dst, src, mask)
    np.testing.assert_array_equal(out[:, :, :50], src[:, :, :50])
    assert (out[:, :, 50:] == 0).all()


def test_cam_process_and_representative():
    from deepards_tpu.explain.frequency_analytics import (
        cam_process,
        representative_index,
    )

    cam = np.array([0.0, 2.0, 1.0], np.float64)
    up = cam_process(cam, 224, normalize=True)
    assert up.shape == (224,)
    assert up.min() == 0.0 and up.max() == 1.0
    cams = np.stack([np.zeros(5), np.ones(5), np.full(5, 0.45)])
    assert representative_index(cams) == 2


def test_one_d_analytics_end_to_end(fft_dataset, fft_model_and_params,
                                    tmp_path):
    from deepards_tpu.explain.frequency_analytics import one_d_analytics

    model, params_by_fold = fft_model_and_params
    res = one_d_analytics(
        _factory(model), fft_dataset, params_by_fold,
        str(tmp_path), n_samps=3,
    )
    assert set(res["intensity"].columns) == {
        "Cam Intensity", "Frequency", "Patho",
    }
    assert len(res["intensity"]) > 0
    assert len(res["bands"]) > 0
    for p in res["pngs"]:
        assert os.path.exists(p)


def test_two_d_analytics_end_to_end(fft_dataset, fft_model_and_params,
                                    tmp_path):
    from deepards_tpu.explain.frequency_analytics import two_d_analytics

    model, params_by_fold = fft_model_and_params
    res = two_d_analytics(
        _factory(model), fft_dataset, params_by_fold,
        str(tmp_path), n_samps=2,
    )
    assert len(res["intensity"]) > 0
    assert os.path.exists(res["pngs"][0])


def test_butterworth_analytics_end_to_end(raw_dataset, tmp_path):
    from deepards_tpu.explain.frequency_analytics import (
        butter_plots,
        butterworth_1d_analytics,
    )
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork

    model = CNNLinearNetwork(breath_block=densenet18())
    x = jnp.asarray(raw_dataset.cache.data[:2])
    params_by_fold = {
        f: model.init(
            {"params": jax.random.PRNGKey(f),
             "dropout": jax.random.PRNGKey(f + 5)},
            x, None, True,
        )["params"]
        for f in range(2)
    }
    res = butterworth_1d_analytics(
        _factory(model), raw_dataset, raw_dataset, params_by_fold,
        "smoke", 0, 5, str(tmp_path), n_samps=3,
    )
    assert len(res["intensity"]) > 0
    assert any(k[1] == "mean_cam" for k in res["prototypes"])
    for p in res["pngs"]:
        assert os.path.exists(p)

    # with butter configured, the "filtered" prototype must be the
    # band-limited signal, NOT the same raw median as no_filter (cache
    # rows are raw; the study's filtering happens on device)
    import copy

    butter_ds = copy.copy(raw_dataset)
    butter_ds.butter_low = 0
    butter_ds.butter_high = 5
    res_b = butterworth_1d_analytics(
        _factory(model), butter_ds, raw_dataset, params_by_fold,
        "smoke_b", 0, 5, str(tmp_path / "b"), n_samps=3,
    )
    for patho in (0, 1):
        if (patho, "filtered") in res_b["prototypes"]:
            filt = res_b["prototypes"][(patho, "filtered")]
            raw = res_b["prototypes"][(patho, "no_filter")]
            assert not np.allclose(filt, raw)

    png, signal = butter_plots(
        raw_dataset, 0, "smoke", 0, 5, str(tmp_path)
    )
    assert os.path.exists(png)
    assert signal.shape == (224,)


def test_one_two_d_comparison(raw_dataset, fft_dataset,
                              fft_model_and_params, tmp_path):
    from deepards_tpu.explain.frequency_analytics import one_two_d_comparison
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork

    model_fft, params_fft = fft_model_and_params
    model_raw = CNNLinearNetwork(breath_block=densenet18())
    x = jnp.asarray(raw_dataset.cache.data[:2])
    params_raw = {
        f: model_raw.init(
            {"params": jax.random.PRNGKey(f),
             "dropout": jax.random.PRNGKey(f + 7)},
            x, None, True,
        )["params"]
        for f in range(2)
    }
    pngs = one_two_d_comparison(
        _factory(model_raw), _factory(model_fft), raw_dataset, fft_dataset,
        params_raw, params_fft, str(tmp_path), n_pairs=2,
    )
    assert pngs and all(os.path.exists(p) for p in pngs)
