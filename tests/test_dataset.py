import numpy as np
import pandas as pd
import pytest

from deepards_tpu.data.dataset import ARDSRawDataset


@pytest.fixture(scope="module")
def kfold_dataset(synthetic_cohort):
    return ARDSRawDataset(
        synthetic_cohort["data_path"],
        1,
        synthetic_cohort["cohort_file"],
        n_sub_batches=4,
        dataset_type="unpadded_centered_sequences",
        kfold_num=0,
        total_kfolds=4,
    )


def test_build_kfold_dataset(kfold_dataset):
    ds = kfold_dataset
    assert ds.cache.data.shape[1:] == (4, 1, 224)
    assert len(ds.cache.patients) == 8
    # one-hot targets
    assert set(ds.cache.target.argmax(axis=1)) == {0, 1}
    # each window's rows nonzero
    assert np.abs(ds.cache.data).sum() > 0


def test_kfold_patient_disjoint(kfold_dataset):
    ds = kfold_dataset
    splits = ds.kfold_patient_splits
    assert len(splits) == 4
    for k, split in splits.items():
        assert not set(split["train"]) & set(split["test"])
        # stratified: each side has both classes
        patho = {
            p: ds.cache.target[ds.cache.patient_idx == ds.cache.patients.index(p)][0].argmax()
            for p in split["train"]
        }
        assert set(patho.values()) == {0, 1}


def test_kfold_indices_translate(kfold_dataset):
    ds = kfold_dataset
    ds.set_kfold_indexes_for_fold(1)
    idx = ds.current_indices()
    pts = set(np.array([ds.cache.patients[i] for i in ds.cache.patient_idx])[idx])
    assert pts == set(ds.kfold_patient_splits[1]["train"])


def test_test_dataset_shares_scaling(kfold_dataset):
    ds = kfold_dataset
    ds.set_kfold_indexes_for_fold(0)
    test = ARDSRawDataset.make_test_dataset_if_kfold(ds)
    assert test.train is False
    for k in range(4):
        np.testing.assert_array_equal(
            test.scaling_factors[k][0], ds.scaling_factors[k][0]
        )
    test.set_kfold_indexes_for_fold(0)
    test_pts = set(
        np.array([ds.cache.patients[i] for i in ds.cache.patient_idx])[
            test.current_indices()
        ]
    )
    assert test_pts == set(ds.kfold_patient_splits[0]["test"])
    # no overlap with train indices
    assert not set(test.current_indices()) & set(ds.current_indices())


def test_scaling_factors_match_manual(kfold_dataset):
    ds = kfold_dataset
    idx = ds.get_kfold_indexes_for_fold(2, train=True)
    mu, std = ds.scaling_factors[2]
    obs = ds.cache.data[idx]
    np.testing.assert_allclose(mu[0], obs.mean(), rtol=1e-4)
    np.testing.assert_allclose(std[0], obs.std(), rtol=1e-4)


def test_oversample_minority(synthetic_cohort):
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"],
        1,
        synthetic_cohort["cohort_file"],
        n_sub_batches=4,
        dataset_type="unpadded_centered_sequences",
        kfold_num=0,
        total_kfolds=4,
        oversample_minority=True,
    )
    y = ds.cache.target[ds.current_indices()].argmax(axis=1)
    counts = np.bincount(y)
    assert counts[0] == counts[1]


def test_ground_truth_df(kfold_dataset):
    ds = kfold_dataset
    ds.set_kfold_indexes_for_fold(0)
    gt = ds.get_ground_truth_df()
    assert list(gt.columns) == ["patient", "y", "hour"]
    assert len(gt) == len(ds.current_indices())
    assert (gt.index == ds.current_indices()).all()


def test_npz_roundtrip(kfold_dataset, tmp_path):
    ds = kfold_dataset
    path = ds.save(str(tmp_path / "cache.npz"))
    loaded = ARDSRawDataset.from_pickle(path)
    np.testing.assert_array_equal(loaded.cache.data, ds.cache.data)
    np.testing.assert_array_equal(loaded.cache.target, ds.cache.target)
    assert loaded.cache.patients == ds.cache.patients
    assert loaded.total_kfolds == ds.total_kfolds
    assert loaded.dataset_type == ds.dataset_type
    # scaling rederived identically
    np.testing.assert_allclose(
        loaded.scaling_factors[0][0], ds.scaling_factors[0][0], rtol=1e-5
    )


def test_reference_pickle_shim(tmp_path):
    """Craft a pickle shaped like the reference's whole-object dataset
    pickle (module deepards.dataset, all_sequences list of numpy rows)."""
    import pickle
    import sys
    import types

    mod = types.ModuleType("deepards")
    dmod = types.ModuleType("deepards.dataset")

    FakeARDSRawDataset = type("ARDSRawDataset", (object,), {})
    FakeARDSRawDataset.__module__ = "deepards.dataset"
    dmod.ARDSRawDataset = FakeARDSRawDataset
    mod.dataset = dmod
    sys.modules["deepards"] = mod
    sys.modules["deepards.dataset"] = dmod
    try:
        obj = FakeARDSRawDataset()
        rng = np.random.default_rng(0)
        obj.all_sequences = [
            [
                str(pt),
                rng.normal(size=(4, 1, 224)).astype(np.float32),
                np.eye(2)[pt % 2].astype(np.float32),
                [0.5 * i for i in range(4)],
            ]
            for pt in range(1, 5)
            for i in range(3)
        ]
        obj.dataset_type = "unpadded_centered_sequences"
        obj.total_kfolds = 2
        obj.kfold_num = 0
        obj.experiment_num = 1
        p = tmp_path / "ref.pkl"
        with open(str(p), "wb") as f:
            pickle.dump(obj, f)
    finally:
        del sys.modules["deepards"]
        del sys.modules["deepards.dataset"]

    ds = ARDSRawDataset.from_pickle(str(p))
    assert ds.cache.data.shape == (12, 4, 1, 224)
    assert ds.total_kfolds == 2
    assert len(ds.cache.patients) == 4
    ds.set_kfold_indexes_for_fold(0)
    assert len(ds.current_indices()) > 0


def test_holdout_dataset(synthetic_cohort):
    train = ARDSRawDataset(
        synthetic_cohort["data_path"],
        1,
        synthetic_cohort["cohort_file"],
        n_sub_batches=4,
        dataset_type="padded_breath_by_breath",
        kfold_num=None,
        total_kfolds=None,
        holdout_set_type="main",
        train=True,
    )
    assert train.scaling_factors[None][0].shape == (1,)
    assert len(train) == len(train.cache)


def test_fractional_patients(synthetic_cohort):
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"],
        1,
        synthetic_cohort["cohort_file"],
        n_sub_batches=4,
        dataset_type="unpadded_centered_sequences",
        kfold_num=0,
        total_kfolds=2,
        train_patient_fraction=0.5,
    )
    pts = set(
        np.array([ds.cache.patients[i] for i in ds.cache.patient_idx])[
            ds.current_indices()
        ]
    )
    all_train = set(ds.kfold_patient_splits[0]["train"])
    assert pts < all_train
