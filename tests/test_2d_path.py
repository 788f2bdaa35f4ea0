"""2D image dataset + backbone + detection tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepards_tpu.data.dataset import ARDSRawDataset
from deepards_tpu.data.img_dataset import ImgARDSDataset

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


@pytest.fixture(scope="module")
def raw_ds(synthetic_cohort):
    return ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=4, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )


@pytest.fixture(scope="module")
def img_ds(raw_ds):
    return ImgARDSDataset(raw_ds)


def test_image_assembly(img_ds):
    assert img_ds.images.ndim == 4
    assert img_ds.images.shape[1:] == (1, 224, 224)
    assert len(img_ds.images) >= len(img_ds.patients)
    # rows content: first row of first image equals first window's first seq
    first = img_ds.images[0, 0, 0]
    assert np.abs(first).sum() > 0


def test_image_scaling_and_gather(img_ds):
    img_ds.set_kfold_indexes_for_fold(0)
    batch = img_ds.gather(img_ds.current_indices()[:2])
    assert batch["data"].shape[1:] == (1, 224, 224)
    # normalized scale
    assert abs(float(batch["data"].mean())) < 1.0


def test_image_fft_channels(raw_ds):
    ds = ImgARDSDataset(raw_ds, add_fft=True)
    assert ds.images.shape[1] == 3  # vwd + real + imag


def test_bbox_dataset(raw_ds):
    ds = ImgARDSDataset(raw_ds, bbox=True)
    assert ds.bbox_targets is not None
    boxes = ds.bbox_targets["boxes"]
    labels = ds.bbox_targets["labels"]
    assert boxes.shape[1:] == (3, 4)
    assert labels.shape[1:] == (3,)
    # middle band label differs from outer bands
    assert (labels[:, 1] != labels[:, 0]).all()
    # mixed images differ from originals inside the band
    i = 0
    y1, y2 = int(boxes[i, 1, 1]), int(boxes[i, 1, 3])
    assert not np.allclose(
        ds.mixed_images[i, :, y1:y2], ds.images[i, :, y1:y2]
    )


def test_patho_mix_dataset(raw_ds):
    ds = ImgARDSDataset(raw_ds, same_patho_mix=True)
    assert ds.mixed_images is not None


def test_2d_transforms_apply():
    from deepards_tpu.data.img_transforms import two_dim_transforms

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 32, 32)).astype(np.float32)
    for name, cls in two_dim_transforms.items():
        t = cls(p=1.0)
        out = t(x, np.random.default_rng(1))
        assert out.shape == x.shape, name
        assert not np.allclose(out, x) or name == "win_slice", name


def test_densenet2d_forward():
    from deepards_tpu.models.densenet2d import (
        CNNLinearNetwork2D,
        densenet18_2d,
        densenet18_2x1d,
    )

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 1, 64, 64)), jnp.float32
    )
    for ctor in (densenet18_2d, densenet18_2x1d):
        bb = ctor()
        model = CNNLinearNetwork2D(breath_block=bb)
        variables = model.init(RNGS, x, None, True)
        out = model.apply(variables, x, None, True)
        assert out.shape == (2, 2), ctor.__name__


def test_row_band_detector():
    from deepards_tpu.models.densenet2d import densenet18_2d
    from deepards_tpu.models.detection2d import (
        RowBandDetector,
        detection_loss,
        extract_bands,
        row_labels_from_boxes,
    )

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 1, 224, 224)), jnp.float32
    )
    model = RowBandDetector(breath_block=densenet18_2d())
    variables = model.init(RNGS, x, None, True)
    logits = model.apply(variables, x, None, True)
    assert logits.shape == (2, 224, 2)

    boxes = np.array([
        [[0, 0, 224, 60], [0, 60, 224, 120], [0, 120, 224, 224]],
        [[0, 0, 224, 100], [0, 100, 224, 150], [0, 150, 224, 224]],
    ], np.float32)
    labels = np.array([[0, 1, 0], [1, 0, 1]])
    targets = row_labels_from_boxes(boxes, labels)
    assert targets.shape == (2, 224, 2)
    loss = detection_loss(logits, jnp.asarray(targets))
    assert np.isfinite(float(loss))

    bands = extract_bands(logits, threshold=0.0)
    assert len(bands) == 2
    assert all(len(b) >= 1 for b in bands)


def test_protopnet2d_forward():
    from deepards_tpu.models.densenet2d import densenet18_2d
    from deepards_tpu.models.protopnet2d import construct_ppnet_2d

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 1, 64, 64)), jnp.float32
    )
    model = construct_ppnet_2d(densenet18_2d(), n_prototypes=2)
    variables = model.init(RNGS, x, None, True)
    logits, min_d = model.apply(variables, x, None, True)
    assert logits.shape == (2, 2)
    assert min_d.shape == (2, 4)


def test_cnn_linear_2d_e2e(synthetic_cohort, tmp_path):
    from deepards_tpu.config import Configuration
    from deepards_tpu.train.loop import make_trainer

    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="cnn_linear_2d",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        only_fold=0,
        epochs=1,
        batch_size=4,
        compute_dtype="float32",
        results_dir=str(tmp_path),
    ))
    trainer = make_trainer(conf, verbose=False)
    results = trainer.train_and_test()
    assert len(results.get_meter("loss", 0)) > 0
    assert len(results.get_meter("test_auc", 0)) == 1


def test_detector_trainer_e2e(synthetic_cohort, tmp_path):
    from deepards_tpu.config import Configuration
    from deepards_tpu.train.loop import make_trainer
    from deepards_tpu.train.detector_trainer import DetectorTrainer

    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="retinanet_2d",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        only_fold=0,
        epochs=1,
        batch_size=4,
        compute_dtype="float32",
        results_dir=str(tmp_path),
    ))
    trainer = make_trainer(conf, verbose=False)
    assert isinstance(trainer, DetectorTrainer)
    results = trainer.train_and_test()
    assert len(results.get_meter("loss", 0)) > 0
    iou = results.get_meter("band_iou", 0)
    assert len(iou) == 1
    assert 0.0 <= iou.values[0] <= 1.0


def test_nested_trainer_e2e(synthetic_cohort, tmp_path):
    from deepards_tpu.config import Configuration
    from deepards_tpu.train.loop import make_trainer
    from deepards_tpu.train.nested_trainer import NestedTrainer

    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="cnn_to_nested_lstm",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        only_fold=0,
        epochs=1,
        batch_size=1,
        compute_dtype="float32",
        results_dir=str(tmp_path),
    ))
    trainer = make_trainer(conf, verbose=False)
    assert isinstance(trainer, NestedTrainer)
    results = trainer.train_and_test()
    assert len(results.get_meter("loss", 0)) > 0
    assert len(results.get_meter("test_auc", 0)) == 1
