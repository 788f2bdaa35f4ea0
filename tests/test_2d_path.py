"""2D image dataset + backbone + detection tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepards_tpu.data.dataset import ARDSRawDataset
from deepards_tpu.data.img_dataset import ImgARDSDataset

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow

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

    # pad-row exclusion: a fixed-shape eval batch with zero-pad images
    # masked out must report the SAME loss as the real rows alone
    pad_logits = jnp.concatenate([logits, jnp.zeros_like(logits)])
    pad_targets = jnp.concatenate(
        [jnp.asarray(targets), jnp.zeros_like(jnp.asarray(targets))]
    )
    weights = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    masked = detection_loss(pad_logits, pad_targets, weights=weights)
    np.testing.assert_allclose(float(masked), float(loss), rtol=1e-6)


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


def test_protopnet2d_push_unflatten():
    """push flat_pos must unflatten row-major to the (H', W') cell whose
    distance is the true grid min (reference: protopnet2d/push.py
    flat-index bookkeeping)."""
    from deepards_tpu.models.densenet2d import densenet18_2d
    from deepards_tpu.models.protopnet2d import construct_ppnet_2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 1, 64, 64)), jnp.float32)
    model = construct_ppnet_2d(densenet18_2d(), n_prototypes=2)
    variables = model.init(RNGS, x, None, True)

    feats, dists = model.apply(
        variables, x, None, True, method=model.push_forward,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    feats = np.asarray(feats)  # (N, H', W', C)
    dists = np.asarray(dists)  # (N, H'*W', P)
    n, hp, wp, c = feats.shape
    assert dists.shape[1] == hp * wp

    for p in range(dists.shape[-1]):
        # global (row, flat_pos) argmin as the push loop computes it
        row, flat_pos = np.unravel_index(
            dists[:, :, p].argmin(), dists[:, :, p].shape
        )
        h, w = divmod(int(flat_pos), wp)
        # the flat distance must equal the grid distance recomputed from
        # the unflattened (h, w) patch
        patch = feats[row, h, w]  # (C,)
        proto = np.asarray(
            variables["params"]["prototype_vectors"]
        )[p]
        d_manual = max(((patch - proto) ** 2).sum(), 0.0)
        np.testing.assert_allclose(
            dists[row, flat_pos, p], d_manual, rtol=1e-4, atol=1e-4
        )
        # and the flattened feats used by the push gather must agree
        fb = feats.reshape(n, hp * wp, c)
        np.testing.assert_array_equal(fb[row, flat_pos], patch)


@pytest.mark.slow
def test_protopnet2d_e2e(synthetic_cohort, tmp_path):
    """End-to-end ProtoPNet-2D: warm + joint + push on the synthetic
    cohort's image dataset (reference: protopnet2d/model.py + push.py)."""
    from deepards_tpu.config import Configuration
    from deepards_tpu.train.loop import make_trainer

    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="protopnet_2d",
        base_network="densenet18_2d",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        only_fold=0,
        epochs=3,
        batch_size=4,
        n_warm_epochs=1,
        push_start_epoch=2,
        push_every_n=2,
        n_push_iters=1,
        n_prototypes=2,
        compute_dtype="float32",
        results_dir=str(tmp_path),
    ))
    trainer = make_trainer(conf, verbose=False)
    results = trainer.train_and_test()
    assert len(results.get_meter("cls_loss", 0)) > 0
    assert hasattr(trainer, "last_push_info")
    assert any(info is not None for info in trainer.last_push_info)


def test_extract_bands_recovers_spliced_boxes(raw_ds):
    """extract_bands must reproduce the bbox dataset's spliced band rows:
    rasterize the dataset's true boxes to row logits, then recover boxes
    that exactly match the splice chunks (reference: dataset.py:1776-1825
    box structure [0, y1, 224, y2] + labels)."""
    from deepards_tpu.models.detection2d import (
        extract_bands,
        row_labels_from_boxes,
    )

    ds = ImgARDSDataset(raw_ds, bbox=True)
    boxes = ds.bbox_targets["boxes"][:4]
    labels = ds.bbox_targets["labels"][:4]
    targets = row_labels_from_boxes(boxes, labels)  # (N, 224, 2)
    # confident logits: +8 for the true class, -8 for the other
    logits = 16.0 * targets - 8.0
    recovered = extract_bands(logits, threshold=0.5)
    for i in range(len(boxes)):
        # merge the dataset's zero-height edge chunks (row_start can be
        # such that chunk 1 or 3 is empty)
        true = [
            (int(y1), int(y2), int(lab))
            for (x1, y1, x2, y2), lab in zip(boxes[i], labels[i])
            if int(y2) > int(y1)
        ]
        got = [
            (int(b[1]), int(b[3]), lab) for b, lab, score in recovered[i]
        ]
        assert got == true, "image {}: {} != {}".format(i, got, true)


def test_detector_variant_registrations():
    """All three reference detection variants resolve to detector specs
    (reference: train_ards_detector.py:118)."""
    from deepards_tpu.models.registry import get_network_spec

    for name in ("retinanet_2d", "retinanet_2x1d", "faster_rcnn_2d"):
        spec = get_network_spec(name)
        assert spec.kind == "detector"
        assert spec.two_dim
