"""Checkpoint parity across trainer modes (VERDICT round-3 ask #2).

The reference saves per-epoch/final models for EVERY network type
(reference: deepards/train_ards_detector.py:355-374) and reloads them
with --load-checkpoint (:467-469).  These tests pin save +
reload-and-continue for the four modes that previously dropped
--save-model silently: stateful LSTM, nested, detector, parallel-folds.
"""
import os

import numpy as np
import pytest

from deepards_tpu.config import Configuration
from deepards_tpu.train.loop import make_trainer

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow


def _conf(synthetic_cohort, tmp, **over):
    base = dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="cnn_linear",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        only_fold=0,
        epochs=1,
        batch_size=4,
        compute_dtype="float32",
        results_dir=str(tmp),
        seed=3,
    )
    base.update(over)
    return Configuration(overrides=base)


def _ckpt_paths(saved):
    return sorted(
        os.path.join(saved, c) for c in os.listdir(saved)
        if not c.endswith(".json")
    )


def test_stateful_lstm_checkpoint_save_reload_continue(
        synthetic_cohort, tmp_path):
    saved = str(tmp_path / "models")
    # no_test_after_epochs rides on the SAME run as the save assertions:
    # a third trainer just for it would pay the stateful LSTM scan
    # compiles a third time (this is the suite's slowest test)
    conf = _conf(
        synthetic_cohort, tmp_path,
        network="cnn_lstm", dataset_type="padded_breath_by_breath",
        unshuffled=True, save_model="sm", save_model_per_epoch=True,
        saved_models_dir=saved, epochs=2, no_test_after_epochs=True,
    )
    trainer = make_trainer(conf, verbose=False)
    results = trainer.train_and_test()
    # no_test_after_epochs: only the last epoch evaluates
    assert len(results.get_meter("test_auc", 0)) == 1
    ckpts = _ckpt_paths(saved)
    # per-epoch + final
    assert any("epoch1" in c for c in ckpts)
    assert any("epoch2" in c for c in ckpts)
    final = [c for c in ckpts if "epoch" not in c]
    assert final
    # fold scaling sidecar rides along
    assert os.path.exists(final[0] + ".scaling.json")

    # reload-and-continue: one more epoch from the final checkpoint
    conf2 = _conf(
        synthetic_cohort, tmp_path / "r2",
        network="cnn_lstm", dataset_type="padded_breath_by_breath",
        unshuffled=True, load_checkpoint=final[0], epochs=1,
    )
    trainer2 = make_trainer(conf2, verbose=False)
    results2 = trainer2.train_and_test()
    assert len(results2.get_meter("test_auc", 0)) == 1


def test_nested_checkpoint_save_reload_continue(synthetic_cohort, tmp_path):
    saved = str(tmp_path / "models")
    conf = _conf(
        synthetic_cohort, tmp_path,
        network="cnn_to_nested_lstm", batch_size=1,
        save_model="nm", save_model_per_epoch=True,
        saved_models_dir=saved,
    )
    trainer = make_trainer(conf, verbose=False)
    trainer.train_and_test()
    ckpts = _ckpt_paths(saved)
    assert any("epoch1" in c for c in ckpts)
    final = [c for c in ckpts if "epoch" not in c]
    assert final

    conf2 = _conf(
        synthetic_cohort, tmp_path / "r2",
        network="cnn_to_nested_lstm", batch_size=1,
        load_checkpoint=final[0], no_train=True,
    )
    trainer2 = make_trainer(conf2, verbose=False)
    results2 = trainer2.train_and_test()
    assert len(results2.get_meter("loss", 0)) == 0
    assert len(results2.get_meter("test_auc", 0)) == 1


def test_detector_checkpoint_and_heldout_iou(synthetic_cohort, tmp_path):
    saved = str(tmp_path / "models")
    conf = _conf(
        synthetic_cohort, tmp_path,
        network="retinanet_2d", save_model="dm",
        save_model_per_epoch=True, saved_models_dir=saved,
    )
    trainer = make_trainer(conf, verbose=False)
    results = trainer.train_and_test()
    # held-out detection metric: band IoU on the TEST split's spliced
    # bands (unseen windows), alongside the train-split sanity curve
    iou_test = results.get_meter("band_iou_test", 0)
    assert len(iou_test) == 1
    assert 0.0 <= iou_test.values[0] <= 1.0
    # test_loss carries ONE entry per epoch, from the held-out split
    # only — the train-split sanity pass must not contaminate it
    assert len(results.get_meter("test_loss", 0)) == 1
    assert len(results.get_meter("band_iou", 0)) == 1

    ckpts = _ckpt_paths(saved)
    assert any("epoch1" in c for c in ckpts)
    final = [c for c in ckpts if "epoch" not in c]
    assert final

    # reload for eval-only: IoU metrics reproduce without training
    conf2 = _conf(
        synthetic_cohort, tmp_path / "r2",
        network="retinanet_2d", load_checkpoint=final[0], no_train=True,
    )
    trainer2 = make_trainer(conf2, verbose=False)
    results2 = trainer2.train_and_test()
    assert len(results2.get_meter("loss", 0)) == 0
    assert len(results2.get_meter("band_iou_test", 0)) == 1


def test_parallel_folds_checkpoint_save_reload(synthetic_cohort, tmp_path):
    saved = str(tmp_path / "models")
    conf = _conf(
        synthetic_cohort, tmp_path,
        parallel_folds=True, only_fold=None,
        save_model="pf", save_model_per_epoch=True,
        saved_models_dir=saved,
    )
    trainer = make_trainer(conf, verbose=False)
    trainer.train_and_test()
    ckpts = os.listdir(saved)
    # one checkpoint per fold slice, sequential-path naming
    for f in range(2):
        assert any(
            "fold{}".format(f) in c and "epoch" not in c
            and not c.endswith(".json") for c in ckpts
        )
        assert any(
            "epoch1-fold{}".format(f) in c and not c.endswith(".json")
            for c in ckpts
        )
    # per-fold scaling sidecars
    assert any(c.endswith(".scaling.json") for c in ckpts)

    # a fold slice restores into the SEQUENTIAL trainer unchanged
    final0 = os.path.join(
        saved,
        [c for c in ckpts if "fold0" in c and "epoch" not in c
         and not c.endswith(".json")][0],
    )
    conf2 = _conf(
        synthetic_cohort, tmp_path / "r2",
        load_checkpoint=final0, no_train=True,
    )
    trainer2 = make_trainer(conf2, verbose=False)
    results2 = trainer2.train_and_test()
    assert len(results2.get_meter("test_auc", 0)) == 1

    # and seeds a CONTINUED parallel-folds run (broadcast over folds)
    conf3 = _conf(
        synthetic_cohort, tmp_path / "r3",
        parallel_folds=True, only_fold=None,
        load_checkpoint=final0,
    )
    trainer3 = make_trainer(conf3, verbose=False)
    results3 = trainer3.train_and_test()
    assert len(results3.get_meter("test_auc", 0)) == 1
