"""End-to-end tiny training runs on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

from deepards_tpu.config import Configuration
from deepards_tpu.train.loop import Trainer

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow


def _conf(synthetic_cohort, **over):
    base = dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="cnn_linear",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        epochs=2,
        batch_size=8,
        optimizer="sgd",
        learning_rate=0.01,
        clip_grad=True,
        clip_val=0.05,
        oversample_minority=False,
        compute_dtype="float32",
        results_dir=None,
        seed=7,
    )
    base.update(over)
    return Configuration(overrides=base)


@pytest.fixture(scope="module")
def trained(synthetic_cohort, tmp_path_factory):
    results_dir = str(tmp_path_factory.mktemp("results"))
    conf = _conf(synthetic_cohort, results_dir=results_dir)
    trainer = Trainer(conf, verbose=False)
    results = trainer.train_and_test()
    return trainer, results


def test_e2e_losses_recorded(trained):
    trainer, results = trained
    loss_meter = results.get_meter("loss", 0)
    assert len(loss_meter) > 0
    assert np.isfinite(loss_meter.values).all()


def test_e2e_patient_predictions(trained):
    trainer, results = trained
    # every fold/epoch produced per-patient rows
    assert len(results.results) > 0
    assert set(results.results.fold_num.unique()) == {0, 1}
    assert set(results.results.epoch_num.unique()) == {1, 2}
    # pred_frac is a valid fraction
    assert results.results.pred_frac.between(0, 1).all()


def test_e2e_auc_meters(trained):
    trainer, results = trained
    for fold in (0, 1):
        auc = results.get_meter("test_auc", fold)
        assert len(auc) == 2  # one per epoch
        assert all(0.0 <= v <= 1.0 for v in auc.values)


def test_e2e_aggregate_and_maximals(trained):
    trainer, results = trained
    agg = results.aggregate_classification_results(verbose=False)
    assert agg is not None
    assert set(agg.patho) == {"OTHER", "ARDS"}
    assert (agg.groupby(["fold_num", "epoch_num"]).size() == 2).all()


def test_e2e_pred_to_hour(trained):
    trainer, results = trained
    frame = results.all_pred_to_hour
    assert len(frame) > 0
    assert {"pred", "hour", "patient", "y", "epoch", "fold"} <= set(
        frame.columns
    )


def test_e2e_learns_synthetic_separation(synthetic_cohort, tmp_path):
    """With more epochs on the cleanly-separable synthetic cohort the
    final-epoch patient AUC should beat chance."""
    conf = _conf(
        synthetic_cohort,
        results_dir=str(tmp_path),
        kfolds=2,
        epochs=4,
        learning_rate=0.01,
    )
    trainer = Trainer(conf, verbose=False)
    results = trainer.train_and_test()
    last_aucs = [results.get_meter("test_auc", f).values[-1] for f in (0, 1)]
    assert np.nanmean(last_aucs) > 0.6


def test_e2e_regression_network(synthetic_cohort, tmp_path):
    conf = _conf(
        synthetic_cohort,
        results_dir=str(tmp_path),
        network="cnn_regressor",
        dataset_type="padded_breath_by_breath_with_full_bm_target",
        n_sub_batches=1,
        kfolds=2,
        epochs=1,
        batch_size=16,
    )
    trainer = Trainer(conf, verbose=False)
    results = trainer.train_and_test()
    assert len(results.get_meter("test_mae", 0)) == 1
    assert len(results.get_meter("test_r2", 0)) == 1


def test_e2e_fused_steps_matches_capability(synthetic_cohort, tmp_path):
    """Fused-epoch mode (lax.scan over steps) trains and evaluates."""
    conf = _conf(
        synthetic_cohort,
        results_dir=str(tmp_path),
        kfolds=2,
        only_fold=0,
        epochs=2,
        fused_steps=3,
    )
    trainer = Trainer(conf, verbose=False)
    results = trainer.train_and_test()
    loss_meter = results.get_meter("loss", 0)
    assert len(loss_meter) > 0
    assert np.isfinite(loss_meter.values).all()
    assert len(results.get_meter("test_auc", 0)) == 2


def test_e2e_parallel_folds(synthetic_cohort, tmp_path):
    """All folds train simultaneously under vmap; per-fold AUC meters and
    patient predictions appear for every fold."""
    from deepards_tpu.train.loop import make_trainer

    conf = _conf(
        synthetic_cohort,
        results_dir=str(tmp_path),
        kfolds=2,
        epochs=2,
        parallel_folds=True,
    )
    trainer = make_trainer(conf, verbose=False)
    from deepards_tpu.train.parallel_folds import ParallelFoldTrainer

    assert isinstance(trainer, ParallelFoldTrainer)
    results = trainer.train_and_test()
    for f in (0, 1):
        assert len(results.get_meter("loss", f)) > 0
        assert len(results.get_meter("test_auc", f)) == 2
    assert set(results.results.fold_num.unique()) == {0, 1}


def test_e2e_parallel_folds_device_cache_both_paths(synthetic_cohort,
                                                    tmp_path):
    """The parallel-fold device-cache TRAIN and EVAL scans (one dispatch
    per epoch, all folds) must reproduce the host-gather path: same loss
    sequences, same test-loss recording structure, same patient votes."""
    from deepards_tpu.train.loop import make_trainer

    metered = {}
    for name, flag in (("dev", True), ("host", False)):
        conf = _conf(
            synthetic_cohort,
            results_dir=str(tmp_path / name),
            kfolds=2,
            epochs=1,
            parallel_folds=True,
            device_cache=flag,
            seed=21,
        )
        trainer = make_trainer(conf, verbose=False)
        results = trainer.train_and_test()
        # the device path must have actually uploaded the cache (and the
        # host path must not have)
        assert bool(getattr(trainer, "_dev_caches", None)) == flag
        metered[name] = {
            "loss": [list(results.get_meter("loss_epoch_1", f).values)
                     for f in (0, 1)],
            "test_loss": [list(results.get_meter("test_loss", f).values)
                          for f in (0, 1)],
            "rows": results.results.sort_values(
                ["fold_num", "patho"]).reset_index(drop=True),
        }
    for f in (0, 1):
        assert (len(metered["dev"]["loss"][f])
                == len(metered["host"]["loss"][f]) > 0)
        np.testing.assert_allclose(
            metered["dev"]["loss"][f][:3], metered["host"]["loss"][f][:3],
            rtol=1e-4, atol=1e-5,
        )
        # eval after a full trained epoch: same per-step recording count
        # (incl. the exhausted-fold skip); values drift with the f32
        # compounding of the train epoch, so pin the statistics loosely
        assert (len(metered["dev"]["test_loss"][f])
                == len(metered["host"]["test_loss"][f]) > 0)
        assert abs(
            float(np.mean(metered["dev"]["test_loss"][f]))
            - float(np.mean(metered["host"]["test_loss"][f]))
        ) < 0.05
    # patient-vote rows: identical structure
    rd, rh = metered["dev"]["rows"], metered["host"]["rows"]
    assert list(rd.patho) == list(rh.patho)
    assert list(rd.fold_num) == list(rh.fold_num)


def test_parallel_folds_eval_scan_matches_host(synthetic_cohort, tmp_path):
    """The scanned device-cache eval must reproduce the host eval loop on
    IDENTICAL params (no_train): same test-loss sequences (tight), same
    vote fractions — isolates the eval path from train-epoch f32 drift,
    incl. the zero-pad BN semantics of partial final batches."""
    from deepards_tpu.train.loop import make_trainer

    metered = {}
    for name, flag in (("dev", True), ("host", False)):
        conf = _conf(
            synthetic_cohort,
            results_dir=str(tmp_path / ("ev_" + name)),
            kfolds=2,
            epochs=1,
            parallel_folds=True,
            device_cache=flag,
            no_train=True,
            seed=29,
        )
        trainer = make_trainer(conf, verbose=False)
        results = trainer.train_and_test()
        metered[name] = {
            "test_loss": [list(results.get_meter("test_loss", f).values)
                          for f in (0, 1)],
            "rows": results.results.sort_values(
                ["fold_num", "patho"]).reset_index(drop=True),
        }
    for f in (0, 1):
        assert (len(metered["dev"]["test_loss"][f])
                == len(metered["host"]["test_loss"][f]) > 0)
        np.testing.assert_allclose(
            metered["dev"]["test_loss"][f],
            metered["host"]["test_loss"][f],
            rtol=1e-4, atol=1e-5,
        )
    rd, rh = metered["dev"]["rows"], metered["host"]["rows"]
    assert list(rd.patho) == list(rh.patho)
    assert list(rd.fold_num) == list(rh.fold_num)
    np.testing.assert_allclose(
        rd.pred_frac.to_numpy(float), rh.pred_frac.to_numpy(float),
        atol=0.05,
    )
