"""End-to-end ProtoPNet and Siamese training on tiny synthetic data."""
import numpy as np
import pytest

from deepards_tpu.config import Configuration
from deepards_tpu.train.loop import make_trainer

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow


def test_ppnet_model_shapes():
    import jax
    import jax.numpy as jnp

    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.protopnet1d import construct_ppnet

    model = construct_ppnet(densenet18(), sub_batch_size=2, n_prototypes=3)
    x = jnp.ones((2, 2, 1, 224))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, True,
    )
    logits, min_d = model.apply(variables, x, None, True)
    assert logits.shape == (2, 2)
    assert min_d.shape == (2, 2 * 6)  # S * num_prototypes
    assert "prototype_vectors" in variables["params"]
    assert variables["params"]["prototype_vectors"].shape == (6, 128, 1)
    # class-identity init of last layer: kernel (S*P, 2)
    kernel = variables["params"]["last_layer"]["kernel"]
    assert kernel.shape == (2 * 6, 2)
    assert set(np.unique(np.asarray(kernel))) == {-0.5, 1.0}


def test_ppnet_rf_info():
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.protopnet1d import construct_ppnet

    model = construct_ppnet(densenet18(), sub_batch_size=2)
    n_out, jump, rf, start = model.proto_layer_rf_info(224)
    assert n_out == 7  # densenet18 feature map length at 224 input
    assert jump == 32  # 5 stride-2 stages
    assert rf > 100  # deep receptive field


def test_ppnet_loss_components():
    import jax.numpy as jnp

    from deepards_tpu.models.protopnet1d import prototype_class_identity
    from deepards_tpu.train.protopnet_trainer import ppnet_loss

    rng = np.random.default_rng(0)
    b, s, p = 4, 2, 6
    logits = jnp.asarray(rng.normal(size=(b, 2)), jnp.float32)
    target = jnp.asarray(np.eye(2)[rng.integers(0, 2, b)], jnp.float32)
    min_d = jnp.asarray(rng.uniform(0, 10, size=(b, s * p)), jnp.float32)
    ident = np.tile(prototype_class_identity(p, 2), (s, 1))
    loss, (cls_loss, clust, sep, l1) = ppnet_loss(
        logits, target, min_d, ident, 128.0
    )
    assert np.isfinite(float(loss))
    assert float(clust) >= 0 and float(sep) >= 0
    assert float(l1) == 0  # use_l1 off


@pytest.mark.slow
def test_protopnet_e2e(synthetic_cohort, tmp_path):
    import os

    saved = str(tmp_path / "saved")
    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="protopnet",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        epochs=3,
        batch_size=8,
        n_warm_epochs=1,
        push_start_epoch=2,
        push_every_n=2,
        n_push_iters=1,
        n_prototypes=2,
        compute_dtype="float32",
        results_dir=str(tmp_path),
        only_fold=0,
        save_model="pp",
        save_model_per_epoch=True,
        saved_models_dir=saved,
        train_to_pickle=str(tmp_path / "pp_cache.npz"),
    ))
    trainer = make_trainer(conf, verbose=False)
    results = trainer.train_and_test()
    assert len(results.get_meter("cls_loss", 0)) > 0
    assert len(results.get_meter("clst_loss", 0)) > 0
    # push happened and recorded prototype provenance
    assert hasattr(trainer, "last_push_info")
    assert any(info is not None for info in trainer.last_push_info)
    auc = results.get_meter("test_auc", 0)
    assert len(auc) == 3
    # checkpoint parity with the base trainer: per-epoch + final saves
    ckpts = os.listdir(saved)
    assert any(c == "pp-fold0" for c in ckpts)
    assert any("epoch" in c and c.endswith("fold0") for c in ckpts)

    # the protopnet analysis CLI consumes the checkpoint + cache
    from deepards_tpu.cli.protopnet_analysis import main as ppa_main

    out_dir = str(tmp_path / "ppa")
    ppa_main([
        os.path.join(saved, "pp-fold0"),
        "--kfold-from-pickle", str(tmp_path / "pp_cache.npz"),
        "--kfold-idx", "0", "-o", out_dir, "--n-prototypes", "2",
    ])
    panes = os.listdir(out_dir)
    assert any(p.endswith(".txt") for p in panes)


@pytest.mark.slow
def test_siamese_e2e(synthetic_cohort, tmp_path):
    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="siamese_cnn_linear",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=None,
        epochs=1,
        batch_size=8,
        compute_dtype="float32",
        results_dir=str(tmp_path),
        holdout_set_type="main",
    ))
    trainer = make_trainer(conf, verbose=False)
    results = trainer.train_and_test()
    assert len(results.get_meter("loss", 0)) > 0
    acc = results.get_meter("accuracy", 0)
    assert len(acc) >= 1
    assert 0.0 <= acc.values[-1] <= 1.0


@pytest.mark.slow
def test_protopnet_2d_e2e(synthetic_cohort, tmp_path):
    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="protopnet_2d",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=4,
        kfolds=2,
        only_fold=0,
        epochs=2,
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
    assert any(i is not None for i in trainer.last_push_info)


def test_push_padded_batch_exact_min(synthetic_cohort):
    """Regression: a padded row must not hijack the per-batch argmin and
    discard a real runner-up patch (exact-min parity with ppnet_push).
    Dataset of 3 windows with batch_size=2 -> second batch is half pad;
    every prototype's pushed distance must equal the min over all real
    same-class windows.  BatchStatNorm makes features batch-dependent,
    so the oracle replays the loader's batches — and because the push
    pass scopes `bn_row_mask`, the half-pad final batch must produce the
    SAME features as a true-size dispatch (reference semantics: torch
    DataLoader feeds the short final batch at its real size,
    train_ards_detector.py:424-448), so the oracle feeds batch 2 at its
    true size with no pad row."""
    import jax
    import jax.numpy as jnp

    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.protopnet1d import construct_ppnet
    from deepards_tpu.train.protopnet_trainer import ProtoPNetTrainer

    rng = np.random.default_rng(3)
    data = rng.normal(size=(3, 2, 1, 224)).astype(np.float32)
    target = np.eye(2, dtype=np.float32)[[0, 1, 0]]

    class FakeDataset:
        def current_indices(self):
            return np.arange(3)

        def gather(self, idxs):
            return {
                "data": data[idxs],
                "target": target[idxs],
                "index": np.asarray(idxs),
            }

    model = construct_ppnet(densenet18(), sub_batch_size=2, n_prototypes=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(data[:2]), None, True,
    )

    class State:
        params = variables["params"]

        def replace(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)
            return self

    trainer = ProtoPNetTrainer.__new__(ProtoPNetTrainer)
    trainer.push_prototypes(
        State(), model, FakeDataset(), lambda x: x, batch_size=2
    )

    # oracle: same batches (incl. the zero-pad row), numpy min over real
    # same-class rows only
    def batch_dists(batch_data):
        _, dists = model.apply(
            {"params": variables["params"]}, jnp.asarray(batch_data),
            None, True, method=model.push_forward,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        d = np.asarray(dists)
        return d.reshape(d.shape[0], -1, d.shape[-1])  # (B, pos, P)

    b1 = batch_dists(data[[0, 1]])
    # true-size final batch: the padded dispatch (masked BN) must match
    b2 = batch_dists(data[2:3])

    ident = model.class_identity()
    cls_of_proto = ident.argmax(axis=1)
    labels = target.argmax(axis=1)
    for j in range(model.num_prototypes):
        cands = []
        for row in (0, 1):
            if labels[row] == cls_of_proto[j]:
                cands.append(b1[row, :, j].min())
        if labels[2] == cls_of_proto[j]:
            cands.append(b2[0, :, j].min())  # row 2, real row of batch 2
        true_min = min(cands)
        info = trainer.last_push_info[j]
        assert info is not None
        np.testing.assert_allclose(info["distance"], true_min, rtol=1e-4)
        assert info["window_index"] in np.nonzero(
            labels == cls_of_proto[j]
        )[0]
