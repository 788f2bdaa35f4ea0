"""End-to-end AUC parity-or-better: OUR trainer vs the REFERENCE'S OWN
torch model trained on identical data with identical protocol.

This grounds the patient-AUC parity target (BASELINE.md north star)
beyond weight-transplant logit checks: both stacks train
cnn_linear/densenet18 from scratch on the same fold of the same cohort
(same windows, same normalization, same optimizer recipe —
reference: train_ards_detector.py:416-422 SGD + clamp hooks) and the TPU
build's best-epoch patient-vote AUC must be at least the reference's.

Measured finding (documented in PARITY.md): the reference's per-sequence
BatchNorm statistics (its python loop feeds S windows per backbone call)
make its optimization strictly harder at small S — on this cohort the
reference protocol peaks at ~0.6 AUC in 10 epochs while the super-batch
build reaches 1.0 in 5 — so the honest invariant is parity-or-better,
not equality of training curves.
"""
import importlib.util
import os

import numpy as np
import pytest

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

REF = "/root/reference/deepards/models"


def _load_ref(name, fname):
    path = os.path.join(REF, fname)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _patient_auc(dataset, pred_frac_by_idx):
    """Patient-vote AUC exactly like eval/metrics: fraction of ARDS
    window votes per patient vs patient ground truth."""
    from sklearn.metrics import roc_auc_score

    gt = dataset.get_ground_truth_df()
    rows = []
    for pt, sub in gt.groupby("patient"):
        fracs = [pred_frac_by_idx[int(i)] for i in sub.index]
        rows.append((int(sub.y.iloc[0]), float(np.mean(fracs))))
    y = [r[0] for r in rows]
    f = [r[1] for r in rows]
    if len(set(y)) < 2:
        pytest.skip("single-class fold")
    return roc_auc_score(y, f)


@pytest.fixture(scope="module")
def parity_cohort(tmp_path_factory):
    """Bigger cohort than the suite default: 16 patients -> 8 test
    patients per fold, so patient-vote AUC has enough resolution for a
    meaningful parity comparison.  800 breaths/patient: with the
    round-5 true-size final-batch BN semantics (bn_row_mask) the old
    400-breath cohort became borderline at 5 epochs (max AUC 0.75-0.875,
    one misranked patient from the bar on an 8-patient fold whose AUC
    quantum is 0.125); doubling the windows restores a comfortable
    learnability margin (measured: max AUC 1.0 at epoch 5)."""
    from deepards_tpu.data.synthetic import generate_cohort

    data_path = str(tmp_path_factory.mktemp("parity_cohort"))
    cohort_file = generate_cohort(
        data_path, n_patients=16, n_breaths_per_patient=800, seed=77,
    )
    return {"data_path": data_path, "cohort_file": cohort_file}


@pytest.mark.slow
@pytest.mark.parametrize("bn_scope", ["batch", "sequence"])
def test_auc_parity_same_data_same_protocol(parity_cohort, bn_scope):
    """Runs in BOTH BN modes: the default super-batch statistics and the
    reference-exact per-sequence statistics (bn_scope: sequence, the
    config switch added for strict semantic parity)."""
    synthetic_cohort = parity_cohort
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.data.pipeline import BatchPipeline

    ref_densenet = _load_ref("ref_densenet_auc", "densenet.py")
    ref_heads = _load_ref("ref_heads_auc", "torch_cnn_linear_network.py")

    S = 4
    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=S, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    test_ds = ARDSRawDataset.make_test_dataset_if_kfold(ds)
    ds.set_kfold_indexes_for_fold(0)
    test_ds.set_kfold_indexes_for_fold(0)
    pipeline = BatchPipeline(ds)

    train_idx = np.asarray(ds.current_indices())
    test_idx = np.asarray(test_ds.current_indices())
    # identical normalized arrays for both stacks (the device pipeline
    # output, materialized)
    x_train = np.asarray(pipeline(ds.cache.data[train_idx]))
    y_train = ds.cache.target[train_idx]
    x_test = np.asarray(pipeline(test_ds.cache.data[test_idx]))

    bs, lr = 8, 0.005
    ref_epochs = 10
    # batch mode: the super-batch statistics make the cohort learnable in
    # half the reference's budget.  sequence mode: identical semantics to
    # the reference, so identical budget — the invariant is parity, not
    # the batch-mode speedup.
    epochs = 5 if bn_scope == "batch" else ref_epochs

    # ---- reference stack: its own torch modules, its own loop ----------
    torch.manual_seed(0)
    tback = ref_densenet.densenet18()
    tnet = ref_heads.CNNLinearNetwork(tback, sequence_size=S,
                                      metadata_features=0)
    opt = torch.optim.SGD(tnet.parameters(), lr=lr, momentum=0.9,
                          nesterov=True, weight_decay=1e-4)
    crit = torch.nn.BCEWithLogitsLoss()
    for p in tnet.parameters():
        p.register_hook(lambda grad: torch.clamp(grad, -0.01, 0.01))
    host_rng = np.random.default_rng(0)
    ref_epoch_aucs = []
    for _ in range(ref_epochs):
        order = host_rng.permutation(len(train_idx))
        tnet.train()
        for s in range(0, len(order) - bs + 1, bs):
            sel = order[s:s + bs]
            xb = torch.from_numpy(x_train[sel])
            yb = torch.from_numpy(y_train[sel])
            opt.zero_grad()
            loss = crit(tnet(xb, None), yb)
            loss.backward()
            opt.step()
        ref_frac = {}
        with torch.no_grad():
            for s in range(0, len(test_idx), bs):
                sel = slice(s, s + bs)
                out = tnet(torch.from_numpy(x_test[sel]), None).numpy()
                for k, i in enumerate(test_idx[sel]):
                    ref_frac[int(i)] = float(out[k].argmax() == 1)
        ref_epoch_aucs.append(_patient_auc(test_ds, ref_frac))
    # the reference's own headline protocol: the max-AUC epoch
    # (metrics.py save_maximals)
    ref_auc = max(ref_epoch_aucs)

    # ---- our stack: the real trainer ------------------------------------
    from deepards_tpu.config import Configuration
    from deepards_tpu.train.loop import make_trainer

    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="cnn_linear",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=S,
        kfolds=2,
        only_fold=0,
        epochs=epochs,
        batch_size=bs,
        learning_rate=lr,
        clip_grad=True,
        clip_val=0.01,
        compute_dtype="float32",
        results_dir="/tmp/auc_parity_results",
        seed=0,
        bn_scope=bn_scope,
    ))
    trainer = make_trainer(conf, verbose=False)
    results = trainer.train_and_test()
    our_auc = max(results.get_meter("test_auc", 0).values)

    # parity-or-better vs the reference's own protocol in BOTH modes;
    # the super-batch mode must additionally learn the separable cohort
    # outright (the sequence mode reproduces the reference's harder
    # optimization surface, so its bar is the reference itself)
    assert our_auc >= ref_auc - 0.005, (our_auc, ref_auc)
    if bn_scope == "batch":
        assert our_auc >= 0.95, (our_auc, ref_auc)
