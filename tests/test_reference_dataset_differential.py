"""Differential ETL test: the reference's OWN dataset.py vs our cache.

The reference's 2107-line ``dataset.py`` is imported from
``/root/reference`` at test time (read-only, no code copied) and run on
the same synthetic cohort our ``ARDSRawDataset`` consumes; the produced
``all_sequences`` windows, targets, sequence hours, scaling factors and
kfold splits must match ours exactly.  This closes the loop the
transplant-parity tests leave open: not just the models, but the entire
windowing/filter/scaling/splitting ETL is differentially pinned against
the reference implementation (reference: deepards/dataset.py:347-1081).

Breath parsing is held equal by shimming ``ventmap.raw_utils`` with our
reader (itself oracle-tested against the vendored ucdpvanalysis SAM in
test_breath_oracle.py); the dataset types under test never call
ventmap.SAM (only truncate_lim does, reference dataset.py:1183-1204).
"""
import importlib.util
import os
import sys
import tarfile
import types

import numpy as np
import pytest

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

REF_DATASET = "/root/reference/deepards/dataset.py"
TARBALL = "/root/reference/build/static/ucdpvanalysis-1.5.tar.gz"


@pytest.fixture(scope="module")
def ref_dataset_mod(tmp_path_factory):
    if not (os.path.exists(REF_DATASET) and os.path.exists(TARBALL)):
        pytest.skip("reference checkout not available")

    # 'algorithms.constants' from the vendored tarball (standalone file);
    # breath_meta itself star-imports the real ventmap and is never
    # CALLED by the dataset types under test, so it gets a guard shim
    root = tmp_path_factory.mktemp("ucdpv_ds")
    with tarfile.open(TARBALL) as tf:
        tf.extractall(root)
    pkg_root = os.path.join(str(root), "ucdpvanalysis-1.5")
    const_spec = importlib.util.spec_from_file_location(
        "algorithms.constants",
        os.path.join(pkg_root, "algorithms", "constants.py"))
    constants = importlib.util.module_from_spec(const_spec)
    const_spec.loader.exec_module(constants)

    # pandas 2.x removed Int64Index (reference dataset.py:820 uses it);
    # numpy 1.24 removed the np.float/np.int aliases (dataset.py:632)
    import pandas as pd

    if not hasattr(pd, "Int64Index"):
        pd.Int64Index = pd.Index
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "int"):
        np.int = int
    if not hasattr(np, "bool"):
        np.bool = bool

    # ventmap shim: our reader supplies the breath stream; SAM is not
    # called by the dataset types under test
    from deepards_tpu.data import reader as our_reader

    ventmap = types.ModuleType("ventmap")
    sam = types.ModuleType("ventmap.SAM")

    def _not_used(*a, **k):
        raise AssertionError(
            "ventmap.SAM should not be reached by these dataset types")

    sam.find_x0s_multi_algorithms = _not_used
    sam.x0_heuristic = _not_used
    def read_processed_file(raw_path, processed_path=None):
        # ventmap yields flow as a python LIST; the reference's unpadded
        # accumulation relies on list semantics (flow[remaining:] etc.,
        # dataset.py:1260-1272)
        for breath in our_reader.read_processed_file(raw_path,
                                                     processed_path):
            breath = dict(breath)
            breath["flow"] = list(np.asarray(breath["flow"], np.float64))
            yield breath

    raw_utils = types.ModuleType("ventmap.raw_utils")
    raw_utils.read_processed_file = read_processed_file
    raw_utils.extract_raw = _not_used
    ventmap.SAM = sam
    ventmap.raw_utils = raw_utils

    # 'deepards' shim so `import deepards` and the correlation import
    # resolve (AutoCorrelation backed by our autocorr_r2 function)
    from deepards_tpu.data.correlation import autocorr_r2

    class AutoCorrelation:
        def get_auto_corr_r2(self, seq):
            return autocorr_r2(seq)

    deepards_pkg = types.ModuleType("deepards")
    deepards_pkg.__path__ = []
    correlation = types.ModuleType("deepards.correlation")
    correlation.AutoCorrelation = AutoCorrelation
    deepards_pkg.correlation = correlation

    # imblearn / torchvision are unavailable in this image; the dataset
    # module only touches them for oversampling and the 2D transform
    # stacks, neither of which these differential paths reach.  Minimal
    # functional shims keep the import surface honest.
    imblearn = types.ModuleType("imblearn")
    over_sampling = types.ModuleType("imblearn.over_sampling")

    class RandomOverSampler:
        """Minority random-duplication oversampler (imblearn semantics)."""

        def __init__(self, random_state=None):
            self.rng = np.random.RandomState(random_state)

        def fit_resample(self, x, y):
            x = np.asarray(x)
            y = np.asarray(y)
            counts = {c: int((y == c).sum()) for c in np.unique(y)}
            n_max = max(counts.values())
            xs, ys = [x], [y]
            for c, n in counts.items():
                if n < n_max:
                    idx = np.where(y == c)[0]
                    extra = self.rng.choice(idx, n_max - n, replace=True)
                    xs.append(x[extra])
                    ys.append(y[extra])
            return np.concatenate(xs), np.concatenate(ys)

    over_sampling.RandomOverSampler = RandomOverSampler
    imblearn.over_sampling = over_sampling

    torchvision = types.ModuleType("torchvision")
    tv_transforms = types.ModuleType("torchvision.transforms")

    class _TVStub:
        def __init__(self, *a, **k):
            pass

    for name in ("Compose", "RandomHorizontalFlip", "RandomVerticalFlip",
                 "ToTensor", "Normalize"):
        setattr(tv_transforms, name, type(name, (_TVStub,), {}))
    torchvision.transforms = tv_transforms

    # get_experimental_breath_meta adapter over OUR flow-time features
    # (themselves oracle-tested against the vendored SAM in
    # test_breath_oracle.py): the vendored breath_meta module cannot
    # import here (it star-imports the real ventmap), so features are
    # held equal by construction and the bm differential pins the
    # reference's WINDOWING of them (skip rules, ratio clip, layout)
    from deepards_tpu.data.breath import (
        FLOW_TIME_FEATURE_NAMES,
        flow_time_features,
    )

    header = list(constants.EXPERIMENTAL_META_HEADER)
    feat_idx = [header.index(n) for n in FLOW_TIME_FEATURE_NAMES]

    def get_experimental_breath_meta(breath, tve_pos=True):
        row = np.zeros(len(header), dtype=object)
        row[0] = breath["rel_bn"]
        feats = flow_time_features(
            np.asarray(breath["flow"], np.float64),
            np.asarray(breath.get("pressure", []), np.float64)
            if breath.get("pressure") is not None else None,
        )
        for i, v in zip(feat_idx, feats):
            row[i] = v
        return list(row)

    algorithms = types.ModuleType("algorithms")
    algorithms.__path__ = []
    breath_meta = types.ModuleType("algorithms.breath_meta")
    breath_meta.get_experimental_breath_meta = get_experimental_breath_meta
    algorithms.breath_meta = breath_meta
    algorithms.constants = constants

    injected = {
        "ventmap": ventmap,
        "ventmap.SAM": sam,
        "ventmap.raw_utils": raw_utils,
        "deepards": deepards_pkg,
        "deepards.correlation": correlation,
        "imblearn": imblearn,
        "imblearn.over_sampling": over_sampling,
        "torchvision": torchvision,
        "torchvision.transforms": tv_transforms,
        "algorithms": algorithms,
        "algorithms.breath_meta": breath_meta,
        "algorithms.constants": constants,
    }
    saved = {k: sys.modules.get(k) for k in injected}
    sys.modules.update(injected)
    sys.path.insert(0, pkg_root)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_dataset", REF_DATASET)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        deepards_pkg.dataset = mod
        yield mod
    finally:
        sys.path.remove(pkg_root)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    from deepards_tpu.data.synthetic import generate_cohort

    data_path = str(tmp_path_factory.mktemp("diff_cohort"))
    cohort_file = generate_cohort(
        data_path, n_patients=4, n_breaths_per_patient=120, seed=77,
        subdirs=("all_data", "aim1_70_30_training", "aim1_70_30_testing"))
    return {"data_path": data_path, "cohort_file": cohort_file}


@pytest.mark.parametrize("dataset_type", [
    "unpadded_centered_sequences",
    "padded_breath_by_breath",
    "unpadded_sequences",
    "spaced_padded_breath_by_breath",
    "unpadded_downsampled_sequences",
    "unpadded_centered_downsampled_sequences",
])
def test_etl_content_matches_reference(ref_dataset_mod, cohort,
                                       dataset_type):
    from deepards_tpu.data.dataset import ARDSRawDataset

    kwargs = dict(
        n_sub_batches=2,
        dataset_type=dataset_type,
        kfold_num=0,
        total_kfolds=2,
    )
    # all_sequences passed explicitly: the reference's mutable default
    # argument (dataset.py:354) would otherwise leak windows between
    # constructions in one process
    ref = ref_dataset_mod.ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"],
        all_sequences=[], **kwargs)
    ours = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)

    assert len(ref.all_sequences) == len(ours.cache.data), dataset_type

    for i, item in enumerate(ref.all_sequences):
        patient_id, window, target = item[0], item[1], item[2]
        our_pt = ours.cache.patients[ours.cache.patient_idx[i]]
        assert str(patient_id) == str(our_pt), i
        np.testing.assert_allclose(
            np.asarray(window, np.float32), ours.cache.data[i],
            atol=1e-6, err_msg="window {} ({})".format(i, dataset_type),
        )
        ref_target = np.asarray(item[2], np.float32)
        np.testing.assert_allclose(ref_target, ours.cache.target[i])
        if len(item) > 3:  # batch_seq_hours
            ref_hours = np.asarray(item[3], np.float64)
            our_hours = np.asarray(ours.cache.hours[i], np.float64)
            s = len(our_hours)
            if len(ref_hours) == 2 * s - 1:
                # reference accumulation quirk (dataset.py:1081-1082): the
                # trailing `if len(batch_arr) > 0 and breath_arr == []`
                # re-appends each completed row's hour, so centered types
                # carry [h1,h1,h2,h2,...,hS]; rows are the even slots
                ref_hours = ref_hours[0::2]
            np.testing.assert_allclose(ref_hours, our_hours, atol=1e-9)

    # per-fold scaling factors over the SAME kfold splits.  The reference
    # broadcasts the per-channel mu/std to (S, C, L)
    # (dataset.py:642,648); ours stores the per-channel values compactly
    for fold in range(2):
        ref_mu, ref_std = ref.scaling_factors[fold]
        our_mu, our_std = ours.scaling_factors[fold]
        for ref_v, our_v in ((ref_mu, our_mu), (ref_std, our_std)):
            per_chan = np.asarray(ref_v, np.float64)[0, :, 0]
            np.testing.assert_allclose(
                per_chan,
                np.ravel(np.asarray(our_v, np.float64)), rtol=1e-5)


def test_kfold_indexes_match_reference(ref_dataset_mod, cohort):
    from deepards_tpu.data.dataset import ARDSRawDataset

    kwargs = dict(
        n_sub_batches=2,
        dataset_type="unpadded_centered_sequences",
        kfold_num=0,
        total_kfolds=2,
    )
    # all_sequences passed explicitly: the reference's mutable default
    # argument (dataset.py:354) would otherwise leak windows between
    # constructions in one process
    ref = ref_dataset_mod.ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"],
        all_sequences=[], **kwargs)
    ours = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)
    for fold in range(2):
        ref.set_kfold_indexes_for_fold(fold)
        ours.set_kfold_indexes_for_fold(fold)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ref.kfold_indexes)),
            np.sort(np.asarray(ours.current_indices())),
        )


def test_stretched_type_is_unscalable_in_the_reference(ref_dataset_mod,
                                                       cohort):
    """The reference's own derive_scaling_factors raises for
    stretched_breath_by_breath (dataset.py:660-665 only recognizes
    padded/unpadded name patterns), so the type is untrainable there;
    ours supports it (a documented capability superset, not a parity
    gap)."""
    from deepards_tpu.data.dataset import ARDSRawDataset

    kwargs = dict(
        n_sub_batches=2,
        dataset_type="stretched_breath_by_breath",
        kfold_num=0,
        total_kfolds=2,
    )
    with pytest.raises(Exception, match="unsupported dataset type"):
        ref_dataset_mod.ARDSRawDataset(
            cohort["data_path"], 1, cohort["cohort_file"],
            all_sequences=[], **kwargs)
    ours = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)
    assert len(ours.cache.data) > 0
    assert ours.scaling_factors


def test_bm_target_etl_matches_reference(ref_dataset_mod, cohort):
    """Breath-meta pretraining windows + 9-feature regression targets
    (reference: dataset.py:912-962; benchmark config 3)."""
    from deepards_tpu.data.dataset import ARDSRawDataset

    kwargs = dict(
        n_sub_batches=1,
        dataset_type="padded_breath_by_breath_with_full_bm_target",
        kfold_num=0,
        total_kfolds=2,
    )
    ref = ref_dataset_mod.ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"],
        all_sequences=[], **kwargs)
    ours = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)

    assert len(ref.all_sequences) == len(ours.cache.data)
    for i, item in enumerate(ref.all_sequences):
        patient_id, window, meta = item[0], item[1], item[2]
        our_pt = ours.cache.patients[ours.cache.patient_idx[i]]
        assert str(patient_id) == str(our_pt), i
        np.testing.assert_allclose(
            np.asarray(window, np.float32).reshape(-1),
            np.asarray(ours.cache.data[i], np.float32).reshape(-1),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(meta, np.float64),
            np.asarray(ours.cache.target[i], np.float64),
            rtol=1e-6,
        )


@pytest.mark.parametrize("dataset_type,n_feats", [
    ("padded_breath_by_breath_with_limited_bm_target", 3),
    ("padded_breath_by_breath_with_experimental_bm_target", 7),
])
def test_other_bm_targets_match_reference(ref_dataset_mod, cohort,
                                          dataset_type, n_feats):
    """Limited/experimental bm-target variants (reference:
    dataset.py:525-531).  Run under the 'main' holdout — the reference's
    actual pretraining protocol — because its kfold splitter computes
    y=argmax(target) (dataset.py:1433), which for these feature subsets
    lands outside {0,1} for every window and crashes StratifiedKFold."""
    from deepards_tpu.data.dataset import ARDSRawDataset

    kwargs = dict(n_sub_batches=1, dataset_type=dataset_type,
                  holdout_set_type="main")
    ref = ref_dataset_mod.ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"],
        all_sequences=[], **kwargs)
    ours = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)
    assert len(ref.all_sequences) == len(ours.cache.data)
    for i, item in enumerate(ref.all_sequences):
        np.testing.assert_allclose(
            np.asarray(item[1], np.float32).reshape(-1),
            np.asarray(ours.cache.data[i], np.float32).reshape(-1),
            atol=1e-6)
        meta = np.asarray(item[2], np.float64)
        assert meta.shape == (n_feats,)
        np.testing.assert_allclose(
            meta, np.asarray(ours.cache.target[i], np.float64), rtol=1e-6)


def test_unpadded_centered_with_bm_matches_reference(ref_dataset_mod,
                                                     cohort):
    """ProtoPNet's dataset type: windows + mean/median breath-meta rows
    (reference: dataset.py:1083-1178)."""
    from deepards_tpu.data.dataset import ARDSRawDataset

    kwargs = dict(n_sub_batches=2,
                  dataset_type="unpadded_centered_with_bm",
                  kfold_num=0, total_kfolds=2)
    ref = ref_dataset_mod.ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"],
        all_sequences=[], **kwargs)
    ours = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)
    assert len(ref.all_sequences) == len(ours.cache.data)
    for i, item in enumerate(ref.all_sequences):
        pt, window, mean_meta, median_meta, target = item[:5]
        assert str(pt) == str(
            ours.cache.patients[ours.cache.patient_idx[i]])
        np.testing.assert_allclose(
            np.asarray(window, np.float32), ours.cache.data[i], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(target, np.float32), ours.cache.target[i])
        our_meta = np.asarray(ours.cache.meta[i], np.float64)
        np.testing.assert_allclose(
            np.asarray(mean_meta, np.float64), our_meta[0], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(median_meta, np.float64), our_meta[1], rtol=1e-6)


@pytest.mark.parametrize("dataset_type,case", [
    ("unpadded_centered_sequences", {}),
    ("padded_breath_by_breath", {}),  # padded mu-mask normalization
    ("unpadded_centered_sequences", {"butter_low": 8}),  # lowpass arm
    ("unpadded_centered_sequences", {"butter_low": 2, "butter_high": 10}),
    ("padded_breath_by_breath", {"post_hoc_downsampling": 2.0}),
    ("unpadded_centered_sequences",
     {"fft_filtering_low": 1, "fft_filtering_high": 10}),
])
def test_getitem_transforms_match_reference(ref_dataset_mod, cohort,
                                            dataset_type, case):
    """The actual training inputs: the reference's __getitem__
    normalization + butter/downsample/FFT stack (dataset.py:1343-1404)
    vs our jitted transform_batch over the same windows."""
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.data.pipeline import BatchPipeline

    kwargs = dict(n_sub_batches=2, dataset_type=dataset_type,
                  kfold_num=0, total_kfolds=2, **case)
    ref = ref_dataset_mod.ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"],
        all_sequences=[], **kwargs)
    ours = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)
    ours.set_kfold_indexes_for_fold(0)
    ref.set_kfold_indexes_for_fold(0)

    pipeline = BatchPipeline(ours)
    idx = np.asarray(ours.current_indices()[:8])
    batch = ours.gather(idx)
    transformed = np.asarray(pipeline(np.asarray(batch["data"])))

    for rel in range(len(idx)):
        _, ref_data, _, _ = ref[rel]
        np.testing.assert_allclose(
            np.asarray(ref_data, np.float32),
            transformed[rel],
            atol=2e-4,
            err_msg="{} {} item {}".format(dataset_type, case, rel),
        )


@pytest.fixture(scope="module")
def ref_metrics_mod():
    """The reference's metrics.py, with prettytable (absent here) and
    its optional dtw_lib import shimmed."""
    path = "/root/reference/deepards/metrics.py"
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")

    prettytable = types.ModuleType("prettytable")

    class PrettyTable:
        def __init__(self, *a, **k):
            self.field_names = []
            self._rows = []

        def add_row(self, row):
            self._rows.append(row)

        def __str__(self):
            return "\n".join(str(r) for r in self._rows)

    prettytable.PrettyTable = PrettyTable
    deepards_pkg = types.ModuleType("deepards")
    deepards_pkg.__path__ = []
    dtw_lib = types.ModuleType("deepards.dtw_lib")
    deepards_pkg.dtw_lib = dtw_lib
    injected = {
        "prettytable": prettytable,
        "deepards": deepards_pkg,
        "deepards.dtw_lib": dtw_lib,
    }
    saved = {k: sys.modules.get(k) for k in injected}
    sys.modules.update(injected)
    try:
        spec = importlib.util.spec_from_file_location("ref_metrics", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_patient_vote_aggregation_matches_reference(ref_metrics_mod,
                                                    tmp_path, capsys):
    """Patient-level vote rows, pred_frac, majority predictions and the
    aggregate accuracy/sensitivity/precision/AUC/f1 table vs the
    reference's DeepARDSResults (reference: metrics.py:572-626,
    317-351) on identical mock predictions."""
    import pandas as pd

    from deepards_tpu.eval.metrics import DeepARDSResults

    rng = np.random.default_rng(5)
    rows = []
    for pt in range(8):
        y = pt % 2
        rows += [[str(pt), y]] * 25
    y_test = pd.DataFrame(rows, columns=["patient", "y"])
    preds = pd.Series(rng.integers(0, 2, len(y_test)), index=y_test.index)

    ref = ref_metrics_mod.DeepARDSResults(0, "difftest")
    ref.perform_patient_predictions(y_test, preds, 0, 0)
    capsys.readouterr()

    ours = DeepARDSResults(0, "difftest", results_dir=str(tmp_path))
    our_stats = ours.perform_patient_predictions(
        y_test, preds, 0, 0, verbose=False)

    # per-patient vote rows
    shared_cols = [c for c in ref.results.columns]
    assert list(ours.results.columns) == shared_cols
    ref_rows = ref.results.sort_values("patient").reset_index(drop=True)
    our_rows = ours.results.sort_values("patient").reset_index(drop=True)
    for col in shared_cols:
        np.testing.assert_array_equal(
            np.asarray(ref_rows[col].tolist()),
            np.asarray(our_rows[col].tolist()), err_msg=col)

    # aggregate stats table
    ref_stats = ref._aggregate_specific_results(ref.results, 0, 0)
    for col in ("accuracy", "sensitivity", "specificity", "precision",
                "auc", "f1"):
        np.testing.assert_allclose(
            np.asarray(ref_stats[col], np.float64),
            np.asarray(our_stats[col], np.float64),
            atol=1e-9, err_msg=col)

    # meters recorded identically
    for meter in ("test_auc", "test_patient_accuracy", "test_prec_ards",
                  "test_sen_ards", "test_f1_ards"):
        ref_meter = ref.reporting.meters["{}_fold_0".format(meter)]
        np.testing.assert_allclose(
            ref_meter.values.numpy()
            if hasattr(ref_meter.values, "numpy")
            else np.asarray(ref_meter.values),
            np.asarray(ours.get_meter(meter, 0).values),
            atol=1e-9, err_msg=meter)


def test_losses_match_reference(ref_metrics_mod):
    """BCE / vacillating / confidence-penalty losses vs the reference's
    loss.py on identical logits (reference: loss.py:7-35)."""
    spec = importlib.util.spec_from_file_location(
        "ref_loss", "/root/reference/deepards/loss.py")
    ref_loss = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_loss)

    from deepards_tpu.train import losses as our_losses

    rng = np.random.default_rng(11)
    logits = rng.normal(size=(12, 2)).astype(np.float32)
    target = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 12)]
    t_logits = torch.from_numpy(logits)
    t_target = torch.from_numpy(target)

    ref_bce = float(torch.nn.BCEWithLogitsLoss()(t_logits, t_target))
    np.testing.assert_allclose(
        float(our_losses.bce_with_logits(logits, target)), ref_bce,
        rtol=1e-6)

    # vacillating loss operates on per-breath (B, S, 2) logits: the mean
    # softmax over the S axis is what gets pushed away from 0.5
    # (reference use: PerBreathClassifierMixin outputs).  With confident
    # logits the left-hand branch is invalid exactly where the right-hand
    # value is valid, which is the incidental shape agreement the
    # reference's in-place patch-up (loss.py:21) depends on.
    vlogits = (rng.normal(size=(6, 10, 2)) * 3).astype(np.float32)
    vtarget = np.repeat(
        np.eye(2, dtype=np.float32)[rng.integers(0, 2, 6)][:, None, :],
        10, axis=1)
    alpha = 2.0
    ref_vac = float(ref_loss.VacillatingLoss(
        torch.tensor(alpha))(torch.from_numpy(vlogits),
                             torch.from_numpy(vtarget)))
    np.testing.assert_allclose(
        float(our_losses.vacillating_loss(vlogits, vtarget, alpha)),
        ref_vac, rtol=1e-5)

    beta = 0.3
    ref_conf = float(ref_loss.ConfidencePenaltyLoss(beta)(
        t_logits, t_target))
    np.testing.assert_allclose(
        float(our_losses.confidence_penalty_loss(logits, target, beta)),
        ref_conf, rtol=1e-5)


def test_siamese_triplets_match_reference(ref_dataset_mod,
                                          tmp_path_factory):
    """Siamese positive-pair selection + single-window-patient drop vs
    the reference's SiameseNetworkDataset (reference:
    dataset.py:1463-1620).  Negatives are random draws in both stacks
    (statistical parity), so only their other-patient invariant is
    checked."""
    from deepards_tpu.data.siamese_dataset import SiameseWindowDataset
    from deepards_tpu.data.synthetic import generate_cohort

    data_path = str(tmp_path_factory.mktemp("siam_cohort"))
    cohort_file = generate_cohort(
        data_path, n_patients=4, n_breaths_per_patient=120, seed=21,
        subdirs=("all_data", "aim1_70_30_training", "aim1_70_30_testing",
                 "prototrain", "prototest"))

    # padded_breath_by_breath is the reference siamese's only working
    # builder: its get_unpadded_sequences_dataset override still calls the
    # pre-refactor 3-argument processing signature (dataset.py:1568) and
    # crashes, matching the launcher's own "XXX need to add processing
    # for unpadded types" note (preprocess_siamese_models.py:19)
    ref = ref_dataset_mod.SiameseNetworkDataset(
        data_path, 1, 2, "padded_breath_by_breath",
        all_sequences=[], train=True)
    ours = SiameseWindowDataset(
        data_path=data_path, experiment_num=1, n_sub_batches=2,
        dataset_type="padded_breath_by_breath", cohort_file=cohort_file,
        train=True)

    # Our siamese view is built on the standard ARDSRawDataset, which
    # applies the per-breath filters (>=21 samples, vent_bn frame drops)
    # the reference siamese builder skips (dataset.py:1519-1545 has no
    # length filter) — so ours is a filtered SUBSET of the reference's
    # windows, under the same mu/std and the same positive-pair rule.
    assert len(ours) <= len(ref)
    assert len(ours) >= 0.9 * len(ref)  # only tail breaths get filtered

    def key(arr):
        return np.asarray(arr, np.float32).tobytes()

    ref_windows = {key(item[1]) for item in ref.all_sequences}
    np.random.seed(0)
    rel = np.arange(len(ours))
    anchors, poss, negs = ours.sample_triplet_indices(rel)
    for i in rel:
        our_anchor = ours.base.cache.data[anchors[i]]
        assert key(our_anchor) in ref_windows, i
        # positive = an adjacent window of the same patient
        anchor_pt = ours.base.cache.patients[ours.base.cache.patient_idx[anchors[i]]]
        pos_pt = ours.base.cache.patients[ours.base.cache.patient_idx[poss[i]]]
        neg_pt = ours.base.cache.patients[ours.base.cache.patient_idx[negs[i]]]
        assert anchor_pt == pos_pt
        assert abs(int(poss[i]) - int(anchors[i])) == 1
        assert anchor_pt != neg_pt


@pytest.mark.parametrize("add_fft,fft_real_only", [
    (False, False),
    (True, False),
    (True, True),
])
def test_img_dataset_matches_reference(ref_dataset_mod, cohort, add_fft,
                                       fft_real_only):
    """2D image assembly (row packing, zero-pad, optional FFT channels)
    and per-fold image scaling vs the reference's ImgARDSDataset
    (reference: dataset.py:1623-1774, 1827-1855)."""
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.data.img_dataset import ImgARDSDataset

    kwargs = dict(n_sub_batches=2,
                  dataset_type="unpadded_centered_sequences",
                  kfold_num=0, total_kfolds=2)
    ref_raw = ref_dataset_mod.ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"],
        all_sequences=[], **kwargs)
    # latent reference defect: ImgARDSDataset.__init__ reaches the
    # inherited set_kfold_patient_splits, which reads self.bootstrap /
    # self.random_kfold — attributes only ARDSRawDataset.__init__ sets
    # (the Img subclass never calls it), so current reference code
    # crashes at construction; class attributes restore the
    # pre-bootstrap-era behavior it was written against
    ref_dataset_mod.ImgARDSDataset.bootstrap = False
    ref_dataset_mod.ImgARDSDataset.random_kfold = False
    ref_img = ref_dataset_mod.ImgARDSDataset(
        ref_raw, [], add_fft, False, fft_real_only, False, False)

    our_raw = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)
    our_img = ImgARDSDataset(our_raw, add_fft=add_fft,
                             fft_real_only=fft_real_only)

    assert len(ref_img.all_sequences) == len(our_img.images)
    for i, item in enumerate(ref_img.all_sequences):
        pt, img, target = item[0], item[1], item[2]
        # reference images are (H, W, C); ours (C, H, W)
        ref_chw = np.transpose(np.asarray(img, np.float32), (2, 0, 1))
        np.testing.assert_allclose(
            ref_chw, our_img.images[i], atol=1e-4,
            err_msg="image {} (fft={},{})".format(i, add_fft,
                                                  fft_real_only))
        np.testing.assert_allclose(
            np.asarray(target, np.float32), our_img.target[i])
        assert str(pt) == str(
            our_img.patients[our_img.patient_idx[i]])

    # per-fold image scaling: reference broadcasts per-channel values to
    # (224, 224, C); ours stores per-channel scalars
    for fold in range(2):
        ref_mu, ref_std = ref_img.scaling_factors[fold]
        our_mu, our_std = our_img.scaling_factors[fold]
        for ref_v, our_v in ((ref_mu, our_mu), (ref_std, our_std)):
            per_chan = np.asarray(ref_v, np.float64)[0, 0, :]
            np.testing.assert_allclose(
                per_chan, np.ravel(np.asarray(our_v, np.float64)),
                rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("add_fft,only_fft,real_only", [
    (True, False, False),
    (False, True, True),
])
def test_1d_fft_channels_match_reference(ref_dataset_mod, cohort,
                                         add_fft, only_fft, real_only):
    """1D FFT input channels vs the reference's _perform_fft
    (reference: dataset.py:1330-1341), including its no-axes fftshift
    that rolls the window axis by S//2."""
    from deepards_tpu.data.dataset import ARDSRawDataset

    kwargs = dict(n_sub_batches=2,
                  dataset_type="unpadded_centered_sequences",
                  kfold_num=0, total_kfolds=2, add_fft=add_fft,
                  only_fft=only_fft, fft_real_only=real_only)
    ref = ref_dataset_mod.ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"],
        all_sequences=[], **kwargs)
    ours = ARDSRawDataset(
        cohort["data_path"], 1, cohort["cohort_file"], **kwargs)
    assert len(ref.all_sequences) == len(ours.cache.data)
    for i, item in enumerate(ref.all_sequences):
        np.testing.assert_allclose(
            np.asarray(item[1], np.float32), ours.cache.data[i],
            atol=1e-4, err_msg="fft seq {}".format(i))


class _Legacy2DRng:
    """Replays the global legacy np.random stream through the
    Generator-style surface the 2D transforms consume."""

    def random(self):
        return np.random.random()

    def permutation(self, n):
        return np.random.permutation(n)

    def uniform(self, lo, hi, size=None):
        return np.random.uniform(lo, hi, size)

    def normal(self, loc, scale, size=None):
        return np.random.normal(loc, scale, size)

    def integers(self, lo, hi, size=None):
        return np.random.randint(lo, hi, size)

    def choice(self, arr, size=None):
        return np.random.choice(arr, size=size)


@pytest.mark.parametrize("key,seed", [
    ("row_shuffle", 11), ("row_horiz_flip", 12), ("scale", 13),
    ("mag_warp", 14), ("time_warp", 15), ("win_warp", 16),
    ("win_slice", 17),
])
def test_2d_transforms_match_reference(ref_dataset_mod, key, seed):
    """2D augmentation draw-shape exactness: each np.random-driven
    transform in the reference registry (reference: dataset.py:108-340)
    run on the same seeded image must match ours bitwise — same draw
    shapes (per (channel, row) warps), same call order, same math.
    horiz/vert flip are excluded: the reference delegates those to
    torchvision (torch RNG stream, not np.random)."""
    from deepards_tpu.data.img_transforms import two_dim_transforms

    rng = np.random.default_rng(99)
    x = rng.normal(size=(2, 12, 48)).astype(np.float64)

    np.random.seed(seed)
    ref_t = getattr(ref_dataset_mod, "two_dim_transforms")[key](p=1.0)
    ref_out = np.asarray(ref_t.forward(torch.from_numpy(x.copy())))

    np.random.seed(seed)
    ours = two_dim_transforms[key](p=1.0)(x.copy(), rng=_Legacy2DRng())
    np.testing.assert_allclose(ours, ref_out, atol=1e-12,
                               err_msg="2d transform {}".format(key))


def test_2d_window_warp_by_row_matches_reference(ref_dataset_mod):
    """The by_row variant draws one scale per ROW (reference:
    dataset.py:157-166 warp_dim) — pin that path too."""
    from deepards_tpu.data.img_transforms import RandomWindowWarping

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 6, 40)).astype(np.float64)
    np.random.seed(21)
    ref_t = ref_dataset_mod.RandomWindowWarping(p=1.0, by_row=True)
    ref_out = np.asarray(ref_t.forward(torch.from_numpy(x.copy())))
    np.random.seed(21)
    ours = RandomWindowWarping(p=1.0, by_row=True)(
        x.copy(), rng=_Legacy2DRng())
    np.testing.assert_allclose(ours, ref_out, atol=1e-12)
