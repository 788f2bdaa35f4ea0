import numpy as np
import pytest

from deepards_tpu.ops.dtw import dtw_numpy, dtw_pallas, dtw_scan


@pytest.fixture(scope="module")
def pairs(rng2=np.random.default_rng(3)):
    n = 48
    a = rng2.normal(size=(6, n)).astype(np.float32)
    b = rng2.normal(size=(6, n)).astype(np.float32)
    la = rng2.integers(20, n + 1, size=6).astype(np.int32)
    lb = rng2.integers(20, n + 1, size=6).astype(np.int32)
    a[np.arange(n)[None, :] >= la[:, None]] = 0
    b[np.arange(n)[None, :] >= lb[:, None]] = 0
    oracle = np.array([
        dtw_numpy(a[i, : la[i]], b[i, : lb[i]]) for i in range(6)
    ])
    return a, b, la, lb, oracle


def test_dtw_scan_matches_oracle(pairs):
    a, b, la, lb, oracle = pairs
    out = np.asarray(dtw_scan(a, b, la, lb))
    np.testing.assert_allclose(out, oracle, rtol=1e-4)


def test_dtw_scan_identical_sequences_zero(pairs):
    a, b, la, lb, oracle = pairs
    out = np.asarray(dtw_scan(a, a, la, la))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_dtw_scan_full_length_default():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 32)).astype(np.float32)
    b = rng.normal(size=(2, 32)).astype(np.float32)
    out = np.asarray(dtw_scan(a, b))
    oracle = np.array([dtw_numpy(a[i], b[i]) for i in range(2)])
    np.testing.assert_allclose(out, oracle, rtol=1e-4)


def test_dtw_pallas_interpret_matches_oracle(pairs):
    a, b, la, lb, oracle = pairs
    out = np.asarray(dtw_pallas(a, b, la, lb, block_b=8, interpret=True))
    np.testing.assert_allclose(out, oracle, rtol=1e-4)


def test_dtw_shift_invariance():
    """DTW of a signal vs its time-warped self is far below vs noise."""
    t = np.linspace(0, 4 * np.pi, 64)
    a = np.sin(t).astype(np.float32)
    b = np.sin(t * 1.1).astype(np.float32)
    noise = np.random.default_rng(1).normal(size=64).astype(np.float32)
    d_warp = float(dtw_scan(a[None], b[None])[0])
    d_noise = float(dtw_scan(a[None], noise[None])[0])
    assert d_warp < d_noise / 3


def test_native_dtw_matches_oracle(pairs):
    from deepards_tpu.ops.native import load_native_dtw

    fn = load_native_dtw()
    if fn is None:
        pytest.skip("no native toolchain")
    a, b, la, lb, oracle = pairs
    out = fn(a, b, la, lb)
    np.testing.assert_allclose(out, oracle, rtol=1e-5)


def test_per_breath_rolling_scores():
    from deepards_tpu.dtw.lib import per_breath_dtw_scores

    rng = np.random.default_rng(2)
    breaths = [rng.normal(size=rng.integers(30, 60)) for _ in range(8)]
    scores = per_breath_dtw_scores(breaths, n_breaths=3)
    assert np.isnan(scores[:3]).all()
    assert np.isfinite(scores[3:]).all()
    # manual check for breath 3
    expected = np.mean([
        dtw_numpy(breaths[3], breaths[2]),
        dtw_numpy(breaths[3], breaths[1]),
        dtw_numpy(breaths[3], breaths[0]),
    ])
    np.testing.assert_allclose(scores[3], expected, rtol=1e-4)


def test_kmedoids_matches_reference_mediods():
    """Differential: identical medoids/labels/inertia vs the reference's
    own vendored estimator on shared precomputed distance fixtures
    (reference: deepards/mediods.py:24-433; both use the deterministic
    'heuristic' init + strict-improvement alternate updates)."""
    import importlib.util

    from deepards_tpu.dtw.kmedoids import KMedoids

    spec = importlib.util.spec_from_file_location(
        "ref_mediods", "/root/reference/deepards/mediods.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(42)
    for n, k in [(20, 2), (30, 4), (50, 8)]:
        pts = rng.normal(size=(n, 3))
        D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        ours = KMedoids(k, metric="precomputed").fit(D)
        theirs = ref.KMedoids(k, metric="precomputed").fit(D)
        np.testing.assert_array_equal(
            np.asarray(ours.medoid_indices_),
            np.asarray(theirs.medoid_indices_))
        np.testing.assert_array_equal(ours.labels_, theirs.labels_)
        np.testing.assert_allclose(ours.inertia_, theirs.inertia_,
                                   rtol=1e-9)


def test_kmedoids_duplicate_point_ties_match_reference():
    """Medoid-adoption edge: duplicated points create zero-distance ties
    that can pull a medoid out of its own cluster (argmin assigns it to
    a lower-indexed cluster).  The reference's vendored estimator then
    costs the absent medoid as members[0] (mediods.py:248-250 argmax
    over an all-False mask); our defensive lookup reproduces that quirk
    deliberately — this fixture pins bit-identity on such ties."""
    import importlib.util

    from deepards_tpu.dtw.kmedoids import KMedoids

    spec = importlib.util.spec_from_file_location(
        "ref_mediods_ties", "/root/reference/deepards/mediods.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(7)
    for trial in range(12):
        base = rng.normal(size=(12, 2))
        # heavy duplication: every point appears 2-3 times
        reps = rng.integers(2, 4, size=len(base))
        pts = np.repeat(base, reps, axis=0)
        rng.shuffle(pts)
        D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        for k in (2, 3, 5):
            ours = KMedoids(k, metric="precomputed").fit(D)
            import warnings as _w
            with _w.catch_warnings():
                _w.simplefilter("ignore")
                theirs = ref.KMedoids(k, metric="precomputed").fit(D)
            np.testing.assert_array_equal(
                np.asarray(ours.medoid_indices_),
                np.asarray(theirs.medoid_indices_))
            np.testing.assert_array_equal(ours.labels_, theirs.labels_)


def test_kmedoids_precomputed():
    from deepards_tpu.dtw.kmedoids import KMedoids

    # two obvious clusters
    pts = np.concatenate([
        np.random.default_rng(0).normal(0, 0.1, size=(5, 2)),
        np.random.default_rng(1).normal(5, 0.1, size=(5, 2)),
    ])
    D = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
    km = KMedoids(2, metric="precomputed").fit(D)
    labels = km.predict(D)
    assert len(set(labels[:5])) == 1
    assert len(set(labels[5:])) == 1
    assert labels[0] != labels[5]


def test_similarity_matrix_and_pickers(synthetic_cohort):
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.dtw.lib import (
        find_patient_similarity,
        mediod_process,
        pick_dissimilar_pts,
        pick_similar_pts,
    )

    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    mat = find_patient_similarity(ds, dist_method="random", n_random=2)
    assert (mat.values >= 0).all()
    assert (mat.values == mat.values.T).all()
    assert (np.diag(mat.values) == 0).all()

    sim = pick_similar_pts(mat, ds, n_pts=4)
    assert sim and len(sim[0][1]) == 4
    dis = pick_dissimilar_pts(mat, ds, n_pts=4)
    assert dis and len(dis[0][1]) == 4
    # dissimilar set cost should be >= similar set cost scale
    clusts = mediod_process(mat, 2, ds)
    assert set(clusts.clust) <= {0, 1}


def test_undersampler_integration(synthetic_cohort):
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.dtw.lib import build_patient_score_map

    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    score_map = build_patient_score_map(ds)
    assert len(score_map) > 0
    ds.dtw_scores = score_map
    ds.undersample_factor = 0.5
    ds.undersample_std_factor = 1.0
    before = len(ds.current_indices())
    ds.set_kfold_indexes_for_fold(0)
    after = len(ds.current_indices())
    assert after < before


def test_hetero_split_generation_and_breakdown(synthetic_cohort, tmp_path):
    """Train-similar/test-sim+dissim splits + per-group stat breakdown
    (reference: scripts/hetero/train_sim_test_sim_dissim.py)."""
    import pandas as pd
    import yaml

    from deepards_tpu.cli.sim_dissim import (
        generate_hetero_splits,
        sim_dissim_breakdown,
    )
    from deepards_tpu.data.dataset import ARDSRawDataset

    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    written = generate_hetero_splits(
        ds, str(tmp_path), n_splits=3, train_n=2, test_n=1,
        mean_similarity_thresh=1.0, seed=3,
    )
    # split_n is named after candidate index n; candidate 0 is skipped,
    # matching the reference runner's numbering (ADVICE r2)
    assert len(written) == 2
    assert written[0].endswith("train_sim_test_sim_dissim_split_1.yml")
    assert written[1].endswith("train_sim_test_sim_dissim_split_2.yml")
    with open(written[0]) as f:
        split = yaml.safe_load(f)
    assert set(split) == {"train", "test", "similar", "dissimilar"}
    # test groups are disjoint from train and from each other
    assert not set(split["train"]) & set(split["test"])
    assert not set(split["similar"]) & set(split["dissimilar"])
    assert set(split["test"]) == set(split["similar"]) | set(
        split["dissimilar"])

    # breakdown over a fabricated patient-results frame
    from deepards_tpu.eval.metrics import DeepARDSResults

    res = DeepARDSResults(0, "hetero_test", results_dir=str(tmp_path),
                          testing=True)
    gt = ds.get_ground_truth_df()
    test_pts = split["test"]
    sub = gt[gt.patient.astype(str).isin(test_pts)]
    preds = pd.Series(sub.y.values, index=sub.index)  # perfect predictions
    res.perform_patient_predictions(sub, preds, 0, 0, verbose=False)
    frames = sim_dissim_breakdown(res.results, split)
    assert frames
    for kind, stats in frames.items():
        assert (stats.group == kind).all()
        row = stats[stats.patho == "ARDS"]
        if len(row) and not pd.isna(row.iloc[0].accuracy):
            assert row.iloc[0].accuracy == 1.0


def test_dtw_full_matches_oracle_and_valid_path():
    """dtw_full == the numpy DP oracle, with a valid monotone warping
    path (dtwco dist_only=False surface, dtw_grad_cam.py:17,66)."""
    from deepards_tpu.ops.dtw import dtw_full, dtw_numpy

    rng = np.random.default_rng(4)
    a = rng.normal(size=37)
    b = rng.normal(size=29)
    d, cost, (px, py) = dtw_full(a, b)
    np.testing.assert_allclose(d, dtw_numpy(a, b), rtol=1e-12)
    assert cost.shape == (37, 29)
    np.testing.assert_allclose(cost[-1, -1], d)
    # path: (0,0) -> (n-1, m-1), monotone non-decreasing, steps of <= 1
    assert (px[0], py[0]) == (0, 0)
    assert (px[-1], py[-1]) == (36, 28)
    dx, dy = np.diff(px), np.diff(py)
    assert ((dx >= 0) & (dx <= 1)).all()
    assert ((dy >= 0) & (dy <= 1)).all()
    assert ((dx + dy) >= 1).all()


def test_dtw_cam_match_identical_breaths():
    from deepards_tpu.explain.dtw_gradcam import dtw_cam_match

    br = np.sin(np.linspace(0, 6, 64)).astype(np.float32)
    cam = np.linspace(0, 255, 64)
    res = dtw_cam_match(br, br, cam, cam, min_run=5)
    assert res["distance"] == 0.0
    # identical sequences -> pure diagonal path -> one lockstep run
    assert len(res["runs"]) == 1
    run = res["runs"][0]
    assert run["cam_dist"] == 0
    assert run["seq1"] == run["seq2"]
    assert len(run["seq1"]) == 64
    assert (res["cam_dists"] == 0).all()


def test_find_similar_cam_regions(synthetic_cohort):
    """Batched cam extraction + pairwise DTW alignment screen
    (reference: scripts/exploratory/dtw_grad_cam.py:109-140)."""
    import jax
    import jax.numpy as jnp

    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.dtw_gradcam import find_similar_cam_regions
    from deepards_tpu.explain.gradcam import MaxMinNormCam
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork

    ds = ARDSRawDataset(
        synthetic_cohort["data_path"], 1, synthetic_cohort["cohort_file"],
        n_sub_batches=2, dataset_type="unpadded_centered_sequences",
        kfold_num=0, total_kfolds=2,
    )
    model = CNNLinearNetwork(breath_block=densenet18())
    x = jnp.asarray(ds.cache.data[:2])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, True,
    )["params"]
    cam_gen = MaxMinNormCam(model, params)
    pt = ds.get_ground_truth_df().patient.iloc[0]
    pairs, dists = find_similar_cam_regions(
        cam_gen, ds, pt, target=1, n_windows=2,
        max_cam_dist=10**9, min_cam1_sum=-1,  # keep every run (smoke)
    )
    assert len(dists) > 0
    assert pairs  # with no thresholds every run qualifies
    run = pairs[0]["run"]
    assert len(run["seq1"]) == len(run["seq2"]) > 5


def test_batched_dtw_pairs_sorted_chunks_scatter_identity():
    """The length-sorted, shape-bucketed dispatch (chunk 8192, batch
    padded to a power of two, width to a multiple of 64) must return
    per-pair values identical to an unchunked per-pair oracle, in input
    order — including a ragged long outlier and a non-power-of-two
    pair count that forces batch padding."""
    from deepards_tpu.dtw.lib import batched_dtw_pairs

    rng = np.random.default_rng(11)
    lens = list(rng.integers(25, 90, size=13)) + [301]  # one long outlier
    seqs_a = [rng.normal(size=n).astype(np.float32) for n in lens]
    seqs_b = [rng.normal(size=n).astype(np.float32) for n in lens]
    # tiny chunk forces multiple dispatches AND exercises the scatter
    out_chunked = batched_dtw_pairs(seqs_a, seqs_b, chunk=5)
    out_default = batched_dtw_pairs(seqs_a, seqs_b)
    oracle = np.array([
        dtw_numpy(a, b) for a, b in zip(seqs_a, seqs_b)
    ])
    np.testing.assert_allclose(out_chunked, oracle, rtol=1e-4)
    np.testing.assert_allclose(out_default, oracle, rtol=1e-4)
    np.testing.assert_allclose(out_chunked, out_default, rtol=1e-6)
