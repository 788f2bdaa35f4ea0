"""DTW heterogeneity subsystem: per-breath scores, inter-patient
similarity, cohort pickers.

Capability-parity rebuild of the reference DTW library
(reference: deepards/dtw_lib.py:40-409).  TPU-native shift: the reference
computed one C-backed DTW at a time behind a multiprocessing pool
(dtw_lib.py:284-293); here every scoring task is flattened into one padded
pair-batch and dispatched to the batched device kernel
(deepards_tpu.ops.dtw), removing the pool entirely.
"""
import os

import numpy as np
import pandas as pd

from deepards_tpu.ops.dtw import dtw_batch


def _pad_pairs(seqs_a, seqs_b, width_bucket=64, batch_bucket=True):
    """Ragged pair lists -> padded (B, n) arrays + length vectors.

    Both dims are bucketed so the device kernel sees a handful of
    compiled shapes across a whole similarity sweep instead of one per
    chunk: the width rounds up to a multiple of ``width_bucket`` and the
    batch to the next power of two (>=128).  Pad rows carry length 1
    (a 1x1 DP is valid and ignored); per-pair results are independent of
    both paddings because the kernel masks by (la, lb)."""
    n = max(
        max((len(a) for a in seqs_a), default=1),
        max((len(b) for b in seqs_b), default=1),
    )
    n = -(-n // width_bucket) * width_bucket
    bsz = len(seqs_a)
    padded_bsz = bsz
    if batch_bucket:
        padded_bsz = 128
        while padded_bsz < bsz:
            padded_bsz *= 2
    def fill(seqs):
        dst = np.zeros((padded_bsz, n), np.float32)
        lens = np.ones(padded_bsz, np.int32)
        if bsz:
            ls = np.fromiter((len(s) for s in seqs), np.int64, count=bsz)
            lens[:bsz] = ls
            # vectorized ragged scatter: row r gets seqs[r][:ls[r]]
            rows = np.repeat(np.arange(bsz), ls)
            starts = np.cumsum(ls) - ls
            cols = np.arange(ls.sum()) - np.repeat(starts, ls)
            dst[rows, cols] = np.concatenate(
                [np.asarray(s, np.float32).ravel() for s in seqs]
            )
        return dst, lens

    a, la = fill(seqs_a)
    b, lb = fill(seqs_b)
    return a, b, la, lb


def batched_dtw_pairs(seqs_a, seqs_b, chunk=8192):
    """DTW distance for each (seqs_a[i], seqs_b[i]) pair; ragged input.

    Dispatch discipline (the kernel compiles per (B, n) shape):
    - pairs are processed in length-sorted order, so one long outlier
      inflates the padded width of one chunk, not every chunk;
    - chunks are LARGE: the wavefront kernel only saturates the chip
      well past 4k pairs (measured knee, bench.py config 8: 4096 pairs
      -> 128k pairs/s, 65536 -> 416k; the old 512-pair chunks ran
      floor-dominated at ~20k pairs/s);
    - shapes are bucketed by ``_pad_pairs`` so repeated sweeps hit the
      XLA compile cache.
    Results are scattered back to input order; each pair's DP runs in
    its own lanes, so values are independent of chunking and sorting.
    """
    m = len(seqs_a)
    out = np.zeros(m, np.float64)
    if m == 0:
        return out
    order = np.argsort(
        [max(len(a), len(b)) for a, b in zip(seqs_a, seqs_b)],
        kind="stable",
    )
    for start in range(0, m, chunk):
        idx = order[start : start + chunk]
        a, b, la, lb = _pad_pairs(
            [seqs_a[i] for i in idx], [seqs_b[i] for i in idx]
        )
        out[idx] = np.asarray(
            dtw_batch(a, b, la, lb)[: len(idx)], np.float64
        )
    return out


def per_breath_dtw_scores(breaths, n_breaths=3):
    """Rolling DTW of each breath vs its previous ``n_breaths`` breaths
    (reference: dtw_lib.py:330-336): score_i = mean_k dtw(b_i, b_{i-k}).

    The rolling window is pure indexing — all (i, i-k) pairs flatten into
    one device batch.  Returns (len(breaths),) with NaN for the first
    ``n_breaths`` entries.
    """
    n = len(breaths)
    scores = np.full(n, np.nan)
    if n <= n_breaths:
        return scores
    pairs_a, pairs_b, owners = [], [], []
    for i in range(n_breaths, n):
        for k in range(1, n_breaths + 1):
            pairs_a.append(breaths[i])
            pairs_b.append(breaths[i - k])
            owners.append(i)
    d = batched_dtw_pairs(pairs_a, pairs_b)
    d = d.reshape(n - n_breaths, n_breaths).mean(axis=1)
    scores[n_breaths:] = d
    return scores


def dtw_analyze(pt_data, n_breaths, rolling_av_len, pt_preds_by_hour):
    """(reference: dtw_lib.py:338-372) — per-breath rolling DTW over a
    patient's window sequence, aligned with prediction hours."""
    breaths = []
    df_idx = []
    hrs = []
    pt_obs_idxs = list(pd.unique(pt_preds_by_hour.index))
    for idx, seq in enumerate(pt_data):
        cur_obs_idx = pt_obs_idxs[idx] if idx < len(pt_obs_idxs) else idx
        hours = pt_preds_by_hour.loc[[cur_obs_idx]].hour.tolist()
        for j, breath in enumerate(np.asarray(seq)):
            breaths.append(np.asarray(breath).ravel())
            df_idx.append(cur_obs_idx)
            hrs.append(hours[j % len(hours)] if hours else np.nan)
    scores = per_breath_dtw_scores(breaths, n_breaths)
    hrs = np.asarray(hrs, np.float64)
    hrs[:n_breaths] = np.nan
    if rolling_av_len > 1:
        kern = np.ones(rolling_av_len) / rolling_av_len
        rolled = np.convolve(scores, kern, mode="valid")
        scores = np.append([np.nan] * (rolling_av_len - 1), rolled)
    return pd.DataFrame(
        {"dtw": scores, "hour": hrs}, index=df_idx
    )


def analyze_patient(patient_id, dataset, cache_dir, preds_by_hour,
                    n_breaths=3, rolling_len=1):
    """Per-patient rolling-DTW frame with on-disk cache
    (reference: dtw_lib.py:375-409).

    Cache-key provenance (deliberate): the filename carries every input
    that changes the DTW scores — patient, n_breaths, rolling_len,
    dataset_type, n_sub_batches, and kfold-vs-holdout split mode.  Other
    dataset knobs (butter/fft filters, downsampling) act at TRANSFORM
    time, after the cache's raw windows, and so do not feed the scores;
    this matches the reference's cache filename fields (dtw_lib.py:378).
    """
    pt_dir = os.path.join(cache_dir, str(patient_id))
    os.makedirs(pt_dir, exist_ok=True)
    split_type = "kfold" if dataset.kfold_num else "holdout"
    cache_file = "{}_n{}_rolling{}_{}_nb{}_{}.pkl".format(
        patient_id, n_breaths, rolling_len, dataset.dataset_type,
        dataset.n_sub_batches, split_type,
    )
    path = os.path.join(pt_dir, cache_file)
    if os.path.exists(path):
        return pd.read_pickle(path)

    y_test = dataset.get_ground_truth_df()
    pt_obs_idx = y_test[y_test.patient == patient_id].index
    pt_data = [dataset.cache.data[int(i)] for i in pt_obs_idx]
    if preds_by_hour is None:
        hours = dataset.cache.hours[np.asarray(pt_obs_idx, np.int64), 0]
        preds_by_hour = pd.DataFrame(
            {"hour": hours, "patient": patient_id}, index=pt_obs_idx
        )
    pt_preds = preds_by_hour[preds_by_hour.patient == patient_id]
    frame = dtw_analyze(pt_data, n_breaths, rolling_len, pt_preds)
    pd.to_pickle(frame, path)
    return frame


def build_patient_score_map(dataset, cache_dir=None):
    """Window-level mean DTW scores for the homogeneity undersamplers
    (reference consumes dtw_cache/patient_score_map.pkl,
    deepards/dataset.py:45-75).  Returns {window_index: score}."""
    gt = dataset.get_ground_truth_df()
    score_map = {}
    for pt in gt.patient.unique():
        idxs = gt[gt.patient == pt].index.to_numpy()
        breaths = [
            dataset.cache.data[int(i)].reshape(-1, dataset.seq_len)
            for i in idxs
        ]
        flat = [b for w in breaths for b in w]
        scores = per_breath_dtw_scores(flat, 3)
        s = dataset.cache.data.shape[1]
        per_window = np.nanmean(
            scores.reshape(len(idxs), s), axis=1
        )
        for i, idx in enumerate(idxs):
            if not np.isnan(per_window[i]):
                score_map[int(idx)] = float(per_window[i])
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        pd.to_pickle(
            score_map, os.path.join(cache_dir, "patient_score_map.pkl")
        )
    return score_map


def find_patient_similarity(dataset, results_path=None,
                            dist_method="same_ordered", n_random=50,
                            rng=None):
    """Inter-patient DTW distance matrix
    (reference: dtw_lib.py:185-307).  All cross-patient sequence pairs are
    batched to the device in one sweep — no multiprocessing pool.
    """
    rng = rng or np.random.default_rng(0)
    gt = dataset.get_ground_truth_df().sort_index()
    pts = list(gt.patient.unique())
    df_map = {pt: gt[gt.patient == pt] for pt in pts}

    pairs_a, pairs_b, owners = [], [], []
    for i, pt in enumerate(pts):
        for pt2 in pts[i + 1 :]:
            if dist_method == "same_ordered":
                m = min(len(df_map[pt]), len(df_map[pt2]))
                idx_a = df_map[pt].index[:m]
                idx_b = df_map[pt2].index[:m]
            elif dist_method == "random":
                n = min(n_random, len(df_map[pt]), len(df_map[pt2]))
                idx_a = rng.choice(df_map[pt].index, n, replace=False)
                idx_b = rng.choice(df_map[pt2].index, n, replace=False)
            else:
                raise ValueError(
                    'dist_method must be "random" or "same_ordered"'
                )
            for ia, ib in zip(idx_a, idx_b):
                pairs_a.append(dataset.cache.data[int(ia)].ravel())
                pairs_b.append(dataset.cache.data[int(ib)].ravel())
                owners.append((pt, pt2))
    dists = batched_dtw_pairs(pairs_a, pairs_b)
    mat = pd.DataFrame(0.0, index=pts, columns=pts)
    sums = {}
    counts = {}
    for (pt, pt2), d in zip(owners, dists):
        sums[(pt, pt2)] = sums.get((pt, pt2), 0.0) + d
        counts[(pt, pt2)] = counts.get((pt, pt2), 0) + 1
    for (pt, pt2), s in sums.items():
        mean = s / counts[(pt, pt2)]
        mat.loc[pt, pt2] = mean
        mat.loc[pt2, pt] = mean
    if results_path:
        pd.to_pickle(mat, results_path)
    return mat


def eval_set_for_candidacy(candidate, existing_sets, mean_similarity_thresh):
    """Candidate accepted if its mean patient overlap with already-accepted
    sets stays below the threshold (reference: dtw_lib.py pickers)."""
    if not existing_sets:
        return True
    overlaps = [
        len(set(candidate) & set(s)) / float(len(candidate))
        for s in existing_sets
    ]
    return float(np.mean(overlaps)) < mean_similarity_thresh


def pick_dissimilar_pts(dist_data, main_dataset, n_pts, exclude=None,
                        retrieve_n=1, mean_similarity_thresh=0.8):
    """Greedy max-distance patient sets with patho alternation
    (reference: dtw_lib.py:50-106)."""
    gt = main_dataset.get_ground_truth_df().sort_index()
    patho = gt.groupby("patient").y.first()
    patients = list(gt.patient.unique())
    if exclude:
        keep = [p for p in patients if p not in set(exclude)]
        dist_data = dist_data.loc[keep, keep]
        patients = keep

    candidate_sets = []
    for patient in patients:
        patient_patho = int(patho.loc[patient])
        picked = [patient]
        for i in range(n_pts - 1):
            patho_to_select = (patient_patho + (i + 1)) % 2
            cands = patho[patho == patho_to_select].index.difference(picked)
            cands = [c for c in cands if c in dist_data.index]
            if not cands:
                break
            sums = dist_data.loc[cands, picked].sum(axis=1)
            picked.append(sums.idxmax())
        cost = float(
            dist_data.loc[picked, picked].values[
                np.triu_indices(len(picked), 1)
            ].sum()
        )
        candidate_sets.append([cost, picked])
    best = []
    for g in sorted(candidate_sets, key=lambda x: -x[0]):
        if eval_set_for_candidacy(
            g[1], [b[1] for b in best], mean_similarity_thresh
        ):
            best.append(g)
        if len(best) == retrieve_n:
            break
    return best


def pick_similar_pts(dist_data, main_dataset, n_pts, exclude=None,
                     retrieve_n=1, mean_similarity_thresh=0.8):
    """Medoid-ball search for maximally similar patho-balanced sets
    (reference: dtw_lib.py:108-165)."""
    if retrieve_n < 1:
        raise ValueError("retrieve_n cannot be set < 1!")
    if not (0 < mean_similarity_thresh <= 1):
        raise ValueError("mean_similarity_thresh must be between 0 and 1!")
    gt = main_dataset.get_ground_truth_df().sort_index()
    patho = gt.groupby("patient").y.first()
    if exclude:
        keep = [p for p in dist_data.index if p not in set(exclude)]
        dist_data = dist_data.loc[keep, keep]

    arr = dist_data.values
    per_class = n_pts // 2
    candidates = []
    max_d = float(dist_data.max().max())
    for val in range(1000, int(max_d + 1000) + 1, 1000):
        for i in range(len(arr)):
            mediod = dist_data.columns[i]
            mask = arr[i] < val
            if mask.sum() < n_pts:
                continue
            pts = dist_data.columns[mask]
            sel_patho = patho.loc[pts]
            if (sel_patho == 0).sum() < per_class:
                continue
            if (sel_patho == 1).sum() < per_class:
                continue
            normals = sel_patho[sel_patho == 0].index
            ards = sel_patho[sel_patho == 1].index
            best_n = list(
                dist_data.loc[mediod, normals].sort_values()[:per_class].index
            )
            best_a = list(
                dist_data.loc[mediod, ards].sort_values()[:per_class].index
            )
            cost = float(dist_data.loc[mediod, best_n + best_a].sum())
            if eval_set_for_candidacy(
                best_a + best_n, [c[1] for c in candidates],
                mean_similarity_thresh,
            ):
                candidates.append((cost, best_a + best_n))
        if len(candidates) >= retrieve_n:
            break
    return sorted(candidates, key=lambda x: x[0])[:retrieve_n]


def mediod_process(dist_data, nclusts, main_dataset):
    """KMedoids clustering of the distance matrix
    (reference: dtw_lib.py:167-183)."""
    from deepards_tpu.dtw.kmedoids import KMedoids

    gt = main_dataset.get_ground_truth_df().sort_index()
    patho = gt.groupby("patient").y.first().to_frame()
    km = KMedoids(nclusts, metric="precomputed")
    km.fit(dist_data.values)
    patho["clust"] = km.predict(dist_data.values)
    return patho
