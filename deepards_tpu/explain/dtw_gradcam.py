"""DTW-aligned GradCAM comparison.

Capability parity with the reference's exploratory cam-alignment study
(reference: scripts/exploratory/dtw_grad_cam.py:1-158): warp two breaths
onto each other with DTW, walk the optimal path, extract the
diagonal-slope runs (stretches where both breaths advance in lockstep),
and compare the cams along the matched samples — low cam distance over a
strongly-activated run means the model attends to the same physiological
region in both breaths.

TPU-native shift: the single-sequence cams for all sampled windows are
computed in batched device dispatches (the reference pays one python
GradCam call per breath); the per-pair DTW path extraction stays on host
(sequential backtrack, cold analysis path).
"""
import numpy as np

from deepards_tpu.ops.dtw import dtw_full


def diagonal_runs(path_x, path_y, min_run=5):
    """Index runs of breath 1 where the warping path moves diagonally
    (slope 1) for at least min_run consecutive samples
    (reference: dtw_grad_cam.py:79-91 slope bookkeeping)."""
    px = np.asarray(path_x)
    py = np.asarray(path_y)
    runs = []
    cur = []
    for k in range(1, len(px)):
        if px[k] - px[k - 1] == 1 and py[k] - py[k - 1] == 1:
            if not cur:
                cur = [int(px[k - 1])]
            cur.append(int(px[k]))
        else:
            if len(cur) > min_run:
                runs.append(cur)
            cur = []
    if len(cur) > min_run:
        runs.append(cur)
    return runs


def dtw_cam_match(br1, br2, cam1, cam2, min_run=5):
    """Warp br2 onto br1 and compare cams along the matched samples.

    Returns dict with the DTW distance, the per-sample cam distance over
    the whole path, and one entry per diagonal run: the br1 indexes, the
    matched br2 indexes, the run's summed cam distance, and the run's
    summed cam1 activation (the reference's similarity screen keeps runs
    with cam_dist <= 15 and sum(cam1[run]) > 100,
    dtw_grad_cam.py:136-139)."""
    d, cost, (px, py) = dtw_full(br1, br2)
    # last-match-wins: the reference builds matches with a dict
    # comprehension, so a br1 index revisited by a vertical path move
    # keeps its LAST br2 partner (dtw_grad_cam.py:69 {pathx[i]: pathy[i]})
    matches = {int(x): int(y) for x, y in zip(px, py)}
    # cams stay float: UnNormalizedCam emits sub-integer raw cams that an
    # integer cast would truncate to 0, voiding the cam_dist screen
    cam1 = np.asarray(cam1, np.float64).ravel()
    cam2 = np.asarray(cam2, np.float64).ravel()
    cam_dists = np.asarray([
        abs(cam1[i] - cam2[matches[i]]) for i in sorted(matches)
    ])
    runs = []
    for run in diagonal_runs(px, py, min_run):
        match2 = [matches[i] for i in run]
        runs.append({
            "seq1": run,
            "seq2": match2,
            "cam_dist": float(sum(
                abs(cam1[i] - cam2[matches[i]]) for i in run
            )),
            "cam1_sum": float(cam1[run].sum()),
        })
    return {
        "distance": d,
        "cost_matrix": cost,
        "path": (px, py),
        "cam_dists": cam_dists,
        "runs": runs,
    }


def find_similar_cam_regions(cam_gen, dataset, patient_id, target,
                             n_windows=6, max_cam_dist=15,
                             min_cam1_sum=100, min_run=5, rng=None):
    """Sample breath pairs of one patient, align them with DTW, and keep
    the lockstep runs where both cams agree AND breath 1's cam is
    strongly active (reference: dtw_grad_cam.py:109-140).

    cam_gen must expose ``generate_read_cams_batch`` (MaxMin /
    UnNormalized); all sampled windows' cams run in ONE device dispatch.
    Returns (pairs, all_cam_dists).
    """
    from deepards_tpu.data.pipeline import gather_pipeline

    rng = rng or np.random.default_rng(0)
    gt = dataset.get_ground_truth_df()
    rows = gt[gt.patient == patient_id]
    idxs = rows.index.to_numpy()
    take = min(n_windows, len(idxs))
    pick = rng.choice(idxs, size=take, replace=False)
    # fold-pipeline normalization first: the cams must run at the scale
    # the checkpoint was trained at (reference scales in __getitem__)
    data = gather_pipeline(dataset)(
        dataset.gather(pick)["data"]
    )  # (W, S, C, L)
    cams, _ = cam_gen.generate_read_cams_batch(
        data, np.full(len(data), target)
    )  # (W, S, L')
    from deepards_tpu.explain.gradcam import upsample_cam

    cams224 = upsample_cam(cams.reshape(-1, cams.shape[-1]))
    breaths = data[:, :, 0, :].reshape(-1, data.shape[-1])

    pairs = []
    all_cam_dists = []
    n = len(breaths)
    for i in range(n):
        for j in range(i + 1, n):
            res = dtw_cam_match(
                breaths[i], breaths[j], cams224[i], cams224[j],
                min_run=min_run,
            )
            for run in res["runs"]:
                all_cam_dists.append(run["cam_dist"])
                if (
                    run["cam_dist"] <= max_cam_dist
                    and run["cam1_sum"] > min_cam1_sum
                ):
                    pairs.append({
                        "window_i": i,
                        "window_j": j,
                        "br1": breaths[i],
                        "br2": breaths[j],
                        "run": run,
                    })
    return pairs, np.asarray(all_cam_dists)
