"""Similar/dissimilar-cohort experiment generator.

Capability parity with the reference's heterogeneity-experiment pipeline
(reference: deepards/sim_dissim_experiments_script.py + the generated
deepards/data_split_files/*.yml + scripts/hetero/train_sim_test_sim_dissim.py):
build the inter-patient DTW similarity matrix, pick maximally similar and
dissimilar patho-balanced cohorts, and emit train/test split yml files
consumable by ``deepards-split-data preset_file``.
"""
import argparse
import os

import yaml


def generate_split_files(dataset, out_dir, n_pts=10, retrieve_n=2,
                         mean_similarity_thresh=0.8, dist_method="random"):
    from deepards_tpu.dtw.lib import (
        find_patient_similarity,
        pick_dissimilar_pts,
        pick_similar_pts,
    )

    os.makedirs(out_dir, exist_ok=True)
    mat = find_patient_similarity(dataset, dist_method=dist_method)
    written = []
    sims = pick_similar_pts(
        mat, dataset, n_pts, retrieve_n=retrieve_n,
        mean_similarity_thresh=mean_similarity_thresh,
    )
    diss = pick_dissimilar_pts(
        mat, dataset, n_pts, retrieve_n=retrieve_n,
        mean_similarity_thresh=mean_similarity_thresh,
    )
    all_pts = set(mat.index)
    for kind, sets in (("sim", sims), ("dissim", diss)):
        for i, (cost, pts) in enumerate(sets):
            test = sorted(all_pts - set(pts))
            path = os.path.join(
                out_dir, "{}_{}pts_v{}.yml".format(kind, n_pts, i)
            )
            with open(path, "w") as f:
                yaml.dump(
                    {
                        "train": [str(p) for p in pts],
                        "test": [str(p) for p in test],
                        "cost": float(cost),
                        "kind": kind,
                    },
                    f,
                )
            written.append(path)
    return written


def hetero_split(similarity, dataset, n, rng, train_n=40, test_n=6,
                 retrieve_n=10, mean_similarity_thresh=0.7):
    """One train-on-similar / test-on-sim+dissim split.

    Semantics of the reference's heterogeneity runner ``do_split``
    (reference: scripts/hetero/train_sim_test_sim_dissim.py:20-49):
    train = the n-th most-similar patho-balanced set; the test set is a
    dissimilar set picked excluding train, plus a similar set picked
    excluding both; one patient of opposite pathophysiology is trimmed
    from each test group at random to rebalance.
    """
    from deepards_tpu.dtw.lib import pick_dissimilar_pts, pick_similar_pts

    def _nth(sets, what):
        """n-th candidate set, clamped: small cohorts can yield fewer
        distinct sets than retrieve_n (the reference assumed its 80-pt
        cohort always had enough)."""
        if not sets:
            raise ValueError(
                "no {} candidate sets found - cohort too small or "
                "mean_similarity_thresh too strict".format(what))
        return list(sets[min(n, len(sets) - 1)][1])

    train = _nth(pick_similar_pts(
        similarity, dataset, train_n, retrieve_n=retrieve_n,
        mean_similarity_thresh=mean_similarity_thresh), "similar-train")
    dissim = _nth(pick_dissimilar_pts(
        similarity, dataset, test_n, exclude=train, retrieve_n=retrieve_n,
        mean_similarity_thresh=mean_similarity_thresh), "dissimilar-test")
    sim = _nth(pick_similar_pts(
        similarity, dataset, test_n, exclude=train + dissim,
        retrieve_n=retrieve_n,
        mean_similarity_thresh=mean_similarity_thresh), "similar-test")

    gt = dataset.get_ground_truth_df().sort_index()
    patho = gt.groupby("patient").y.first()
    # trim one patient of opposite patho from each test group
    trim_dissim_cls, trim_sim_cls = (0, 1) if rng.random() > 0.5 else (1, 0)

    def _trim(pts, cls):
        if len(pts) <= 1:  # never trim a group to empty (tiny cohorts)
            return pts
        candidates = [p for p in pts if int(patho.loc[p]) == cls]
        if not candidates:
            return pts
        drop = candidates[int(rng.integers(0, len(candidates)))]
        return [p for p in pts if p != drop]

    dissim = _trim(dissim, trim_dissim_cls)
    sim = _trim(sim, trim_sim_cls)
    return {
        "train": [str(p) for p in train],
        "test": [str(p) for p in sim + dissim],
        "similar": [str(p) for p in sim],
        "dissimilar": [str(p) for p in dissim],
    }


def generate_hetero_splits(dataset, out_dir, n_splits=10, train_n=40,
                           test_n=6, mean_similarity_thresh=0.7,
                           dist_method="random", seed=0, similarity=None):
    """Write train_sim_test_sim_dissim_split_{n}.yml split files, each
    consumable by ``deepards-split-data preset_file`` and then trainable
    with the generated ``train_sim_test_sim_dissim_split_{n}`` experiment
    yml (reference: scripts/hetero/train_sim_test_sim_dissim.py:91-131)."""
    import numpy as np

    from deepards_tpu.dtw.lib import find_patient_similarity

    os.makedirs(out_dir, exist_ok=True)
    if similarity is None:
        similarity = find_patient_similarity(dataset,
                                             dist_method=dist_method)
    rng = np.random.default_rng(seed)
    written = []
    # numbered from 1 with candidate index == split number: the reference
    # runner skips candidate 0 and names split_n after candidate n, so
    # same-named files must map to the same candidate sets
    # (reference: scripts/hetero/train_sim_test_sim_dissim.py:91-131)
    for n in range(1, n_splits):
        split = hetero_split(
            similarity, dataset, n, rng, train_n=train_n, test_n=test_n,
            retrieve_n=n_splits, mean_similarity_thresh=mean_similarity_thresh)
        path = os.path.join(
            out_dir, "train_sim_test_sim_dissim_split_{}.yml".format(n))
        with open(path, "w") as f:
            yaml.dump(split, f)
        written.append(path)
    return written


def sim_dissim_breakdown(patient_results, split):
    """Patient-level stats broken down by the test set's similar vs
    dissimilar groups — the analysis the reference's hetero experiments
    exist to produce (reference: scripts/hetero/train_sim_test_sim_dissim.py
    + lstm_dtw.py's similarity hypotheses)."""
    from deepards_tpu.eval.metrics import aggregate_stats

    frames = {}
    for kind in ("similar", "dissimilar"):
        pts = set(str(p) for p in split.get(kind, []))
        sub = patient_results[
            patient_results.patient.astype(str).isin(pts)
        ]
        if not len(sub):
            continue
        sub = sub[sub.epoch_num == sub.epoch_num.max()]
        stats = aggregate_stats(
            sub, sub.fold_num.iloc[0], sub.epoch_num.iloc[0])
        stats["group"] = kind
        frames[kind] = stats
    return frames


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-sim-dissim")
    sub = parser.add_subparsers(dest="command", required=True)

    gen = sub.add_parser(
        "generate", help="similar/dissimilar cohort split files")
    gen.add_argument("--train-from-pickle", required=True)
    gen.add_argument("-o", "--out-dir", default="data_split_files")
    gen.add_argument("--n-pts", type=int, default=10)
    gen.add_argument("--retrieve-n", type=int, default=2)
    gen.add_argument("--dist-method", choices=["random", "same_ordered"],
                     default="random")

    het = sub.add_parser(
        "hetero",
        help="train-similar/test-sim+dissim split files (reference "
             "scripts/hetero/train_sim_test_sim_dissim.py)")
    het.add_argument("--train-from-pickle", required=True)
    het.add_argument("-o", "--out-dir", default="data_split_files")
    het.add_argument("--n-splits", type=int, default=10)
    het.add_argument("--train-n", type=int, default=40)
    het.add_argument("--test-n", type=int, default=6)
    het.add_argument("--mean-similarity-thresh", type=float, default=0.7)
    het.add_argument("--dist-method", choices=["random", "same_ordered"],
                     default="random")
    het.add_argument("--seed", type=int, default=0)

    brk = sub.add_parser(
        "breakdown",
        help="patient-level stats split by similar vs dissimilar test "
             "groups")
    brk.add_argument("patient_results", help="*_patient_results.pkl path")
    brk.add_argument("split_file", help="train_sim_test_sim_dissim yml")
    args = parser.parse_args(argv)

    if args.command == "breakdown":
        import pandas as pd

        with open(args.split_file) as f:
            split = yaml.load(f, Loader=yaml.FullLoader)
        results = pd.read_pickle(args.patient_results)
        for kind, stats in sim_dissim_breakdown(results, split).items():
            print("---- {} test patients ----".format(kind))
            print(stats.to_string(index=False))
        return

    from deepards_tpu.data.dataset import ARDSRawDataset

    ds = ARDSRawDataset.from_pickle(args.train_from_pickle)
    if ds.total_kfolds:
        ds.set_kfold_indexes_for_fold(0)
    if args.command == "hetero":
        written = generate_hetero_splits(
            ds, args.out_dir, n_splits=args.n_splits, train_n=args.train_n,
            test_n=args.test_n,
            mean_similarity_thresh=args.mean_similarity_thresh,
            dist_method=args.dist_method, seed=args.seed,
        )
    else:
        written = generate_split_files(
            ds, args.out_dir, n_pts=args.n_pts, retrieve_n=args.retrieve_n,
            dist_method=args.dist_method,
        )
    for path in written:
        print("wrote", path)


if __name__ == "__main__":
    main()
