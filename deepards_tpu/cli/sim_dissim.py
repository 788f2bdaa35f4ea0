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


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-sim-dissim")
    parser.add_argument("--train-from-pickle", required=True)
    parser.add_argument("-o", "--out-dir", default="data_split_files")
    parser.add_argument("--n-pts", type=int, default=10)
    parser.add_argument("--retrieve-n", type=int, default=2)
    parser.add_argument("--dist-method",
                        choices=["random", "same_ordered"],
                        default="random")
    args = parser.parse_args(argv)

    from deepards_tpu.data.dataset import ARDSRawDataset

    ds = ARDSRawDataset.from_pickle(args.train_from_pickle)
    if ds.total_kfolds:
        ds.set_kfold_indexes_for_fold(0)
    written = generate_split_files(
        ds, args.out_dir, n_pts=args.n_pts, retrieve_n=args.retrieve_n,
        dist_method=args.dist_method,
    )
    for path in written:
        print("wrote", path)


if __name__ == "__main__":
    main()
