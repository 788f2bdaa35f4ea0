"""ProtoPNet prototype-feature analysis CLI
(reference: deepards/models/protopnet1d/protopnet_analysis.py:199-221).

Usage:
  python -m deepards_tpu.cli.protopnet_analysis CKPT \\
      --kfold-from-pickle dataset.pkl --kfold-idx 0 -o out/ \\
      [--n-prototypes 10] [--base-network densenet18]

Gathers per-window prototype-similarity features from train + test sets,
probes them with the transplanted last-layer linear classifier, and
renders a random-sequence prototype pane with its txt record.
"""
import argparse

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model", help="saved checkpoint")
    parser.add_argument("--kfold-from-pickle",
                        help="pickled/cached dataset for kfold mode")
    parser.add_argument("--kfold-idx", type=int,
                        help="fold index; unset means holdout mode")
    parser.add_argument("--holdout-train-pickle")
    parser.add_argument("--holdout-test-pickle")
    parser.add_argument("-o", "--out-dir", default="protopnet_analysis")
    parser.add_argument("--base-network", default="densenet18")
    parser.add_argument("--n-prototypes", type=int, default=10,
                        help="prototypes per class used at train time")
    parser.add_argument("--topk", type=int, default=40)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "-tp", "--analysis-class-to-pickle",
        help="save the gathered feature frames for later reuse")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepards_tpu.config.config import Configuration
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.explain.prototypes import ProtoPNetAnalysis
    from deepards_tpu.models.protopnet1d import construct_ppnet
    from deepards_tpu.models.registry import get_base_network
    from deepards_tpu.train import checkpoint as ckpt

    if args.kfold_idx is not None:
        x_train = ARDSRawDataset.from_pickle(args.kfold_from_pickle)
        x_train.set_kfold_indexes_for_fold(args.kfold_idx)
        x_test = ARDSRawDataset.make_test_dataset_if_kfold(x_train)
        x_test.set_kfold_indexes_for_fold(args.kfold_idx)
    else:
        x_train = ARDSRawDataset.from_pickle(args.holdout_train_pickle)
        x_test = ARDSRawDataset.from_pickle(args.holdout_test_pickle)

    conf = Configuration(overrides={"base_network": args.base_network})
    model = construct_ppnet(
        get_base_network(conf),
        sub_batch_size=x_train.n_sub_batches,
        n_prototypes=args.n_prototypes,
    )
    params = ckpt.restore(args.model)["params"]

    analysis = ProtoPNetAnalysis(model, params, x_train, x_test)
    if args.analysis_class_to_pickle:
        import pandas as pd

        pd.to_pickle({
            "train_features": analysis.train_features,
            "test_features": analysis.test_features,
            "train_preds": analysis.train_preds,
            "test_preds": analysis.test_preds,
            "coefs": analysis.coefs,
        }, args.analysis_class_to_pickle)
    base = analysis.make_random_sequence_pane(
        args.out_dir, rng=np.random.default_rng(args.seed),
        topk=args.topk,
    )
    print(base)


if __name__ == "__main__":
    main()
