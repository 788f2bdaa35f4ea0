"""Per-patient GradCAM ops CLI
(reference: deepards/patient_gradcam.py:378-437 __main__).

Usage:
  python -m deepards_tpu.cli.patient_gradcam CKPT \\
      -pdp dataset.pkl --fold 0 --ops dtw_clust \\
      --results-base-dir out/ [--target ground_truth] [--only-patient X]

The reference torch.load()s a whole nn.Module; our orbax checkpoints are
parameter pytrees, so the model architecture is rebuilt from
--network/--base-network (defaults match the reference's quickstart).
"""
import argparse

import numpy as np

from deepards_tpu.explain.gradcam import (
    FracTotalNormCam,
    MaxMinNormCam,
    UnNormalizedCam,
)
from deepards_tpu.explain.patient_gradcam import PatientGradCam

OPS = ("averages", "medians", "sample_seqs", "read_cam", "rand_sample",
       "dtw_clust", "cam_by_hour")

CAM_CLASSES = {
    "maxmin": MaxMinNormCam,
    "fractotal": FracTotalNormCam,
    "unnormalized": UnNormalizedCam,
}


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_path", help="path to a saved checkpoint")
    parser.add_argument("-pdp", "--pickled-data-path", required=True,
                        help="path to the pickled/cached dataset")
    parser.add_argument("--only-patient")
    parser.add_argument("--fold", type=int, required=True,
                        help="kfold whose TRAIN patients form the cam set "
                        "(reference: patient_gradcam.py:383)")
    parser.add_argument("--ops", choices=OPS, required=True)
    parser.add_argument("-shuf", "--shuffle-samples", action="store_true",
                        help="rand_sample: randomize the patho groups")
    parser.add_argument("--results-base-dir", default="gradcam_results")
    parser.add_argument(
        "--target",
        choices=["ards", "other", "ground_truth", "both"],
        default="ground_truth",
    )
    parser.add_argument("--cam", default="maxmin",
                        choices=sorted(CAM_CLASSES))
    parser.add_argument("--network", default="cnn_linear")
    parser.add_argument("--base-network", default="densenet18")
    parser.add_argument("--hour-start", type=int, default=0,
                        help="cam_by_hour band start")
    parser.add_argument("--hour-end", type=int, default=24)
    parser.add_argument("--seqs-per-hour", type=int, default=None)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepards_tpu.config.config import Configuration
    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.models.registry import (
        get_base_network,
        get_network_spec,
    )
    from deepards_tpu.train import checkpoint as ckpt

    data = ARDSRawDataset.from_pickle(args.pickled_data_path)
    data = ARDSRawDataset.make_test_dataset_if_kfold(data)
    data.set_kfold_indexes_for_fold(args.fold)

    conf = Configuration(overrides={
        "base_network": args.base_network, "network": args.network,
    })
    bb = get_base_network(conf)
    spec = get_network_spec(args.network)
    model = spec.build(conf, bb, data.n_sub_batches, 0)
    params = ckpt.restore(args.model_path)["params"]

    pgc = PatientGradCam(
        model, params, data, results_dir=args.results_base_dir,
        cam_cls=CAM_CLASSES[args.cam], target=args.target,
    )
    if args.only_patient:
        # restrict the op scope to one patient (reference: --only-patient)
        pgc.gt = pgc.gt[pgc.gt.patient.astype(str) == args.only_patient]
        if not len(pgc.gt):
            raise SystemExit(
                "patient {} not in fold {}".format(args.only_patient,
                                                   args.fold))

    if args.ops == "rand_sample":
        pgc.do_rand_sample(randomize_groups=args.shuffle_samples)
    elif args.ops == "cam_by_hour":
        pgc.do_cam_by_hour(
            hour_start=args.hour_start, hour_end=args.hour_end,
            n_sequences_per_hour=args.seqs_per_hour,
        )
    else:
        pgc.do_op(args.ops)
    print(args.results_base_dir)


if __name__ == "__main__":
    main()
