"""CLI for the frequency-domain GradCAM studies
(reference: deepards/gradcam.py:1096-1159 __main__ experiment runner).

Usage:
  python -m deepards_tpu.cli.cam_analytics one-d \\
      -p dataset.pkl --model-pattern 'ckpt-fold{fold}' --folds 5 -o out/
  python -m deepards_tpu.cli.cam_analytics two-d ...
  python -m deepards_tpu.cli.cam_analytics butter \\
      -p filtered.pkl --no-filter-pickle raw.pkl -lf 0 -hf 5 ...
  python -m deepards_tpu.cli.cam_analytics butter-plot -p raw.pkl --index 0
"""
import argparse

from deepards_tpu.explain import frequency_analytics as fa
from deepards_tpu.explain.gradcam import MaxMinNormCam, UnNormalizedCam


def _load_dataset(path):
    from deepards_tpu.data.dataset import ARDSRawDataset

    return ARDSRawDataset.from_pickle(path)


def _params_by_fold(pattern, n_folds):
    from deepards_tpu.train.checkpoint import load_params

    return {
        fold: load_params(pattern.format(fold=fold))
        for fold in range(n_folds)
    }


def _cam_factory(model, cam_cls):
    def factory(params):
        return cam_cls(model, params)

    return factory


def _build_model(network, base_network, n_sub_batches=20):
    from deepards_tpu.config.config import Configuration
    from deepards_tpu.models.registry import (
        get_base_network,
        get_network_spec,
    )

    conf = Configuration(
        overrides={"base_network": base_network, "network": network}
    )
    bb = get_base_network(conf)
    spec = get_network_spec(network)
    return spec.build(conf, bb, n_sub_batches, 0)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("-p", "--pickled-dataset", required=True)
        p.add_argument("--model-pattern", required=True,
                       help="checkpoint path with {fold} placeholder")
        p.add_argument("--folds", type=int, default=5)
        p.add_argument("-o", "--out-dir", default="cam_analytics_out")
        p.add_argument("-n", "--n-samps", type=int, default=50)
        p.add_argument("--network", default="cnn_linear")
        p.add_argument("--base-network", default="densenet18")
        p.add_argument("--cam", default="unnormalized",
                       choices=("unnormalized", "maxmin"))

    for name in ("one-d", "two-d", "butter"):
        p = sub.add_parser(name)
        common(p)
        if name == "butter":
            p.add_argument("--no-filter-pickle", required=True)
            p.add_argument("-lf", "--hz-low", type=float, required=True)
            p.add_argument("-hf", "--hz-high", type=float, required=True)
            p.add_argument("--experiment", default="butter")

    p = sub.add_parser("butter-plot")
    p.add_argument("-p", "--pickled-dataset", required=True)
    p.add_argument("--index", type=int, required=True)
    p.add_argument("-lf", "--hz-low", type=float, default=0.0)
    p.add_argument("-hf", "--hz-high", type=float, default=25.0)
    p.add_argument("--experiment", default="butter")
    p.add_argument("-o", "--out-dir", default="cam_analytics_out")

    args = parser.parse_args(argv)

    if args.cmd == "butter-plot":
        ds = _load_dataset(args.pickled_dataset)
        png, _ = fa.butter_plots(
            ds, args.index, args.experiment, args.hz_low, args.hz_high,
            args.out_dir,
        )
        print(png)
        return

    model = _build_model(args.network, args.base_network)
    cam_cls = {
        "unnormalized": UnNormalizedCam, "maxmin": MaxMinNormCam,
    }[args.cam]
    factory = _cam_factory(model, cam_cls)
    ds = _load_dataset(args.pickled_dataset)
    params = _params_by_fold(args.model_pattern, args.folds)

    if args.cmd == "one-d":
        res = fa.one_d_analytics(
            factory, ds, params, args.out_dir, n_samps=args.n_samps
        )
    elif args.cmd == "two-d":
        res = fa.two_d_analytics(
            factory, ds, params, args.out_dir, n_samps=args.n_samps
        )
    else:
        no_filt = _load_dataset(args.no_filter_pickle)
        res = fa.butterworth_1d_analytics(
            factory, ds, no_filt, params, args.experiment,
            args.hz_low, args.hz_high, args.out_dir, n_samps=args.n_samps,
        )
    for png in res["pngs"]:
        print(png)


if __name__ == "__main__":
    main()
