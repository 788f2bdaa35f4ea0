"""Generate the experiment-file registry.

The reference carries 215 hand-edited yml files spanning ~20 parameter
families (reference: deepards/experiment_files/).  Here the registry is
GENERATED from the family grids — same config keys (reference ymls load
unchanged), no machine-specific pickle/data paths baked in (pass
``--data-path``/``--train-from-pickle`` on the CLI instead).

Run ``python -m deepards_tpu.config.generate_experiments`` to (re)write
``config/experiment_files/generated/``.
"""
import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "experiment_files", "generated")

BASE = {
    "clip_val": 0.01,
    "clip_grad": True,
    "dataset_type": "unpadded_centered_sequences",
    "oversample_minority": True,
    "kfolds": 5,
    "epochs": 10,
    "batch_size": 16,
    "network": "cnn_linear",
    "n_sub_batches": 20,
    "random_kfold": False,
}

PADDED_BASE = dict(BASE, dataset_type="padded_breath_by_breath")


def _merge(base, **kw):
    out = dict(base)
    out.update(kw)
    return out


def experiments():
    """name -> config dict for every generated family."""
    exps = {}

    # -- butterworth band studies (reference: *_butter_*hz.yml) -----------
    bands = [(0, 5), (5, 10), (10, 15), (15, 20), (20, 25)]
    for base, tag in ((BASE, "unpadded_centered_nb20"),
                      (PADDED_BASE, "padded_breath_by_breath")):
        for lo, hi in bands:
            conf = dict(base)
            if lo == 0:
                conf["butter_high"] = hi  # lowpass
            elif hi == 25:
                conf["butter_low"] = lo  # highpass
            else:
                conf["butter_low"] = lo
                conf["butter_high"] = hi
            exps["{}_cnn_linear_butter_{}_{}hz".format(tag, lo, hi)] = conf
    for lo, hi in ((0.2, 25), (0.5, 25), (1, 25), (2, 25)):
        exps["unpadded_centered_nb20_cnn_linear_butter_{}hz".format(
            str(lo).replace(".", "dot"))] = _merge(BASE, butter_low=lo)

    # -- fft band filters (reference: *_fft_filter_*hz.yml) ---------------
    for lo, hi in bands + [(1, 25), (2, 25), (5, 25)]:
        exps["unpadded_centered_nb20_cnn_linear_fft_filter_{}_{}hz".format(
            lo, hi)] = _merge(
                BASE, fft_filtering_low=lo, fft_filtering_high=hi)

    # -- post-hoc downsampling (reference: *_downsamp_*x.yml) -------------
    for f in (1.1, 1.2, 1.3, 1.4, 1.5, 1.6, 1.8, 2.0, 2.25, 2.5, 2.75,
              3.0, 3.25, 3.5, 4.0):
        exps["padded_breath_by_breath_cnn_linear_downsamp_{}x".format(f)] = (
            _merge(PADDED_BASE, post_hoc_downsampling=f)
        )

    # -- fractional training patients (reference: train_frac*.yml) --------
    for frac in (0.025, 0.05, 0.075, 0.1, 0.125, 0.25, 0.5, 0.75):
        exps["train_frac{}".format(str(frac).replace("0.", ""))] = _merge(
            BASE, train_pt_frac=frac)

    # -- prototype count sweep (reference: protopnet_*_np*.yml) -----------
    for n in range(1, 9):
        exps["protopnet_unpadded_centered_np{}".format(n)] = _merge(
            BASE, network="protopnet", n_prototypes=n,
            n_warm_epochs=3, push_start_epoch=6, push_every_n=6,
            n_push_iters=5, clust_lambda=0.8, sep_lambda=0.2,
            incorrect_strength=-0.5,
        )
    exps["protopnet_final"] = _merge(
        exps["protopnet_unpadded_centered_np5"], epochs=15)
    exps["protopnet2d_unpadded_centered"] = _merge(
        BASE, network="protopnet_2d", n_prototypes=10, n_warm_epochs=3,
        push_start_epoch=6, push_every_n=6, n_push_iters=5, batch_size=2,
    )

    # -- DTW undersampling grids (reference: *_undersample_std*.yml) ------
    for uf in (0.1, 0.2, 0.3, 0.4):
        for std in (0.1, 0.2):
            exps["unpadded_centered_20_len_sub_batch_cnn_undersample_"
                 "{}_std{}".format(uf, std)] = _merge(
                BASE, undersample_factor=uf, undersample_std_factor=std)
        exps["unpadded_centered_20_len_sub_batch_cnn_oversample_"
             "undersample_{}".format(uf)] = _merge(
            BASE, undersample_factor=uf, oversample_all_factor=1.5)

    # -- sub-batch length sweep -------------------------------------------
    for n in (10, 20, 40, 100):
        exps["unpadded_centered_{}_len_sub_batch_cnn".format(n)] = _merge(
            BASE, n_sub_batches=n)

    # -- expiratory-limit truncation (reference: truncate_e_lim*.yml) -----
    for lim in (0.5, 1.0, 1.5, 2.0):
        exps["truncate_e_lim_{}".format(str(lim).replace(".", "dot"))] = (
            _merge(BASE, truncate_e_lim=lim)
        )
    exps["drop_i_lim"] = _merge(BASE, drop_i_lim=True)
    exps["drop_e_lim"] = _merge(BASE, drop_e_lim=True)

    # -- window-warping augmentation (reference: *window_warping*.yml) ----
    for over in (1.0, 1.5, 2.0):
        exps["unpadded_centered_nb20_cnn_linear_ie_window_warping_"
             "oversamp_all_{}".format(over)] = _merge(
            BASE, transforms=["ie_ww"], transform_probability=0.5,
            oversample_all_factor=over)
    exps["window_warping"] = _merge(
        BASE, transforms=["naive_ww"], transform_probability=0.5)

    # -- 2D image path (reference: *_2d_bs2_*.yml) -------------------------
    exps["unpadded_centered_nb20_cnn_linear_2d_bs2_baseline"] = _merge(
        BASE, network="cnn_linear_2d", batch_size=2)
    exps["unpadded_centered_nb20_cnn_linear_2d_bs2_only_fft_baseline"] = (
        _merge(BASE, network="cnn_linear_2d", batch_size=2, only_fft=True)
    )
    exps["unpadded_centered_nb20_cnn_linear_2d_bs2_row_mix"] = _merge(
        BASE, network="cnn_linear_2d", batch_size=2,
        two_dim_transforms=["row_mix"])
    exps["unpadded_centered_nb20_cnn_linear_2d_bs2_all_transforms"] = (
        _merge(BASE, network="cnn_linear_2d", batch_size=2,
               two_dim_transforms=["all"])
    )

    # -- detection baselines (reference: *_retinanet/frcnn_bbox*.yml) -----
    for net in ("retinanet_2d", "retinanet_2x1d", "faster_rcnn_2d"):
        exps["unpadded_centered_nb20_{}_bs2_bbox_baseline".format(net)] = (
            _merge(BASE, network=net, batch_size=2)
        )

    # -- holdout similarity splits (reference: train_sim_test_*.yml) ------
    for i in range(1, 10):
        exps["train_sim_test_sim_dissim_split_{}".format(i)] = _merge(
            BASE, kfolds=None,
            holdout_set_type="train_sim_test_sim_dissim_split_{}".format(i))
    for i in range(1, 10):
        exps["heterogeneity_filter_by_train_{}".format(i)] = _merge(
            BASE, kfolds=None, holdout_set_type="main",
            drop_if_under_r2=i / 10.0)
    for fold in range(4):
        exps["holdout_with_similarity_split_fold{}".format(fold)] = _merge(
            BASE, kfolds=None,
            holdout_set_type="similarity_split_fold{}".format(fold))
        exps["holdout_with_dissimilarity_split_fold{}".format(fold)] = (
            _merge(BASE, kfolds=None,
                   holdout_set_type="dissimilarity_split_fold{}".format(
                       fold))
        )

    # -- pretraining + temporal (mirror the top-level benchmark ymls) -----
    exps["bm_pretraining_regression"] = {
        "dataset_type": "padded_breath_by_breath_with_full_bm_target",
        "network": "cnn_regressor", "holdout_set_type": "main",
        "epochs": 10, "batch_size": 64, "n_sub_batches": 1,
        "optimizer": "adam", "learning_rate": 0.001,
    }
    exps["unpadded_centered_nb20_cnn_lstm"] = _merge(
        BASE, network="cnn_lstm", time_series_hidden_units=16)
    exps["padded_breath_by_breath_resnet18"] = _merge(
        PADDED_BASE, base_network="resnet18")

    # -- anonymized cohort ------------------------------------------------
    exps["unpadded_centered_sequences_nb20_anon"] = _merge(
        BASE, cohort_file="anon-desc.csv")
    return exps


def write_all(out_dir=OUT_DIR):
    os.makedirs(out_dir, exist_ok=True)
    exps = experiments()
    for name, conf in sorted(exps.items()):
        with open(os.path.join(out_dir, name + ".yml"), "w") as f:
            yaml.safe_dump(
                {k: v for k, v in conf.items() if v is not None},
                f, default_flow_style=False, sort_keys=True,
            )
    return sorted(exps)


if __name__ == "__main__":
    names = write_all()
    print("wrote {} experiment files to {}".format(len(names), OUT_DIR))
