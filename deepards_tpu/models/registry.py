"""Network registries: base backbone map and composite-network specs.

Mirrors the reference's two registries (``base_networks``
reference: train_ards_detector.py:45-69 and ``network_map``
:1410-1436) but as declarative specs the trainer consumes: each network
declares how to build its module, how targets are shaped, which loss family
applies, and how per-window predictions are extracted for patient voting.
"""
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from deepards_tpu.models import (
    autoencoder_cnn,
    densenet1d,
    densenet2d,
    detection2d,
    heads,
    nested,
    recurrent,
    resnet1d,
    senet1d,
    siamese,
    unet1d,
    vgg1d,
)


def _densenet_ctor(name):
    return lambda conf: getattr(densenet1d, name)()


def _resnet_ctor(name):
    """ResNet backbones consume the resnet CLI knobs
    (reference: train_ards_detector.py:389-394)."""

    def ctor(conf):
        return getattr(resnet1d, name)(
            initial_planes=conf.get("initial_planes", 64) or 64,
            first_pool_type=conf.get("resnet_first_pool_type", "max") or "max",
            double_conv_first=bool(conf.get("resnet_double_conv")),
        )

    return ctor


def _plain_ctor(mod, name):
    return lambda conf: getattr(mod, name)()


BASE_NETWORKS = {
    "densenet18": _densenet_ctor("densenet18"),
    "densenet121": _densenet_ctor("densenet121"),
    "densenet161": _densenet_ctor("densenet161"),
    "densenet169": _densenet_ctor("densenet169"),
    "densenet201": _densenet_ctor("densenet201"),
    "resnet18": _resnet_ctor("resnet18"),
    "resnet34": _resnet_ctor("resnet34"),
    "resnet50": _resnet_ctor("resnet50"),
    "resnet101": _resnet_ctor("resnet101"),
    "resnet152": _resnet_ctor("resnet152"),
    "vgg11": _plain_ctor(vgg1d, "vgg11"),
    "vgg11_bn": _plain_ctor(vgg1d, "vgg11_bn"),
    "vgg13": _plain_ctor(vgg1d, "vgg13"),
    "vgg13_bn": _plain_ctor(vgg1d, "vgg13_bn"),
    "senet18": _plain_ctor(senet1d, "senet18"),
    "senet154": _plain_ctor(senet1d, "senet154"),
    "se_resnet18": _plain_ctor(senet1d, "se_resnet18"),
    "se_resnet50": _plain_ctor(senet1d, "se_resnet50"),
    "se_resnet101": _plain_ctor(senet1d, "se_resnet101"),
    "se_resnet152": _plain_ctor(senet1d, "se_resnet152"),
    "se_resnext50_32x4d": _plain_ctor(senet1d, "se_resnext50_32x4d"),
    "se_resnext101_32x4d": _plain_ctor(senet1d, "se_resnext101_32x4d"),
    "unet": lambda conf: unet1d.UNet1DEncoder(),
    "basic_cnn_ae": lambda conf: autoencoder_cnn.AutoencoderCNNEncoder(),
    "densenet18_2d": lambda conf: densenet2d.densenet18_2d(
        block_kernel_size=conf.get("block_kernel_size", 3) or 3
    ),
    "densenet121_2d": lambda conf: densenet2d.densenet121_2d(
        block_kernel_size=conf.get("block_kernel_size", 3) or 3
    ),
    "densenet18_2x1d": lambda conf: densenet2d.densenet18_2x1d(
        block_kernel_size=conf.get("block_kernel_size", 3) or 3
    ),
}


def register_base_network(name, ctor):
    BASE_NETWORKS[name] = ctor


def get_base_network(conf):
    name = conf.base_network
    if name not in BASE_NETWORKS:
        raise ValueError(
            "unknown base network: {} (have: {})".format(
                name, sorted(BASE_NETWORKS)
            )
        )
    return BASE_NETWORKS[name](conf)


@dataclass
class NetworkSpec:
    name: str
    build: Callable  # (conf, base_network, n_sub_batches, meta_features) -> module
    target_mode: str = "per_sample"  # per_sample|per_breath|regression|autoencoder
    kind: str = "classifier"  # classifier|regressor|autoencoder|siamese
    # map raw model outputs -> (flat per-window predictions, index expansion)
    expand_obs_idx: bool = False  # per-breath heads repeat idx S times
    uses_metadata: bool = False
    stateful_lstm: bool = False  # supports hidden-state carry when unshuffled
    super_batch: bool = False  # whole-patient super batches, batch_size=1
    eval_dropout_off: bool = False  # trainer calls model.eval() in reference
    trainer: str = "standard"  # standard|protopnet|siamese
    two_dim: bool = False  # operates on ImgARDSDataset images


def _bn_scope(conf):
    """'sequence' restores the reference's per-sample BN statistics
    (reference python loop, torch_cnn_linear_network.py:104-113); the
    default 'batch' folds all B*S windows into one norm batch."""
    return conf.get("bn_scope") or "batch"


def _simple(name, cls, **kw):
    return NetworkSpec(
        name=name,
        build=lambda conf, bb, s, m: cls(breath_block=bb,
                                         bn_scope=_bn_scope(conf)),
        **kw,
    )


NETWORK_MAP = {
    "cnn_linear": NetworkSpec(
        "cnn_linear",
        lambda conf, bb, s, m: heads.CNNLinearNetwork(
            breath_block=bb, metadata_features=m,
            bn_scope=_bn_scope(conf),
        ),
        uses_metadata=True,
    ),
    "cnn_double_linear": NetworkSpec(
        "cnn_double_linear",
        lambda conf, bb, s, m: heads.CNNDoubleLinearNetwork(
            breath_block=bb, metadata_features=m,
            bn_scope=_bn_scope(conf),
        ),
        uses_metadata=True,
    ),
    "cnn_single_breath_linear": NetworkSpec(
        "cnn_single_breath_linear",
        lambda conf, bb, s, m: heads.CNNSingleBreathLinearNetwork(
            breath_block=bb, bn_scope=_bn_scope(conf),
        ),
        target_mode="per_breath",
        expand_obs_idx=True,
    ),
    "cnn_linear_to_mean": _simple("cnn_linear_to_mean", heads.CNNLinearToMean),
    "cnn_linear_compr_to_rf": _simple(
        "cnn_linear_compr_to_rf", heads.CNNLinearComprToRF
    ),
    "cnn_regressor": NetworkSpec(
        "cnn_regressor",
        lambda conf, bb, s, m: heads.CNNRegressor(
            breath_block=bb, n_outputs=_n_bm_features(conf),
            bn_scope=_bn_scope(conf),
        ),
        target_mode="regression",
        kind="regressor",
    ),
    "metadata_only": NetworkSpec(
        "metadata_only",
        lambda conf, bb, s, m: heads.MetadataOnlyNetwork(),
        uses_metadata=True,
    ),
    "autoencoder": NetworkSpec(
        "autoencoder",
        lambda conf, bb, s, m: heads.AutoencoderNetwork(breath_block=bb),
        target_mode="autoencoder",
        kind="autoencoder",
    ),
    "cnn_lstm": NetworkSpec(
        "cnn_lstm",
        lambda conf, bb, s, m: recurrent.CNNLSTMNetwork(
            breath_block=bb,
            lstm_hidden_units=conf.get("time_series_hidden_units", 16) or 16,
            metadata_features=m,
            bm_to_linear=bool(conf.get("bm_to_linear")),
            bn_scope=_bn_scope(conf),
        ),
        target_mode="per_breath",
        expand_obs_idx=True,
        uses_metadata=True,
        stateful_lstm=True,
        eval_dropout_off=True,
    ),
    "cnn_lstm_double_linear": NetworkSpec(
        "cnn_lstm_double_linear",
        lambda conf, bb, s, m: recurrent.CNNLSTMDoubleLinearNetwork(
            breath_block=bb,
            lstm_hidden_units=conf.get("time_series_hidden_units", 16) or 16,
            metadata_features=m,
            bm_to_linear=bool(conf.get("bm_to_linear")),
            bn_scope=_bn_scope(conf),
        ),
        uses_metadata=True,
    ),
    "lstm_only": NetworkSpec(
        "lstm_only",
        lambda conf, bb, s, m: recurrent.LSTMOnlyNetwork(
            lstm_hidden_units=conf.get("time_series_hidden_units", 16) or 16,
        ),
    ),
    "lstm_only_with_packing": NetworkSpec(
        "lstm_only_with_packing",
        lambda conf, bb, s, m: recurrent.LSTMOnlyWithPacking(
            lstm_hidden_units=conf.get("time_series_hidden_units", 16) or 16,
        ),
    ),
    "double_lstm": NetworkSpec(
        "double_lstm",
        lambda conf, bb, s, m: recurrent.DoubleLSTMNetwork(
            lstm_hidden_units=conf.get("time_series_hidden_units", 16) or 16,
        ),
    ),
    "cnn_transformer": NetworkSpec(
        "cnn_transformer",
        lambda conf, bb, s, m: recurrent.CNNTransformerNetwork(
            breath_block=bb,
            hidden_units=conf.get("time_series_hidden_units", 16) or 16,
            num_blocks=conf.get("transformer_blocks", 2) or 2,
            metadata_features=m,
            bm_to_linear=bool(conf.get("bm_to_linear")),
            bn_scope=_bn_scope(conf),
        ),
        target_mode="per_breath",
        expand_obs_idx=True,
        uses_metadata=True,
    ),
    "cnn_to_nested_rnn": NetworkSpec(
        "cnn_to_nested_rnn",
        lambda conf, bb, s, m: nested.CNNToNestedRNNNetwork(breath_block=bb),
        target_mode="per_breath",
        expand_obs_idx=True,
        super_batch=True,
    ),
    "cnn_to_nested_lstm": NetworkSpec(
        "cnn_to_nested_lstm",
        lambda conf, bb, s, m: nested.CNNToNestedLSTMNetwork(breath_block=bb),
        target_mode="per_breath",
        expand_obs_idx=True,
        super_batch=True,
    ),
    "cnn_to_nested_transformer": NetworkSpec(
        "cnn_to_nested_transformer",
        lambda conf, bb, s, m: nested.CNNToNestedTransformerNetwork(
            breath_block=bb,
            transformer_blocks=conf.get("transformer_blocks", 2) or 2,
        ),
        target_mode="per_breath",
        expand_obs_idx=True,
        super_batch=True,
    ),
    "siamese_cnn_linear": NetworkSpec(
        "siamese_cnn_linear",
        lambda conf, bb, s, m: siamese.SiameseCNNLinearNetwork(
            breath_block=bb, bn_scope=_bn_scope(conf),
        ),
        kind="siamese",
    ),
    "siamese_cnn_lstm": NetworkSpec(
        "siamese_cnn_lstm",
        lambda conf, bb, s, m: siamese.SiameseCNNLSTMNetwork(
            breath_block=bb,
            hidden_units=conf.get("time_series_hidden_units", 16) or 16,
            bn_scope=_bn_scope(conf),
        ),
        kind="siamese",
    ),
    "siamese_cnn_transformer": NetworkSpec(
        "siamese_cnn_transformer",
        lambda conf, bb, s, m: siamese.SiameseCNNTransformerNetwork(
            breath_block=bb,
            hidden_units=conf.get("time_series_hidden_units", 16) or 16,
            bn_scope=_bn_scope(conf),
        ),
        kind="siamese",
    ),
    "siamese_pretrained": NetworkSpec(
        "siamese_pretrained",
        lambda conf, bb, s, m: siamese.SiameseARDSClassifier(
            breath_block=bb,
            time_layer=conf.get("siamese_time_layer", "none") or "none",
            hidden_units=conf.get("time_series_hidden_units", 16) or 16,
            bn_scope=_bn_scope(conf),
        ),
    ),
    "protopnet": NetworkSpec(
        "protopnet",
        # built by ProtoPNetTrainer.build_model (needs n_sub_batches etc.)
        lambda conf, bb, s, m: None,
        trainer="protopnet",
    ),
    "cnn_linear_2d": NetworkSpec(
        "cnn_linear_2d",
        lambda conf, bb, s, m: densenet2d.CNNLinearNetwork2D(
            breath_block=bb
        ),
        two_dim=True,
    ),
    "cnn_linear_2x1d": NetworkSpec(
        "cnn_linear_2x1d",
        lambda conf, bb, s, m: densenet2d.CNNLinearNetwork2D(
            breath_block=bb
        ),
        two_dim=True,
    ),
    "protopnet_2d": NetworkSpec(
        "protopnet_2d",
        lambda conf, bb, s, m: None,
        trainer="protopnet",
        two_dim=True,
    ),
    # The reference registers three detection variants (retinanet_2d,
    # retinanet_2x1d, faster_rcnn_2d — train_ards_detector.py:118) that
    # differ only in torchvision detection machinery (anchor grids vs
    # region proposals) over the SAME full-width row-band boxes
    # (dataset.py:1776-1825).  The row-band parameterization subsumes all
    # three: per-row dense classification recovers the identical box
    # structure with a static-shape program (see PARITY.md "detection").
    # The variants differ here only in their backbone family.
    "retinanet_2d": NetworkSpec(
        "retinanet_2d",
        lambda conf, bb, s, m: detection2d.RowBandDetector(breath_block=bb),
        two_dim=True,
        kind="detector",
    ),
    "retinanet_2x1d": NetworkSpec(
        "retinanet_2x1d",
        lambda conf, bb, s, m: detection2d.RowBandDetector(breath_block=bb),
        two_dim=True,
        kind="detector",
    ),
    "faster_rcnn_2d": NetworkSpec(
        "faster_rcnn_2d",
        lambda conf, bb, s, m: detection2d.RowBandDetector(breath_block=bb),
        two_dim=True,
        kind="detector",
    ),
}

# siamese nets use their own triplet dataset/epoch structure
for _name in ("siamese_cnn_linear", "siamese_cnn_lstm",
              "siamese_cnn_transformer"):
    NETWORK_MAP[_name].trainer = "siamese"


def _n_bm_features(conf):
    """Regression output width by dataset type
    (reference: train_ards_detector.py:99-104)."""
    dt = conf.dataset_type
    if dt == "padded_breath_by_breath_with_limited_bm_target":
        return 3
    if dt == "padded_breath_by_breath_with_experimental_bm_target":
        return 7
    return 9


def register_network(name, spec):
    NETWORK_MAP[name] = spec


def get_network_spec(name):
    if name not in NETWORK_MAP:
        raise ValueError(
            "unknown network: {} (have: {})".format(name, sorted(NETWORK_MAP))
        )
    return NETWORK_MAP[name]


def metadata_features_for(conf):
    """(reference: train_ards_detector.py:106-109)"""
    if conf.dataset_type == "padded_breath_by_breath_with_flow_time_features":
        return 9
    return 0
