"""Composite networks: CNN backbone + classification/regression heads.

Capability parity with the reference's head zoo
(reference: deepards/models/torch_cnn_linear_network.py,
torch_cnn_bm_regressor.py, torch_metadata_only_network.py).

TPU-native shift: the reference loops Python-level over the batch calling
the backbone once per sample (torch_cnn_linear_network.py:104-113 — its #1
hot-loop inefficiency).  Here every head folds (batch, windows) into one
(B*S) super-batch and runs the backbone as a single batched XLA conv
program on the MXU.

Because the backbones use batch-statistic normalization (the reference's
track_running_stats=False + skipped model.eval()), the fold changes WHICH
rows share norm statistics: the super-batch normalizes over all B*S
windows, where the reference's loop normalizes over each sample's own S
windows.  ``bn_scope='sequence'`` restores the reference's exact
semantics by lifting the backbone per sample with ``nn.vmap`` (shared
params, per-sequence norm statistics) — a config flag away from
reference-exact numerics (plumbed from ``bn_scope`` in the experiment
config; pinned bitwise vs the reference in tests/test_reference_parity).
"""
import jax.numpy as jnp
from flax import linen as nn


def _window_features(parent, x, deterministic):
    """(B, S, C, L) -> (B, S, F) window features from parent.breath_block.

    bn_scope='batch' (default): one batched backbone call over B*S rows.
    bn_scope='sequence': backbone lifted per sample so batch-stat BN
    spans each sample's own S windows (reference-exact,
    torch_cnn_linear_network.py:104-113).
    """
    b, s, c, l = x.shape
    if getattr(parent, "bn_scope", "batch") == "sequence":
        def one_seq(mdl, seq):
            return mdl.breath_block(seq, deterministic)

        per_seq = nn.vmap(
            one_seq,
            in_axes=0,
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False, "dropout": True},
        )
        return per_seq(parent, x)  # (B, S, F)
    feats = parent.breath_block(x.reshape(b * s, c, l), deterministic)
    return feats.reshape(b, s, -1)


class CNNLinearNetwork(nn.Module):
    """Flatten all window features -> one Linear -> (B, 2) logits.
    The headline model (reference: torch_cnn_linear_network.py:92-113)."""

    breath_block: nn.Module
    metadata_features: int = 0
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        feats = _window_features(self, x, deterministic)
        b = feats.shape[0]
        flat = feats.reshape(b, -1)
        if self.metadata_features and metadata is not None:
            flat = jnp.concatenate(
                [flat, metadata.reshape(b, -1)], axis=-1
            )
        return nn.Dense(2)(flat)


class CNNDoubleLinearNetwork(nn.Module):
    """Per-window Linear(F,2) then Linear over the flattened window logits
    (reference: torch_cnn_linear_network.py:70-89)."""

    breath_block: nn.Module
    metadata_features: int = 0
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        feats = _window_features(self, x, deterministic)
        b, s, _ = feats.shape
        inter = nn.Dense(2)(feats)  # (B, S, 2)
        flat = inter.reshape(b, -1)
        if self.metadata_features and metadata is not None:
            flat = jnp.concatenate([flat, metadata.reshape(b, -1)], axis=-1)
        return nn.Dense(2)(flat)


class CNNSingleBreathLinearNetwork(nn.Module):
    """Per-window logits (B, S, 2) for the per-breath classifier mixin
    (reference: torch_cnn_linear_network.py:49-67)."""

    breath_block: nn.Module
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        feats = _window_features(self, x, deterministic)
        return nn.Dense(2)(feats)


class CNNLinearToMean(nn.Module):
    """Mean-pool window features -> Linear
    (reference: torch_cnn_linear_network.py:7-25)."""

    breath_block: nn.Module
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        feats = _window_features(self, x, deterministic)
        return nn.Dense(2)(feats.mean(axis=1))


class CNNLinearComprToRF(nn.Module):
    """Median-pool window features -> Linear
    (reference: torch_cnn_linear_network.py:28-46).

    torch.median returns the LOWER of the two middle values on an even
    window count (the reference runs S=20), where jnp.median would
    average them — the lower-median semantics are reproduced exactly.
    """

    breath_block: nn.Module
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        feats = _window_features(self, x, deterministic)
        s = feats.shape[1]
        lower_median = jnp.sort(feats, axis=1)[:, (s - 1) // 2]
        return nn.Dense(2)(lower_median)


class CNNRegressor(nn.Module):
    """Per-breath regression head for breath-meta pretraining
    (reference: torch_cnn_bm_regressor.py:6-19; n_outputs set by dataset
    type, train_ards_detector.py:99-104)."""

    breath_block: nn.Module
    n_outputs: int = 9
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        feats = _window_features(self, x, deterministic)
        b = feats.shape[0]
        return nn.Dense(self.n_outputs)(feats.reshape(b, -1))


class MetadataOnlyNetwork(nn.Module):
    """Linear(9,32)->Linear(32,16)->Linear(16,2) over metadata.mean(dim=1)
    — reproduced exactly, INCLUDING the absence of activations between
    layers: the reference's published grid-searched classifier is a pure
    linear chain (reference: torch_metadata_only_network.py:17-26).  The
    reference raises on NaN metadata at forward time; here NaN-freedom is
    a dataset invariant (wrong-dataset-type misuse surfaces as NaN loss).
    """

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        h = metadata.mean(axis=1)  # (B, rows, 9) -> (B, 9)
        h = nn.Dense(32)(h)
        h = nn.Dense(16)(h)
        return nn.Dense(2)(h)


class AutoencoderNetwork(nn.Module):
    """Reconstruction network: loss compares output to input
    (reference: models/autoencoder_network.py:4-16,
    train_ards_detector.py:1112-1113)."""

    breath_block: nn.Module  # an AutoencoderCNN

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        b, s, c, l = x.shape
        out = self.breath_block(x.reshape(b * s, c, l), deterministic)
        return out.reshape(b, s, c, l)
