"""Whole-patient "super batch" networks: median-pooled window features fed
to an RNN/LSTM/Transformer over the window axis.

(reference: deepards/models/cnn_to_nested_layer.py:8-127; trainers force
batch_size=1, train_ards_detector.py:774-794.)  Input here is
(1, n_windows, S, C, L).

Exactness notes: the reference loops ``breath_block(x[i])`` one WINDOW at
a time, so BatchNorm statistics span a single window's S breaths — the
backbone is therefore lifted per window with ``nn.vmap`` (shared params,
per-window norm statistics), not folded into one (W*S) super batch.  This
also makes zero-padded bucket windows safe: a padded window only corrupts
its own features, which the causal RNN/LSTM never propagates backwards
and the transformer excludes via ``window_mask``.
"""
import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.transformer import Transformer

INTERMEDIATE_UNITS = 128


def _nested_features(parent, x, deterministic):
    """(1, W, S, C, L) -> (1, W, F): per-window backbone (reference BN
    scope), median-pooled over each window's breaths."""
    if x.ndim == 5:
        x = x[0]

    def one_window(mdl, win):
        return mdl.breath_block(win, deterministic)

    per_window = nn.vmap(
        one_window,
        in_axes=0,
        out_axes=0,
        variable_axes={"params": None},
        split_rngs={"params": False, "dropout": True},
    )
    feats = per_window(parent, x)  # (W, S, F)
    return jnp.median(feats, axis=1)[None]


class CNNToNestedRNNNetwork(nn.Module):
    breath_block: nn.Module

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False,
                 window_mask=None):
        out = _nested_features(self, x, deterministic)
        out = nn.RNN(nn.SimpleCell(features=INTERMEDIATE_UNITS))(out)
        return nn.Dense(2)(out)


class CNNToNestedLSTMNetwork(nn.Module):
    breath_block: nn.Module

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False,
                 window_mask=None):
        out = _nested_features(self, x, deterministic)
        out = nn.RNN(nn.OptimizedLSTMCell(features=INTERMEDIATE_UNITS))(out)
        return nn.Dense(2)(out)


class CNNToNestedTransformerNetwork(nn.Module):
    breath_block: nn.Module
    transformer_blocks: int = 2

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False,
                 window_mask=None):
        out = _nested_features(self, x, deterministic)
        out = Transformer(
            input_size=out.shape[-1],
            hidden_size=INTERMEDIATE_UNITS,
            num_blocks=self.transformer_blocks,
            num_heads=4,
        )(out, deterministic, mask=window_mask)
        return nn.Dense(2)(out)
