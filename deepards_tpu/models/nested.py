"""Whole-patient "super batch" networks: median-pooled window features fed
to an RNN/LSTM/Transformer over the window axis.

(reference: deepards/models/cnn_to_nested_layer.py:8-127; trainers force
batch_size=1, train_ards_detector.py:774-794.)  Input here is
(1, n_windows, S, C, L); the backbone runs once over n_windows*S rows.
"""
import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.transformer import Transformer

INTERMEDIATE_UNITS = 128


def _nested_features(breath_block, x, deterministic):
    """(1, W, S, C, L) -> (1, W, F) median-pooled over windows' breaths."""
    if x.ndim == 5:
        x = x[0]
    w, s, c, l = x.shape
    feats = breath_block(x.reshape(w * s, c, l), deterministic)
    feats = feats.reshape(w, s, -1)
    return jnp.median(feats, axis=1)[None]


class CNNToNestedRNNNetwork(nn.Module):
    breath_block: nn.Module

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        out = _nested_features(self.breath_block, x, deterministic)
        out = nn.RNN(nn.SimpleCell(features=INTERMEDIATE_UNITS))(out)
        return nn.Dense(2)(out)


class CNNToNestedLSTMNetwork(nn.Module):
    breath_block: nn.Module

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        out = _nested_features(self.breath_block, x, deterministic)
        out = nn.RNN(nn.OptimizedLSTMCell(features=INTERMEDIATE_UNITS))(out)
        return nn.Dense(2)(out)


class CNNToNestedTransformerNetwork(nn.Module):
    breath_block: nn.Module
    transformer_blocks: int = 2

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        out = _nested_features(self.breath_block, x, deterministic)
        out = Transformer(
            input_size=out.shape[-1],
            hidden_size=INTERMEDIATE_UNITS,
            num_blocks=self.transformer_blocks,
            num_heads=4,
        )(out, deterministic)
        return nn.Dense(2)(out)
