"""Siamese pretraining networks and the pretrained-tower classifier.

(reference: deepards/models/siamese.py:16-157.)  Twin towers share the
backbone (flax parameter sharing is automatic — the same submodule is
applied to both inputs), |difference| feeds a per-window Linear then a
final Linear.
"""
import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.transformer import Transformer


from deepards_tpu.models.heads import _window_features  # noqa: E402
# (shared helper: honors each module's bn_scope field)


class SiameseCNNLinearNetwork(nn.Module):
    """(reference: siamese.py:57-85)"""

    breath_block: nn.Module
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, compr, deterministic=False):
        x_out = _window_features(self, x, deterministic)
        c_out = _window_features(self, compr, deterministic)
        diff = nn.Dense(2, name="linear_intermediate")(
            jnp.abs(c_out - x_out)
        )
        b = diff.shape[0]
        return nn.Dense(2, name="linear_final")(diff.reshape(b, -1))


class SiameseCNNLSTMNetwork(nn.Module):
    """LSTM-tower variant (reference: siamese.py cnn_lstm flavor)."""

    breath_block: nn.Module
    hidden_units: int = 16
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, compr, deterministic=False):
        lstm = nn.RNN(nn.OptimizedLSTMCell(features=self.hidden_units))
        x_out = lstm(_window_features(self, x, deterministic))
        c_out = lstm(_window_features(self, compr,
                                      deterministic))
        diff = nn.Dense(2, name="linear_intermediate")(jnp.abs(c_out - x_out))
        b = diff.shape[0]
        return nn.Dense(2, name="linear_final")(diff.reshape(b, -1))


class SiameseCNNTransformerNetwork(nn.Module):
    """(reference: siamese.py:87-120)"""

    breath_block: nn.Module
    hidden_units: int = 16
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, compr, deterministic=False):
        x_out = _window_features(self, x, deterministic)
        c_out = _window_features(self, compr, deterministic)
        trans = Transformer(
            input_size=x_out.shape[-1],
            hidden_size=self.hidden_units,
            num_blocks=2,
            num_heads=4,
        )
        x_out = trans(x_out, deterministic)
        c_out = trans(c_out, deterministic)
        diff = nn.Dense(2, name="linear_intermediate")(jnp.abs(c_out - x_out))
        b = diff.shape[0]
        return nn.Dense(2, name="linear_final")(diff.reshape(b, -1))


class SiameseARDSClassifier(nn.Module):
    """Repurpose a pretrained siamese tower for ARDS classification:
    backbone (+ optional time layer) -> final Linear
    (reference: siamese.py:16-54)."""

    breath_block: nn.Module
    time_layer: str = "none"  # none|lstm|transformer
    hidden_units: int = 16
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        out = _window_features(self, x, deterministic)
        if self.time_layer == "lstm":
            out = nn.RNN(nn.OptimizedLSTMCell(features=self.hidden_units))(out)
        elif self.time_layer == "transformer":
            out = Transformer(
                input_size=out.shape[-1],
                hidden_size=self.hidden_units,
                num_blocks=2,
                num_heads=4,
            )(out, deterministic)
        b = out.shape[0]
        return nn.Dense(2, name="linear_final")(out.reshape(b, -1))
