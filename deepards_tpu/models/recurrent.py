"""LSTM-based networks: CNN+LSTM combos and raw-waveform LSTM models.

Capability parity with the reference
(reference: deepards/models/torch_cnn_lstm_combo.py:6-97,
deepards/models/lstm_only.py:7-95).  TPU-native shifts: the CNN feature
extraction runs as one batched conv over (batch*windows); the LSTM time
recursion is a ``flax.linen.RNN``/``lax.scan``; the "packed sequence"
variant becomes masked outputs (identical results to pack→pad with
zero-padded outputs, without the host-side packing).
"""
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.transformer import Transformer


from deepards_tpu.models.heads import _window_features  # noqa: E402
# (shared helper: honors each module's bn_scope field)


def _metadata_valid(metadata):
    return metadata is not None


class CNNLSTMNetwork(nn.Module):
    """CNN features per window -> LSTM over windows -> per-window logits;
    optional stateful hidden-state carry across batches in the
    patient-ordered unshuffled mode (reference:
    torch_cnn_lstm_combo.py:6-50, train_ards_detector.py:841-849)."""

    breath_block: nn.Module
    lstm_hidden_units: int = 16
    metadata_features: int = 0
    bm_to_linear: bool = False
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False, carry=None):
        feats = _window_features(self, x, deterministic)
        if (
            self.metadata_features
            and metadata is not None
            and not self.bm_to_linear
        ):
            feats = jnp.concatenate([feats, metadata], axis=-1)
        hidden = self.lstm_hidden_units + (
            self.metadata_features if not self.bm_to_linear else 0
        )
        cell = nn.OptimizedLSTMCell(features=hidden)
        rnn = nn.RNN(cell, return_carry=True)
        if carry is None:
            carry, out = rnn(feats)
        else:
            carry, out = rnn(feats, initial_carry=carry)
        if self.bm_to_linear and metadata is not None:
            out = jnp.concatenate([out, metadata], axis=-1)
        logits = nn.Dense(2)(out)
        return logits, carry


class CNNLSTMDoubleLinearNetwork(nn.Module):
    """(reference: torch_cnn_lstm_combo.py:53-97)"""

    breath_block: nn.Module
    lstm_hidden_units: int = 16
    metadata_features: int = 0
    bm_to_linear: bool = False
    bn_scope: str = "batch"

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        feats = _window_features(self, x, deterministic)
        if (
            self.metadata_features
            and metadata is not None
            and not self.bm_to_linear
        ):
            feats = jnp.concatenate([feats, metadata], axis=-1)
        hidden = self.lstm_hidden_units + (
            self.metadata_features if not self.bm_to_linear else 0
        )
        out = nn.RNN(nn.OptimizedLSTMCell(features=hidden))(feats)
        if self.bm_to_linear and metadata is not None:
            out = jnp.concatenate([out, metadata], axis=-1)
        b = out.shape[0]
        h = nn.Dense(hidden)(out.reshape(b, -1))
        return nn.Dense(2)(h)


class LSTMOnlyNetwork(nn.Module):
    """Raw-waveform LSTM over each 224-sample window
    (reference: lstm_only.py:47-72)."""

    lstm_hidden_units: int = 16
    intermediate_features: int = 16

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        b, s, c, l = x.shape
        seq = x.reshape(b * s, l, c)  # time-major windows, 1 feature
        out = nn.RNN(
            nn.OptimizedLSTMCell(features=self.lstm_hidden_units)
        )(seq)
        out = out.reshape(b, s, -1)
        h = nn.Dense(self.intermediate_features)(out)
        return nn.Dense(2)(h.reshape(b, -1))


class LSTMOnlyWithPacking(nn.Module):
    """Pad-aware variant: outputs beyond each window's true length are
    zeroed, numerically equivalent to the reference's
    pack_padded_sequence→pad_packed_sequence round trip
    (reference: lstm_only.py:7-44) without host packing.
    """

    lstm_hidden_units: int = 16
    intermediate_features: int = 64

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        b, s, c, l = x.shape
        seq = x.reshape(b * s, l, c)
        # length = index of first zero sample (0 -> treated as full length),
        # mirroring the reference's argmax(x == 0) heuristic
        is_zero = (seq == 0).all(axis=-1)
        first_zero = jnp.argmax(is_zero, axis=1)
        lens = jnp.where(first_zero == 0, l - 1, first_zero) + 1
        out = nn.RNN(
            nn.OptimizedLSTMCell(features=self.lstm_hidden_units)
        )(seq)
        t = jnp.arange(l)[None, :, None]
        out = jnp.where(t < lens[:, None, None], out, 0.0)
        out = out.reshape(b, s, -1)
        h = nn.Dense(self.intermediate_features)(out)
        return nn.Dense(2)(h.reshape(b, -1))


class DoubleLSTMNetwork(nn.Module):
    """Window LSTM then batch LSTM (reference: lstm_only.py:75-95)."""

    lstm_hidden_units: int = 16
    intermediate_features: int = 16

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        b, s, c, l = x.shape
        seq = x.reshape(b * s, l, c)
        out = nn.RNN(
            nn.OptimizedLSTMCell(features=self.lstm_hidden_units)
        )(seq)
        out = out.reshape(b, s, -1)
        out = nn.RNN(
            nn.OptimizedLSTMCell(features=self.intermediate_features)
        )(out)
        return nn.Dense(2)(out.reshape(b, -1))


class CNNTransformerNetwork(nn.Module):
    """CNN features -> transformer encoder -> per-window logits
    (reference: deepards/models/cnn_transformer.py:8-44)."""

    breath_block: nn.Module
    hidden_units: int = 16
    num_blocks: int = 2
    metadata_features: int = 0
    bm_to_linear: bool = False
    bn_scope: str = "batch"
    n_out_filters: Optional[int] = None

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        feats = _window_features(self, x, deterministic)
        if (
            self.metadata_features
            and metadata is not None
            and not self.bm_to_linear
        ):
            feats = jnp.concatenate([feats, metadata], axis=-1)
        out = Transformer(
            input_size=feats.shape[-1],
            hidden_size=self.hidden_units,
            num_blocks=self.num_blocks,
            num_heads=4,
        )(feats, deterministic)
        if self.bm_to_linear and metadata is not None:
            out = jnp.concatenate([out, metadata], axis=-1)
        return nn.Dense(2)(out)
