"""DenseNet-BC 1D backbone family (densenet18/121/161/169/201).

Capability-parity rebuild of the reference's 1D DenseNet
(reference: deepards/models/densenet.py:83-275): growth-rate dense blocks
with 1x1 bottlenecks, transition halving, batch-stat normalization
throughout, dropout 0.2 after each dense layer, and the
``conv_info()``/``forward_no_pool`` surface consumed by ProtoPNet/GradCAM.

TPU-native shifts: channels-last (N, L, C) layout; the whole backbone runs
as one batched XLA program over batch*windows; dropout is rng-keyed.
"""
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.layers import (
    BatchStatNorm,
    Conv1d,
    avg_pool1d,
    global_avg_pool_flatten,
    max_pool1d,
)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float

    @nn.compact
    def __call__(self, x, deterministic=False):
        h = BatchStatNorm()(x)
        h = nn.relu(h)
        h = Conv1d(self.bn_size * self.growth_rate, kernel_size=1)(h)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.growth_rate, kernel_size=3, padding=1)(h)
        if self.drop_rate > 0:
            h = nn.Dropout(rate=self.drop_rate, deterministic=deterministic)(h)
        return jnp.concatenate([x, h], axis=-1)

    @staticmethod
    def conv_info():
        return [1, 3], [1, 1], [0, 1]


class Transition(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = BatchStatNorm()(x)
        h = nn.relu(h)
        h = Conv1d(self.features, kernel_size=1)(h)
        return avg_pool1d(h, 2, 2)

    @staticmethod
    def conv_info():
        return [1, 2], [1, 2], [0, 0]


class DenseNet1D(nn.Module):
    """Input (N, C, L) torch-layout for API-compat; internally (N, L, C)."""

    growth_rate: int = 32
    block_config: Sequence[int] = (2, 2, 2, 2)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.2
    network_name: str = "densenet18"

    @property
    def n_out_filters(self):
        n = self.num_init_features
        for i, layers in enumerate(self.block_config):
            n += layers * self.growth_rate
            if i != len(self.block_config) - 1:
                n = n // 2
        return n

    def conv_info(self) -> Tuple[list, list, list]:
        """Kernel/stride/padding of every conv+pool, for receptive-field
        math (reference: deepards/models/densenet.py:169-177)."""
        ks, ss, ps = [7, 3], [2, 2], [3, 1]
        for i, layers in enumerate(self.block_config):
            for _ in range(layers):
                k, s, p = DenseLayer.conv_info()
                ks += k
                ss += s
                ps += p
            if i != len(self.block_config) - 1:
                k, s, p = Transition.conv_info()
                ks += k
                ss += s
                ps += p
        return ks, ss, ps

    @nn.compact
    def features(self, x, deterministic=False):
        # x: (N, C, L) -> (N, L, C)
        h = jnp.transpose(x, (0, 2, 1))
        h = Conv1d(self.num_init_features, kernel_size=7, stride=2, padding=3)(h)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = max_pool1d(h, 3, 2, padding=1)
        num_features = self.num_init_features
        for i, layers in enumerate(self.block_config):
            for _ in range(layers):
                h = DenseLayer(
                    self.growth_rate, self.bn_size, self.drop_rate
                )(h, deterministic)
                num_features += self.growth_rate
            if i != len(self.block_config) - 1:
                num_features = num_features // 2
                h = Transition(num_features)(h)
        h = BatchStatNorm()(h)
        return h

    def __call__(self, x, deterministic=False):
        h = self.features(x, deterministic)
        h = nn.relu(h)
        return global_avg_pool_flatten(h, window=7)

    def forward_no_pool(self, x, deterministic=False):
        """Pre-pool feature map (N, L', C') for GradCAM / ProtoPNet
        (reference: deepards/models/densenet.py:191-193)."""
        return nn.relu(self.features(x, deterministic))


def _make(name, growth_rate, block_config, num_init_features):
    def ctor(**kwargs):
        kwargs.pop("with_fft", None)
        kwargs.pop("only_fft", None)
        kwargs.pop("fft_real_only", None)
        return DenseNet1D(
            growth_rate=growth_rate,
            block_config=block_config,
            num_init_features=num_init_features,
            network_name=name,
            **kwargs,
        )

    return ctor


densenet18 = _make("densenet18", 32, (2, 2, 2, 2), 64)
densenet121 = _make("densenet121", 32, (6, 12, 24, 16), 64)
densenet161 = _make("densenet161", 48, (6, 12, 36, 24), 96)
densenet169 = _make("densenet169", 32, (6, 12, 32, 32), 64)
densenet201 = _make("densenet201", 32, (6, 12, 48, 32), 64)
