"""DenseNet-2D and DenseNet-2x1d backbones for breath-image datasets.

Capability parity with the reference 2D nets
(reference: deepards/models/densenet2d.py — torchvision-style 2D densenet
with a ``block_kernel_size`` knob; deepards/models/densenet2x1d.py — 2D
net with (k, 1)-shaped kernels that convolve along image rows only).

Input API: (N, C, H, W); internally channels-last (N, H, W, C) for TPU.
"""
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.layers import BatchStatNorm


def _conv2d(features, kernel, stride=1, padding=0):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    if isinstance(stride, int):
        stride = (stride, stride)
    return nn.Conv(
        features, kernel_size=kernel, strides=stride, padding=padding,
        use_bias=False,
    )


class DenseLayer2D(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float
    block_kernel: Tuple[int, int]

    @nn.compact
    def __call__(self, x, deterministic=False):
        h = BatchStatNorm()(x)
        h = nn.relu(h)
        h = _conv2d(self.bn_size * self.growth_rate, 1)(h)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        kh, kw = self.block_kernel
        h = _conv2d(
            self.growth_rate, self.block_kernel,
            padding=(kh // 2, kw // 2),
        )(h)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=deterministic)(h)
        return jnp.concatenate([x, h], axis=-1)


class Transition2D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = BatchStatNorm()(x)
        h = nn.relu(h)
        h = _conv2d(self.features, 1)(h)
        return nn.avg_pool(h, (2, 2), (2, 2))


class DenseNet2D(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (2, 2, 2, 2)
    num_init_features: int = 64
    bn_size: int = 4
    # the reference's 2D variant defaults dropout OFF, unlike the 1D one
    # (reference: densenet2d.py:166 drop_rate = 0)
    drop_rate: float = 0.0
    block_kernel: Tuple[int, int] = (3, 3)
    network_name: str = "densenet18_2d"

    @property
    def n_out_filters(self):
        n = self.num_init_features
        for i, layers in enumerate(self.block_config):
            n += layers * self.growth_rate
            if i != len(self.block_config) - 1:
                n = n // 2
        return n

    @nn.compact
    def features(self, x, deterministic=False):
        # (N, C, H, W) -> (N, H, W, C)
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = _conv2d(self.num_init_features, 7, stride=2, padding=3)(h)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        num_features = self.num_init_features
        for i, layers in enumerate(self.block_config):
            for _ in range(layers):
                h = DenseLayer2D(
                    self.growth_rate, self.bn_size, self.drop_rate,
                    self.block_kernel,
                )(h, deterministic)
                num_features += self.growth_rate
            if i != len(self.block_config) - 1:
                num_features = num_features // 2
                h = Transition2D(num_features)(h)
        h = BatchStatNorm()(h)
        return h

    def __call__(self, x, deterministic=False):
        h = self.features(x, deterministic)
        h = nn.relu(h)
        # adaptive global average pool
        return h.mean(axis=(1, 2))

    def forward_no_pool(self, x, deterministic=False):
        return nn.relu(self.features(x, deterministic))


def densenet18_2d(block_kernel_size=3, **kw):
    return DenseNet2D(
        block_config=(2, 2, 2, 2),
        block_kernel=(block_kernel_size, block_kernel_size),
        network_name="densenet18_2d",
    )


def densenet121_2d(block_kernel_size=3, **kw):
    return DenseNet2D(
        block_config=(6, 12, 24, 16),
        block_kernel=(block_kernel_size, block_kernel_size),
        network_name="densenet121_2d",
    )


def densenet18_2x1d(block_kernel_size=3, **kw):
    """(k, 1)-kernel variant: convolves along rows only
    (reference: deepards/models/densenet2x1d.py)."""
    return DenseNet2D(
        block_config=(2, 2, 2, 2),
        block_kernel=(block_kernel_size, 1),
        network_name="densenet18_2x1d",
    )


class CNNLinearNetwork2D(nn.Module):
    """2D backbone + adaptive avg pool + Linear
    (reference: torch_cnn_linear_network.py:116-125)."""

    breath_block: nn.Module

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        h = self.breath_block(x, deterministic)
        return nn.Dense(2)(h)
