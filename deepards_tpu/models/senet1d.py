"""Squeeze-and-Excitation networks in 1D (senet18/154, se_resnet*,
se_resnext*).

(reference: deepards/models/senet.py:15-388 — a 1D port of the
pretrainedmodels SENet family.)  The squeeze-excite gate is a global
average pool -> bottleneck MLP -> sigmoid channel scaling.
"""
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.layers import (
    BatchStatNorm,
    Conv1d,
    global_avg_pool_flatten,
    max_pool1d,
)


class SEModule(nn.Module):
    channels: int
    reduction: int

    @nn.compact
    def __call__(self, x):
        # x: (N, L, C)
        s = x.mean(axis=1, keepdims=True)
        s = Conv1d(self.channels // self.reduction, 1, use_bias=True)(s)
        s = nn.relu(s)
        s = Conv1d(self.channels, 1, use_bias=True)(s)
        return x * nn.sigmoid(s)


class SEBasicBlock(nn.Module):
    planes: int
    groups: int
    reduction: int
    stride: int = 1
    downsample: bool = False
    downsample_kernel_size: int = 1
    downsample_padding: int = 0
    expansion = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        h = Conv1d(self.planes, 3, stride=self.stride, padding=1,
                   feature_group_count=self.groups)(x)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes, 3, padding=1,
                   feature_group_count=self.groups)(h)
        h = BatchStatNorm()(h)
        if self.downsample:
            residual = Conv1d(
                self.planes, self.downsample_kernel_size,
                stride=self.stride, padding=self.downsample_padding,
            )(x)
            residual = BatchStatNorm()(residual)
        h = SEModule(self.planes, self.reduction)(h) + residual
        return nn.relu(h)


class SEBottleneck(nn.Module):
    """SENet154-style bottleneck (reference: senet.py:98-120)."""

    planes: int
    groups: int
    reduction: int
    stride: int = 1
    downsample: bool = False
    downsample_kernel_size: int = 1
    downsample_padding: int = 0
    expansion = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        h = Conv1d(self.planes * 2, 1)(x)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes * 4, 3, stride=self.stride, padding=1,
                   feature_group_count=self.groups)(h)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes * 4, 1)(h)
        h = BatchStatNorm()(h)
        if self.downsample:
            residual = Conv1d(
                self.planes * 4, self.downsample_kernel_size,
                stride=self.stride, padding=self.downsample_padding,
            )(x)
            residual = BatchStatNorm()(residual)
        h = SEModule(self.planes * 4, self.reduction)(h) + residual
        return nn.relu(h)


class SEResNetBottleneck(nn.Module):
    """(reference: senet.py:122-145)"""

    planes: int
    groups: int
    reduction: int
    stride: int = 1
    downsample: bool = False
    downsample_kernel_size: int = 1
    downsample_padding: int = 0
    expansion = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        h = Conv1d(self.planes, 1, stride=self.stride)(x)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes, 3, padding=1,
                   feature_group_count=self.groups)(h)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes * 4, 1)(h)
        h = BatchStatNorm()(h)
        if self.downsample:
            residual = Conv1d(
                self.planes * 4, self.downsample_kernel_size,
                stride=self.stride, padding=self.downsample_padding,
            )(x)
            residual = BatchStatNorm()(residual)
        h = SEModule(self.planes * 4, self.reduction)(h) + residual
        return nn.relu(h)


class SEResNeXtBottleneck(nn.Module):
    """(reference: senet.py:147-168)"""

    planes: int
    groups: int
    reduction: int
    stride: int = 1
    downsample: bool = False
    downsample_kernel_size: int = 1
    downsample_padding: int = 0
    base_width: int = 4
    expansion = 4

    @nn.compact
    def __call__(self, x):
        import math

        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.groups
        residual = x
        h = Conv1d(width, 1)(x)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(width, 3, stride=self.stride, padding=1,
                   feature_group_count=self.groups)(h)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes * 4, 1)(h)
        h = BatchStatNorm()(h)
        if self.downsample:
            residual = Conv1d(
                self.planes * 4, self.downsample_kernel_size,
                stride=self.stride, padding=self.downsample_padding,
            )(x)
            residual = BatchStatNorm()(residual)
        h = SEModule(self.planes * 4, self.reduction)(h) + residual
        return nn.relu(h)


class SENet1D(nn.Module):
    block_cls: type = SEBasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    groups: int = 64
    reduction: int = 4
    dropout_p: Optional[float] = 0.2
    inplanes: int = 128
    input_3x3: bool = True
    downsample_kernel_size: int = 3
    downsample_padding: int = 1
    network_name: str = "senet18"

    @property
    def n_out_filters(self):
        return 512 * self.block_cls.expansion

    @nn.compact
    def __call__(self, x, deterministic=False):
        h = jnp.transpose(x, (0, 2, 1))
        if self.input_3x3:
            h = Conv1d(64, 3, stride=2, padding=1)(h)
            h = nn.relu(BatchStatNorm()(h))
            h = Conv1d(64, 3, padding=1)(h)
            h = nn.relu(BatchStatNorm()(h))
            h = Conv1d(self.inplanes, 3, padding=1)(h)
            h = nn.relu(BatchStatNorm()(h))
        else:
            h = Conv1d(self.inplanes, 7, stride=2, padding=3)(h)
            h = nn.relu(BatchStatNorm()(h))
        # torch ceil_mode=True pool: pad right so ceil lengths are kept
        pad = (2 - (h.shape[1] - 3) % 2) % 2
        if pad:
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)),
                        constant_values=-jnp.inf)
        h = max_pool1d(h, 3, 2)

        inplanes = self.inplanes
        exp = self.block_cls.expansion
        for li, blocks in enumerate(self.layers):
            planes = 64 * (2 ** li)
            for b in range(blocks):
                stride = 2 if (b == 0 and li > 0) else 1
                needs_ds = b == 0 and (
                    stride != 1 or inplanes != planes * exp
                )
                dk = 1 if li == 0 else self.downsample_kernel_size
                dp = 0 if li == 0 else self.downsample_padding
                h = self.block_cls(
                    planes=planes,
                    groups=self.groups,
                    reduction=self.reduction,
                    stride=stride,
                    downsample=needs_ds,
                    downsample_kernel_size=dk,
                    downsample_padding=dp,
                )(h)
                inplanes = planes * exp
        h = global_avg_pool_flatten(h, window=7)
        if self.dropout_p:
            h = nn.Dropout(self.dropout_p, deterministic=deterministic)(h)
        return h

    def conv_info(self):
        raise NotImplementedError(
            "receptive-field math is not wired for SENet backbones"
        )


def senet18(**kw):
    return SENet1D(block_cls=SEBasicBlock, layers=(2, 2, 2, 2), groups=64,
                   reduction=4, dropout_p=0.2, network_name="senet18")


def senet154(**kw):
    return SENet1D(block_cls=SEBottleneck, layers=(3, 8, 36, 3), groups=64,
                   reduction=16, dropout_p=0.2, network_name="senet154")


def se_resnet18(**kw):
    return SENet1D(block_cls=SEBasicBlock, layers=(2, 2, 2, 2), groups=1,
                   reduction=4, dropout_p=None, inplanes=64, input_3x3=False,
                   downsample_kernel_size=1, downsample_padding=0,
                   network_name="se_resnet18")


def se_resnet50(**kw):
    return SENet1D(block_cls=SEResNetBottleneck, layers=(3, 4, 6, 3),
                   groups=1, reduction=16, dropout_p=None, inplanes=64,
                   input_3x3=False, downsample_kernel_size=1,
                   downsample_padding=0, network_name="se_resnet50")


def se_resnet101(**kw):
    return SENet1D(block_cls=SEResNetBottleneck, layers=(3, 4, 23, 3),
                   groups=1, reduction=16, dropout_p=None, inplanes=64,
                   input_3x3=False, downsample_kernel_size=1,
                   downsample_padding=0, network_name="se_resnet101")


def se_resnet152(**kw):
    return SENet1D(block_cls=SEResNetBottleneck, layers=(3, 8, 36, 3),
                   groups=1, reduction=16, dropout_p=None, inplanes=64,
                   input_3x3=False, downsample_kernel_size=1,
                   downsample_padding=0, network_name="se_resnet152")


def se_resnext50_32x4d(**kw):
    return SENet1D(block_cls=SEResNeXtBottleneck, layers=(3, 4, 6, 3),
                   groups=32, reduction=16, dropout_p=None, inplanes=64,
                   input_3x3=False, downsample_kernel_size=1,
                   downsample_padding=0, network_name="se_resnext50_32x4d")


def se_resnext101_32x4d(**kw):
    return SENet1D(block_cls=SEResNeXtBottleneck, layers=(3, 4, 23, 3),
                   groups=32, reduction=16, dropout_p=None, inplanes=64,
                   input_3x3=False, downsample_kernel_size=1,
                   downsample_padding=0, network_name="se_resnext101_32x4d")
