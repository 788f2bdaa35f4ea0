"""ResNet-1D backbone family (resnet18/34/50/101/152).

Capability-parity rebuild of the reference 1D ResNet
(reference: deepards/models/resnet.py:81-222) with its knobs:
``initial_planes``, ``first_pool_type`` (max/avg), ``double_conv_first``.
Channels-last (N, L, C) on TPU; batch-stat normalization (the reference
never leaves train mode, so running stats are never consulted).
"""
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.layers import (
    BatchStatNorm,
    Conv1d,
    avg_pool1d,
    global_avg_pool_flatten,
    max_pool1d,
)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        h = Conv1d(self.planes, 3, stride=self.stride, padding=1)(x)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes, 3, padding=1)(h)
        h = BatchStatNorm()(h)
        if self.downsample:
            identity = Conv1d(self.planes, 1, stride=self.stride)(x)
            identity = BatchStatNorm()(identity)
        return nn.relu(h + identity)

    @staticmethod
    def conv_info(stride, downsample):
        ks, ss, ps = [3, 3], [stride, 1], [1, 1]
        return ks, ss, ps


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        h = Conv1d(self.planes, 1)(x)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes, 3, stride=self.stride, padding=1)(h)
        h = BatchStatNorm()(h)
        h = nn.relu(h)
        h = Conv1d(self.planes * 4, 1)(h)
        h = BatchStatNorm()(h)
        if self.downsample:
            identity = Conv1d(self.planes * 4, 1, stride=self.stride)(x)
            identity = BatchStatNorm()(identity)
        return nn.relu(h + identity)

    @staticmethod
    def conv_info(stride, downsample):
        return [1, 3, 1], [1, stride, 1], [0, 1, 0]


class ResNet1D(nn.Module):
    block_cls: type = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    initial_planes: int = 64
    first_pool_type: str = "max"
    double_conv_first: bool = False
    network_name: str = "resnet18"

    @property
    def n_out_filters(self):
        return self.initial_planes * 8 * self.block_cls.expansion

    def conv_info(self):
        ks, ss, ps = [7, 3], [2, 2], [3, 1]
        inplanes = self.initial_planes
        for li, blocks in enumerate(self.layers):
            planes = self.initial_planes * (2 ** li)
            for b in range(blocks):
                stride = 2 if (b == 0 and li > 0) else 1
                k, s, p = self.block_cls.conv_info(stride, b == 0)
                ks += k
                ss += s
                ps += p
        return ks, ss, ps

    @nn.compact
    def features(self, x, deterministic=False):
        h = jnp.transpose(x, (0, 2, 1))
        if not self.double_conv_first:
            h = Conv1d(self.initial_planes, 7, stride=2, padding=3)(h)
            h = BatchStatNorm()(h)
        else:
            h = Conv1d(self.initial_planes, 3, stride=1, padding=1)(h)
            h = BatchStatNorm()(h)
            h = Conv1d(self.initial_planes, 7, stride=2, padding=3)(h)
            h = BatchStatNorm()(h)
        h = nn.relu(h)
        if self.first_pool_type == "max":
            h = max_pool1d(h, 3, 2, padding=1)
        else:
            h = avg_pool1d(h, 3, 2, padding=1)

        inplanes = self.initial_planes
        exp = self.block_cls.expansion
        for li, blocks in enumerate(self.layers):
            planes = self.initial_planes * (2 ** li)
            for b in range(blocks):
                stride = 2 if (b == 0 and li > 0) else 1
                downsample = b == 0 and (stride != 1 or inplanes != planes * exp)
                h = self.block_cls(
                    planes, stride=stride, downsample=downsample
                )(h)
                inplanes = planes * exp
        return h

    def __call__(self, x, deterministic=False):
        h = self.features(x, deterministic)
        return global_avg_pool_flatten(h, window=7)

    def forward_no_pool(self, x, deterministic=False):
        return self.features(x, deterministic)


def _make(name, block, layers):
    def ctor(initial_planes=64, first_pool_type="max",
             double_conv_first=False, **kwargs):
        kwargs.pop("with_fft", None)
        kwargs.pop("only_fft", None)
        kwargs.pop("fft_real_only", None)
        return ResNet1D(
            block_cls=block,
            layers=layers,
            initial_planes=initial_planes,
            first_pool_type=first_pool_type,
            double_conv_first=bool(double_conv_first),
            network_name=name,
        )

    return ctor


resnet18 = _make("resnet18", BasicBlock, (2, 2, 2, 2))
resnet34 = _make("resnet34", BasicBlock, (3, 4, 6, 3))
resnet50 = _make("resnet50", Bottleneck, (3, 4, 6, 3))
resnet101 = _make("resnet101", Bottleneck, (3, 4, 23, 3))
resnet152 = _make("resnet152", Bottleneck, (3, 8, 36, 3))
