"""VGG-1D backbones (vgg11/vgg13 with and without batch norm).

(reference: deepards/models/vgg.py:11-145.)  The backbone ends with an
adaptive average pool to length 7 and flattens to 512*7 features.
"""
from typing import Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.layers import BatchStatNorm, Conv1d, max_pool1d

CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512,
          512, "M"],
}


def adaptive_avg_pool1d(x, out_len):
    """(N, L, C) -> (N, out_len, C), torch AdaptiveAvgPool semantics."""
    n, l, c = x.shape
    # torch uses variable windows start=floor(i*L/out), end=ceil((i+1)*L/out)
    outs = []
    for i in range(out_len):
        start = (i * l) // out_len
        end = -(-((i + 1) * l) // out_len)
        outs.append(x[:, start:end, :].mean(axis=1))
    return jnp.stack(outs, axis=1)


class VGG1D(nn.Module):
    cfg: Sequence[Union[int, str]] = tuple(CFGS["A"])
    batch_norm: bool = True
    network_name: str = "vgg11_bn"

    @property
    def n_out_filters(self):
        return 512 * 7

    def conv_info(self):
        ks, ss, ps = [], [], []
        for v in self.cfg:
            if v == "M":
                ks.append(2)
                ss.append(2)
                ps.append(0)
            else:
                ks.append(3)
                ss.append(1)
                ps.append(1)
        return ks, ss, ps

    @nn.compact
    def features(self, x, deterministic=False):
        h = jnp.transpose(x, (0, 2, 1))
        for v in self.cfg:
            if v == "M":
                h = max_pool1d(h, 2, 2)
            else:
                h = Conv1d(v, 3, padding=1, use_bias=True)(h)
                if self.batch_norm:
                    h = BatchStatNorm()(h)
                h = nn.relu(h)
        return h

    def __call__(self, x, deterministic=False):
        h = self.features(x, deterministic)
        h = adaptive_avg_pool1d(h, 7)
        # flatten channel-major (N, C, 7) like the reference's
        # x.view(N, -1) over torch layout, so head weights transplant 1:1
        return jnp.transpose(h, (0, 2, 1)).reshape(h.shape[0], -1)

    def forward_no_pool(self, x, deterministic=False):
        return self.features(x, deterministic)


def vgg11(**kw):
    return VGG1D(cfg=tuple(CFGS["A"]), batch_norm=False,
                 network_name="vgg11")


def vgg11_bn(**kw):
    return VGG1D(cfg=tuple(CFGS["A"]), batch_norm=True,
                 network_name="vgg11_bn")


def vgg13(**kw):
    return VGG1D(cfg=tuple(CFGS["B"]), batch_norm=False,
                 network_name="vgg13")


def vgg13_bn(**kw):
    return VGG1D(cfg=tuple(CFGS["B"]), batch_norm=True,
                 network_name="vgg13_bn")
