"""UNet-1D: full segmentation net + encoder-as-backbone.

(reference: deepards/models/unet.py:13-69; the training harness uses
``.encoder`` as a breath_block.)
"""
import jax
import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.layers import Conv1d, max_pool1d


class DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = Conv1d(self.features, 3, padding=1, use_bias=True)(x)
        h = nn.relu(h)
        h = Conv1d(self.features, 3, padding=1, use_bias=True)(h)
        return nn.relu(h)


def linear_upsample(x, factor=2):
    """nn.Upsample(scale_factor=2, mode='linear', align_corners=True)."""
    n, l, c = x.shape
    return jax.image.resize(x, (n, l * factor, c), method="linear")


class UNet1DEncoder(nn.Module):
    """The breath-block view of UNet: down path only, output flattened."""

    network_name: str = "unet"

    @property
    def n_out_filters(self):
        return 512

    @nn.compact
    def __call__(self, x, deterministic=False):
        h = jnp.transpose(x, (0, 2, 1))
        h = DoubleConv(64)(h)
        h = max_pool1d(h, 2, 2)
        h = DoubleConv(128)(h)
        h = max_pool1d(h, 2, 2)
        h = DoubleConv(256)(h)
        h = max_pool1d(h, 2, 2)
        h = DoubleConv(512)(h)
        # (N, 28, 512) -> flatten like the torch view(-1) consumer
        return h.reshape(h.shape[0], -1)


class UNet1D(nn.Module):
    n_class: int = 1
    network_name: str = "unet"

    @property
    def n_out_filters(self):
        return 512

    @nn.compact
    def __call__(self, x, deterministic=False):
        h = jnp.transpose(x, (0, 2, 1))
        c1 = DoubleConv(64)(h)
        h = max_pool1d(c1, 2, 2)
        c2 = DoubleConv(128)(h)
        h = max_pool1d(c2, 2, 2)
        c3 = DoubleConv(256)(h)
        h = max_pool1d(c3, 2, 2)
        h = DoubleConv(512)(h)
        h = linear_upsample(h)
        h = jnp.concatenate([h, c3], axis=-1)
        h = DoubleConv(256)(h)
        h = linear_upsample(h)
        h = jnp.concatenate([h, c2], axis=-1)
        h = DoubleConv(128)(h)
        h = linear_upsample(h)
        h = jnp.concatenate([h, c1], axis=-1)
        h = DoubleConv(64)(h)
        out = Conv1d(self.n_class, 1, use_bias=True)(h)
        return jnp.transpose(out, (0, 2, 1))
