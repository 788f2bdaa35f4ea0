"""Convolutional autoencoder with max-unpooling, + encoder backbone.

(reference: deepards/models/autoencoder_cnn.py:5-64.)  torch's
MaxPool1d(return_indices)/MaxUnpool1d pair becomes a vectorized one-hot
scatter: pooling windows are non-overlapping (k=2,s=2) so argmax within
each window is a 0/1 index and unpooling is a broadcast multiply.
"""
import jax.numpy as jnp
from flax import linen as nn

from deepards_tpu.models.layers import BatchStatNorm, Conv1d, max_pool1d


def max_pool_with_argmax(x):
    """(N, L, C) -> pooled (N, L/2, C), idx one-hot (N, L/2, 2, C)."""
    n, l, c = x.shape
    xr = x.reshape(n, l // 2, 2, c)
    pooled = xr.max(axis=2)
    onehot = (xr == pooled[:, :, None, :]).astype(x.dtype)
    # break ties toward the first element like torch
    first = onehot[:, :, 0:1, :]
    onehot = jnp.concatenate([first, onehot[:, :, 1:2, :] * (1 - first)],
                             axis=2)
    return pooled, onehot


def max_unpool(x, onehot):
    """Inverse of max_pool_with_argmax."""
    n, l2, c = x.shape
    out = x[:, :, None, :] * onehot
    return out.reshape(n, l2 * 2, c)


class AutoencoderCNN(nn.Module):
    """Full autoencoder: (N, C, L) -> (N, C, L) reconstruction."""

    network_name: str = "basic_cnn_ae"

    @property
    def n_out_filters(self):
        return 512

    @nn.compact
    def __call__(self, x, deterministic=False):
        h = jnp.transpose(x, (0, 2, 1))
        idxs = []
        for feats in (64, 128, 256, 512):
            h = Conv1d(feats, 3, padding=1, use_bias=True)(h)
            h = BatchStatNorm()(h)
            h, idx = max_pool_with_argmax(h)
            idxs.append(idx)
        for feats, idx in zip((256, 128, 64, 1), reversed(idxs)):
            h = max_unpool(h, idx)
            # ConvTranspose1d(k=3, padding=1) keeps length; a same-padded
            # transpose conv is what torch computes here
            h = nn.ConvTranspose(
                features=feats, kernel_size=(3,), padding="SAME",
            )(h)
        return jnp.transpose(h, (0, 2, 1))


class AutoencoderCNNEncoder(nn.Module):
    """Encoder-as-backbone: conv/bn/pool stack then global max pool
    (reference .encoder attribute, autoencoder_cnn.py:27-41)."""

    network_name: str = "basic_cnn_ae"

    @property
    def n_out_filters(self):
        return 512

    @nn.compact
    def __call__(self, x, deterministic=False):
        h = jnp.transpose(x, (0, 2, 1))
        for feats in (64, 128, 256, 512):
            h = Conv1d(feats, 3, padding=1, use_bias=True)(h)
            h = BatchStatNorm()(h)
            h = max_pool1d(h, 2, 2)
        # final MaxPool1d(14) collapses the remaining length-14 axis
        h = h.max(axis=1)
        return h
