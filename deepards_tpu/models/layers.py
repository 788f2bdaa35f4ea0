"""Shared flax building blocks for the 1D model zoo.

Conventions:
- tensors flow through backbones as (N, L, C) (length-major, channel-last) —
  the layout XLA:TPU prefers for convolutions;
- ``BatchStatNorm`` always normalizes by current-batch statistics.  The
  reference deliberately runs BatchNorm with ``track_running_stats=False``
  and never switches to eval mode (reference: deepards/models/densenet.py:107,
  deepards/train_ards_detector.py:427-448), so test-time behavior equals
  train-time behavior; AUC parity requires reproducing this exactly.
"""
import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv_kernel_init(kernel_size):
    """Reference init: normal(0, sqrt(2/(kernel_size*out_channels)))
    (reference: deepards/models/densenet.py:156-159)."""

    def init(key, shape, dtype=jnp.float32):
        # flax Conv kernel shape: (kernel, in_feat, out_feat)
        out_ch = shape[-1]
        std = math.sqrt(2.0 / (kernel_size * out_ch))
        import jax

        return jax.random.normal(key, shape, dtype) * std

    return init


class BatchStatNorm(nn.Module):
    """BatchNorm that always uses current-batch statistics (no running
    averages, no train/eval distinction)."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # stats over all axes except the channel axis (last); computed in
        # float32 even under bfloat16 compute for numerical stability
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype)


class Conv1d(nn.Module):
    """1D conv on (N, L, C)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=conv_kernel_init(self.kernel_size),
        )(x)


def max_pool1d(x, window, stride, padding=0):
    return nn.max_pool(
        x,
        window_shape=(window,),
        strides=(stride,),
        padding=[(padding, padding)],
    )


def avg_pool1d(x, window, stride, padding=0):
    return nn.avg_pool(
        x,
        window_shape=(window,),
        strides=(stride,),
        padding=[(padding, padding)],
    )


def global_avg_pool_flatten(x, window=7):
    """AvgPool1d(window, stride=1) then flatten — the backbone epilogue
    shared by all 1D backbones (reference: deepards/models/densenet.py:167,
    179-189).  Expects final spatial length == window."""
    x = avg_pool1d(x, window, 1)
    return x.reshape(x.shape[0], -1)
