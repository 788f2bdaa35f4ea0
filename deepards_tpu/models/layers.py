"""Shared flax building blocks for the 1D model zoo.

Conventions:
- tensors flow through backbones as (N, L, C) (length-major, channel-last) —
  the layout XLA:TPU prefers for convolutions;
- ``BatchStatNorm`` always normalizes by current-batch statistics.  The
  reference deliberately runs BatchNorm with ``track_running_stats=False``
  and never switches to eval mode (reference: deepards/models/densenet.py:107,
  deepards/train_ards_detector.py:427-448), so test-time behavior equals
  train-time behavior; AUC parity requires reproducing this exactly.
- The reference's DataLoader feeds the final partial batch of every epoch
  at its TRUE size, so batch statistics cover real rows only (reference:
  deepards/train_ards_detector.py:424-448, torch DataLoader keeps the
  short final batch).  The rebuild pads every batch to a fixed shape; the
  ``bn_row_mask`` scope threads the step's row-validity mask into every
  ``BatchStatNorm`` so pad rows are excluded from the statistics —
  real-row outputs then equal a true-size dispatch exactly, with no
  recompile per tail shape.
"""
import contextlib
import math

import jax
import jax.numpy as jnp
from flax import linen as nn


# Stack of row-validity masks scoped around model.apply by the train/eval
# steps.  Entries are traced arrays, valid only within the trace that
# pushed them (the context manager pops on exit, so a mask can never leak
# across traces).
_BN_ROW_MASK = []


@contextlib.contextmanager
def bn_row_mask(mask):
    """Scope a per-row validity mask for BatchStatNorm statistics.

    ``mask`` carries one entry per backbone row — the leading batch axis
    of the arrays BatchStatNorm sees (B*S for the windowed 1D layout where
    heads flatten (B, S, C, L) into B*S rows, B for the 2D image layout).
    Within the scope, every BatchStatNorm whose input's leading axis
    matches ``len(mask)`` computes mask-weighted mean/var, reproducing the
    reference's true-size final-batch statistics
    (reference: deepards/train_ards_detector.py:424-448).  Norm sites with
    a different leading axis — e.g. per-sequence ``nn.vmap`` lifts under
    ``bn_scope='sequence'``, whose statistics pad rows cannot contaminate
    anyway — are unaffected.
    """
    if mask is None:
        yield
        return
    _BN_ROW_MASK.append(jnp.asarray(mask))
    try:
        yield
    finally:
        _BN_ROW_MASK.pop()


def current_bn_row_mask(n_rows):
    """The scoped row mask if one is set AND matches ``n_rows``, else None."""
    if not _BN_ROW_MASK:
        return None
    mask = _BN_ROW_MASK[-1]
    return mask if mask.shape[0] == n_rows else None


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
        row_mask = current_bn_row_mask(x.shape[0])
        if row_mask is not None:
            # mask-weighted statistics: pad rows contribute nothing, so
            # real rows normalize exactly as a true-size batch would
            # (reference final-partial-batch semantics,
            # train_ards_detector.py:424-448).  With an all-ones mask this
            # reduces to the unmasked sums bit-for-bit.
            m = row_mask.astype(jnp.float32).reshape(
                (-1,) + (1,) * (x.ndim - 1)
            )
            per_row = 1
            for d in x.shape[1:-1]:
                per_row *= d
            count = jnp.maximum(jnp.sum(m), 1.0) * float(per_row)
            mean = jnp.sum(xf * m, axis=axes, keepdims=True) / count
            var = (
                jnp.sum(jnp.square(xf - mean) * m, axis=axes, keepdims=True)
                / count
            )
        else:
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
