"""Transformer encoder core (MHA + FF blocks, pre-softmax scaling).

Capability parity with the reference's hand-rolled encoder
(reference: deepards/models/transformer.py:13-108 — py2-era code with an
``xrange`` bug we obviously don't reproduce).  Attention projects
input->hidden across ``num_heads`` heads, applies scaled dot-product
attention, projects back to input size; each block is post-norm residual.
"""
import jax.numpy as jnp
from flax import linen as nn


class MultiHeadAttention(nn.Module):
    input_size: int
    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        """``mask``: optional (B, S) True-for-valid key mask — padded
        positions are excluded from attention."""
        head_size = self.hidden_size // self.num_heads
        b, s, _ = q.shape

        def proj(x, name):
            h = nn.Dense(self.hidden_size, name=name)(x)
            return h.reshape(b, s, self.num_heads, head_size).transpose(
                0, 2, 1, 3
            )

        qp = proj(q, "q_linear")
        kp = proj(k, "k_linear")
        vp = proj(v, "v_linear")
        weights = jnp.einsum(
            "bhqd,bhkd->bhqk", qp, kp, preferred_element_type=jnp.float32
        )
        weights = weights / jnp.sqrt(float(head_size))
        if mask is not None:
            weights = jnp.where(
                mask[:, None, None, :], weights, jnp.finfo(weights.dtype).min
            )
        weights = nn.softmax(weights, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(vp.dtype), vp)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.hidden_size)
        return nn.Dense(self.input_size, name="joint_linear")(out)


class Block(nn.Module):
    input_size: int
    hidden_size: int
    num_heads: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic=False, mask=None):
        att = MultiHeadAttention(
            self.input_size, self.hidden_size, self.num_heads
        )(x, x, x, mask=mask)
        att = nn.Dropout(self.dropout, deterministic=deterministic)(att)
        attended = nn.LayerNorm()(att + x)
        h = nn.Dense(self.hidden_size)(attended)
        h = nn.relu(h)
        h = nn.Dense(self.input_size)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        # post-norm residual off the block input (reference quirk:
        # transformer.py:89 adds x, not attended)
        return nn.LayerNorm()(h + x)


class Transformer(nn.Module):
    input_size: int
    hidden_size: int
    num_blocks: int
    num_heads: int = 4
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic=False, mask=None):
        for _ in range(self.num_blocks):
            h = Block(
                self.input_size, self.hidden_size, self.num_heads,
                self.dropout,
            )(x, deterministic, mask=mask)
            x = h
        return x
