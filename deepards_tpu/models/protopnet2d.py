"""ProtoPNet-2D over breath images.

Capability parity with the reference 2D variant
(reference: deepards/models/protopnet2d/model.py + receptive_field.py +
push.py): prototypes live on the 2D feature map; distances min-pool over
both spatial axes.  Shares the distance/similarity math with the 1D
implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deepards_tpu.models.protopnet1d import (
    AddOnLayers,
    prototype_class_identity,
)


class PPNet2D(nn.Module):
    breath_block: nn.Module
    num_prototypes: int = 20
    proto_channels: int = 128
    num_classes: int = 2
    prototype_activation_function: str = "log"
    incorrect_strength: float = -0.5
    epsilon: float = 1e-4

    @property
    def prototype_shape(self):
        return (self.num_prototypes, self.proto_channels, 1, 1)

    @property
    def max_dist(self):
        return self.proto_channels

    def class_identity(self):
        return prototype_class_identity(self.num_prototypes,
                                        self.num_classes)

    def _last_layer_init(self, key, shape, dtype=jnp.float32):
        ident = self.class_identity()
        w = 1.0 * ident + self.incorrect_strength * (1 - ident)
        return jnp.asarray(w, dtype)

    def setup(self):
        self.prototype_vectors = self.param(
            "prototype_vectors",
            lambda key, shape: jax.random.uniform(key, shape),
            (self.num_prototypes, self.proto_channels),
        )
        self.add_on_layers = AddOnLayers(
            in_channels=self.breath_block.n_out_filters,
            proto_channels=self.proto_channels,
        )
        self.last_layer = nn.Dense(
            self.num_classes, use_bias=False,
            kernel_init=self._last_layer_init,
        )

    def conv_features(self, x, deterministic=False):
        fmap = self.breath_block.forward_no_pool(x, deterministic)
        return self.add_on_layers(fmap)  # (N, H', W', C)

    def l2_distances(self, feats):
        n, hp, wp, c = feats.shape
        flat = feats.reshape(n, hp * wp, c)
        x2 = (flat ** 2).sum(axis=-1, keepdims=True)
        p2 = (self.prototype_vectors ** 2).sum(axis=-1)
        xp = jnp.einsum(
            "nlc,pc->nlp", flat, self.prototype_vectors,
            preferred_element_type=jnp.float32,
        )
        d = x2 + p2[None, None, :] - 2 * xp
        return nn.relu(d)  # (N, H'*W', P)

    def distance_to_similarity(self, d):
        if self.prototype_activation_function == "log":
            return jnp.log((d + 1) / (d + self.epsilon))
        return -d

    def __call__(self, x, metadata=None, deterministic=False):
        feats = self.conv_features(x, deterministic)
        d = self.l2_distances(feats)
        min_d = d.min(axis=1)  # (N, P)
        sim = self.distance_to_similarity(min_d)
        logits = self.last_layer(sim)
        return logits, min_d

    def push_forward(self, x, metadata=None, deterministic=False):
        feats = self.conv_features(x, deterministic)
        return feats, self.l2_distances(feats)


def construct_ppnet_2d(base_architecture, n_prototypes=10, num_classes=2,
                       incorrect_strength=-0.5):
    return PPNet2D(
        breath_block=base_architecture,
        num_prototypes=n_prototypes * num_classes,
        num_classes=num_classes,
        incorrect_strength=incorrect_strength,
    )
