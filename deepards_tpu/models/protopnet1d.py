"""ProtoPNet-1D: case-based interpretable network.

Capability-parity rebuild of the reference
(reference: deepards/models/protopnet1d/model.py:113-392): backbone
``forward_no_pool`` -> 1x1 bottleneck add-on stack -> L2-distance
"convolution" against learned prototype vectors -> spatial min-pool ->
log similarity -> bias-free Linear initialized with class-identity
weights.  Receptive-field bookkeeping reimplements
``compute_proto_layer_rf_info_v2`` (model.py:81-110) from the backbone's
``conv_info()`` lists.

TPU-native shifts: all windows of the batch go through the backbone as
one (B*S) super-batch; the L2 convolution is an einsum (K=1 prototypes)
or XLA conv (K>1), both MXU-friendly.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def compute_layer_rf_info(layer_filter_size, layer_stride, layer_padding,
                          previous_layer_rf_info):
    """One conv/pool layer's [n_out, jump, rf_size, start] update
    (standard receptive-field arithmetic; reference: model.py:11-46)."""
    n_in, j_in, r_in, start_in = previous_layer_rf_info
    if layer_padding == "SAME":
        n_out = math.ceil(float(n_in) / float(layer_stride))
        pad = max(
            (n_out - 1) * layer_stride + layer_filter_size - n_in, 0
        )
    elif layer_padding == "VALID":
        n_out = math.ceil(
            float(n_in - layer_filter_size + 1) / float(layer_stride)
        )
        pad = 0
    else:
        pad = layer_padding * 2
        n_out = math.floor(
            (n_in - layer_filter_size + pad) / layer_stride
        ) + 1
    p_l = pad // 2
    j_out = j_in * layer_stride
    r_out = r_in + (layer_filter_size - 1) * j_in
    start_out = start_in + ((layer_filter_size - 1) / 2 - p_l) * j_in
    return [n_out, j_out, r_out, start_out]


def compute_proto_layer_rf_info(seq_len, layer_filter_sizes, layer_strides,
                                layer_paddings, prototype_kernel_size):
    """(reference: model.py:81-110)"""
    rf_info = [seq_len, 1, 1, 0.5]
    for k, s, p in zip(layer_filter_sizes, layer_strides, layer_paddings):
        rf_info = compute_layer_rf_info(k, s, p, rf_info)
    return compute_layer_rf_info(
        prototype_kernel_size, 1, "VALID", rf_info
    )


def compute_rf_boundaries(spatial_index, rf_info, seq_len=224):
    """Input-space [lo, hi) window covered by a proto-layer position."""
    _, jump, rf, start = rf_info
    center = start + spatial_index * jump
    lo = max(int(center - rf / 2), 0)
    hi = min(int(center + rf / 2), seq_len)
    return lo, hi


class AddOnLayers(nn.Module):
    """1x1 bottleneck chain halving channels down to proto depth,
    ReLU between, sigmoid gate at the end (reference: model.py:158-185)."""

    in_channels: int
    proto_channels: int

    @nn.compact
    def __call__(self, x):
        current_in = self.in_channels
        first = True
        while current_in > self.proto_channels or first:
            first = False
            current_out = max(self.proto_channels, current_in // 2)
            x = nn.Conv(current_out, (1,),
                        kernel_init=nn.initializers.kaiming_normal())(x)
            x = nn.relu(x)
            x = nn.Conv(current_out, (1,),
                        kernel_init=nn.initializers.kaiming_normal())(x)
            if current_out > self.proto_channels:
                x = nn.relu(x)
            else:
                x = nn.sigmoid(x)
            current_in = current_in // 2
        return x


def prototype_class_identity(num_prototypes, num_classes):
    """One-hot (P, num_classes) class assignment, equal split
    (reference: model.py:135-141)."""
    per_class = num_prototypes // num_classes
    ident = np.zeros((num_prototypes, num_classes), np.float32)
    for j in range(num_prototypes):
        ident[j, j // per_class] = 1.0
    return ident


class PPNet(nn.Module):
    breath_block: nn.Module
    sub_batch_size: int = 20
    num_prototypes: int = 20
    proto_channels: int = 128
    proto_kernel: int = 1
    num_classes: int = 2
    prototype_activation_function: str = "log"
    incorrect_strength: float = -0.5
    average_linear: bool = False
    epsilon: float = 1e-4

    @property
    def prototype_shape(self):
        return (self.num_prototypes, self.proto_channels, self.proto_kernel)

    @property
    def max_dist(self):
        return self.proto_channels * self.proto_kernel

    def proto_layer_rf_info(self, seq_len=224):
        ks, ss, ps = self.breath_block.conv_info()
        return compute_proto_layer_rf_info(
            seq_len, ks, ss, ps, self.proto_kernel
        )

    def class_identity(self):
        return prototype_class_identity(self.num_prototypes, self.num_classes)

    def class_identity_windows(self):
        """Per-window-expanded identity matching min_distances layout
        (reference: model.py:143 repeats identity sub_batch_size times)."""
        return np.tile(self.class_identity(), (self.sub_batch_size, 1))

    def _last_layer_init(self, key, shape, dtype=jnp.float32):
        """Class-identity weight preset: +1 for own-class prototypes,
        incorrect_strength for the rest (reference: model.py:319-333)."""
        ident = self.class_identity()
        if not self.average_linear:
            ident = np.tile(ident, (self.sub_batch_size, 1))
        w = 1.0 * ident + self.incorrect_strength * (1 - ident)
        # flax Dense kernel is (in_features, out_features) == ident shape
        return jnp.asarray(w, dtype)

    def setup(self):
        self.prototype_vectors = self.param(
            "prototype_vectors",
            lambda key, shape: jax.random.uniform(key, shape),
            self.prototype_shape,
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
        """(N, C, L) -> (N, L', proto_channels) latent patches."""
        fmap = self.breath_block.forward_no_pool(x, deterministic)
        return self.add_on_layers(fmap)

    def l2_distances(self, feats):
        """(N, L', C) vs prototypes (P, C, K) -> (N, L'', P) distances
        via ||x||^2 + ||p||^2 - 2<x,p> (reference: model.py:217-242)."""
        protos = self.prototype_vectors
        p, c, k = protos.shape
        if k == 1:
            pv = protos[:, :, 0]  # (P, C)
            x2 = (feats ** 2).sum(axis=-1, keepdims=True)  # (N, L', 1)
            p2 = (pv ** 2).sum(axis=-1)  # (P,)
            xp = jnp.einsum(
                "nlc,pc->nlp", feats, pv,
                preferred_element_type=jnp.float32,
            )
            d = x2 + p2[None, None, :] - 2 * xp
        else:
            kernel = jnp.transpose(protos, (2, 1, 0))  # (K, C, P)
            ones = jnp.ones_like(kernel)
            x2 = jax.lax.conv_general_dilated(
                feats ** 2, ones, (1,), "VALID",
                dimension_numbers=("NLC", "LIO", "NLC"),
            )
            xp = jax.lax.conv_general_dilated(
                feats, kernel, (1,), "VALID",
                dimension_numbers=("NLC", "LIO", "NLC"),
            )
            p2 = (protos ** 2).sum(axis=(1, 2))
            d = x2 - 2 * xp + p2[None, None, :]
        return nn.relu(d)

    def distance_to_similarity(self, distances):
        if self.prototype_activation_function == "log":
            return jnp.log((distances + 1) / (distances + self.epsilon))
        if self.prototype_activation_function == "linear":
            return -distances
        raise ValueError("unknown prototype activation")

    def __call__(self, x, metadata=None, deterministic=False):
        """x: (B, S, C, L) -> (logits (B,2), min_distances (B, S*P))."""
        b, s, c, l = x.shape
        feats = self.conv_features(x.reshape(b * s, c, l), deterministic)
        d = self.l2_distances(feats)  # (B*S, L'', P)
        min_d = d.min(axis=1)  # (B*S, P)
        sim = self.distance_to_similarity(min_d)
        sim = sim.reshape(b, s, self.num_prototypes)
        if self.average_linear:
            pooled = sim.mean(axis=1)
        else:
            pooled = sim.reshape(b, -1)
        logits = self.last_layer(pooled)
        return logits, min_d.reshape(b, -1)

    def push_forward(self, x, metadata=None, deterministic=False):
        """Latent patches + full distance maps for the prototype push
        (reference: model.py:283-296).  Returns
        (feats (B,S,L',C), distances (B,S,L'',P))."""
        b, s, c, l = x.shape
        feats = self.conv_features(x.reshape(b * s, c, l), deterministic)
        d = self.l2_distances(feats)
        return (
            feats.reshape(b, s, *feats.shape[1:]),
            d.reshape(b, s, *d.shape[1:]),
        )


def construct_ppnet(
    base_architecture,
    sub_batch_size=20,
    n_prototypes=10,
    proto_channels=128,
    num_classes=2,
    incorrect_strength=-0.5,
    average_linear=False,
):
    """(reference: model.py:360-384)"""
    return PPNet(
        breath_block=base_architecture,
        sub_batch_size=sub_batch_size,
        num_prototypes=n_prototypes * num_classes,
        proto_channels=proto_channels,
        num_classes=num_classes,
        incorrect_strength=incorrect_strength,
        average_linear=average_linear,
    )
