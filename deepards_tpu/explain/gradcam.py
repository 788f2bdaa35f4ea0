"""GradCAM for the 1D CNN models.

Capability-parity rebuild of the reference GradCAM stack
(reference: deepards/gradcam.py:28-205): forward through the backbone's
feature extractor, gradient of the one-hot class score w.r.t. the pre-relu
conv feature map, channel-mean gradient weights, weighted feature sum, and
the three normalization variants (MaxMinNormCam / FracTotalNormCam /
UnNormalizedCam).

TPU-native shift: instead of autograd hooks, the forward is split at the
feature map and ``jax.grad`` differentiates the head w.r.t. that
intermediate activation — the whole cam computation is one jitted program.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


class GradCam:
    """Cam generator over a flax cnn_linear-family model.

    ``model`` must expose ``breath_block`` with a ``features`` method and
    the head must be a single Dense over flattened pooled features
    (reference model surface: gradcam.py:40-65).
    """

    def __init__(self, model, params, record_grads=False):
        self.model = model
        self.params = params
        # optional per-call grad/pred history for grad-norm histograms
        # (reference: gradcam.py keeps self.grads/self.preds consumed by
        # patient_gradcam.plot_grads, patient_gradcam.py:365-375)
        self.record_grads = record_grads
        self.grads = []
        self.preds = []

        def feature_fn(x):
            # pre-relu conv feature map (N, L', C)
            return model.apply(
                {"params": params},
                x,
                True,
                method=lambda mdl, xx, det: mdl.breath_block.features(
                    xx, det
                ),
            )

        def head_fn(fmap):
            # relu -> AvgPool1d(7,1) -> flatten all windows -> Dense
            h = jax.nn.relu(fmap)
            # (N, L', C): average the final 7-length axis
            h = h.mean(axis=1)
            flat = h.reshape(-1)
            dense = self._head_dense_params()
            logits = flat @ dense["kernel"]
            if "bias" in dense:
                logits = logits + dense["bias"]
            return logits[None]

        self._feature_fn = feature_fn
        self._head_fn = head_fn

        @jax.jit
        def cam_grad(fmap, target):
            def score(fm):
                out = head_fn(fm)
                one_hot = jax.nn.one_hot(target, out.shape[-1])
                return (one_hot * out).sum(), out

            grads, out = jax.grad(score, has_aux=True)(fmap)
            return grads, out

        self._cam_grad = cam_grad

        def _one_seq(x, target):
            fmap = feature_fn(x)

            def score(fm):
                out = head_fn(fm)
                one_hot = jax.nn.one_hot(target, out.shape[-1])
                return (one_hot * out).sum(), out

            grads, out = jax.grad(score, has_aux=True)(fmap)
            return fmap, grads, out

        def _one_seq_cam(x, target):
            # cam reduction ON DEVICE: fetching raw (S, L', C) fmaps+grads
            # for a whole batch moves hundreds of MB through the chip
            # tunnel (measured 0.9s for 128 sequences); the reduced
            # (S, L') cams are ~800x smaller
            fmap, grads, out = _one_seq(x, target)
            weights = grads.mean(axis=1)  # (S, C): mean over L'
            cam = (fmap * weights[:, None, :]).sum(axis=-1)  # (S, L')
            return cam, out

        # batched cam pipeline: every sequence's cam and logits in ONE
        # dispatch, reduced on device (the per-sample python loop pays a
        # full round trip per sequence; fetching raw fmaps+grads pays
        # hundreds of MB through the chip tunnel)
        self._batch_cam = jax.jit(jax.vmap(_one_seq_cam))

    def _head_dense_params(self):
        dense_keys = sorted(
            k for k in self.params
            if k.startswith("Dense") or k == "linear_final"
        )
        if len(dense_keys) > 1:
            # cnn_double_linear-style heads have an intermediate Dense;
            # the single-Dense-over-pooled-features cam math does not
            # apply — fail loudly instead of silently using the wrong one
            raise NotImplementedError(
                "GradCam supports single-Dense heads (cnn_linear family); "
                "found {} Dense layers: {}".format(
                    len(dense_keys), dense_keys
                )
            )
        if dense_keys:
            return self.params[dense_keys[0]]
        raise ValueError("could not locate head Dense params")

    def _grad_and_output(self, x, target):
        """x: (S, C, L) one breath-window read."""
        x = jnp.asarray(x, jnp.float32)
        fmap = self._feature_fn(x)
        out = self._head_fn(fmap)
        if target is None:
            target = int(np.argmax(np.asarray(out)))
        grads, out = self._cam_grad(fmap, target)
        # convert to torch-layout (N, C, L') to mirror reference math
        conv = np.asarray(fmap).transpose(0, 2, 1)
        grad = np.asarray(grads).transpose(0, 2, 1)
        out = np.asarray(out)
        if self.record_grads:
            self.grads.append(grad)
            self.preds.append(out)
        return conv, grad, out


class MaxMinNormCam(GradCam):
    """(reference: gradcam.py:110-162)"""

    def generate_read_cams_batch(self, xs, targets):
        """Per-read cams for a BATCH of sequences in one device dispatch.
        xs: (B, S, C, L); targets: (B,) ints.  Returns (B, S, L') uint8
        cams + (B, 2) outputs."""
        xs = jnp.asarray(xs, jnp.float32)
        targets = jnp.asarray(targets)
        cams, outs = self._batch_cam(xs, targets)
        cams = np.asarray(cams)  # (B, S, L') — small host fetch
        normed = np.stack([
            np.stack([self.normalize(c) for c in seq_cams])
            for seq_cams in cams
        ])
        return normed, np.asarray(outs)

    def generate_read_cam(self, x, target):
        conv, grad, out = self._grad_and_output(x, target)
        weights = grad.mean(axis=2)  # (N, C)
        cam = (weights[:, :, None] * conv).sum(axis=1)  # (N, L')
        return (
            np.stack([self.normalize(c) for c in cam]),
            out,
        )

    def generate_cam(self, x, target=None):
        conv, grad, out = self._grad_and_output(x, target)
        weights = grad.mean(axis=(0, 2))  # (C,)
        conv = conv.mean(axis=0)  # (C, L')
        cam = (weights[:, None] * conv).sum(axis=0)
        return self.normalize(cam), out

    @staticmethod
    def normalize(cam):
        cam = np.maximum(cam, 0)
        rng = cam.max() - cam.min()
        cam = (cam - cam.min()) / (rng if rng else 1.0)
        return np.uint8(cam * 255)


class FracTotalNormCam(GradCam):
    """Target-vs-other-class cam ratio (reference: gradcam.py:165-192)."""

    def generate_read_cam(self, x, target):
        conv, grad_t, out = self._grad_and_output(x, target)
        _, grad_o, _ = self._grad_and_output(x, (target + 1) % 2)
        w_t = grad_t.mean(axis=2)
        w_o = grad_o.mean(axis=2)
        cam_t = (w_t[:, :, None] * conv).sum(axis=1)
        cam_o = (w_o[:, :, None] * conv).sum(axis=1)
        cams = np.stack([
            self.normalize(ct, co) for ct, co in zip(cam_t, cam_o)
        ])
        return cams, out

    @staticmethod
    def normalize(cam_target, cam_other):
        cam_target = np.maximum(cam_target, 0)
        cam_other = np.maximum(cam_other, 0)
        denom = cam_target + cam_other
        denom = np.where(denom == 0, 1.0, denom)
        return np.uint8(cam_target / denom * 255)


class UnNormalizedCam(GradCam):
    """(reference: gradcam.py:195-205)"""

    def generate_cam(self, x, target=None):
        conv, grad, out = self._grad_and_output(x, target)
        weights = grad.mean(axis=(0, 2))
        conv = conv.mean(axis=0)
        cam = (weights[:, None] * conv).sum(axis=0)
        return np.maximum(0, cam), out

    def generate_read_cam(self, x, target):
        conv, grad, out = self._grad_and_output(x, target)
        weights = grad.mean(axis=2)
        cam = (weights[:, :, None] * conv).sum(axis=1)
        return np.maximum(0, cam), out

    def generate_read_cams_batch(self, xs, targets):
        """(B, S, C, L) -> (B, S, L') unnormalized cams, one dispatch."""
        xs = jnp.asarray(xs, jnp.float32)
        cams, outs = self._batch_cam(xs, jnp.asarray(targets))
        return np.maximum(0, np.asarray(cams)), np.asarray(outs)


def upsample_cam(cam, target_len=224):
    """cv2.resize equivalent via jax.image (reference: gradcam.py:14
    uses cv2; patient_gradcam.py overlays at 224 samples)."""
    cam = np.asarray(cam, np.float32)
    if cam.ndim == 1:
        out = jax.image.resize(jnp.asarray(cam), (target_len,), "linear")
        return np.asarray(out)
    out = jax.image.resize(
        jnp.asarray(cam), (cam.shape[0], target_len), "linear"
    )
    return np.asarray(out)
