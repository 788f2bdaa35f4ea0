"""Row-band detection over breath images.

Capability-equivalent of the reference's bbox-detection path
(reference: deepards/models/retinanet.py — lightly modified torchvision
RetinaNet — and deepards/models/detection.py, wired through the
ImgARDSDataset bbox mode; reference: deepards/dataset.py:1776-1825).

The reference's boxes are always full-width horizontal row bands
([0, y1, 224, y2]) marking foreign-patho splices.  A TPU-first design
exploits that structure: instead of a multi-scale anchor machine, the
detector predicts a per-row class distribution (dense row classification
head over the upsampled backbone feature map, trained with sigmoid focal
loss like RetinaNet) and recovers band boxes by run-length grouping rows
at inference.  Same capability — localize and label patho bands — with a
static-shape, fusion-friendly program instead of NMS-heavy anchor logic.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deepards_tpu.train.losses import focal_loss


class RowBandDetector(nn.Module):
    """Backbone features -> per-row logits (N, H, num_classes)."""

    breath_block: nn.Module
    num_classes: int = 2
    rows: int = 224

    @nn.compact
    def __call__(self, x, metadata=None, deterministic=False):
        fmap = self.breath_block.forward_no_pool(x, deterministic)
        # (N, H', W', C) -> pool over width, upsample rows to full height
        h = fmap.mean(axis=2)  # (N, H', C)
        h = nn.Dense(128)(h)
        h = nn.relu(h)
        n, hp, c = h.shape
        h = jax.image.resize(h, (n, self.rows, c), method="linear")
        return nn.Dense(self.num_classes)(h)  # (N, rows, num_classes)


def row_labels_from_boxes(boxes, labels, rows=224):
    """Rasterize band boxes ([x1,y1,x2,y2], label) to per-row one-hot."""
    boxes = np.asarray(boxes)
    labels = np.asarray(labels)
    out = np.zeros((boxes.shape[0], rows, 2), np.float32)
    for i in range(boxes.shape[0]):
        for (x1, y1, x2, y2), lab in zip(boxes[i], labels[i]):
            out[i, int(y1) : int(y2), int(lab)] = 1.0
    return out


def detection_loss(row_logits, row_targets, gamma=2.0, alpha=0.25,
                   weights=None):
    """Sigmoid focal loss over dense row classifications — the RetinaNet
    classification objective applied to the row-band parameterization.
    ``weights`` (per-image, optional) lets eval exclude zero-padded
    fixed-shape batch rows from the mean."""
    return focal_loss(row_logits, row_targets, alpha=alpha, gamma=gamma,
                      weights=weights)


def extract_bands(row_logits, threshold=0.5):
    """Run-length group per-row argmax classes into band boxes.

    Returns a list per image of (box [x1,y1,x2,y2], label, score).
    """
    probs = np.asarray(jax.nn.sigmoid(jnp.asarray(row_logits)))
    out = []
    for img_probs in probs:
        cls = img_probs.argmax(axis=1)
        conf = img_probs.max(axis=1)
        bands = []
        start = 0
        rows = len(cls)
        for r in range(1, rows + 1):
            if r == rows or cls[r] != cls[start]:
                score = float(conf[start:r].mean())
                if score >= threshold:
                    bands.append((
                        [0.0, float(start), 224.0, float(r)],
                        int(cls[start]),
                        score,
                    ))
                start = r
        out.append(bands)
    return out
