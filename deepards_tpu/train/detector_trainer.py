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

from deepards_tpu.models.layers import bn_row_mask
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
        def eval_step(state, data, row_targets, weights):
            # weights mask out the zero-pad rows of fixed-shape eval
            # batches so the recorded loss is a mean over real windows;
            # the same mask scopes BatchStatNorm so pad images cannot
            # contaminate the batch statistics (2D rows == batch rows)
            rng, drng = split_state_rng(state.rng, rng_impl)
            data_c = _maybe_cast(data, compute_dtype)
            params_c = _maybe_cast(state.params, compute_dtype)
            with bn_row_mask(weights):
                logits = model.apply(
                    {"params": params_c}, data_c, None, False,
                    rngs={"dropout": drng},
                ).astype(jnp.float32)
            loss = detection_loss(
                logits, row_targets, gamma=gamma, alpha=alpha,
                weights=weights,
            )
            return state.replace(rng=rng), loss, logits

        if conf.get("load_checkpoint"):
            # full-state resume, same contract as the standard path
            from deepards_tpu.train import checkpoint

            restored = checkpoint.restore(conf.load_checkpoint, state)
            state = state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                rng=restored["rng"], step=restored["step"],
            )

        batch_size = conf.get("batch_size", 16)
        epochs = conf.get("epochs", 10)
        # checkpoint/test-gating parity with the standard path
        # (reference checkpoints every network type,
        # train_ards_detector.py:355-374)
        start_epoch = 1
        resume = getattr(self, "resume_meta", None)
        if resume and resume["fold"] == fold_num:
            start_epoch = resume["epoch"]
        # fold-level dispatch pipelining (see Trainer.deferred_fetch)
        with self.deferred_fetch():
            for epoch_num in range(start_epoch, epochs + 1):
                if not conf.get("no_train"):
                    idx = self.host_rng.permutation(
                        train_dataset.current_indices()
                    )
                    losses = []
                    for s in range(max(len(idx) // batch_size, 1)):
                        sel = idx[s * batch_size : (s + 1) * batch_size]
                        if len(sel) == 0:
                            break
                        b = train_dataset.gather(sel)
                        rows = row_labels_from_boxes(
                            b["boxes"], b["labels"])
                        state, loss = train_step(
                            state, jnp.asarray(b["data"]),
                            jnp.asarray(rows)
                        )
                        losses.append(loss)
                        if conf.get("debug"):
                            break

                    self._defer(self._record_step_losses, losses, fold_num)
                if not conf.get("no_test_after_epochs") or epoch_num == epochs:
                    # train-split IoU stays as a sanity/overfit curve; the
                    # headline per-epoch metric is the HELD-OUT band IoU on
                    # the test split's own spliced bands (unseen windows)
                    state = self._detector_test_epoch(
                        state, eval_step, train_dataset, fold_num,
                        epoch_num, batch_size, meter="band_iou",
                    )
                    state = self._detector_test_epoch(
                        state, eval_step, test_dataset, fold_num,
                        epoch_num, batch_size, meter="band_iou_test",
                    )
                if conf.get("save_model_per_epoch") and conf.get("save_model"):
                    self.save_checkpoint(state, fold_num, epoch_num)
        if conf.get("save_model"):
            self.save_checkpoint(state, fold_num, None)
        if resume and resume["fold"] == fold_num:
            self.resume_meta = None
        self.final_state = state
        return state

    def _detector_test_epoch(self, state, eval_step, dataset, fold_num,
                             epoch_num, batch_size, meter="band_iou"):
        """Band IoU over the WHOLE split in fixed-shape batches (the
        last partial batch is zero-padded; pad rows are excluded from
        both the IoU mean and the loss via a per-image weight mask)."""
        idx = dataset.current_indices()
        ious = []
        losses = []
        for s in range(0, len(idx), batch_size):
            sel = idx[s : s + batch_size]
            n_real = len(sel)
            b = dataset.gather(sel)
            rows = row_labels_from_boxes(b["boxes"], b["labels"])
            data = b["data"]
            weights = np.ones(batch_size, np.float32)
            if n_real < batch_size:
                pad = batch_size - n_real
                data = np.concatenate(
                    [data, np.zeros((pad,) + data.shape[1:],
                                    data.dtype)])
                rows = np.concatenate(
                    [rows, np.zeros((pad,) + rows.shape[1:],
                                    rows.dtype)])
                weights[n_real:] = 0.0
            state, loss, logits = eval_step(
                state, jnp.asarray(data), jnp.asarray(rows),
                jnp.asarray(weights),
            )
            losses.append((loss, n_real))
            ious.append((logits, n_real, b["boxes"], b["labels"]))
        self._defer(
            self._record_detector_eval, losses, ious, fold_num, epoch_num,
            meter,
        )
        return state

    def _record_detector_eval(self, losses, batches, fold_num, epoch_num,
                              meter):
        ious = []
        losses = jax.device_get(losses)    # one batched transfer
        batches = jax.device_get(batches)
        for logits, n_real, boxes, labels in batches:
            bands = extract_bands(
                np.asarray(logits)[:n_real], threshold=0.0)
            ious.extend(
                band_iou(bands[i], boxes[i], labels[i])
                for i in range(n_real)
            )
        mean_loss = (sum(float(ls) * n for ls, n in losses)
                     / max(sum(n for _, n in losses), 1))
        if meter == "band_iou_test":
            # only the held-out split feeds the test_loss meter — the
            # train-split sanity pass must not contaminate it (one
            # entry per epoch, same cadence as the standard path)
            self.results.update_meter("test_loss", fold_num, mean_loss)
        self.results.update_meter(meter, fold_num, float(np.mean(ious)))
        self.results.update_epoch_meter(
            meter, epoch_num, float(np.mean(ious))
        )

    def perform_post_modeling_actions(self):
        self.results.save_all()
