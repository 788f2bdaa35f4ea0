"""Whole-patient "super batch" training for the nested networks.

(reference: NestedMixin + CNNToNested* trainers,
deepards/train_ards_detector.py:680-794 — batch_size forced to 1, each
sample is ALL windows of one patient.)

TPU-first shift: patients have ragged window counts, which would force a
recompile per patient.  Windows-per-patient are bucketed to a small set
of power-of-two lengths; shorter patients ZERO-pad and carry a window
mask.  This is EXACT (not an approximation): the backbone normalizes per
window (models/nested.py lifts it with nn.vmap, matching the reference's
per-window loop), the RNN/LSTM over windows is causal so trailing pad
windows cannot affect real outputs, the transformer masks attention, and
the loss is weighted to real windows only.  Loss semantics follow
loss_calc: 'all_breaths' (target repeated over real windows) or
'last_breath' (the LAST REAL window's logits).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepards_tpu.parallel import mesh as mesh_lib
from deepards_tpu.train.loop import Trainer
from deepards_tpu.train.steps import (
    TrainState,
    _maybe_cast,
    make_state_rng,
    split_state_rng,
)


def _bucket(n):
    b = 1
    while b < n:
        b *= 2
    return b


class NestedTrainer(Trainer):
    """batch = one patient's windows (1, W_bucket, S, C, L)."""

    def _patient_groups(self, dataset):
        gt = dataset.get_ground_truth_df()
        groups = []
        for pt, rows in gt.groupby("patient"):
            groups.append((pt, rows.index.to_numpy(), int(rows.y.iloc[0])))
        return groups

    def _gather_super_batch(self, dataset, idxs):
        """Returns ((1, W_bucket, S, C, L) zero-padded data,
        (1, W_bucket) validity mask)."""
        data = dataset.cache.data[np.asarray(idxs, np.int64)]
        w = data.shape[0]
        bucket = _bucket(w)
        mask = np.zeros(bucket, np.float32)
        mask[:w] = 1.0
        if bucket > w:
            pad = np.zeros((bucket - w,) + data.shape[1:], data.dtype)
            data = np.concatenate([data, pad], axis=0)
        return data[None], mask[None]

    def run_fold(self, fold_num, train_dataset, test_dataset, tx):
        conf = self.conf
        model = self.build_model()
        from deepards_tpu.data.pipeline import BatchPipeline

        pipeline = BatchPipeline(train_dataset)
        self.rng, init_rng = jax.random.split(self.rng)
        groups = self._patient_groups(train_dataset)
        sample, _ = self._gather_super_batch(train_dataset, groups[0][1][:2])
        variables = model.init(
            {"params": init_rng, "dropout": init_rng},
            jnp.asarray(sample), None, True,
        )
        params = variables["params"]
        state = TrainState(
            params=params, opt_state=tx.init(params),
            rng=make_state_rng(
                jax.random.fold_in(init_rng, 5), self._rng_impl()
            ),
            step=jnp.zeros((), jnp.int32),
        )
        if conf.get("load_checkpoint"):
            # full-state resume, same contract as the standard path
            # (reference loads checkpoints for every network type,
            # train_ards_detector.py:467-469)
            from deepards_tpu.train import checkpoint

            restored = checkpoint.restore(conf.load_checkpoint, state)
            state = state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                rng=restored["rng"], step=restored["step"],
            )
        state = mesh_lib.replicate_tree(self.mesh, state)
        loss_fn = self.loss_fn
        compute_dtype = self.compute_dtype
        last_breath = conf.get("loss_calc") == "last_breath"

        def loss_wrap(params, data, target, wmask, dropout_rng):
            data = pipeline(data.reshape(-1, *data.shape[2:]))
            data = data.reshape(1, -1, *data.shape[1:])
            data = _maybe_cast(data, compute_dtype)
            params_c = _maybe_cast(params, compute_dtype)
            out = model.apply(
                {"params": params_c}, data, None, False,
                rngs={"dropout": dropout_rng},
                window_mask=wmask.astype(bool),
            ).astype(jnp.float32)  # (1, W, 2)
            if last_breath:
                last_real = jnp.maximum(wmask[0].sum().astype(jnp.int32), 1)
                logits = jnp.take(out[0], last_real - 1, axis=0)[None]
                return loss_fn(logits, target), out
            t = jnp.repeat(target, out.shape[1], axis=0)  # (W, 2)
            return loss_fn(out[0], t, wmask[0]), out

        rng_impl = self._rng_impl()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, data, target, wmask):
            rng, drng = split_state_rng(state.rng, rng_impl)
            (loss, _), grads = jax.value_and_grad(
                loss_wrap, has_aux=True
            )(state.params, data, target, wmask, drng)
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
        def eval_step(state, data, target, wmask):
            rng, drng = split_state_rng(state.rng, rng_impl)
            loss, out = loss_wrap(state.params, data, target, wmask, drng)
            return state.replace(rng=rng), loss, out

        # checkpoint/test-gating parity with the standard path
        # (reference: train_ards_detector.py:355-374)
        epochs = conf.get("epochs", 10)
        start_epoch = 1
        resume = getattr(self, "resume_meta", None)
        if resume and resume["fold"] == fold_num:
            start_epoch = resume["epoch"]
        # fold-level dispatch pipelining (see Trainer.deferred_fetch):
        # the per-patient super-batch dispatches enqueue back-to-back;
        # loss materialization flushes at fold end
        with self.deferred_fetch():
            for epoch_num in range(start_epoch, epochs + 1):
                if not conf.get("no_train"):
                    order = self.host_rng.permutation(len(groups))
                    losses = []
                    for gi in order:
                        pt, idxs, y = groups[gi]
                        data, wmask = self._gather_super_batch(
                            train_dataset, idxs)
                        target = jnp.asarray(
                            np.eye(2, dtype=np.float32)[y][None])
                        state, loss = train_step(
                            state, jnp.asarray(data), target,
                            jnp.asarray(wmask)
                        )
                        losses.append(loss)
                        if conf.get("debug"):
                            break

                    self._defer(self._record_step_losses, losses, fold_num)
                if not conf.get("no_test_after_epochs") or epoch_num == epochs:
                    state = self._nested_test_epoch(
                        state, eval_step, test_dataset, fold_num, epoch_num
                    )
                if conf.get("save_model_per_epoch") and conf.get("save_model"):
                    self.save_checkpoint(state, fold_num, epoch_num)
        if conf.get("save_model"):
            self.save_checkpoint(state, fold_num, None)
        if resume and resume["fold"] == fold_num:
            self.resume_meta = None
        self.final_state = state
        return state

    def _nested_test_epoch(self, state, eval_step, dataset, fold_num,
                           epoch_num):
        pending = []
        for pt, idxs, y in self._patient_groups(dataset):
            data, wmask = self._gather_super_batch(dataset, idxs)
            target = jnp.asarray(np.eye(2, dtype=np.float32)[y][None])
            state, loss, out = eval_step(
                state, jnp.asarray(data), target, jnp.asarray(wmask)
            )
            pending.append((loss, out, idxs))
        self._defer(
            self._record_nested_eval, pending, dataset, fold_num, epoch_num
        )
        return state

    def _record_nested_eval(self, pending, dataset, fold_num, epoch_num):
        preds, pred_idx = [], []
        pending = jax.device_get(pending)  # one batched transfer
        for loss, out, idxs in pending:
            self.results.update_meter("test_loss", fold_num, float(loss))
            out = np.asarray(out)[0, : len(idxs)]  # (W, 2) drop padding
            preds.extend(out.argmax(axis=-1).tolist())
            pred_idx.extend(np.asarray(idxs).tolist())
        self.record_classifier_results(
            preds, pred_idx, dataset, fold_num, epoch_num
        )
