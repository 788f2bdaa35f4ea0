"""Parallel-fold training: all k folds train simultaneously under vmap.

The reference trains folds sequentially (one GPU each via the task
spooler; SURVEY.md §2.10 "per-fold training is embarrassingly parallel").
On TPU the natural formulation is a fold axis: per-fold parameter states
stack into one pytree with a leading (F, ...) axis, every step gathers one
batch per fold, and a single vmapped jitted step advances all folds at
once — k-fold CV costs barely more wall-clock than one fold at small
batch sizes, because the chip was dispatch-bound anyway.

Enable with ``parallel_folds: true`` (classifier networks, kfold mode).
Per-epoch step count is the minimum across folds (shuffled indices make
the dropped tail unbiased); evaluation pads fold batches with masks.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from deepards_tpu.models.layers import bn_row_mask
from deepards_tpu.parallel import mesh as mesh_lib
from deepards_tpu.train.loop import Trainer, _pad_batch
from deepards_tpu.train.steps import (
    TrainState,
    _maybe_cast,
    make_state_rng,
    split_state_rng,
)


class ParallelFoldTrainer(Trainer):
    def train_and_test(self):
        conf = self.conf
        if not conf.get("kfolds"):
            raise ValueError("parallel_folds requires kfold mode")
        if self.spec.kind != "classifier" or self.spec.trainer != "standard":
            raise ValueError(
                "parallel_folds supports standard classifier networks"
            )
        train_dataset, test_dataset = self.get_base_datasets()
        n_folds = self.n_kfolds
        model = self.build_model()
        tx = self._make_tx()

        # per-fold index sets + scaling factors
        fold_train_idx = []
        fold_test_idx = []
        mus, stds = [], []
        for f in range(n_folds):
            train_dataset.set_kfold_indexes_for_fold(f)
            fold_train_idx.append(
                np.asarray(train_dataset.current_indices())
            )
            test_dataset.set_kfold_indexes_for_fold(f)
            fold_test_idx.append(np.asarray(test_dataset.current_indices()))
            mu, std = train_dataset.scaling_factors[f]
            mus.append(mu)
            stds.append(std)
        mus = jnp.asarray(np.stack(mus))  # (F, C)
        stds = jnp.asarray(np.stack(stds))
        is_padded = "padded_breath_by_breath" in train_dataset.dataset_type

        # vmapped init: a fresh model per fold
        self.rng, init_rng = jax.random.split(self.rng)
        fold_keys = jax.random.split(init_rng, n_folds)
        sample = train_dataset.gather(fold_train_idx[0][:2])
        sample_data = jnp.asarray(sample["data"])

        def init_one(key):
            k1, k2 = jax.random.split(key)
            variables = model.init(
                {"params": k1, "dropout": k2}, sample_data, None, True
            )
            return variables["params"]

        params = jax.jit(jax.vmap(init_one))(fold_keys)
        opt_state = jax.vmap(tx.init)(params)
        state = TrainState(
            params=params,
            opt_state=opt_state,
            rng=jnp.stack([
                make_state_rng(k, self._rng_impl())
                for k in jax.random.split(
                    jax.random.fold_in(init_rng, 9), n_folds
                )
            ]),
            step=jnp.zeros((n_folds,), jnp.int32),
        )

        loss_fn = self.loss_fn
        compute_dtype = self.compute_dtype
        target_mode = self.spec.target_mode

        def normalize(data, mu, std):
            mu_b = mu.reshape(1, 1, -1, 1)
            std_b = std.reshape(1, 1, -1, 1)
            if is_padded:
                return jnp.where(
                    data != 0, (data - mu_b) / std_b, data / std_b
                )
            return (data - mu_b) / std_b

        rng_impl = self._rng_impl()

        def fold_loss(params, data, target, mask, mu, std, rng):
            data = normalize(data, mu, std)
            data = _maybe_cast(data, compute_dtype)
            params_c = _maybe_cast(params, compute_dtype)
            # pad-proof BN statistics: same reference true-size-final-batch
            # semantics as the sequential path (steps.py loss_wrap)
            with bn_row_mask(jnp.repeat(mask, data.shape[1])):
                out = model.apply(
                    {"params": params_c}, data, None, False,
                    rngs={"dropout": rng},
                )
            if isinstance(out, tuple):
                out = out[0]
            out = out.astype(jnp.float32)
            t = target
            if target_mode == "per_breath":
                t = jnp.repeat(t[:, None, :], out.shape[1], axis=1)
            return loss_fn(out, t, mask), out

        def fold_train_step(params, opt_state, rng, data, target, mask,
                            mu, std):
            rng, drng = split_state_rng(rng, rng_impl)
            (loss, _), grads = jax.value_and_grad(
                fold_loss, has_aux=True
            )(params, data, target, mask, mu, std, drng)
            grads = _maybe_cast(grads, jnp.float32)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, rng, loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step_all(state, data, target, mask):
            params, opt_state, rng, loss = jax.vmap(fold_train_step)(
                state.params, state.opt_state, state.rng, data, target,
                mask, mus, stds,
            )
            return (
                state.replace(params=params, opt_state=opt_state, rng=rng,
                              step=state.step + 1),
                loss,
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_epoch_all(state, data_cache, target_cache, ids, masks):
            """Whole epoch, all folds, ONE dispatch: per scanned step the
            (F, B) index block gathers on device from the uploaded cache
            and a vmapped fold step advances every fold."""

            def body(s, xs):
                ids_s, m = xs  # (F, B)
                data = jnp.take(data_cache, ids_s, axis=0)
                target = jnp.take(target_cache, ids_s, axis=0)
                params, opt_state, rng, loss = jax.vmap(fold_train_step)(
                    s.params, s.opt_state, s.rng, data, target, m,
                    mus, stds,
                )
                return (
                    s.replace(params=params, opt_state=opt_state, rng=rng,
                              step=s.step + 1),
                    loss,
                )

            return jax.lax.scan(body, state, (ids, masks))

        @jax.jit
        def eval_step_all(state, data, target, mask):
            def one(params, rng, data, target, mask, mu, std):
                rng, drng = split_state_rng(rng, rng_impl)
                loss, out = fold_loss(
                    params, data, target, mask, mu, std, drng
                )
                return rng, loss, out

            rng, loss, out = jax.vmap(one)(
                state.params, state.rng, data, target, mask, mus, stds
            )
            return state.replace(rng=rng), loss, out

        @jax.jit
        def eval_epoch_all(state, data_cache, target_cache, ids, masks):
            """Whole test epoch, all folds, ONE dispatch (the eval mirror
            of train_epoch_all): per scanned step the (F, B) index block
            gathers on device and the vmapped eval scores every fold.
            The per-step rng threading matches the host loop exactly."""

            def body(s, xs):
                ids_s, m = xs  # (F, B)
                data = jnp.take(data_cache, ids_s, axis=0)
                target = jnp.take(target_cache, ids_s, axis=0)
                # pad slots gather a repeated real index; zero them to
                # match the host loop's _pad_batch byte-for-byte.  BN
                # statistics no longer see pad rows at all (fold_loss
                # scopes a bn_row_mask), so this is data-level parity
                # only, not a normalization requirement.
                dshape = m.shape + (1,) * (data.ndim - 2)
                data = data * m.reshape(dshape)
                target = target * m.reshape(
                    m.shape + (1,) * (target.ndim - 2)
                ).astype(target.dtype)

                def one(params, rng, data, target, mask, mu, std):
                    rng, drng = split_state_rng(rng, rng_impl)
                    loss, out = fold_loss(
                        params, data, target, mask, mu, std, drng
                    )
                    return rng, loss, out

                rng, loss, out = jax.vmap(one)(
                    s.params, s.rng, data, target, m, mus, stds
                )
                return s.replace(rng=rng), (loss, out)

            return jax.lax.scan(body, state, (ids, masks))

        if conf.get("load_checkpoint"):
            # one checkpoint seeds EVERY fold slice — the sequential
            # path restores the same file per fold (loop.py run_fold),
            # so the vmapped formulation broadcasts it over the fold axis
            from deepards_tpu.train import checkpoint

            template = jax.tree_util.tree_map(lambda x: x[0], state)
            restored = checkpoint.restore(conf.load_checkpoint, template)

            def bcast(stacked, single):
                single = jnp.asarray(single)
                return jnp.broadcast_to(
                    single, stacked.shape
                ).astype(stacked.dtype)

            state = state.replace(
                params=jax.tree_util.tree_map(
                    bcast, state.params, restored["params"]),
                opt_state=jax.tree_util.tree_map(
                    bcast, state.opt_state, restored["opt_state"]),
                rng=bcast(state.rng, restored["rng"]),
                step=bcast(state.step, restored["step"]),
            )
            # restored leaves carry the checkpoint's single-device
            # placement; the device-cache epoch program consumes
            # mesh-replicated arrays, so re-pin the whole state
            state = mesh_lib.replicate_tree(self.mesh, state)

        batch_size = conf.get("batch_size", 16)
        epochs = conf.get("epochs", 10)
        # checkpoint/test-gating parity with the standard path
        # (reference checkpoints every network type,
        # train_ards_detector.py:355-374); folds advance together, so
        # resume is epoch-level
        start_epoch = 1
        resume = getattr(self, "resume_meta", None)
        if resume:
            start_epoch = resume["epoch"]
        # fold-level dispatch pipelining (see Trainer.deferred_fetch):
        # all epochs' train+eval scans enqueue back-to-back; host
        # recording flushes once at the end
        with self.deferred_fetch():
            for epoch_num in range(start_epoch, epochs + 1):
                if not conf.get("no_train"):
                    use_device = (
                        self._device_cache_eligible(train_dataset, None)
                        and min(len(i) for i in fold_train_idx) >= batch_size
                    )
                    if use_device:
                        state = self._parallel_train_epoch_device(
                            state, train_epoch_all, train_dataset,
                            fold_train_idx, batch_size, epoch_num,
                        )
                    else:
                        state = self._parallel_train_epoch(
                            state, train_step_all, train_dataset,
                            fold_train_idx, batch_size, epoch_num,
                        )
                if not conf.get("no_test_after_epochs") or epoch_num == epochs:
                    eval_use_device = (
                        self._device_cache_eligible(test_dataset, None)
                        and min(len(i) for i in fold_test_idx) > 0
                    )
                    if eval_use_device:
                        state = self._parallel_test_epoch_device(
                            state, eval_epoch_all, test_dataset,
                            fold_test_idx, batch_size, epoch_num,
                        )
                    else:
                        state = self._parallel_test_epoch(
                            state, eval_step_all, test_dataset,
                            fold_test_idx, batch_size, epoch_num,
                        )
                if conf.get("save_model_per_epoch") and conf.get("save_model"):
                    self._save_fold_checkpoints(state, mus, stds, epoch_num)
        if conf.get("save_model"):
            self._save_fold_checkpoints(state, mus, stds, None)
        self.resume_meta = None
        self.final_state = state
        self.perform_post_modeling_actions()
        self.perform_plotting(test_dataset)
        return self.results

    def _save_fold_checkpoints(self, state, mus, stds, epoch_num):
        """Per-fold slices of the vmapped state, saved with the exact
        layout/naming of the sequential path (so predict/serve/resume
        consume them unchanged), each with its fold's scaling sidecar."""
        n_folds = int(np.asarray(state.step).shape[0])
        for f in range(n_folds):
            state_f = jax.tree_util.tree_map(lambda x: x[f], state)
            self._current_scaling = (
                np.asarray(mus[f]), np.asarray(stds[f])
            )
            self.save_checkpoint(state_f, f, epoch_num)

    def _make_tx(self):
        from deepards_tpu.train.steps import make_optimizer

        conf = self.conf
        return make_optimizer(
            optimizer=conf.get("optimizer", "sgd"),
            learning_rate=conf.get("learning_rate", 0.001),
            weight_decay=conf.get("weight_decay", 0.0001),
            clip_grad=bool(conf.get("clip_grad")),
            clip_val=conf.get("clip_val", 0.01),
        )

    def _parallel_train_epoch_device(self, state, train_epoch_all, dataset,
                                     fold_idx, batch_size, epoch_num):
        """Device-cache fast path: one dispatch per epoch (all folds)."""
        n_folds = len(fold_idx)
        orders = [self.host_rng.permutation(idx) for idx in fold_idx]
        n_steps = min(len(o) for o in orders) // batch_size
        ids = np.stack([
            o[: n_steps * batch_size].reshape(n_steps, batch_size)
            for o in orders
        ], axis=1)  # (n_steps, F, B)
        masks = np.ones((n_steps, n_folds, batch_size), np.float32)
        dev = self._get_device_cache(dataset)
        state, losses = train_epoch_all(
            state, dev["data"], dev["target"],
            jnp.asarray(ids.astype(np.int32)), jnp.asarray(masks),
        )
        self._defer(
            self._record_parallel_train_losses, losses, n_steps, n_folds,
            epoch_num,
        )
        return state

    def _record_parallel_train_losses(self, losses, n_steps, n_folds,
                                      epoch_num):
        losses = np.asarray(losses)  # (n_steps, F)
        for s in range(n_steps):
            for f in range(n_folds):
                self.results.update_meter(
                    "loss_epoch_{}".format(epoch_num), f,
                    float(losses[s, f]),
                )
                self.results.update_loss(f, float(losses[s, f]))

    def _parallel_train_epoch(self, state, train_step_all, dataset,
                              fold_idx, batch_size, epoch_num):
        n_folds = len(fold_idx)
        orders = [self.host_rng.permutation(idx) for idx in fold_idx]
        n_steps = min(len(o) for o in orders) // batch_size
        for s in range(max(n_steps, 1)):
            datas, targets, masks = [], [], []
            for f in range(n_folds):
                sel = orders[f][s * batch_size : (s + 1) * batch_size]
                if len(sel) == 0:
                    sel = orders[f][:batch_size]
                b = dataset.gather(sel)
                b, m = _pad_batch(
                    {"data": b["data"], "target": b["target"]}, batch_size
                )
                datas.append(b["data"])
                targets.append(b["target"])
                masks.append(m)
            state, loss = train_step_all(
                state,
                jnp.asarray(np.stack(datas)),
                jnp.asarray(np.stack(targets)),
                jnp.asarray(np.stack(masks)),
            )
            loss_np = np.asarray(loss)
            for f in range(n_folds):
                self.results.update_meter(
                    "loss_epoch_{}".format(epoch_num), f, float(loss_np[f])
                )
                self.results.update_loss(f, float(loss_np[f]))
            if self.conf.get("debug"):
                break
        return state

    def _parallel_test_epoch_device(self, state, eval_epoch_all, dataset,
                                    fold_idx, batch_size, epoch_num):
        """Device-cache eval fast path: the whole test epoch for all
        folds in one dispatch.  Fold splits of unequal length pad with
        repeated indexes under a zero mask; host-side vote recording
        drops the pad rows, matching _parallel_test_epoch exactly."""
        n_folds = len(fold_idx)
        max_len = max(len(idx) for idx in fold_idx)
        n_steps = -(-max_len // batch_size)
        ids = np.zeros((n_steps, n_folds, batch_size), np.int32)
        masks = np.zeros((n_steps, n_folds, batch_size), np.float32)
        for f, idx in enumerate(fold_idx):
            n = len(idx)
            fill = idx[0] if n else 0
            padded = np.concatenate(
                [idx, np.full(n_steps * batch_size - n, fill, np.int64)]
            )
            ids[:, f, :] = padded.reshape(n_steps, batch_size)
            m = np.zeros(n_steps * batch_size, np.float32)
            m[:n] = 1.0
            masks[:, f, :] = m.reshape(n_steps, batch_size)
        dev = self._get_device_cache(dataset)
        state, (losses, outs) = eval_epoch_all(
            state, dev["data"], dev["target"],
            jnp.asarray(ids), jnp.asarray(masks),
        )
        self._defer(
            self._record_parallel_eval, losses, outs, fold_idx,
            batch_size, dataset, epoch_num,
        )
        return state

    def _record_parallel_eval(self, losses, outs, fold_idx, batch_size,
                              dataset, epoch_num):
        losses = np.asarray(losses)   # (n_steps, F)
        outs = np.asarray(outs)       # (n_steps, F, B, ...)
        n_steps = outs.shape[0]
        for f in range(len(fold_idx)):
            n = len(fold_idx[f])
            if n == 0:
                continue
            # the host loop records one test_loss per step that carries
            # at least one real window for this fold
            for s in range(-(-n // batch_size)):
                self.results.update_meter("test_loss", f,
                                          float(losses[s, f]))
            out_flat = outs[:, f].reshape(
                (n_steps * batch_size,) + outs.shape[3:]
            )[:n]
            if self.spec.expand_obs_idx and out_flat.ndim == 3:
                preds = out_flat.argmax(axis=-1).reshape(-1).tolist()
                pred_idx = np.repeat(
                    fold_idx[f], out_flat.shape[1]).tolist()
            else:
                preds = out_flat.argmax(axis=-1).tolist()
                pred_idx = np.asarray(fold_idx[f]).tolist()
            dataset.set_kfold_indexes_for_fold(f)
            self.record_classifier_results(
                preds, pred_idx, dataset, f, epoch_num
            )

    def _parallel_test_epoch(self, state, eval_step_all, dataset, fold_idx,
                             batch_size, epoch_num):
        n_folds = len(fold_idx)
        max_len = max(len(idx) for idx in fold_idx)
        n_steps = -(-max_len // batch_size)
        fold_preds = [[] for _ in range(n_folds)]
        fold_pred_idx = [[] for _ in range(n_folds)]
        for s in range(n_steps):
            datas, targets, masks, chunk_idx = [], [], [], []
            for f in range(n_folds):
                sel = fold_idx[f][s * batch_size : (s + 1) * batch_size]
                real = len(sel)
                if real == 0:
                    sel = fold_idx[f][:1]
                    real = 0
                b = dataset.gather(sel)
                b, m = _pad_batch(
                    {"data": b["data"], "target": b["target"]}, batch_size
                )
                if real < batch_size:
                    m[real:] = 0.0
                datas.append(b["data"])
                targets.append(b["target"])
                masks.append(m)
                chunk_idx.append((sel, real))
            state, loss, out = eval_step_all(
                state,
                jnp.asarray(np.stack(datas)),
                jnp.asarray(np.stack(targets)),
                jnp.asarray(np.stack(masks)),
            )
            out_np = np.asarray(out)
            loss_np = np.asarray(loss)
            for f in range(n_folds):
                sel, real = chunk_idx[f]
                if real == 0:
                    continue
                self.results.update_meter(
                    "test_loss", f, float(loss_np[f])
                )
                preds_f = out_np[f][:real]
                if self.spec.expand_obs_idx and preds_f.ndim == 3:
                    fold_preds[f].extend(
                        preds_f.argmax(axis=-1).reshape(-1).tolist()
                    )
                    fold_pred_idx[f].extend(
                        np.repeat(sel[:real], preds_f.shape[1]).tolist()
                    )
                else:
                    fold_preds[f].extend(
                        preds_f.argmax(axis=-1).tolist()
                    )
                    fold_pred_idx[f].extend(
                        np.asarray(sel[:real]).tolist()
                    )
        for f in range(n_folds):
            dataset.set_kfold_indexes_for_fold(f)
            self.record_classifier_results(
                fold_preds[f], fold_pred_idx[f], dataset, f, epoch_num
            )
        return state
