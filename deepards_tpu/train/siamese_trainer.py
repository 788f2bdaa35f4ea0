"""Siamese pretraining loop: pos/neg twin-tower BCE.

(reference: deepards/train_ards_detector.py:558-659 SiameseMixin.)  Each
batch runs the twin model on (anchor, positive) and (anchor, negative);
loss = BCE(pos, [0,1]) + BCE(neg, [1,0]).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepards_tpu.data.pipeline import BatchPipeline
from deepards_tpu.data.siamese_dataset import SiameseWindowDataset
from deepards_tpu.parallel import mesh as mesh_lib
from deepards_tpu.train.loop import Trainer
from deepards_tpu.train.steps import (
    TrainState,
    _maybe_cast,
    make_state_rng,
    split_state_rng,
)


class SiameseTrainer(Trainer):
    def get_base_datasets(self):
        conf = self.conf
        if conf.get("train_from_pickle"):
            train_dataset = SiameseWindowDataset.from_pickle(
                conf.train_from_pickle
            )
        else:
            train_dataset = SiameseWindowDataset(
                conf.data_path,
                conf.experiment_num,
                conf.n_sub_batches,
                dataset_type=conf.dataset_type,
                cohort_file=conf.cohort_file,
                train=True,
                to_pickle=conf.get("train_to_pickle"),
                seed=conf.get("seed", 42) or 42,
            )
        self.n_sub_batches = train_dataset.n_sub_batches
        if conf.get("test_from_pickle"):
            test_dataset = SiameseWindowDataset.from_pickle(
                conf.test_from_pickle
            )
        else:
            test_dataset = SiameseWindowDataset(
                conf.data_path,
                conf.experiment_num,
                conf.n_sub_batches,
                dataset_type=conf.dataset_type,
                cohort_file=conf.cohort_file,
                train=False,
                to_pickle=conf.get("test_to_pickle"),
                seed=(conf.get("seed", 42) or 42) + 1,
            )
        test_dataset.scaling_factors = train_dataset.scaling_factors
        return train_dataset, test_dataset

    def run_fold(self, fold_num, train_dataset, test_dataset, tx):
        conf = self.conf
        model = self.build_model()
        pipeline = BatchPipeline(train_dataset.base)
        self.rng, init_rng = jax.random.split(self.rng)
        seq, pos, neg = train_dataset.sample_triplets(np.arange(2))
        variables = model.init(
            {"params": init_rng, "dropout": init_rng},
            jnp.asarray(seq), jnp.asarray(pos), True,
        )
        params = variables["params"]
        state = TrainState(
            params=params,
            opt_state=tx.init(params),
            rng=make_state_rng(
                jax.random.fold_in(init_rng, 3), self._rng_impl()
            ),
            step=jnp.zeros((), jnp.int32),
        )
        state = mesh_lib.replicate_tree(self.mesh, state)
        compute_dtype = self.compute_dtype
        rng_impl = self._rng_impl()

        def loss_fn(params, seq, pos, neg, dropout_rng):
            seq = _maybe_cast(pipeline(seq), compute_dtype)
            pos = _maybe_cast(pipeline(pos), compute_dtype)
            neg = _maybe_cast(pipeline(neg), compute_dtype)
            params_c = _maybe_cast(params, compute_dtype)
            out_pos = model.apply(
                {"params": params_c}, seq, pos, False,
                rngs={"dropout": dropout_rng},
            ).astype(jnp.float32)
            out_neg = model.apply(
                {"params": params_c}, seq, neg, False,
                rngs={"dropout": dropout_rng},
            ).astype(jnp.float32)
            t_pos = jnp.tile(jnp.array([[0.0, 1.0]]), (out_pos.shape[0], 1))
            t_neg = jnp.tile(jnp.array([[1.0, 0.0]]), (out_neg.shape[0], 1))
            loss = (
                optax.sigmoid_binary_cross_entropy(out_pos, t_pos).mean()
                + optax.sigmoid_binary_cross_entropy(out_neg, t_neg).mean()
            )
            return loss, (out_pos, out_neg)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, seq, pos, neg):
            rng, drng = split_state_rng(state.rng, rng_impl)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, seq, pos, neg, drng
            )
            grads = _maybe_cast(grads, jnp.float32)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 rng=rng, step=state.step + 1), loss

        @jax.jit
        def eval_step(state, seq, pos, neg):
            rng, drng = split_state_rng(state.rng, rng_impl)
            loss, (out_pos, out_neg) = loss_fn(
                state.params, seq, pos, neg, drng
            )
            return state.replace(rng=rng), loss, out_pos, out_neg

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_epoch_scan(state, data_cache, a_ids, p_ids, n_ids):
            """Whole siamese epoch in one dispatch: triplet INDICES are
            sampled on host (cheap ints), windows gather on device."""

            def body(s, xs):
                ai, pi, ni = xs
                s, loss = _train_body(
                    s,
                    jnp.take(data_cache, ai, axis=0),
                    jnp.take(data_cache, pi, axis=0),
                    jnp.take(data_cache, ni, axis=0),
                )
                return s, loss

            return jax.lax.scan(body, state, (a_ids, p_ids, n_ids))

        def _train_body(state, seq, pos, neg):
            rng, drng = split_state_rng(state.rng, rng_impl)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, seq, pos, neg, drng
            )
            grads = _maybe_cast(grads, jnp.float32)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 rng=rng, step=state.step + 1), loss

        batch_size = conf.get("batch_size", 16)
        epochs = conf.get("epochs", 10)
        use_device = self._device_cache_eligible(train_dataset.base, None)
        if use_device:
            dev = self._get_device_cache(train_dataset.base)
        # fold-level dispatch pipelining (see Trainer.deferred_fetch)
        with self.deferred_fetch():
            for epoch_num in range(1, epochs + 1):
                order = self.host_rng.permutation(len(train_dataset))
                n_batches = len(order) // batch_size
                if use_device and n_batches >= 1 and not conf.get("debug"):
                    a, p, n = train_dataset.sample_triplet_indices(
                        order[: n_batches * batch_size]
                    )
                    shape = (n_batches, batch_size)
                    state, losses = train_epoch_scan(
                        state, dev["data"],
                        jnp.asarray(a.reshape(shape).astype(np.int32)),
                        jnp.asarray(p.reshape(shape).astype(np.int32)),
                        jnp.asarray(n.reshape(shape).astype(np.int32)),
                    )
                    self._defer(self._record_step_losses, losses,
                                fold_num)
                else:
                    losses = []
                    for bi in range(max(n_batches, 1)):
                        rel = order[bi * batch_size : (bi + 1) * batch_size]
                        if len(rel) < batch_size:
                            break
                        seq, pos, neg = train_dataset.sample_triplets(rel)
                        state, loss = train_step(
                            state, jnp.asarray(seq), jnp.asarray(pos),
                            jnp.asarray(neg),
                        )
                        losses.append(loss)
                        if conf.get("debug"):
                            break
                    self._defer(self._record_step_losses, losses,
                                fold_num)
                state = self._siamese_test_epoch(
                    state, eval_step, test_dataset, fold_num, epoch_num,
                    batch_size,
                )
        if conf.get("save_model"):
            self.save_checkpoint(state, fold_num, None)
        self.final_state = state
        return state

    def _siamese_test_epoch(self, state, eval_step, dataset, fold_num,
                            epoch_num, batch_size):
        pending = []
        n_batches = max(len(dataset) // batch_size, 1)
        for bi in range(n_batches):
            rel = np.arange(bi * batch_size,
                            min((bi + 1) * batch_size, len(dataset)))
            if len(rel) < batch_size:
                break
            seq, pos, neg = dataset.sample_triplets(rel)
            state, loss, out_pos, out_neg = eval_step(
                state, jnp.asarray(seq), jnp.asarray(pos), jnp.asarray(neg)
            )
            pending.append((loss, out_pos, out_neg))
        self._defer(
            self._record_siamese_eval, pending, fold_num, epoch_num
        )
        return state

    def _record_siamese_eval(self, pending, fold_num, epoch_num):
        preds = []
        targets = []
        pending = jax.device_get(pending)  # one batched transfer
        for loss, out_pos, out_neg in pending:
            self.results.update_meter("test_loss", fold_num, float(loss))
            self.results.update_epoch_meter(
                "test_loss", epoch_num, float(loss)
            )
            cat = np.concatenate([np.asarray(out_pos), np.asarray(out_neg)])
            preds.extend(cat.argmax(axis=1).tolist())
            targets.extend([1] * out_pos.shape[0] + [0] * out_neg.shape[0])
        if preds:
            accuracy = float(np.mean(np.array(preds) == np.array(targets)))
            self.results.update_meter("accuracy", fold_num, accuracy)
            self.results.update_epoch_meter("accuracy", epoch_num, accuracy)

    def perform_post_modeling_actions(self):
        self.results.save_all()
