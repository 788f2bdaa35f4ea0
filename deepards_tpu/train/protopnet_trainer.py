"""ProtoPNet training protocol: staged optimizers, composite loss,
prototype push.

(reference: deepards/train_ards_detector.py:1156-1405.)  The three
optimizers (warm / joint / last-layer-only) become one optax
``multi_transform`` whose parameter labels switch per stage — the jitted
train step takes the stage as a traced scalar selecting the masked
update, so no recompiles across stages.  The push (projection of each
prototype onto its nearest same-class latent patch over the train set)
runs as a jitted per-batch min-reduction with a host-side cross-batch
argmin.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepards_tpu.data.pipeline import BatchPipeline
from deepards_tpu.models.layers import bn_row_mask
from deepards_tpu.models.protopnet1d import construct_ppnet
from deepards_tpu.models.registry import get_base_network
from deepards_tpu.parallel import mesh as mesh_lib
from deepards_tpu.train.loader import EpochLoader
from deepards_tpu.train.loop import Trainer, _pad_batch
from deepards_tpu.train.steps import (
    TrainState,
    _maybe_cast,
    make_state_rng,
    split_state_rng,
)

STAGES = {"warm": 0, "joint": 1, "last": 2}


def _param_stage_masks(params):
    """Label each top-level param subtree for the 3 stages
    (reference: train_ards_detector.py:1158-1192)."""

    def label_tree(stage):
        def label(path, leaf):
            top = path[0].key
            if top == "prototype_vectors":
                grp = "protos"
            elif top.startswith("AddOnLayers") or top == "add_on_layers":
                grp = "add_on"
            elif top.startswith("Dense") or top == "last_layer":
                grp = "last"
            else:
                grp = "backbone"
            if stage == "warm":
                return grp in ("add_on", "protos")
            if stage == "joint":
                return grp in ("backbone", "add_on", "protos")
            return grp == "last"

        return jax.tree_util.tree_map_with_path(label, params)

    return {s: label_tree(s) for s in STAGES}


def ppnet_loss(
    logits,
    target,
    min_distances,
    class_identity_windows,
    max_dist,
    clust_lambda=0.8,
    sep_lambda=0.2,
    use_l1=False,
    last_layer_kernel=None,
    weights=None,
):
    """BCE(softmax) + clust*cluster + sep*separation + 1e-4*L1
    (reference: train_ards_detector.py:1194-1247)."""
    probs = jax.nn.softmax(logits, axis=-1)
    eps = 1e-7
    probs = jnp.clip(probs, eps, 1 - eps)
    bce_rows = -(
        target * jnp.log(probs) + (1 - target) * jnp.log(1 - probs)
    ).mean(axis=-1)
    if weights is None:
        cls_loss = bce_rows.mean()
    else:
        cls_loss = (bce_rows * weights).sum() / jnp.maximum(
            weights.sum(), 1.0
        )

    label = target.argmax(axis=1)
    ident = jnp.asarray(class_identity_windows)  # (S*P, n_cls)
    correct = ident[:, label].T  # (B, S*P)
    inv_dist = ((max_dist - min_distances) * correct).max(axis=1)
    cluster_cost = (max_dist - inv_dist)
    wrong = 1 - correct
    inv_dist_wrong = ((max_dist - min_distances) * wrong).max(axis=1)
    separation_cost = (max_dist - inv_dist_wrong)
    if weights is None:
        cluster_cost = cluster_cost.mean()
        separation_cost = separation_cost.mean()
    else:
        denom = jnp.maximum(weights.sum(), 1.0)
        cluster_cost = (cluster_cost * weights).sum() / denom
        separation_cost = (separation_cost * weights).sum() / denom

    if use_l1 and last_layer_kernel is not None:
        l1_mask = 1 - ident  # (S*P, n_cls) == kernel shape
        l1 = jnp.abs(last_layer_kernel * l1_mask).sum()
    else:
        l1 = jnp.zeros(())
    loss = (
        cls_loss
        + clust_lambda * cluster_cost
        + sep_lambda * separation_cost
        + 1e-4 * l1
    )
    return loss, (cls_loss, cluster_cost, separation_cost, l1)


class ProtoPNetTrainer(Trainer):
    """Drives PPNet through warm -> joint -> push/last-layer cycles."""

    def build_model(self):
        base = get_base_network(self.conf)
        if self.spec.two_dim:
            from deepards_tpu.models.protopnet2d import construct_ppnet_2d

            return construct_ppnet_2d(
                base,
                n_prototypes=self.conf.get("n_prototypes", 10) or 10,
                incorrect_strength=(
                    self.conf.get("incorrect_strength", -0.5) or -0.5
                ),
            )
        return construct_ppnet(
            base,
            sub_batch_size=self.n_sub_batches,
            n_prototypes=self.conf.get("n_prototypes", 10) or 10,
            incorrect_strength=(
                self.conf.get("incorrect_strength", -0.5) or -0.5
            ),
            average_linear=bool(self.conf.get("average_linear_layer")),
        )

    def _make_tx(self, params):
        conf = self.conf
        lr = conf.get("learning_rate", 0.001)
        wd = conf.get("weight_decay", 0.0001)
        opt_name = conf.get("optimizer", "sgd")

        def base_opt(with_wd=True):
            chain = []
            if with_wd:
                chain.append(optax.add_decayed_weights(wd))
            if opt_name == "adam":
                chain.append(optax.adam(lr))
            else:
                chain.append(optax.sgd(lr, momentum=0.9, nesterov=True))
            return optax.chain(*chain)

        masks = _param_stage_masks(params)

        def masked(stage):
            return optax.masked(base_opt(), masks[stage])

        # one transform per stage; the step picks by stage index
        return {s: masked(s) for s in STAGES}

    def run_fold(self, fold_num, train_dataset, test_dataset, tx_unused):
        conf = self.conf
        model = self.build_model()
        if self.spec.two_dim:
            pipeline = lambda x: x  # ImgARDSDataset pre-normalizes
        else:
            pipeline = BatchPipeline(train_dataset)
        self.rng, init_rng = jax.random.split(self.rng)
        sample = train_dataset.gather(train_dataset.current_indices()[:2])
        variables = model.init(
            {"params": init_rng, "dropout": init_rng},
            jnp.asarray(sample["data"]), None, True,
        )
        params = variables["params"]
        txs = self._make_tx(params)
        opt_states = {s: txs[s].init(params) for s in STAGES}
        state = TrainState(
            params=params,
            opt_state=opt_states,
            rng=make_state_rng(
                jax.random.fold_in(init_rng, 7), self._rng_impl()
            ),
            step=jnp.zeros((), jnp.int32),
        )
        state = mesh_lib.replicate_tree(self.mesh, state)

        if hasattr(model, "class_identity_windows"):
            ident_w = model.class_identity_windows()
        else:
            ident_w = model.class_identity()
        max_dist = model.max_dist
        clust_l = conf.get("clust_lambda", 0.8)
        sep_l = conf.get("sep_lambda", 0.2)
        use_l1 = bool(conf.get("use_l1"))
        compute_dtype = self.compute_dtype

        # 1D protopnet flattens (B, S, C, L) into B*S backbone rows; 2D
        # backbone rows are B.  The expanded mask keeps BN statistics
        # pad-proof (reference true-size final-batch semantics).
        two_dim = bool(getattr(self.spec, "two_dim", False))

        def expand_bn_mask(mask, data):
            if two_dim or data.ndim != 4:
                return mask
            return jnp.repeat(mask, data.shape[1])

        def loss_wrap(params, batch, mask, dropout_rng):
            data = pipeline(batch["data"])
            data = _maybe_cast(data, compute_dtype)
            params_c = _maybe_cast(params, compute_dtype)
            with bn_row_mask(expand_bn_mask(mask, data)):
                logits, min_d = model.apply(
                    {"params": params_c}, data, None, False,
                    rngs={"dropout": dropout_rng},
                )
            logits = logits.astype(jnp.float32)
            min_d = min_d.astype(jnp.float32)
            kernel = params["last_layer"]["kernel"] if use_l1 else None
            loss, aux = ppnet_loss(
                logits, batch["target"], min_d, ident_w, max_dist,
                clust_l, sep_l, use_l1, kernel, mask,
            )
            return loss, aux

        rng_impl = self._rng_impl()

        def make_step(stage):
            tx = txs[stage]

            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(state, batch, mask):
                rng, drng = split_state_rng(state.rng, rng_impl)
                (loss, aux), grads = jax.value_and_grad(
                    loss_wrap, has_aux=True
                )(state.params, batch, mask, drng)
                grads = _maybe_cast(grads, jnp.float32)
                updates, new_opt = tx.update(
                    grads, state.opt_state[stage], state.params
                )
                params = optax.apply_updates(state.params, updates)
                opt_state = dict(state.opt_state)
                opt_state[stage] = new_opt
                return (
                    state.replace(
                        params=params, opt_state=opt_state, rng=rng,
                        step=state.step + 1,
                    ),
                    loss,
                    aux,
                )

            return step

        steps = {s: make_step(s) for s in STAGES}

        @jax.jit
        def eval_step(state, batch, mask):
            rng, drng = split_state_rng(state.rng, rng_impl)
            data = pipeline(batch["data"])
            with bn_row_mask(expand_bn_mask(mask, data)):
                logits, min_d = model.apply(
                    {"params": state.params}, data, None, True,
                    rngs={"dropout": drng},
                )
            loss, _ = ppnet_loss(
                logits.astype(jnp.float32),
                batch["target"],
                min_d.astype(jnp.float32),
                ident_w, max_dist, clust_l, sep_l,
                weights=mask,
            )
            return state.replace(rng=rng), loss, logits

        epochs = conf.get("epochs", 10)
        n_warm = conf.get("n_warm_epochs", 3)
        push_start = conf.get("push_start_epoch", 6)
        push_every = conf.get("push_every_n", 6)
        n_push_iters = conf.get("n_push_iters", 5)
        batch_size = conf.get("batch_size", 16)

        # fold-level dispatch pipelining (see Trainer.deferred_fetch):
        # staged epochs + evals enqueue back-to-back; prototype pushes
        # still synchronize inherently (they materialize features on
        # host)
        with self.deferred_fetch():
            for epoch_num in range(1, epochs + 1):
                stage = "warm" if epoch_num <= n_warm else "joint"
                state = self._run_ppnet_epoch(
                    state, steps[stage], train_dataset, fold_num,
                    epoch_num, batch_size,
                )
                if (
                    epoch_num >= push_start
                    and (epoch_num - push_start) % push_every == 0
                ):
                    state = self.push_prototypes(
                        state, model, train_dataset, pipeline, batch_size)
                    for _ in range(n_push_iters):
                        state = self._run_ppnet_epoch(
                            state, steps["last"], train_dataset, fold_num,
                            epoch_num, batch_size,
                        )
                        if conf.get("debug"):
                            break
                state = self.run_test_epoch(
                    state, eval_step, test_dataset, fold_num, epoch_num
                )
                if conf.get("save_model_per_epoch") and conf.get("save_model"):
                    self.save_checkpoint(state, fold_num, epoch_num)
        # checkpointing parity with the base trainer: the reference's
        # BaseTraining saves every network type incl. ProtoPNet
        # (train_ards_detector.py:355-374)
        if conf.get("save_model"):
            self.save_checkpoint(state, fold_num, None)
        self.final_state = state
        self.final_model = model
        return state

    def _run_ppnet_epoch(self, state, step, dataset, fold_num, epoch_num,
                         batch_size):
        if self._device_cache_eligible(dataset, None):
            return self._run_ppnet_epoch_device(
                state, step, dataset, fold_num, epoch_num, batch_size
            )
        loader = EpochLoader(
            dataset, batch_size, shuffle=True, rng=self.host_rng
        )
        for batch in loader:
            batch.pop("index")
            batch, mask = self._prepare_batch(batch, batch_size)
            state, loss, aux = step(state, batch, mask)
            cls_loss, clust, sep, l1 = [float(a) for a in aux]
            self.results.update_meter("cls_loss", fold_num, cls_loss)
            self.results.update_meter("clst_loss", fold_num, clust)
            self.results.update_meter("sep_loss", fold_num, sep)
            self.results.update_meter("l1_loss", fold_num, l1)
            self.results.update_meter(
                "loss_epoch_{}".format(epoch_num), fold_num, float(loss)
            )
            self.results.update_loss(fold_num, float(loss))
            if self.conf.get("debug"):
                break
        return state

    def _run_ppnet_epoch_device(self, state, step, dataset, fold_num,
                                epoch_num, batch_size):
        """Whole staged-ppnet epoch in one dispatch over the uploaded
        cache (mirror of Trainer._run_train_epoch_device_cache; the
        composite loss aux terms are materialized after the scan)."""
        conf = self.conf
        dp = self.mesh.shape[mesh_lib.DATA_AXIS]
        target = -(-batch_size // dp) * dp
        idx = np.asarray(dataset.current_indices())
        perm = self.host_rng.permutation(idx)
        n = len(perm)
        steps = -(-n // target)
        pad = steps * target - n
        masks = np.ones(steps * target, np.float32)
        if pad:
            masks[n:] = 0.0
            # cyclic tiling covers splits smaller than one padded batch
            perm = np.resize(perm, steps * target)
        dev = self._get_device_cache(dataset)
        # same generation-token cache scheme as Trainer._device_epoch_scan
        # (id()-keying recycles after GC and would alias a stale closure)
        fns, key, entry = self._scan_cache_lookup(
            "_ppnet_epoch_fns", step, False)
        if entry is None:
            batch_sh = mesh_lib.batch_sharding(self.mesh)

            def shard(tree):
                return jax.tree_util.tree_map(
                    lambda v: jax.lax.with_sharding_constraint(
                        v, batch_sh
                    ),
                    tree,
                )

            @functools.partial(jax.jit, donate_argnums=(0,))
            def epoch_scan(state, data, target_arr, perm_d, masks_d):
                def body(s, xs):
                    ids, m = xs
                    batch = shard({
                        "data": jnp.take(data, ids, axis=0),
                        "target": jnp.take(target_arr, ids, axis=0),
                    })
                    s, loss, aux = step(s, batch, shard(m))
                    return s, (loss, aux)

                return jax.lax.scan(body, state, (perm_d, masks_d))

            entry = (step, self._scan_cache_store(
                fns, key, step, epoch_scan))
        state, (losses, auxs) = entry[1](
            state, dev["data"], dev["target"],
            jnp.asarray(perm.reshape(steps, target).astype(np.int32)),
            jnp.asarray(masks.reshape(steps, target)),
        )
        self._defer(
            self._record_ppnet_losses, losses, auxs, steps, fold_num,
            epoch_num,
        )
        return state

    def _record_ppnet_losses(self, losses, auxs, steps, fold_num,
                             epoch_num):
        losses = np.asarray(losses)
        auxs = [np.asarray(a) for a in auxs]
        for s in range(steps):
            self.results.update_meter("cls_loss", fold_num,
                                      float(auxs[0][s]))
            self.results.update_meter("clst_loss", fold_num,
                                      float(auxs[1][s]))
            self.results.update_meter("sep_loss", fold_num,
                                      float(auxs[2][s]))
            self.results.update_meter("l1_loss", fold_num,
                                      float(auxs[3][s]))
            self.results.update_meter(
                "loss_epoch_{}".format(epoch_num), fold_num,
                float(losses[s]),
            )
            self.results.update_loss(fold_num, float(losses[s]))

    def push_prototypes(self, state, model, dataset, pipeline, batch_size):
        """Project each prototype onto the nearest same-class latent patch
        over the train set and overwrite prototype_vectors
        (reference: deepards/models/protopnet1d/ppnet_push.py push loop).
        Also records push metadata for prototype visualization."""
        p = model.num_prototypes
        c = model.proto_channels
        ident = model.class_identity()  # (P, n_cls)

        two_dim = bool(
            getattr(getattr(self, "spec", None), "two_dim", False)
        )

        @jax.jit
        def batch_min(params, data, target, row_valid):
            piped = pipeline(data)
            # pad-proof BN statistics for the push pass too: pad rows may
            # not skew the latent patches real prototypes project onto
            bn_mask = (
                row_valid if (two_dim or piped.ndim != 4)
                else jnp.repeat(row_valid, piped.shape[1])
            )
            with bn_row_mask(bn_mask):
                feats, dists = model.apply(
                    {"params": params}, piped, None, True,
                    method=model.push_forward,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
            # 1D: feats (B,S,L',C) dists (B,S,L'',P);
            # 2D: feats (B,H',W',C) dists (B,H'*W',P) — flatten both to
            # (B, positions, .) uniformly
            b = dists.shape[0]
            np_ = dists.shape[-1]
            flat_d = dists.reshape(b, -1, np_)
            # mask windows whose class doesn't own the prototype
            cls_of_proto = jnp.asarray(ident.argmax(axis=1))  # (P,)
            label = target.argmax(axis=1)  # (B,)
            allowed = (
                label[:, None] == cls_of_proto[None, :]
            )  # (B, P)
            # padded rows (zero data + zero one-hot -> class 0) must never
            # win the per-batch argmin: mask them to inf BEFORE reducing,
            # so a real runner-up patch in the same batch still competes
            # (reference ppnet_push exact-min semantics)
            allowed = allowed & row_valid[:, None]
            flat_d = jnp.where(
                allowed[:, None, :], flat_d, jnp.inf
            )
            best = flat_d.min(axis=1)  # (B, P)
            best_pos = flat_d.argmin(axis=1)  # (B, P)
            min_over_batch = best.min(axis=0)  # (P,)
            best_row = best.argmin(axis=0)  # (P,)
            pos = best_pos[best_row, jnp.arange(np_)]  # (P,)
            # gather the winning latent patch per prototype (K=1)
            fb = feats.reshape(b, -1, feats.shape[-1])  # (B, S*L', C)
            patches = fb[best_row[:, None], pos[:, None], :][:, 0, :]
            return min_over_batch, patches, best_row, pos

        global_best = np.full(p, np.inf)
        global_patch = np.zeros((p, c), np.float32)
        push_info = [None] * p
        loader = EpochLoader(dataset, batch_size, shuffle=False)
        for batch in loader:
            idx = batch.pop("index")
            n_real = batch["data"].shape[0]
            batch, _ = _pad_batch(batch, batch_size)
            row_valid = jnp.arange(batch_size) < n_real
            dmin, patches, rows, pos = batch_min(
                state.params,
                jnp.asarray(batch["data"]),
                jnp.asarray(batch["target"]),
                row_valid,
            )
            dmin = np.asarray(dmin)
            rows_np = np.asarray(rows)
            better = dmin < global_best
            global_best = np.where(better, dmin, global_best)
            patches_np = np.asarray(patches)
            for j in np.nonzero(better)[0]:
                global_patch[j] = patches_np[j]
                push_info[j] = {
                    "window_index": int(idx[rows_np[j]]),
                    "flat_pos": int(np.asarray(pos)[j]),
                    "distance": float(dmin[j]),
                }
        proto_shape = np.asarray(
            state.params["prototype_vectors"]
        ).shape
        new_protos = jnp.asarray(
            global_patch.reshape(proto_shape), dtype=jnp.float32
        )
        params = dict(state.params)
        params["prototype_vectors"] = new_protos
        self.last_push_info = push_info
        return state.replace(params=type(state.params)(params) if not
                             isinstance(state.params, dict) else params)
