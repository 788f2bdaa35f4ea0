"""Fold/epoch training driver.

The reference's ``BaseTraining`` + mixin + per-network trainer-class stack
(reference: deepards/train_ards_detector.py:73-1405) collapses here into
one ``Trainer`` driven by declarative ``NetworkSpec``s: per fold it builds
a fresh model/optimizer state, runs jitted train/eval steps over fixed-
shape padded batches on the device mesh, collects per-window predictions
on the host, and feeds the patient-vote aggregation of
``deepards_tpu.eval.metrics``.
"""
import contextlib
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from deepards_tpu.data.dataset import ARDSRawDataset
from deepards_tpu.data.pipeline import BatchPipeline
from deepards_tpu.eval.metrics import DeepARDSResults
from deepards_tpu.models.registry import (
    get_base_network,
    get_network_spec,
    metadata_features_for,
)
from deepards_tpu.parallel import mesh as mesh_lib
from deepards_tpu.train import losses as loss_lib
from deepards_tpu.train.loader import EpochLoader, PrefetchLoader
from deepards_tpu.train.steps import (
    create_train_state,
    make_optimizer,
    make_train_step,
    split_state_rng,
)


def make_trainer(conf, **kwargs):
    """Trainer factory keyed off the network spec
    (the reference's network_map trainer-class dispatch,
    train_ards_detector.py:1410-1436)."""
    spec = get_network_spec(conf.network)
    if conf.get("parallel_folds") and spec.trainer == "standard":
        from deepards_tpu.train.parallel_folds import ParallelFoldTrainer

        return ParallelFoldTrainer(conf, **kwargs)
    if spec.trainer == "protopnet":
        from deepards_tpu.train.protopnet_trainer import ProtoPNetTrainer

        return ProtoPNetTrainer(conf, **kwargs)
    if spec.trainer == "siamese":
        from deepards_tpu.train.siamese_trainer import SiameseTrainer

        return SiameseTrainer(conf, **kwargs)
    if spec.kind == "detector":
        from deepards_tpu.train.detector_trainer import DetectorTrainer

        return DetectorTrainer(conf, **kwargs)
    if spec.super_batch:
        from deepards_tpu.train.nested_trainer import NestedTrainer

        return NestedTrainer(conf, **kwargs)
    return Trainer(conf, **kwargs)


def r2_score(y_true, y_pred):
    y_true = np.asarray(y_true, np.float64)
    y_pred = np.asarray(y_pred, np.float64)
    ss_res = ((y_true - y_pred) ** 2).sum()
    ss_tot = ((y_true - y_true.mean(axis=0)) ** 2).sum()
    return 1.0 - ss_res / ss_tot if ss_tot else 0.0


def _pad_batch(batch, batch_size):
    """Pad a gathered batch dict up to a fixed batch size; returns mask."""
    b = batch["data"].shape[0]
    pad = batch_size - b
    mask = np.ones(batch_size, dtype=np.float32)
    if pad:
        mask[b:] = 0.0
        batch = {
            k: np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
            )
            for k, v in batch.items()
        }
    return batch, mask


class Trainer:
    """Config-driven experiment runner (the train_and_test surface,
    reference: train_ards_detector.py:340-378)."""

    def __init__(self, conf, mesh=None, verbose=True):
        self.conf = conf
        self.verbose = verbose
        self.spec = get_network_spec(conf.network)
        self.mesh = mesh or mesh_lib.make_mesh(
            dp_devices=conf.get("dp_devices", -1) or -1
        )
        self.n_kfolds = (
            1 if conf.get("bootstrap") else (conf.get("kfolds") or 1)
        )
        self.start_time = str(int(time.time()))
        self.results = DeepARDSResults(
            self.start_time,
            conf.get("experiment_name"),
            results_dir=conf.get("results_dir") or "results",
            conf=dict(conf.conf),
        )
        self.rng = jax.random.PRNGKey(conf.get("seed", 42) or 42)
        self.host_rng = np.random.default_rng(conf.get("seed", 42) or 42)
        self.compute_dtype = {
            "bfloat16": jnp.bfloat16,
            "float32": None,
            None: None,
        }[conf.get("compute_dtype", "bfloat16")]

        if self.spec.kind == "regressor":
            self.loss_fn = loss_lib.mse
        elif self.spec.kind == "autoencoder":
            self.loss_fn = loss_lib.mse
        else:
            self.loss_fn = loss_lib.get_classification_loss(
                conf.get("loss_func", "bce"),
                valpha=conf.get("valpha", float("inf")) or float("inf"),
                conf_beta=conf.get("conf_beta", 1.0) or 1.0,
            )

    def _rng_impl(self):
        """Dropout-mask PRNG implementation: "rbg" (default) rides XLA's
        RngBitGenerator — ~3x faster mask draws than threefry on TPU;
        set rng_impl: threefry for cross-version key-stream stability."""
        impl = self.conf.get("rng_impl", "rbg") or "rbg"
        return None if impl == "threefry" else impl

    # -- datasets -------------------------------------------------------------

    def get_base_datasets(self):
        """(reference: train_ards_detector.py:189-315)"""
        conf = self.conf
        kfold_num = None if not conf.get("kfolds") else 0
        transforms = self._get_transforms()
        if conf.get("train_from_pickle"):
            train_dataset = ARDSRawDataset.from_pickle(
                conf.train_from_pickle,
                oversample_minority=bool(conf.get("oversample_minority")),
                train_patient_fraction=conf.get("train_pt_frac", 1.0),
                transforms=transforms,
                undersample_factor=conf.get("undersample_factor", -1),
                undersample_std_factor=conf.get("undersample_std_factor", 0.2),
                oversample_all_factor=conf.get("oversample_all_factor", 1.0),
                butter_low=conf.get("butter_low"),
                butter_high=conf.get("butter_high"),
                add_fft=bool(conf.get("with_fft")),
                only_fft=bool(conf.get("only_fft")),
                fft_real_only=bool(conf.get("fft_real_only")),
                random_kfold=bool(conf.get("random_kfold")),
                bootstrap=bool(conf.get("bootstrap")),
                post_hoc_downsampling=conf.get("post_hoc_downsampling"),
                fft_filtering_low=conf.get("fft_filtering_low"),
                fft_filtering_high=conf.get("fft_filtering_high"),
                seed=conf.get("seed", 42) or 42,
            )
        else:
            train_dataset = ARDSRawDataset(
                conf.data_path,
                conf.experiment_num,
                conf.cohort_file,
                conf.n_sub_batches,
                dataset_type=conf.dataset_type,
                to_pickle=conf.get("train_to_pickle"),
                kfold_num=kfold_num,
                total_kfolds=conf.get("kfolds"),
                unpadded_downsample_factor=conf.get("downsample_factor", 4.0),
                oversample_minority=bool(conf.get("oversample_minority")),
                train_patient_fraction=conf.get("train_pt_frac", 1.0),
                transforms=transforms,
                holdout_set_type=conf.get("holdout_set_type", "main"),
                drop_if_under_r2=conf.get("drop_if_under_r2", 0) or 0,
                drop_i_lim=bool(conf.get("drop_i_lim")),
                drop_e_lim=bool(conf.get("drop_e_lim")),
                truncate_e_lim=conf.get("truncate_e_lim"),
                undersample_factor=conf.get("undersample_factor", -1),
                undersample_std_factor=conf.get("undersample_std_factor", 0.2),
                oversample_all_factor=conf.get("oversample_all_factor", 1.0),
                butter_low=conf.get("butter_low"),
                butter_high=conf.get("butter_high"),
                add_fft=bool(conf.get("with_fft")),
                only_fft=bool(conf.get("only_fft")),
                fft_real_only=bool(conf.get("fft_real_only")),
                random_kfold=bool(conf.get("random_kfold")),
                bootstrap=bool(conf.get("bootstrap")),
                post_hoc_downsampling=conf.get("post_hoc_downsampling"),
                fft_filtering_low=conf.get("fft_filtering_low"),
                fft_filtering_high=conf.get("fft_filtering_high"),
                seed=conf.get("seed", 42) or 42,
            )
        self.n_sub_batches = train_dataset.n_sub_batches

        if conf.get("kfolds"):
            test_dataset = ARDSRawDataset.make_test_dataset_if_kfold(
                train_dataset
            )
        elif conf.get("test_from_pickle"):
            test_dataset = ARDSRawDataset.from_pickle(conf.test_from_pickle)
            test_dataset.train = False
            test_dataset.scaling_factors = train_dataset.scaling_factors
        else:
            test_dataset = ARDSRawDataset(
                conf.data_path,
                conf.experiment_num,
                conf.cohort_file,
                conf.n_sub_batches,
                dataset_type=conf.dataset_type,
                to_pickle=conf.get("test_to_pickle"),
                train=False,
                unpadded_downsample_factor=conf.get("downsample_factor", 4.0),
                holdout_set_type=conf.get("holdout_set_type", "main"),
                final_validation_set=bool(conf.get("final_validation")),
                drop_i_lim=bool(conf.get("drop_i_lim")),
                drop_e_lim=bool(conf.get("drop_e_lim")),
                truncate_e_lim=conf.get("truncate_e_lim"),
                butter_low=conf.get("butter_low"),
                butter_high=conf.get("butter_high"),
                add_fft=bool(conf.get("with_fft")),
                only_fft=bool(conf.get("only_fft")),
                fft_real_only=bool(conf.get("fft_real_only")),
                post_hoc_downsampling=conf.get("post_hoc_downsampling"),
                fft_filtering_low=conf.get("fft_filtering_low"),
                fft_filtering_high=conf.get("fft_filtering_high"),
                seed=conf.get("seed", 42) or 42,
            )
            test_dataset.scaling_factors = train_dataset.scaling_factors
        if self.spec.two_dim:
            # wrap into image datasets (reference:
            # train_ards_detector.py:309-313); base_network gets the _2d
            # suffix automatically (reference :111-116)
            from deepards_tpu.data.img_dataset import ImgARDSDataset

            base = self.conf.get("base_network", "densenet18")
            if self.spec.name.endswith("_2x1d"):
                if "2x1d" not in base:
                    self.conf.conf["base_network"] = base + "_2x1d"
            elif "_2d" not in base:
                self.conf.conf["base_network"] = base + "_2d"
            train_dataset = ImgARDSDataset(
                train_dataset,
                extra_transforms=self.conf.get("two_dim_transforms") or [],
                add_fft=bool(self.conf.get("with_fft")),
                fft_only=bool(self.conf.get("only_fft")),
                fft_real_only=bool(self.conf.get("fft_real_only")),
                bbox=self.spec.kind == "detector",
                same_patho_mix=bool(self.conf.get("row_mix")),
                butter_filter=self.conf.get("butter_freq"),
                seed=self.conf.get("seed", 42) or 42,
            )
            test_dataset = ImgARDSDataset(
                test_dataset,
                bbox=self.spec.kind == "detector",
                seed=(self.conf.get("seed", 42) or 42) + 1,
            )
            test_dataset.scaling_factors = train_dataset.scaling_factors
        return train_dataset, test_dataset

    def _get_transforms(self):
        """Augmentation composition
        (reference: train_ards_detector.py:175-187); wired when
        augmentations land."""
        names = self.conf.get("transforms")
        if not names:
            return None
        from deepards_tpu.data.augment import build_transforms

        return build_transforms(
            names,
            self.conf.get("transform_probability", 0.2),
            use_i=bool(self.conf.get("use_i")),
        )

    # -- model ----------------------------------------------------------------

    def build_model(self):
        base = get_base_network(self.conf)
        meta_features = metadata_features_for(self.conf)
        return self.spec.build(
            self.conf, base, self.n_sub_batches, meta_features
        )

    # -- main loop ------------------------------------------------------------

    def train_and_test(self):
        conf = self.conf
        self.resume_meta = None
        if conf.get("load_checkpoint"):
            from deepards_tpu.train import checkpoint

            self.resume_meta = checkpoint.load_resume_meta(
                conf.load_checkpoint
            )
        train_dataset, test_dataset = self.get_base_datasets()
        tx = make_optimizer(
            optimizer=conf.get("optimizer", "sgd"),
            learning_rate=conf.get("learning_rate", 0.001),
            weight_decay=conf.get("weight_decay", 0.0001),
            clip_grad=bool(conf.get("clip_grad")),
            clip_val=conf.get("clip_val", 0.01),
        )
        for fold_num in range(self.n_kfolds):
            if conf.get("only_fold") is not None and fold_num != conf.only_fold:
                continue
            if self.resume_meta and fold_num < self.resume_meta["fold"]:
                continue  # fold already completed before the checkpoint
            if conf.get("kfolds") or conf.get("bootstrap"):
                if self.verbose:
                    print("--- Run Fold {} ---".format(fold_num + 1))
                train_dataset.set_kfold_indexes_for_fold(fold_num)
                test_dataset.set_kfold_indexes_for_fold(fold_num)
            try:
                # fold scaling rides along into checkpoint sidecars so
                # serving can normalize without the dataset pickle
                self._current_scaling = \
                    train_dataset.scaling_for_current_fold()
            except (AttributeError, KeyError):
                self._current_scaling = None
            self.run_fold(
                fold_num, train_dataset, test_dataset, tx
            )
        self.perform_post_modeling_actions()
        self.perform_plotting(test_dataset)
        return self.results

    def perform_plotting(self, test_dataset):
        """Flag-gated DTW/disease-evolution plotting
        (reference: train_ards_detector.py:496-511)."""
        conf = self.conf
        wants_dtw = (
            conf.get("plot_dtw_with_disease")
            or conf.get("perform_dtw_preprocessing")
        )
        wants_plots = (
            conf.get("plot_untiled_disease_evol")
            or conf.get("plot_tiled_disease_evol")
            or conf.get("plot_dtw_with_disease")
        )
        if not (wants_dtw or wants_plots):
            return
        from deepards_tpu.eval import plots

        dtw_frames = None
        if wants_dtw:
            dtw_frames = plots.perform_dtw_preprocessing(
                self.results, test_dataset, "dtw_cache"
            )
        if conf.get("plot_tiled_disease_evol"):
            plots.plot_tiled_disease_evol(
                self.results, test_dataset,
                out_path="prediction_plots/tiled.png",
                dtw_frames=dtw_frames,
            )
        elif wants_plots:
            plots.perform_hourly_patient_plot(
                self.results, dtw_frames=dtw_frames
            )

    def run_fold(self, fold_num, train_dataset, test_dataset, tx):
        conf = self.conf
        # observability: window counts of the fold just run (tests use
        # these to assert a deliberately non-divisible split padded)
        self.last_train_count = len(train_dataset.current_indices())
        self.last_test_count = len(test_dataset.current_indices())
        model = self.build_model()
        if self.spec.two_dim:
            pipeline = None  # ImgARDSDataset.gather pre-normalizes
        else:
            pipeline = BatchPipeline(train_dataset)
        self.rng, init_rng = jax.random.split(self.rng)
        sample = train_dataset.gather(train_dataset.current_indices()[:2])
        if conf.get("load_checkpoint"):
            # resume/inference from a saved checkpoint — FULL state
            # (params + optimizer + rng + step), true resume
            # (reference: train_ards_detector.py:467-469 reloads only the
            # module; SURVEY §5.4 calls out resume as an improvement)
            from deepards_tpu.train import checkpoint

            state = create_train_state(
                model, tx, sample, init_rng,
                has_metadata=self.spec.uses_metadata,
                rng_impl=self._rng_impl(),
            )
            restored = checkpoint.restore(conf.load_checkpoint, state)
            state = state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                rng=restored["rng"],
                step=restored["step"],
            )
        else:
            state = create_train_state(
                model, tx, sample, init_rng,
                has_metadata=self.spec.uses_metadata,
                rng_impl=self._rng_impl(),
            )
        if conf.get("load_base_network"):
            # splice a pretrained backbone into the fresh head
            # (reference: train_ards_detector.py:383-388)
            from deepards_tpu.train import checkpoint

            pre = checkpoint.load_params(conf.load_base_network)
            params = dict(state.params)
            for key in params:
                if key in pre and key.startswith(
                    ("DenseNet", "ResNet", "VGG", "SENet", "UNet",
                     "Autoencoder", "breath_block")
                ):
                    params[key] = pre[key]
            state = state.replace(params=params)
        if conf.get("freeze_base_network"):
            from deepards_tpu.train.steps import freeze_backbone

            tx = freeze_backbone(tx, state.params)
            state = state.replace(opt_state=tx.init(state.params))
        state = mesh_lib.replicate_tree(self.mesh, state)
        train_step, eval_step, train_scan, eval_scan = make_train_step(
            model,
            tx,
            self.loss_fn,
            target_mode=self.spec.target_mode,
            transform=pipeline,
            compute_dtype=self.compute_dtype,
            eval_dropout_active=not self.spec.eval_dropout_off,
            rng_impl=self._rng_impl(),
            # 2D image batches are (B, C, H, W): backbone rows == B
            bn_mask_rows="batch" if self.spec.two_dim else "windows",
        )
        if self.spec.stateful_lstm and conf.get("unshuffled"):
            return self._run_stateful_fold(
                state, model, pipeline, tx, train_dataset, test_dataset,
                fold_num,
            )
        epochs = conf.get("epochs", 10)
        start_epoch = 1
        resume = getattr(self, "resume_meta", None)
        if resume and resume["fold"] == fold_num:
            start_epoch = resume["epoch"]
        # Fold-level dispatch pipelining (see deferred_fetch): the epoch
        # paths queue host-side result recording instead of blocking, so
        # every epoch's train+eval scans enqueue back-to-back and the
        # per-epoch dispatch+fetch round trip (~30ms over the chip
        # tunnel) overlaps device compute.
        with self.deferred_fetch():
            for epoch_num in range(start_epoch, epochs + 1):
                epoch_resume = (
                    resume
                    if resume and resume["fold"] == fold_num
                    and resume["epoch"] == epoch_num
                    else None
                )
                if not conf.get("no_train"):
                    state = self.run_train_epoch(
                        state, train_step, train_dataset, fold_num,
                        epoch_num, train_scan=train_scan,
                        resume=epoch_resume,
                    )
                if conf.get("reshuffle_oversample_per_epoch"):
                    train_dataset.set_oversampling_indices()
                if not conf.get("no_test_after_epochs") or epoch_num == epochs:
                    state = self.run_test_epoch(
                        state, eval_step, test_dataset, fold_num, epoch_num
                    )
                if conf.get("save_model_per_epoch") and conf.get("save_model"):
                    self.save_checkpoint(state, fold_num, epoch_num)
        if conf.get("save_model"):
            self.save_checkpoint(state, fold_num, None)
        if resume and resume["fold"] == fold_num:
            self.resume_meta = None  # later folds run from scratch
        self.final_state = state
        return state

    # -- device-resident cache epochs -----------------------------------------

    _DEVICE_CACHE_MAX_BYTES = 2 << 30  # 2 GiB of window cache fits HBM

    def _device_cache_eligible(self, dataset, resume):
        """The whole-epoch-on-device fast path: the dense window cache is
        uploaded once and every batch is gathered ON DEVICE inside one
        scanned program — the host pipeline (gather/device_put per batch)
        drops out entirely.  Eligible when nothing needs the host in the
        loop: no augmentation transforms, no mid-epoch checkpoints or
        resume, no stop-on-loss breaker, standard (non-2D) datasets."""
        conf = self.conf
        flag = conf.get("device_cache")
        if flag is False:
            return False
        if getattr(self.spec, "two_dim", False):
            return False
        if callable(getattr(dataset, "transforms", None)):
            return False
        if resume is not None or conf.get("checkpoint_every_n_steps"):
            return False
        if conf.get("stop_on_loss") or conf.get("debug"):
            return False
        cache = getattr(dataset, "cache", None)
        if cache is None:
            return False
        if flag is not True and cache.data.nbytes > self._DEVICE_CACHE_MAX_BYTES:
            return False
        return True

    _DEVICE_CACHE_MAX_ENTRIES = 4

    def _get_device_cache(self, dataset):
        from collections import OrderedDict

        caches = getattr(self, "_dev_caches", None)
        if caches is None:
            caches = self._dev_caches = OrderedDict()
        # key on the cache's monotonic generation token: kfold train/test
        # views share one cache object and must not be uploaded twice,
        # while id()-style keys would recycle after GC and alias a stale
        # upload when a long-lived trainer swaps datasets
        key = dataset.cache.token
        if key not in caches:
            rep = mesh_lib.replicated(self.mesh)
            dev = {
                "data": jax.device_put(dataset.cache.data, rep),
                "target": jax.device_put(dataset.cache.target, rep),
            }
            if dataset.cache.meta is not None:
                dev["metadata"] = jax.device_put(dataset.cache.meta, rep)
            caches[key] = dev
            while len(caches) > self._DEVICE_CACHE_MAX_ENTRIES:
                caches.popitem(last=False)  # evict oldest upload from HBM
        else:
            caches.move_to_end(key)
        return caches[key]

    _SCAN_CACHE_MAX_ENTRIES = 4

    def _scan_cache_lookup(self, attr, step_fn, with_meta):
        """Compiled-closure cache keyed on the step function's monotonic
        ``scan_token`` (stamped by make_train_step) — the same
        generation-token scheme as the device data caches, replacing the
        GC-recyclable id() keys.  Entries hold a strong reference to the
        step function and verify identity on hit, so a recycled object
        can never alias a stale compiled closure."""
        from collections import OrderedDict

        fns = getattr(self, attr, None)
        if fns is None:
            fns = OrderedDict()
            setattr(self, attr, fns)
        token = getattr(step_fn, "scan_token", None)
        if token is None:
            # steps built outside make_train_step (e.g. the ProtoPNet
            # eval step) arrive untokened; stamp one so per-epoch
            # lookups with the same live object hit instead of
            # recompiling the scan every epoch
            from deepards_tpu.train.steps import next_step_token

            token = next_step_token()
            try:
                step_fn.scan_token = token
            except AttributeError:
                token = None  # unstampable callable: never cached
        key = (token, with_meta)
        entry = fns.get(key)
        if entry is not None and (
            key[0] is None or entry[0] is not step_fn
        ):
            entry = None  # untokened or collided: rebuild
        if entry is not None:
            fns.move_to_end(key)
        return fns, key, entry

    def _scan_cache_store(self, fns, key, step_fn, compiled):
        fns[key] = (step_fn, compiled)
        while len(fns) > self._SCAN_CACHE_MAX_ENTRIES:
            fns.popitem(last=False)
        return compiled

    def _device_epoch_scan(self, train_step, with_meta):
        fns, key, entry = self._scan_cache_lookup(
            "_dev_epoch_fns", train_step, with_meta)
        if entry is None:
            import functools

            batch_sh = mesh_lib.batch_sharding(self.mesh)

            def shard(tree):
                return jax.tree_util.tree_map(
                    lambda v: jax.lax.with_sharding_constraint(v, batch_sh),
                    tree,
                )

            if with_meta:
                @functools.partial(jax.jit, donate_argnums=(0,))
                def epoch_scan(state, data, target, meta, perm, masks):
                    def body(s, xs):
                        ids, m = xs
                        batch = shard({
                            "data": jnp.take(data, ids, axis=0),
                            "target": jnp.take(target, ids, axis=0),
                            "metadata": jnp.take(meta, ids, axis=0),
                        })
                        s, loss = train_step(s, batch, shard(m))
                        return s, loss

                    return jax.lax.scan(body, state, (perm, masks))
            else:
                @functools.partial(jax.jit, donate_argnums=(0,))
                def epoch_scan(state, data, target, perm, masks):
                    def body(s, xs):
                        ids, m = xs
                        batch = shard({
                            "data": jnp.take(data, ids, axis=0),
                            "target": jnp.take(target, ids, axis=0),
                        })
                        s, loss = train_step(s, batch, shard(m))
                        return s, loss

                    return jax.lax.scan(body, state, (perm, masks))
            return self._scan_cache_store(fns, key, train_step, epoch_scan)
        return entry[1]

    def _run_train_epoch_device_cache(self, state, train_step, dataset,
                                      fold_num, epoch_num):
        conf = self.conf
        batch_size = conf.get("batch_size", 16)
        dp = self.mesh.shape[mesh_lib.DATA_AXIS]
        target = -(-batch_size // dp) * dp
        idx = np.asarray(dataset.current_indices())
        perm = (
            idx if conf.get("unshuffled")
            else self.host_rng.permutation(idx)
        )
        n = len(perm)
        steps = -(-n // target)
        pad = steps * target - n
        masks = np.ones(steps * target, np.float32)
        if pad:
            masks[n:] = 0.0
            # np.resize tiles cyclically, so this also covers pad > n
            # (split smaller than one padded batch); pad rows are masked
            perm = np.resize(perm, steps * target)
        dev = self._get_device_cache(dataset)
        if self.verbose:
            print("train instances: {} (device-cache epoch)".format(steps))
        rep = mesh_lib.replicated(self.mesh)
        perm_d = jax.device_put(
            perm.reshape(steps, target).astype(np.int32), rep)
        masks_d = jax.device_put(masks.reshape(steps, target), rep)
        scan = self._device_epoch_scan(train_step, "metadata" in dev)
        if "metadata" in dev:
            state, losses = scan(
                state, dev["data"], dev["target"], dev["metadata"],
                perm_d, masks_d,
            )
        else:
            state, losses = scan(
                state, dev["data"], dev["target"], perm_d, masks_d
            )
        self._defer(self._record_train_losses, losses, fold_num, epoch_num)
        return state

    # -- deferred host materialization -----------------------------------

    _deferred = None
    # backstop so a pathologically long fold cannot pin unbounded device
    # buffers: past this many queued recordings the queue flushes early
    # (the flush fetches mostly-completed buffers; dispatches already
    # enqueued keep the device busy)
    _DEFER_MAX_PENDING = 64

    @contextlib.contextmanager
    def deferred_fetch(self):
        """Fold-level dispatch pipelining: while armed, the epoch paths
        queue host-side result recording (loss fetch, prediction gather,
        vote aggregation) via _defer instead of blocking on it, so every
        epoch's scans enqueue back-to-back and the per-epoch
        dispatch+fetch round trip overlaps device compute.  Recorded
        results are bit-identical — only host materialization moves to
        the flush.  ``defer_fetch: false`` disables arming (record
        inline, e.g. to watch metrics live).  On an exception the queue
        is flushed best-effort so already-computed metrics survive for
        post-mortems, matching what the blocking path would have
        recorded."""
        self._deferred = [] if self.conf.get("defer_fetch", True) else None
        try:
            yield
            self._flush_deferred()
        finally:
            try:
                # no-op on the normal path (queue already drained); on
                # an exception this salvages every recording whose
                # dispatch completed, without masking the original error
                self._flush_deferred(best_effort=True)
            finally:
                self._deferred = None

    def _defer(self, fn, *args):
        """Queue host-side result recording when the fold-level pipeline
        is armed (deferred_fetch), else record inline."""
        if self._deferred is not None:
            self._deferred.append(lambda: fn(*args))
            if len(self._deferred) >= self._DEFER_MAX_PENDING:
                self._flush_deferred(rearm=True)
        else:
            fn(*args)

    def _flush_deferred(self, best_effort=False, rearm=False):
        work = self._deferred
        if work is None:
            work = []
        self._deferred = [] if rearm else self._deferred
        while work:
            fn = work.pop(0)
            if best_effort:
                try:
                    fn()
                except Exception:
                    pass
            else:
                try:
                    fn()
                except Exception:
                    # salvage the recordings queued after the failing
                    # one (their dispatches already completed) so a
                    # cap-triggered early flush keeps the same
                    # metrics-survive contract as the exit flush, then
                    # surface the original error
                    while work:
                        try:
                            work.pop(0)()
                        except Exception:
                            pass
                    raise

    def _record_step_losses(self, losses, fold_num):
        """Shared deferred recorder for host-loop epochs (detector,
        nested, siamese): one batched transfer for the epoch's step
        losses instead of a device round trip per scalar."""
        for l in jax.device_get(losses):
            self.results.update_loss(fold_num, float(l))

    def _record_train_losses(self, losses, fold_num, epoch_num):
        for l in np.asarray(losses):
            self.results.update_meter(
                "loss_epoch_{}".format(epoch_num), fold_num, float(l)
            )
            self.results.update_loss(fold_num, float(l))

    def _run_stateful_fold(self, state, model, pipeline, tx, train_dataset,
                           test_dataset, fold_num):
        """cnn_lstm unshuffled mode: batch_size=1 patient-ordered batches
        with the LSTM hidden state carried (detached) across batches of
        the same patient (reference: train_ards_detector.py:826-883).
        """
        import functools

        import optax

        from deepards_tpu.train.steps import _maybe_cast

        conf = self.conf
        loss_fn = self.loss_fn
        compute_dtype = self.compute_dtype

        def forward(params, data, metadata, carry, dropout_rng,
                    deterministic):
            data = pipeline(data)
            data = _maybe_cast(data, compute_dtype)
            params_c = _maybe_cast(params, compute_dtype)
            logits, new_carry = model.apply(
                {"params": params_c}, data, metadata, deterministic,
                carry, rngs={"dropout": dropout_rng},
            )
            return logits.astype(jnp.float32), new_carry

        # eval must honor the spec's dropout-off contract (the reference's
        # LSTM trainer calls model.eval() before testing,
        # train_ards_detector.py:880-881); training always draws masks
        eval_deterministic = bool(self.spec.eval_dropout_off)

        def loss_wrap(params, batch, carry, dropout_rng,
                      deterministic=False):
            logits, new_carry = forward(
                params, batch["data"], batch.get("metadata"), carry,
                dropout_rng, deterministic,
            )
            target = jnp.repeat(
                batch["target"][:, None, :], logits.shape[1], axis=1
            )
            return loss_fn(logits, target), (logits, new_carry)

        rng_impl = self._rng_impl()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, carry):
            rng, drng = split_state_rng(state.rng, rng_impl)
            (loss, (_, new_carry)), grads = jax.value_and_grad(
                loss_wrap, has_aux=True
            )(state.params, batch, carry, drng)
            grads = _maybe_cast(grads, jnp.float32)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            # detach: carry is returned as plain values, no grad linkage
            return (
                state.replace(params=params, opt_state=opt_state, rng=rng,
                              step=state.step + 1),
                loss,
                new_carry,
            )

        @jax.jit
        def eval_step(state, batch, carry):
            rng, drng = split_state_rng(state.rng, rng_impl)
            loss, (logits, new_carry) = loss_wrap(
                state.params, batch, carry, drng,
                deterministic=eval_deterministic,
            )
            return state.replace(rng=rng), loss, logits, new_carry

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_epoch_scan(state, dev, ids, resets, carry0):
            def body(c, xs):
                s, carry = c
                i, reset = xs
                batch = {
                    k: jnp.take(v, i[None], axis=0) for k, v in dev.items()
                }
                carry = jax.tree_util.tree_map(
                    lambda z: jnp.where(reset, jnp.zeros_like(z), z), carry
                )
                s, loss, carry = train_step(s, batch, carry)
                return (s, carry), loss

            (state, _), losses = jax.lax.scan(
                body, (state, carry0), (ids, resets)
            )
            return state, losses

        @jax.jit
        def eval_epoch_scan(state, dev, ids, resets, carry0):
            def body(c, xs):
                s, carry = c
                i, reset = xs
                batch = {
                    k: jnp.take(v, i[None], axis=0) for k, v in dev.items()
                }
                carry = jax.tree_util.tree_map(
                    lambda z: jnp.where(reset, jnp.zeros_like(z), z), carry
                )
                s, loss, logits, carry = eval_step(s, batch, carry)
                return (s, carry), (loss, logits)

            (state, _), out = jax.lax.scan(
                body, (state, carry0), (ids, resets)
            )
            return state, out

        def run_epoch_device(state, dataset, train, fold_num, epoch_num):
            """Stateful epoch in ONE dispatch: the patient-ordered window
            sequence scans on device; a reset flag zeroes the LSTM carry
            at patient boundaries (B=1 host stepping otherwise pays a
            full dispatch round trip per window)."""
            gt = dataset.get_ground_truth_df()
            order = gt.index.to_numpy()
            pts = gt.loc[order].patient.to_numpy()
            resets = np.ones(len(order), bool)
            resets[1:] = pts[1:] != pts[:-1]
            dev = self._get_device_cache(dataset)
            sample = dataset.gather(order[:1])
            carry0 = self._zero_carry(model, sample)
            rep = mesh_lib.replicated(self.mesh)
            ids = jax.device_put(order.astype(np.int32), rep)
            resets_d = jax.device_put(resets, rep)
            if train:
                state, losses = train_epoch_scan(
                    state, dev, ids, resets_d, carry0
                )

                def record_train(losses=losses):
                    for l in np.asarray(losses):
                        self.results.update_loss(fold_num, float(l))

                self._defer(record_train)
                return state
            state, (losses, logits) = eval_epoch_scan(
                state, dev, ids, resets_d, carry0
            )

            def record_eval(losses=losses, logits=logits, order=order,
                            epoch_num=epoch_num):
                for l in np.asarray(losses):
                    self.results.update_meter(
                        "test_loss", fold_num, float(l))
                out = mesh_lib.fetch_global(logits)  # (n, 1, S, 2)
                preds = out.argmax(axis=-1).reshape(-1).tolist()
                pred_idx = np.repeat(order, out.shape[2]).tolist()
                self.record_classifier_results(
                    preds, pred_idx, dataset, fold_num, epoch_num
                )

            self._defer(record_eval)
            return state

        def run_epoch(state, dataset, train, fold_num, epoch_num):
            if self._device_cache_eligible(dataset, None):
                return run_epoch_device(
                    state, dataset, train, fold_num, epoch_num
                )
            gt = dataset.get_ground_truth_df()
            order = gt.index.to_numpy()  # patient-ordered
            last_pt = None
            carry = None
            preds, pred_idx = [], []
            for idx in order:
                pt = gt.loc[idx].patient
                batch = dataset.gather([idx])
                if pt != last_pt:
                    carry = self._zero_carry(model, batch)
                last_pt = pt
                data = {
                    "data": jnp.asarray(batch["data"]),
                    "target": jnp.asarray(batch["target"]),
                }
                if "metadata" in batch:
                    data["metadata"] = jnp.asarray(batch["metadata"])
                if train:
                    state, loss, carry = train_step(state, data, carry)
                    self.results.update_loss(fold_num, float(loss))
                else:
                    state, loss, logits, carry = eval_step(
                        state, data, carry
                    )
                    self.results.update_meter(
                        "test_loss", fold_num, float(loss)
                    )
                    out = mesh_lib.fetch_global(logits)
                    preds.extend(out.argmax(axis=-1).reshape(-1).tolist())
                    pred_idx.extend([int(idx)] * out.shape[1])
                if conf.get("debug"):
                    break
            if not train and preds:
                self.record_classifier_results(
                    preds, pred_idx, dataset, fold_num, epoch_num
                )
            return state

        # checkpoint/test-gating parity with the standard path: the
        # reference checkpoints EVERY network type per epoch/at end
        # (reference: train_ards_detector.py:355-374)
        epochs = conf.get("epochs", 10)
        start_epoch = 1
        resume = getattr(self, "resume_meta", None)
        if resume and resume["fold"] == fold_num:
            start_epoch = resume["epoch"]
        # fold-level dispatch pipelining (see deferred_fetch)
        with self.deferred_fetch():
            for epoch_num in range(start_epoch, epochs + 1):
                if not conf.get("no_train"):
                    state = run_epoch(state, train_dataset, True, fold_num,
                                      epoch_num)
                if not conf.get("no_test_after_epochs") or epoch_num == epochs:
                    state = run_epoch(state, test_dataset, False, fold_num,
                                      epoch_num)
                if conf.get("save_model_per_epoch") and conf.get("save_model"):
                    self.save_checkpoint(state, fold_num, epoch_num)
        if conf.get("save_model"):
            self.save_checkpoint(state, fold_num, None)
        if resume and resume["fold"] == fold_num:
            self.resume_meta = None
        self.final_state = state
        return state

    def _zero_carry(self, model, batch):
        """Fresh zero LSTM carry sized to the model's hidden width."""
        hidden = model.lstm_hidden_units + (
            model.metadata_features if not model.bm_to_linear else 0
        )
        b = batch["data"].shape[0]
        zeros = jnp.zeros((b, hidden), jnp.float32)
        return (zeros, zeros)

    def _prepare_batch(self, batch, batch_size):
        """Pad to a dp-divisible fixed size, shard, and build the mask."""
        dp = self.mesh.shape[mesh_lib.DATA_AXIS]
        target = -(-batch_size // dp) * dp
        batch, mask = _pad_batch(batch, target)
        batch, _ = mesh_lib.shard_batch(self.mesh, batch)
        mask = jax.device_put(mask, mesh_lib.batch_sharding(self.mesh))
        return batch, mask

    def run_train_epoch(self, state, train_step, dataset, fold_num,
                        epoch_num, train_scan=None, resume=None):
        conf = self.conf
        batch_size = conf.get("batch_size", 16)
        fused = conf.get("fused_steps") or 1
        ckpt_every = conf.get("checkpoint_every_n_steps") or 0
        start_batch = 0
        perm = None
        if resume is not None:
            perm = resume["perm"]
            start_batch = resume["next_batch"]
        elif ckpt_every:
            # pin the epoch permutation so a step checkpoint can replay it
            idx = np.asarray(dataset.current_indices())
            perm = (
                self.host_rng.permutation(idx)
                if not conf.get("unshuffled") else idx
            )
        if self._device_cache_eligible(dataset, resume):
            return self._run_train_epoch_device_cache(
                state, train_step, dataset, fold_num, epoch_num
            )
        if fused > 1 and train_scan is not None:
            return self._run_train_epoch_fused(
                state, train_step, train_scan, dataset, fold_num,
                epoch_num, fused, ckpt_every=ckpt_every, perm=perm,
                start_batch=start_batch,
            )
        loader = EpochLoader(
            dataset,
            batch_size,
            shuffle=not conf.get("unshuffled"),
            rng=self.host_rng,
            indices=perm,
            start_batch=start_batch,
        )
        if self.verbose:
            print("train instances: {}".format(len(loader)))
        # 1D augmentation hook; 2D datasets apply their own transform list
        # inside gather()
        transforms = getattr(dataset, "transforms", None)
        if not callable(transforms):
            transforms = None

        def prepare(batch):
            if transforms is not None:
                from deepards_tpu.data.augment import apply_to_batch

                batch["data"] = apply_to_batch(
                    transforms, batch["data"], self.host_rng
                )
            return self._prepare_batch(batch, batch_size)

        def record(loss):
            loss = float(loss)
            self.results.update_meter(
                "loss_epoch_{}".format(epoch_num), fold_num, loss
            )
            self.results.update_loss(fold_num, loss)
            if (
                conf.get("stop_on_loss")
                and loss > conf.get("stop_thresh", 1.5)
                and epoch_num > conf.get("stop_after_epoch", 1)
            ):
                print(
                    "stop on loss: loss={:.4f} exceeded stop_thresh".format(
                        loss
                    )
                )
                return True
            return False

        # gather/augment/device_put of batch N+1 overlaps step N on device
        # (the DataLoader(num_workers) equivalent); the loss of step N is
        # fetched AFTER step N+1 is dispatched (lag-1), so the device never
        # waits on a host round trip — the stop-on-loss breaker therefore
        # fires one step late, which the reference's semantics tolerate
        # (it is a runaway-loss failure detector, not a precise stop)
        prev_loss = None
        for i, (batch, mask) in enumerate(
            PrefetchLoader(loader, map_fn=prepare)
        ):
            state, loss = train_step(state, batch, mask)
            if prev_loss is not None and record(prev_loss):
                prev_loss = None
                break
            prev_loss = loss
            if ckpt_every and (start_batch + i + 1) % ckpt_every == 0:
                self.save_checkpoint(
                    state, fold_num, epoch_num,
                    step=start_batch + i + 1,
                    resume_meta={
                        "fold": fold_num,
                        "epoch": epoch_num,
                        "next_batch": start_batch + i + 1,
                        "perm": perm,
                    },
                )
            if conf.get("debug"):
                break
        if prev_loss is not None:
            record(prev_loss)
        return state

    def _run_train_epoch_fused(self, state, train_step, train_scan,
                               dataset, fold_num, epoch_num, fused,
                               ckpt_every=0, perm=None, start_batch=0):
        """Run the epoch in chunks of ``fused`` steps per device dispatch
        (lax.scan over stacked batches).  Remainder batches run single-step.
        Enable with fused_steps: N in the config.  Step checkpoints land
        at flush (fused-chunk) boundaries."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        conf = self.conf
        batch_size = conf.get("batch_size", 16)
        dp = self.mesh.shape[mesh_lib.DATA_AXIS]
        target = -(-batch_size // dp) * dp
        loader = EpochLoader(
            dataset, batch_size,
            shuffle=not conf.get("unshuffled"), rng=self.host_rng,
            indices=perm, start_batch=start_batch,
        )
        if self.verbose:
            print("train instances: {} (fused x{})".format(
                len(loader), fused))
        stacked_sharding = NamedSharding(
            self.mesh, P(None, mesh_lib.DATA_AXIS)
        )
        pend_b, pend_m = [], []
        pending_losses = []

        def flush(state, pend_b, pend_m):
            stacked = {
                k: np.stack([b[k] for b in pend_b])
                for k in pend_b[0]
                if k != "index"
            }
            masks = np.stack(pend_m)
            stacked = {
                k: jax.device_put(v, stacked_sharding)
                for k, v in stacked.items()
            }
            masks = jax.device_put(masks, stacked_sharding)
            state, losses = train_scan(state, stacked, masks)
            # defer materialization: blocking on the loss here would
            # serialize host batch-stacking with device compute
            pending_losses.append(losses)
            return state

        # gather of the next chunk overlaps the in-flight fused scan
        batches_done = start_batch
        last_ckpt = start_batch
        for batch in PrefetchLoader(loader):
            batch.pop("index", None)
            batch, mask = _pad_batch(batch, target)
            pend_b.append(batch)
            pend_m.append(mask)
            if len(pend_b) == fused:
                state = flush(state, pend_b, pend_m)
                pend_b, pend_m = [], []
                batches_done += fused
                if ckpt_every and batches_done - last_ckpt >= ckpt_every:
                    self.save_checkpoint(
                        state, fold_num, epoch_num, step=batches_done,
                        resume_meta={
                            "fold": fold_num, "epoch": epoch_num,
                            "next_batch": batches_done, "perm": perm,
                        },
                    )
                    last_ckpt = batches_done
            if conf.get("debug"):
                break
        # remainder: single steps
        for batch, mask in zip(pend_b, pend_m):
            sb, _ = mesh_lib.shard_batch(self.mesh, batch)
            m = jax.device_put(mask, mesh_lib.batch_sharding(self.mesh))
            state, loss = train_step(state, sb, m)
            pending_losses.append(loss[None])
        for losses in pending_losses:
            for l in np.asarray(losses):
                self.results.update_meter(
                    "loss_epoch_{}".format(epoch_num), fold_num, float(l)
                )
                self.results.update_loss(fold_num, float(l))
        return state

    def _device_eval_scan(self, eval_step, with_meta):
        fns, key, entry = self._scan_cache_lookup(
            "_dev_eval_fns", eval_step, with_meta)
        if entry is None:
            batch_sh = mesh_lib.batch_sharding(self.mesh)

            def shard(tree):
                return jax.tree_util.tree_map(
                    lambda v: jax.lax.with_sharding_constraint(v, batch_sh),
                    tree,
                )

            @jax.jit
            def eval_scan(state, dev, perm, masks):
                def body(s, xs):
                    ids, m = xs
                    batch = shard(jax.tree_util.tree_map(
                        lambda a: jnp.take(a, ids, axis=0), dev
                    ))
                    s, loss, out = eval_step(s, batch, shard(m))
                    return s, (loss, out)

                return jax.lax.scan(body, state, (perm, masks))

            return self._scan_cache_store(fns, key, eval_step, eval_scan)
        return entry[1]

    def _run_test_epoch_device_cache(self, state, eval_step, dataset,
                                     fold_num, epoch_num):
        """Whole test epoch in one device dispatch over the uploaded
        cache (mirror of the train fast path)."""
        conf = self.conf
        batch_size = conf.get("batch_size", 16)
        dp = self.mesh.shape[mesh_lib.DATA_AXIS]
        target = -(-batch_size // dp) * dp
        idx = np.asarray(dataset.current_indices())
        n = len(idx)
        steps = -(-n // target)
        pad = steps * target - n
        masks = np.ones(steps * target, np.float32)
        perm = idx
        if pad:
            masks[n:] = 0.0
            # cyclic tiling covers splits smaller than one padded batch
            perm = np.resize(idx, steps * target)
        dev = self._get_device_cache(dataset)
        scan = self._device_eval_scan(eval_step, "metadata" in dev)
        rep = mesh_lib.replicated(self.mesh)
        state, (losses, outs) = scan(
            state, dev,
            jax.device_put(perm.reshape(steps, target).astype(np.int32),
                           rep),
            jax.device_put(masks.reshape(steps, target), rep),
        )
        # targets snapshot taken NOW (host array) so a later in-place cache
        # mutation cannot skew a deferred regressor recording
        targets = (
            dataset.cache.target[idx]
            if self.spec.kind == "regressor" else None
        )
        self._defer(
            self._record_eval_outputs, losses, outs, idx, steps, target,
            n, targets, dataset, fold_num, epoch_num,
        )
        return state

    def _record_eval_outputs(self, losses, outs, idx, steps, target, n,
                             targets, dataset, fold_num, epoch_num):
        for l in np.asarray(losses):
            self.results.update_meter("test_loss", fold_num, float(l))
            self.results.update_epoch_meter(
                "test_loss", epoch_num, float(l)
            )
        outs = mesh_lib.fetch_global(outs)
        out_flat = outs.reshape((steps * target,) + outs.shape[2:])[:n]
        if self.spec.kind == "classifier":
            if self.spec.expand_obs_idx:
                preds = out_flat.argmax(axis=-1).reshape(-1).tolist()
                pred_idx = np.repeat(idx, out_flat.shape[1]).tolist()
            else:
                preds = out_flat.argmax(axis=-1).tolist()
                pred_idx = idx.tolist()
            self.record_classifier_results(
                preds, pred_idx, dataset, fold_num, epoch_num
            )
        elif self.spec.kind == "regressor":
            self.record_regressor_results(out_flat, targets, fold_num)

    def run_test_epoch(self, state, eval_step, dataset, fold_num, epoch_num):
        conf = self.conf
        batch_size = conf.get("batch_size", 16)
        if self._device_cache_eligible(dataset, None):
            return self._run_test_epoch_device_cache(
                state, eval_step, dataset, fold_num, epoch_num
            )
        loader = EpochLoader(dataset, batch_size, shuffle=False)

        # gather/transform/device_put of batch N+1 overlaps eval step N
        # on device (mirror of the train loop's prefetch); host
        # materialization of every batch's loss/logits is queued and
        # processed after the last dispatch, so the device streams
        # through the whole test epoch without a host round trip
        def prepare(batch):
            obs_idx = batch.pop("index")
            n_real = batch["data"].shape[0]
            batch, mask = self._prepare_batch(batch, batch_size)
            return batch, mask, obs_idx, n_real

        pending = []
        for batch, mask, obs_idx, n_real in PrefetchLoader(
            loader, map_fn=prepare
        ):
            state, loss, out = eval_step(state, batch, mask)
            pending.append((loss, out, obs_idx, n_real, batch["target"]))
        self._defer(
            self._record_host_eval, pending, dataset, fold_num, epoch_num
        )
        return state

    def _record_host_eval(self, pending, dataset, fold_num, epoch_num):
        preds = []
        pred_idx = []
        reg_preds = []
        reg_targets = []
        # one batched transfer each for the epoch's per-batch loss
        # scalars and logits instead of a device round trip per batch
        losses = jax.device_get([p[0] for p in pending])
        outs = mesh_lib.fetch_global_list([p[1] for p in pending])
        for (loss, _, obs_idx, n_real, target), loss_h, out in zip(
            pending, losses, outs
        ):
            self.results.update_meter("test_loss", fold_num,
                                      float(loss_h))
            self.results.update_epoch_meter(
                "test_loss", epoch_num, float(loss_h)
            )
            out = out[:n_real]
            if self.spec.kind == "classifier":
                if self.spec.expand_obs_idx:
                    # per-breath logits (B,S,2): every window index repeats
                    # S times (reference: train_ards_detector.py:548-556)
                    batch_preds = out.argmax(axis=-1).reshape(-1)
                    pred_idx.extend(
                        np.repeat(np.asarray(obs_idx), out.shape[1]).tolist()
                    )
                else:
                    batch_preds = out.argmax(axis=-1)
                    pred_idx.extend(np.asarray(obs_idx).tolist())
                preds.extend(batch_preds.tolist())
            elif self.spec.kind == "regressor":
                reg_preds.append(out)
                reg_targets.append(np.asarray(target)[:n_real])
        if self.spec.kind == "classifier":
            self.record_classifier_results(
                preds, pred_idx, dataset, fold_num, epoch_num
            )
        elif self.spec.kind == "regressor":
            self.record_regressor_results(
                np.concatenate(reg_preds),
                np.concatenate(reg_targets),
                fold_num,
            )

    def record_classifier_results(self, preds, pred_idx, dataset, fold_num,
                                  epoch_num):
        """(reference: train_ards_detector.py:519-524)"""
        series = pd.Series(preds, index=pred_idx).sort_index()
        y_test = dataset.get_ground_truth_df()
        self.results.perform_patient_predictions(
            y_test, series, fold_num, epoch_num, verbose=self.verbose
        )
        seq_hours = {
            int(i): np.atleast_1d(dataset.seq_hours_for([int(i)])[0])
            for i in y_test.index
        }
        self.results.save_predictions_by_hour(
            y_test, series, seq_hours, epoch_num, fold_num
        )

    def record_regressor_results(self, preds, targets, fold_num):
        """(reference: train_ards_detector.py:661-679 RegressorMixin)"""
        self.results.update_meter(
            "test_mae", fold_num, float(np.abs(preds - targets).mean())
        )
        self.results.update_meter(
            "test_mse", fold_num, float(((preds - targets) ** 2).mean())
        )
        self.results.update_r2(fold_num, r2_score(targets, preds))

    def perform_post_modeling_actions(self):
        if self.spec.kind == "classifier":
            self.results.aggregate_classification_results(
                verbose=self.verbose
            )
        self.results.save_all()

    # -- checkpointing --------------------------------------------------------

    def save_checkpoint(self, state, fold_num, epoch_num, step=None,
                        resume_meta=None):
        from deepards_tpu.train import checkpoint

        base = self.conf.get("save_model") or "model"
        name = os.path.splitext(os.path.basename(base))[0]
        if epoch_num is not None:
            name += "-epoch{}".format(epoch_num)
        if self.n_kfolds > 1:
            name += "-fold{}".format(fold_num)
        if step is not None:
            name += "-step{}".format(step)
        out_dir = self.conf.get("saved_models_dir") or "saved_models"
        return checkpoint.save(
            os.path.join(out_dir, name), state, self.conf,
            resume_meta=resume_meta,
            scaling=getattr(self, "_current_scaling", None),
        )
