"""Ensemble evaluation CLI: run saved per-fold checkpoints as pseudo-epochs
and aggregate patient-level stats.

(reference: deepards/evaluate.py:15-50 + evaluate_config yml format with a
``models: {fold: [checkpoint, ...]}`` map.)
"""
import argparse

import numpy as np
import pandas as pd
from sklearn.metrics import accuracy_score, roc_auc_score

from deepards_tpu.config import Configuration


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-evaluate")
    parser.add_argument("-co", "--config-override", required=True)
    parser.add_argument("--saved-models-dir", default="saved_models")
    args = parser.parse_args(argv)

    ns = argparse.Namespace(config_override=args.config_override)
    conf = Configuration(ns)

    import jax

    from deepards_tpu.data.dataset import ARDSRawDataset
    from deepards_tpu.train import checkpoint
    from deepards_tpu.train.loop import Trainer

    dataset = ARDSRawDataset.from_pickle(conf.train_from_pickle)
    test_dataset = ARDSRawDataset.make_test_dataset_if_kfold(dataset)
    trainer = Trainer(conf, verbose=False)
    trainer.n_sub_batches = dataset.n_sub_batches

    from deepards_tpu.data.pipeline import BatchPipeline
    from deepards_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = trainer.build_model()
    tx = make_optimizer()
    # fold count: explicit config > the pickled dataset's own kfold count
    # (reference evaluate.py hardcodes 5; reading the cache is strictly
    # more correct and matches when the dataset was built with kfolds=5)
    kfolds = conf.get("kfolds") or dataset.total_kfolds or 5
    import os

    for fold in range(kfolds):
        test_dataset.set_kfold_indexes_for_fold(fold)
        pipeline = BatchPipeline(test_dataset)
        _, eval_step, _, _ = make_train_step(
            model, tx, trainer.loss_fn,
            target_mode=trainer.spec.target_mode, transform=pipeline,
            compute_dtype=trainer.compute_dtype,
            bn_mask_rows="batch" if trainer.spec.two_dim else "windows",
        )
        sample = test_dataset.gather(test_dataset.current_indices()[:2])
        model_names = conf.models[fold] if "models" in conf.conf else []
        # pipeline the ensemble members like run_fold pipelines epochs:
        # every checkpoint's eval scan enqueues back-to-back, host-side
        # vote aggregation flushes once per fold (honors defer_fetch)
        with trainer.deferred_fetch():
            for i, model_name in enumerate(model_names):
                path = os.path.join(args.saved_models_dir, model_name)
                state = create_train_state(
                    model, tx, sample, jax.random.PRNGKey(0),
                    has_metadata=trainer.spec.uses_metadata,
                )
                restored = checkpoint.restore(path)
                state = state.replace(params=restored["params"])
                # each checkpoint acts as one pseudo-epoch
                trainer.run_test_epoch(state, eval_step, test_dataset,
                                       fold, i)

    print("\nMean Results")
    rows = []
    for fold, fold_df in trainer.results.results.groupby("fold_num"):
        accuracy = round(
            accuracy_score(fold_df.patho.tolist(),
                           fold_df.prediction.tolist()), 4
        )
        auc = round(
            roc_auc_score(fold_df.patho.tolist(),
                          fold_df.pred_frac.tolist()), 4
        )
        rows.append([fold, accuracy, auc])
    print(pd.DataFrame(rows, columns=["Fold", "Accuracy", "AUC"])
          .to_string(index=False))

    print("\nAggregated Results")
    trainer.results.aggregate_classification_results()


if __name__ == "__main__":
    main()
