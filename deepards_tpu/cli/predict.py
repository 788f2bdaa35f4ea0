"""Inference CLI: run a trained checkpoint over new patient data.

The deploy surface — the reference shipped a Jetson L4T docker image that
ran `train_ards_detector.py --no-train` against a checkpoint
(reference: build/Dockerfile:16-26).  Here: load an orbax checkpoint,
assemble windows from raw breath files (or a cache), and emit per-window
predictions + patient-level votes as CSV/JSON.
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def predict(conf, checkpoint_path, batch_size=16):
    from deepards_tpu.data.pipeline import BatchPipeline
    from deepards_tpu.train import checkpoint as ckpt
    from deepards_tpu.train.loop import make_trainer

    trainer = make_trainer(conf, verbose=False)
    train_ds, test_ds = trainer.get_base_datasets()
    if conf.get("kfolds"):
        test_ds.set_kfold_indexes_for_fold(conf.get("only_fold") or 0)
    model = trainer.build_model()
    pipeline = BatchPipeline(test_ds if not trainer.spec.two_dim else None) \
        if not trainer.spec.two_dim else None
    restored = ckpt.restore(checkpoint_path)
    params = restored["params"]

    from deepards_tpu.models.layers import bn_row_mask

    two_dim = bool(getattr(trainer.spec, "two_dim", False))

    @jax.jit
    def forward(params, data, mask):
        if pipeline is not None:
            data = pipeline(data)
        # pad rows must not contaminate batch-scope BN statistics in the
        # final partial chunk (reference true-size final-batch semantics;
        # same fix class as serve.py's bn_scope default)
        rows_mask = (
            mask if (two_dim or data.ndim != 4)
            else jnp.repeat(mask, data.shape[1])
        )
        with bn_row_mask(rows_mask):
            out = model.apply(
                {"params": params}, data, None, False,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
        if isinstance(out, tuple):
            out = out[0]
        return jax.nn.softmax(out, axis=-1)

    idxs = test_ds.current_indices()
    rows = []
    for start in range(0, len(idxs), batch_size):
        chunk = idxs[start : start + batch_size]
        batch = test_ds.gather(chunk)
        pad = batch_size - len(chunk)
        data = batch["data"]
        mask = np.ones(batch_size, np.float32)
        if pad:
            data = np.concatenate(
                [data, np.zeros((pad,) + data.shape[1:], data.dtype)]
            )
            mask[len(chunk):] = 0.0
        probs = np.asarray(
            forward(params, jnp.asarray(data), jnp.asarray(mask))
        )[: len(chunk)]
        if probs.ndim == 3:  # per-breath heads -> mean over windows
            probs = probs.mean(axis=1)
        gt = test_ds.get_ground_truth_df()
        for i, widx in enumerate(chunk):
            rows.append({
                "window_index": int(widx),
                "patient": gt.loc[int(widx)].patient,
                "hour": float(gt.loc[int(widx)].hour),
                "prob_other": float(probs[i, 0]),
                "prob_ards": float(probs[i, 1]),
                "prediction": int(probs[i].argmax()),
            })
    frame = pd.DataFrame(rows)
    votes = (
        frame.groupby("patient")
        .agg(
            pred_frac=("prediction", "mean"),
            n_windows=("prediction", "size"),
        )
        .reset_index()
    )
    votes["prediction"] = (votes.pred_frac >= 0.5).astype(int)
    return frame, votes


def main(argv=None):
    from deepards_tpu.cli.train import build_parser
    from deepards_tpu.config import Configuration

    parser = argparse.ArgumentParser(prog="deepards-predict", add_help=False)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("-o", "--output", default="predictions.csv")
    parser.add_argument("--votes-output", default="patient_votes.json")
    args, rest = parser.parse_known_args(argv)

    model_args = build_parser().parse_args(rest)
    conf = Configuration(model_args)
    frame, votes = predict(conf, args.checkpoint,
                           conf.get("batch_size", 16))
    frame.to_csv(args.output, index=False)
    with open(args.votes_output, "w") as f:
        json.dump(votes.to_dict(orient="records"), f, indent=2)
    print(votes.to_string(index=False))
    print("window predictions -> {}".format(args.output))
    print("patient votes -> {}".format(args.votes_output))


if __name__ == "__main__":
    main()
