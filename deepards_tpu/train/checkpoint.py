"""Checkpoint save/restore (params + optimizer state + config).

Replaces the reference's whole-module ``torch.save(model)`` per
epoch/fold (reference: train_ards_detector.py:355-374) with orbax
pytree checkpoints that carry optimizer state and rng — enabling true
resume, which the reference lacked (SURVEY.md §5.4).
"""
import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(path, state, conf=None, resume_meta=None, scaling=None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "rng": jax.device_get(state.rng),
        "step": jax.device_get(state.step),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if scaling is not None:
        # (mu, std) of the training fold, embedded so inference surfaces
        # (cli/serve.py) can normalize inputs without the dataset pickle
        mu, std = scaling
        with open(path + ".scaling.json", "w") as f:
            json.dump({
                "mu": np.asarray(mu, np.float64).ravel().tolist(),
                "std": np.asarray(std, np.float64).ravel().tolist(),
            }, f)
    if resume_meta is not None:
        # mid-epoch resume bookkeeping: fold/epoch/next-batch + the exact
        # epoch permutation, so resumption replays the remaining batches
        meta = dict(resume_meta)
        if "perm" in meta:
            meta["perm"] = np.asarray(meta["perm"]).tolist()
        with open(path + ".resume.json", "w") as f:
            json.dump(meta, f)
    if conf is not None:
        with open(path + ".conf.json", "w") as f:
            json.dump(
                {
                    k: v
                    for k, v in dict(conf.conf).items()
                    if isinstance(v, (str, int, float, bool, list, type(None)))
                },
                f,
                indent=2,
            )
    return path


def load_scaling(path):
    """Scaling sidecar saved next to a checkpoint (None if absent)."""
    p = os.path.abspath(path) + ".scaling.json"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return (np.asarray(d["mu"], np.float32),
            np.asarray(d["std"], np.float32))


def load_resume_meta(path):
    """Resume metadata saved next to a step checkpoint (None if absent)."""
    meta_path = os.path.abspath(path) + ".resume.json"
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    if "perm" in meta:
        meta["perm"] = np.asarray(meta["perm"], np.int64)
    return meta


def restore(path, abstract_state=None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if abstract_state is not None:
        target = {
            "params": abstract_state.params,
            "opt_state": abstract_state.opt_state,
            "rng": abstract_state.rng,
            "step": abstract_state.step,
        }
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def load_params(path):
    """Load just the params tree (e.g. to extract a pretrained
    breath_block; reference --load-base-network,
    train_ards_detector.py:383-388)."""
    return restore(path)["params"]


def extract_breath_block(params):
    """Pull the backbone subtree out of a composite model's params."""
    for key in params:
        if key.startswith("breath_block") or key == "DenseNet1D_0":
            return {key: params[key]}
    return params
