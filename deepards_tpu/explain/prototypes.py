"""Prototype visualization and analysis for ProtoPNet.

Capability parity with the reference's push visualization and prototype
analytics (reference: deepards/models/protopnet1d/ppnet_push.py:21-695
PrototypeVisualizer; protopnet_analysis.py; protopnet_shap.py): draw each
prototype's receptive-field window on its source breath sequence, report
per-prototype activation statistics, and attribute classifier output to
prototype activations.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from deepards_tpu.data.pipeline import gather_pipeline
from deepards_tpu.models.protopnet1d import compute_rf_boundaries


def _get_plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


class PrototypeVisualizer:
    """Render each pushed prototype's source window with its
    receptive-field span highlighted."""

    def __init__(self, model, dataset, results_dir="prototype_results",
                 fname_prefix="proto"):
        self.model = model
        self.dataset = dataset
        self.results_dir = results_dir
        self.fname_prefix = fname_prefix
        self.rf_info = model.proto_layer_rf_info(dataset.seq_len)
        # prototypes were pushed onto PIPELINED windows; display the
        # breath at the scale the prototype actually saw
        self.pipeline = gather_pipeline(dataset)

    def viz_prototypes(self, push_info, epoch_num=0):
        os.makedirs(self.results_dir, exist_ok=True)
        plt = _get_plt()
        outputs = []
        s = self.dataset.cache.data.shape[1]
        n_pos = None
        for j, info in enumerate(push_info):
            if info is None:
                continue
            widx = info["window_index"]
            flat_pos = info["flat_pos"]
            window = self.pipeline(
                self.dataset.cache.data[widx]
            )  # (S, C, L), fold-normalized like the push inputs
            # flat_pos indexes (S * L'') patch positions
            lpp = None
            # infer L'' from rf_info n_out
            lpp = int(self.rf_info[0])
            sub = flat_pos // lpp
            pos = flat_pos % lpp
            lo, hi = compute_rf_boundaries(pos, self.rf_info,
                                           self.dataset.seq_len)
            breath = window[min(sub, s - 1), 0]
            name = "{}-epoch{}-p{}".format(self.fname_prefix, epoch_num, j)
            outputs.append({
                "prototype": j, "window_index": int(widx),
                "sub_batch": int(sub), "rf_lo": lo, "rf_hi": hi,
                "distance": info.get("distance"),
            })
            if plt is None:
                np.savez(os.path.join(self.results_dir, name + ".npz"),
                         breath=breath, rf=(lo, hi))
                continue
            fig, ax = plt.subplots(figsize=(8, 3))
            t = np.arange(len(breath)) * 0.02
            ax.plot(t, breath, "k", lw=1)
            ax.axvspan(lo * 0.02, hi * 0.02, color="orange", alpha=0.4)
            ax.set_title(
                "prototype {} (window {} sub {})".format(j, widx, sub)
            )
            ax.set_xlabel("time (s)")
            fig.savefig(os.path.join(self.results_dir, name + ".png"),
                        dpi=120, bbox_inches="tight")
            plt.close(fig)
        return outputs


def prototype_activation_frame(model, params, dataset, batch_size=16):
    """Per-window prototype similarity table for analysis
    (reference: protopnet_analysis.py prototype score analytics)."""
    import pandas as pd

    idxs = dataset.current_indices()
    pipeline = gather_pipeline(dataset)
    rows = []
    for start in range(0, len(idxs), batch_size):
        chunk = idxs[start : start + batch_size]
        data = jnp.asarray(pipeline(dataset.cache.data[chunk]))
        logits, min_d = model.apply(
            {"params": params}, data, None, True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        min_d = np.asarray(min_d)  # (B, S*P)
        sims = np.asarray(
            model.distance_to_similarity(jnp.asarray(min_d))
        )
        p = model.num_prototypes
        sims = sims.reshape(len(chunk), -1, p).mean(axis=1)  # (B, P)
        preds = np.asarray(logits).argmax(axis=1)
        for k, widx in enumerate(chunk):
            row = {"window_index": int(widx), "prediction": int(preds[k])}
            for j in range(p):
                row["proto_{}".format(j)] = float(sims[k, j])
            rows.append(row)
    return pd.DataFrame(rows)


class ProtoPNetAnalysis:
    """Prototype-feature classifier probe + topk-prototype visualization
    (reference: protopnet_analysis.py:26-184).

    The reference's "MLP" trains nothing: it transplants the model's
    last-layer weights into a bias-free sklearn MLPClassifier with
    identity activation and softmax output
    (protopnet_analysis.py:93-110) so SHAP/LIME tooling can consume it.
    The classifier here is that same linear map applied directly:
    ``probs = softmax(features @ W)`` with W the last-layer kernel.

    TPU-native shift: the reference gathers prototype features with a
    B=1 DataLoader loop over seq_forward; here every batch of windows
    runs through one jitted apply.
    """

    def __init__(self, model, params, train_dataset, test_dataset,
                 batch_size=16):
        import pandas as pd

        self.model = model
        self.params = params
        self.train_ds = train_dataset
        self.test_ds = test_dataset
        # the head was trained on pipeline-normalized inputs (the
        # reference scales in __getitem__, dataset.py:1364-1375); raw
        # cache rows would yield features at the wrong scale
        self.train_pipe = gather_pipeline(train_dataset)
        self.test_pipe = gather_pipeline(test_dataset)
        self.train_gt = train_dataset.get_ground_truth_df()
        self.test_gt = test_dataset.get_ground_truth_df()
        self.coefs = np.asarray(params["last_layer"]["kernel"])  # (F, 2)
        self.feature_names = self._make_feature_names()
        tr = self._gather(train_dataset, self.train_pipe, batch_size)
        te = self._gather(test_dataset, self.test_pipe, batch_size)
        self.train_features = pd.DataFrame(
            tr, columns=self.feature_names, index=self.train_gt.index)
        self.test_features = pd.DataFrame(
            te, columns=self.feature_names, index=self.test_gt.index)
        self.train_preds = self.predict_proba(tr)
        self.test_preds = self.predict_proba(te)

    def _make_feature_names(self):
        """"prototype {breath},{proto}" per last-layer input column
        (reference: protopnet_analysis.py:77-91)."""
        p = self.model.num_prototypes
        return [
            "prototype {},{}".format(i // p, i % p)
            for i in range(self.coefs.shape[0])
        ]

    def _gather(self, dataset, pipeline, batch_size):
        """Last-layer input features per window: the prototype
        similarities exactly as the head consumes them
        (reference seq_forward outputs, model.py:260-266), computed on
        pipeline-normalized inputs like training."""
        idxs = dataset.current_indices()
        feats = []
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start: start + batch_size]
            data = jnp.asarray(pipeline(dataset.cache.data[chunk]))
            _, min_d = self.model.apply(
                {"params": self.params}, data, None, True,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            sims = np.asarray(
                self.model.distance_to_similarity(min_d)
            )  # (B, S*P)
            if self.model.average_linear:
                p = self.model.num_prototypes
                sims = sims.reshape(len(chunk), -1, p).mean(axis=1)
            feats.append(sims)
        return np.concatenate(feats) if feats else np.zeros(
            (0, self.coefs.shape[0]), np.float32)

    def predict_proba(self, features):
        """softmax(features @ W), the transplanted-last-layer classifier
        (reference: protopnet_analysis.py:93-110)."""
        logits = np.asarray(features) @ self.coefs
        logits = logits - logits.max(axis=-1, keepdims=True)
        e = np.exp(logits)
        return e / e.sum(axis=-1, keepdims=True)

    def _rf_span_for(self, window, breath_n, proto_n):
        """Receptive-field span of the best-matching patch of prototype
        proto_n on breath breath_n of one (S, C, L) window."""
        _, dists = self.model.apply(
            {"params": self.params}, jnp.asarray(window[None]), None, True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            method=self.model.push_forward,
        )
        d = np.asarray(dists)[0, breath_n, :, proto_n]  # (L'',)
        pos = int(d.argmin())
        rf_info = self.model.proto_layer_rf_info(window.shape[-1])
        return compute_rf_boundaries(pos, rf_info, window.shape[-1])

    def plot_random_proto_from_linear_with_topk(self, gt_patho, pred_patho,
                                                topk, rng=None, ax=None):
        """Pick a random test window with the given ground truth and
        prediction, rank prototype features by their contribution to the
        predicted class (W_jc * feature_j), and draw one of the topk
        prototypes' receptive fields on its breath
        (reference: protopnet_analysis.py:122-146)."""
        rng = rng or np.random.default_rng(0)
        gt_n = {"ards": 1, "non_ards": 0}[gt_patho]
        pred_n = {"ards": 1, "non_ards": 0}[pred_patho]
        pred_labels = self.test_preds.argmax(axis=1)
        match = self.test_gt[
            (self.test_gt.y == gt_n)
            & (pred_labels == pred_n)
        ]
        if not len(match):
            # tiny/undertrained models may never predict one class; fall
            # back to ground-truth-only (the reference would crash here)
            match = self.test_gt[self.test_gt.y == gt_n]
        if not len(match):
            raise ValueError("no test windows with patho " + gt_patho)
        idx = int(rng.choice(match.index.to_numpy()))
        iloc = self.test_gt.index.get_loc(idx)
        features = self.test_features.iloc[iloc].to_numpy()
        contrib = self.coefs * features[:, None]  # (F, 2)
        order = np.argsort(contrib[:, pred_n])[::-1][:topk]
        pick = int(rng.choice(order))
        p = self.model.num_prototypes
        breath_n, proto_n = pick // p, pick % p
        window = self.test_pipe(
            self.test_ds.gather([idx])["data"]
        )[0]  # (S, C, L), fold-normalized
        if self.model.average_linear:
            # features are per-prototype; locate its best breath
            proto_n = pick
            _, dists = self.model.apply(
                {"params": self.params}, jnp.asarray(window[None]), None,
                True, rngs={"dropout": jax.random.PRNGKey(0)},
                method=self.model.push_forward,
            )
            breath_n = int(
                np.asarray(dists)[0, :, :, proto_n].min(axis=1).argmin()
            )
        breath_n = min(breath_n, window.shape[0] - 1)
        lo, hi = self._rf_span_for(window, breath_n, proto_n)
        breath = window[breath_n, 0]
        plt = _get_plt()
        if plt is not None:
            axis = ax if ax is not None else plt.subplots(
                figsize=(6, 3))[1]
            t = np.arange(len(breath))
            axis.plot(t, breath, "k", lw=0.8)
            axis.axvspan(lo, hi, color="orange", alpha=0.4)
            axis.tick_params(axis="x", which="both", bottom=False,
                             top=False, labelbottom=False)
            axis.tick_params(axis="y", labelsize="x-small")
        return idx, breath_n, proto_n

    def make_random_sequence_pane(self, dirname, rng=None, topk=40):
        """4x4 pane of random correctly-predicted prototype
        visualizations + txt record
        (reference: protopnet_analysis.py:148-173)."""
        import uuid

        rng = rng or np.random.default_rng(0)
        os.makedirs(dirname, exist_ok=True)
        items = 16
        pathos = ["ards"] * (items // 2) + ["non_ards"] * (items // 2)
        rng.shuffle(pathos)
        record = []
        plt = _get_plt()
        fig = axes = None
        if plt is not None:
            fig, axes = plt.subplots(4, 4, figsize=(20, 10))
        for i, p in enumerate(pathos):
            ax = axes.ravel()[i] if axes is not None else None
            seq_idx, breath_n, proto_n = \
                self.plot_random_proto_from_linear_with_topk(
                    p, p, topk, rng=rng, ax=ax)
            record.append([str(i + 1), p, str(seq_idx), str(breath_n),
                           str(proto_n)])
        base = os.path.join(dirname,
                            "sample-{}".format(uuid.uuid4()))
        if fig is not None:
            fig.suptitle("Random Prototype Viz")
            fig.savefig(base + ".png", dpi=120)
            plt.close(fig)
        with open(base + ".txt", "w") as fh:
            fh.write("n, patho, gt_idx, breath_n, proto_n\n")
            for line in record:
                fh.write(", ".join(line) + "\n")
        return base


def prototype_shap_values(model, params, dataset, n_background=32,
                          n_samples=64, rng=None, batch_size=16):
    """SHAP-style attribution of the final linear layer to prototype
    activations (reference: protopnet_shap.py:1-77 used kernel SHAP over
    prototype activations).

    Because the classification head is LINEAR in the prototype
    similarities, exact Shapley values are available in closed form:
    phi_ij = w_j * (sim_ij - E[sim_j]).  Returns (frame, base_values).
    """
    import pandas as pd

    frame = prototype_activation_frame(model, params, dataset, batch_size)
    proto_cols = [c for c in frame.columns if c.startswith("proto_")]
    sims = frame[proto_cols].to_numpy()  # (N, P) mean-over-window sims
    kernel = np.asarray(params["last_layer"]["kernel"])  # (S*P, 2)
    p = model.num_prototypes
    s = kernel.shape[0] // p
    # aggregate per-prototype weight over window slots
    w = kernel.reshape(s, p, 2).sum(axis=0)  # (P, 2)
    background = sims.mean(axis=0)  # E[sim_j]
    shap_ards = (sims - background) * w[:, 1][None, :]
    out = pd.DataFrame(
        shap_ards,
        columns=["shap_{}".format(c) for c in proto_cols],
        index=frame.window_index,
    )
    base_value = float(background @ w[:, 1])
    return out, base_value
