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
            window = self.dataset.cache.data[widx]  # (S, C, L)
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
    rows = []
    for start in range(0, len(idxs), batch_size):
        chunk = idxs[start : start + batch_size]
        data = jnp.asarray(dataset.cache.data[chunk])
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
