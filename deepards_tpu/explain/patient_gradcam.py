"""Per-patient GradCAM operations CLI.

Capability parity with the reference ops surface
(reference: deepards/patient_gradcam.py:30-437): for each patient in a
fold, compute cams over median/average breaths, sampled sequences, full
reads, per-hour samples, random stratified panes, or cam-active-span DTW
clustering, and save outputs under ``gradcam_results/<op>/<patho>/``
(layout documented in reference README.md:127-160).  Plotting degrades
to .npz dumps when matplotlib is unavailable.

TPU-native shifts vs the reference:
- every multi-sequence op batches its cams through ONE device dispatch
  (``generate_read_cams_batch``) instead of a python per-sequence loop;
- ``dtw_clust``'s pairwise distance matrix runs through the batched
  Pallas DTW kernel (`ops/dtw.py`) instead of N^2 sequential C calls.
"""
import os
import uuid

import numpy as np

from deepards_tpu.explain.gradcam import MaxMinNormCam, upsample_cam


def _get_plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


PATHO_NAME = {0: "non_ards", 1: "ards"}


class PatientGradCam:
    def __init__(self, model, params, dataset, results_dir="gradcam_results",
                 cam_cls=MaxMinNormCam, target="ground_truth"):
        from deepards_tpu.data.pipeline import gather_pipeline

        self.cam = cam_cls(model, params)
        self.dataset = dataset
        self.results_dir = results_dir
        self.gt = dataset.get_ground_truth_df()
        self.target = target
        # dataset.gather returns RAW rows; the model was trained on
        # pipeline-normalized inputs, and the reference scales in
        # __getitem__ before any cam runs (dataset.py:1364-1375) — every
        # gather below goes through the fold's pipeline first
        self.pipeline = gather_pipeline(dataset)

    def get_target(self, ground_truth):
        """Cam target class list for one patient
        (reference: patient_gradcam.py:46-54)."""
        if isinstance(self.target, int):
            return [self.target]
        if self.target == "ground_truth":
            return [int(ground_truth)]
        if self.target == "both":
            return [0, 1]
        return [{"ards": 1, "other": 0}[self.target]]

    def _patient_rows(self, patient_id):
        return self.gt[self.gt.patient == patient_id]

    def _patho_name(self, patient_id):
        rows = self._patient_rows(patient_id)
        return PATHO_NAME[int(rows.y.iloc[0])]

    def _save(self, op, patient_id, breath, cam, suffix="", subdir=None):
        patho = self._patho_name(patient_id)
        out_dir = os.path.join(self.results_dir, op, patho)
        if subdir:
            out_dir = os.path.join(out_dir, subdir)
        os.makedirs(out_dir, exist_ok=True)
        name = "{}{}".format(patient_id, suffix)
        cam224 = upsample_cam(cam)
        plt = _get_plt()
        if plt is None:
            np.savez(
                os.path.join(out_dir, name + ".npz"),
                breath=breath, cam=cam224,
            )
            return
        fig, ax = plt.subplots(figsize=(8, 3))
        t = np.arange(len(breath)) * 0.02
        ax.plot(t, breath, "k", lw=1)
        ax.imshow(
            cam224[None, :],
            aspect="auto",
            cmap="jet",
            alpha=0.4,
            extent=[t[0], t[-1], min(breath), max(breath)],
        )
        ax.set_xlabel("time (s)")
        ax.set_ylabel("flow (l/min)")
        ax.set_title("{} {}".format(patient_id, op))
        fig.savefig(os.path.join(out_dir, name + ".png"), dpi=120,
                    bbox_inches="tight")
        plt.close(fig)

    def _gather(self, idx):
        """Gather + fold-pipeline normalization (the scale the model was
        trained at)."""
        batch = dict(self.dataset.gather(np.asarray(idx)))
        batch["data"] = self.pipeline(batch["data"])
        return batch

    def _patient_data(self, patient_id):
        idx = self._patient_rows(patient_id).index.to_numpy()
        return self._gather(idx)

    # -- batched cam helpers -------------------------------------------------

    def _read_cams_batch(self, windows, targets, chunk=64):
        """Per-breath cams for many (S, C, L) windows, chunked through one
        device dispatch each (the reference loops get_read_grad_cam per
        window, patient_gradcam.py:326)."""
        cams, outs = [], []
        for lo in range(0, len(windows), chunk):
            c, o = self.cam.generate_read_cams_batch(
                windows[lo:lo + chunk], targets[lo:lo + chunk]
            )
            cams.append(c)
            outs.append(o)
        return np.concatenate(cams), np.concatenate(outs)

    def _single_seq_cams_batch(self, breaths, targets):
        """Single-sequence cams: each breath is repeated sub_batch times
        (the reference's get_camout_for_breath batch-repeat trick,
        patient_gradcam.py:208-218 — the repeat feeds batch-stat BN) and
        the whole set runs in one batched dispatch."""
        S = self.dataset.n_sub_batches
        xs = np.repeat(np.asarray(breaths)[:, None], S, axis=1)  # (B,S,C,L)
        cams, outs = self._read_cams_batch(xs, np.asarray(targets))
        # rows are identical (same repeated breath): row 0 == the
        # reference's grad-mean over the repeated batch
        return cams[:, 0, :], outs

    # -- the six reference ops ----------------------------------------------

    def do_medians(self):
        """Median breath per patient -> cam overlay
        (reference: patient_gradcam.py:56-82)."""
        for pt in self.gt.patient.unique():
            data = self._patient_data(pt)["data"]
            med = np.median(
                data.reshape(-1, data.shape[-2], data.shape[-1]), axis=0
            )
            read = np.repeat(
                med[None], self.dataset.n_sub_batches, axis=0
            )
            target = self.get_target(self._patient_rows(pt).y.iloc[0])[0]
            cam, _ = self.cam.generate_cam(read, target)
            self._save("medians", pt, med[0], cam)

    def do_averages(self):
        """(reference: patient_gradcam.py:84-115)"""
        for pt in self.gt.patient.unique():
            data = self._patient_data(pt)["data"]
            avg = data.reshape(
                -1, data.shape[-2], data.shape[-1]
            ).mean(axis=0)
            read = np.repeat(avg[None], self.dataset.n_sub_batches, axis=0)
            target = self.get_target(self._patient_rows(pt).y.iloc[0])[0]
            cam, _ = self.cam.generate_cam(read, target)
            self._save("averages", pt, avg[0], cam)

    def do_sample_sequences(self, n=2, rng=None):
        """(reference: patient_gradcam.py:117-136)"""
        rng = rng or np.random.default_rng(0)
        for pt in self.gt.patient.unique():
            rows = self._patient_rows(pt)
            pick = rng.choice(rows.index.to_numpy(),
                              size=min(n, len(rows)), replace=False)
            for target in self.get_target(rows.y.iloc[0]):
                for i, idx in enumerate(pick):
                    window = self._gather([idx])["data"][0]
                    cam, _ = self.cam.generate_cam(window, target)
                    breath = window.reshape(-1)[: window.shape[-1]]
                    self._save("sample_seqs", pt, breath, cam,
                               suffix="-{}-t{}".format(i, target))

    def do_read_cam(self, rng=None):
        """Full 20-breath read cams (one cam row per breath)
        (reference: patient_gradcam.py:160-173)."""
        rng = rng or np.random.default_rng(0)
        for pt in self.gt.patient.unique():
            rows = self._patient_rows(pt)
            idx = int(rng.choice(rows.index.to_numpy()))
            window = self._gather([idx])["data"][0]
            target = self.get_target(rows.y.iloc[0])[0]
            cams, _ = self.cam.generate_read_cam(window, target)
            for b in range(min(3, cams.shape[0])):
                self._save("read_cam", pt, window[b, 0], cams[b],
                           suffix="-b{}".format(b))

    def do_cam_by_hour(self, hour_start=0, hour_end=24,
                       n_sequences_per_hour=None, rng=None):
        """Per-hour cam sampling: every breath of every sampled window in
        an hour band gets a single-sequence cam, saved as a fast pickle
        for later rendering (reference: patient_gradcam.py:138-159 — the
        reference pickles the matplotlib axis "much faster than png"; we
        pickle the breath/cam/logits payload, which renders the same plot
        and also supports numeric post-analysis)."""
        import pandas as pd

        rng = rng or np.random.default_rng(0)
        S = self.dataset.n_sub_batches
        for pt in self.gt.patient.unique():
            rows = self._patient_rows(pt)
            band = rows[(rows.hour >= hour_start) & (rows.hour < hour_end)]
            if not len(band):
                continue
            idxs = band.index.to_numpy()
            if n_sequences_per_hour is not None:
                take = min(n_sequences_per_hour, len(idxs))
                idxs = rng.choice(idxs, size=take, replace=False)
            data = self._gather(idxs)["data"]  # (B, S, C, L)
            for target in self.get_target(rows.y.iloc[0]):
                # all B*S single-sequence cams in batched dispatches
                breaths = data.reshape(-1, *data.shape[2:])
                cams, outs = self._single_seq_cams_batch(
                    breaths, np.full(len(breaths), target)
                )
                out_dir = os.path.join(
                    self.results_dir, "hour_sequences",
                    PATHO_NAME[target], str(pt), str(hour_start),
                )
                os.makedirs(out_dir, exist_ok=True)
                for k, abs_idx in enumerate(np.repeat(idxs, S)):
                    seq_idx = k % S
                    payload = {
                        "breath": breaths[k, 0],
                        "cam": upsample_cam(cams[k]),
                        "model_output": outs[k],
                        "patient": str(pt),
                        "abs_idx": int(abs_idx),
                        "seq_idx": int(seq_idx),
                        "target": int(target),
                    }
                    pd.to_pickle(payload, os.path.join(
                        out_dir, "seq-{}-{}-target-{}.pkl".format(
                            abs_idx, seq_idx, self.target)
                    ), compression=None)

    # -- rand_sample panes ---------------------------------------------------

    def _pane(self, patho, dirname, rng, items_per_frame=16):
        """One 4x4 pane of random single-sequence cams with its txt
        record (reference: patient_gradcam.py:264-291)."""
        if patho == "random":
            patho_iter = ["ards"] * (items_per_frame // 2) + \
                ["non_ards"] * (items_per_frame // 2)
            rng.shuffle(patho_iter)
        else:
            patho_iter = [patho] * items_per_frame

        picks = []  # (abs_idx, breath_idx, target)
        for p in patho_iter:
            target = {"ards": 1, "non_ards": 0}[p]
            patho_idxs = self.gt[self.gt.y == target].index.to_numpy()
            abs_idx = int(rng.choice(patho_idxs))
            br_idx = int(rng.integers(0, self.dataset.n_sub_batches))
            picks.append((abs_idx, br_idx, target))

        # every pane's 16 cams in one batched dispatch
        windows = self._gather([p[0] for p in picks])["data"]
        breaths = np.stack([
            windows[i, b] for i, (_, b, _) in enumerate(picks)
        ])
        cams, _ = self._single_seq_cams_batch(
            breaths, np.asarray([t for _, _, t in picks])
        )
        graph_id = uuid.uuid4()
        base = os.path.join(dirname, "{}-sample-{}".format(patho, graph_id))
        plt = _get_plt()
        if plt is None:
            np.savez(base + ".npz", breaths=breaths, cams=cams)
        else:
            side = int(np.sqrt(items_per_frame))
            fig, axes = plt.subplots(side, side, figsize=(20, 10))
            for k, ax in enumerate(axes.ravel()):
                br = breaths[k, 0]
                cam224 = upsample_cam(cams[k])
                t = np.arange(len(br))
                ax.scatter(t, br, c=cam224, vmin=0, vmax=255, s=4)
                ax.plot(t, br, lw=0.5)
                ax.tick_params(axis="x", which="both", bottom=False,
                               top=False, labelbottom=False)
                ax.tick_params(axis="y", labelsize="x-small")
            title = {"random": "Random", "non_ards": "Non-ARDS",
                     "ards": "ARDS"}[patho]
            fig.suptitle("{} Grad-Cam".format(title))
            fig.subplots_adjust(right=0.8)
            cbar_ax = fig.add_axes((0.85, 0.15, 0.025, 0.7))
            sm = plt.cm.ScalarMappable(
                norm=plt.Normalize(vmin=0, vmax=255))
            cbar = fig.colorbar(sm, cax=cbar_ax)
            cbar.set_label("Intensity")
            fig.savefig(base + ".png", dpi=120)
            plt.close(fig)
        with open(base + ".txt", "w") as record:
            record.write("n, patho, sequence_idx, breath_idx\n")
            for k, (abs_idx, br_idx, target) in enumerate(picks):
                record.write("{}, {}, {}, {}\n".format(
                    k + 1, PATHO_NAME[target], abs_idx, br_idx))

    def do_rand_sample(self, randomize_groups=False, rng=None,
                       panes_per_group=3):
        """Random stratified sample panes: 4x4 grids of cams from one
        pathophysiology (or shuffled groups) for later qualitative
        analysis (reference: patient_gradcam.py:293-306)."""
        rng = rng or np.random.default_rng(0)
        if not randomize_groups:
            dirname = os.path.join(self.results_dir, "rand_sample",
                                   "non_random")
            os.makedirs(dirname, exist_ok=True)
            for _ in range(panes_per_group):
                self._pane("ards", dirname, rng)
            for _ in range(panes_per_group):
                self._pane("non_ards", dirname, rng)
        else:
            dirname = os.path.join(self.results_dir, "rand_sample",
                                   "randomized")
            os.makedirs(dirname, exist_ok=True)
            for _ in range(2 * panes_per_group):
                self._pane("random", dirname, rng)

    # -- dtw_clust -----------------------------------------------------------

    def _cam_active_spans(self, cams224, breaths, sequence_thresh=0.8,
                          seq_min_len=5):
        """Slice waveform spans where the upsampled cam stays above
        sequence_thresh*255 for >= seq_min_len samples
        (reference: patient_gradcam.py:328-340).  The reference's
        pandas groupby slices ``br[.., group_id:group_id+length-1]`` —
        the GROUP COUNTER, not the run's start sample (a py2-era bug);
        we slice the actual active span, which is the documented intent
        ("cam-active subsequence extraction")."""
        spans = []
        thresh = sequence_thresh * 255.0
        for row_cam, row_br in zip(cams224, breaths):
            active = np.asarray(row_cam, np.float64) >= thresh
            if not active.any():
                continue
            padded = np.concatenate([[False], active, [False]])
            edges = np.flatnonzero(np.diff(padded.astype(np.int8)))
            starts, ends = edges[::2], edges[1::2]
            for s, e in zip(starts, ends):
                if e - s >= seq_min_len:
                    spans.append(np.asarray(row_br[s:e], np.float32))
        return spans

    def _pairwise_dtw_matrix(self, sequences, chunk=4096):
        """Batched pairwise DTW over variable-length spans: zero-pad to
        the max span length and run all pairs through the wavefront DTW
        kernel (`ops/dtw.dtw_batch`) in chunked dispatches — the
        reference runs N^2/2 sequential C dtw calls
        (patient_gradcam.py:342-348)."""
        from deepards_tpu.ops.dtw import dtw_batch

        n = len(sequences)
        D = np.zeros((n, n), np.float64)
        if n < 2:
            return D
        max_len = max(len(s) for s in sequences)
        padded = np.zeros((n, max_len), np.float32)
        lens = np.zeros(n, np.int32)
        for i, s in enumerate(sequences):
            padded[i, : len(s)] = s
            lens[i] = len(s)
        ii, jj = np.triu_indices(n, k=1)
        for lo in range(0, len(ii), chunk):
            a_idx = ii[lo:lo + chunk]
            b_idx = jj[lo:lo + chunk]
            d = np.asarray(dtw_batch(
                padded[a_idx], padded[b_idx], lens[a_idx], lens[b_idx]
            ))
            D[a_idx, b_idx] = d
            D[b_idx, a_idx] = d
        return D

    def do_dtw_clust(self, sequence_thresh=0.8, seq_min_len=5,
                     max_clusters=20):
        """Cam-active subsequence extraction -> batched DTW distance
        matrix -> KMedoids elbow search per patient
        (reference: patient_gradcam.py:308-362).  Saves the elbow plot +
        an npz of {distortions, n_sequences} per patient/target and
        returns the per-patient results dict."""
        from deepards_tpu.dtw.kmedoids import KMedoids

        results = {}
        for pt in self.gt.patient.unique():
            rows = self._patient_rows(pt)
            idxs = rows.index.to_numpy()
            data = self._gather(idxs)["data"]  # (B, S, C, L)
            for target in self.get_target(rows.y.iloc[0]):
                dirname = os.path.join(
                    self.results_dir, "dtw_clustering",
                    PATHO_NAME[target], str(pt),
                )
                os.makedirs(dirname, exist_ok=True)
                # all windows' read cams in batched dispatches
                cams, _ = self._read_cams_batch(
                    data, np.full(len(data), target)
                )  # (B, S, L')
                cams224 = upsample_cam(
                    cams.reshape(-1, cams.shape[-1])
                )  # (B*S, 224)
                breaths = data[:, :, 0, :].reshape(-1, data.shape[-1])
                spans = self._cam_active_spans(
                    cams224, breaths, sequence_thresh, seq_min_len
                )
                D = self._pairwise_dtw_matrix(spans)
                n = len(spans)
                distortions = []
                # the reference sweeps k=2..20 unconditionally
                # (patient_gradcam.py:353); clamp to the span count so
                # sparse patients don't crash the estimator
                ks = list(range(2, min(max_clusters, n) + 1))
                for k in ks:
                    km = KMedoids(k, metric="precomputed")
                    km.fit(D)
                    medoids = km.medoid_indices_
                    dist = float(
                        np.min(D[:, medoids], axis=1).sum() / max(n, 1)
                    )
                    distortions.append(dist)
                np.savez(os.path.join(dirname, "elbow.npz"),
                         distortions=np.asarray(distortions),
                         clusters=np.asarray(ks),
                         n_sequences=n)
                plt = _get_plt()
                if plt is not None and distortions:
                    fig, ax = plt.subplots()
                    ax.plot(ks, distortions)
                    ax.set_xlabel("n clusters")
                    ax.set_ylabel("mean distance to medoid")
                    ax.set_title("patient: {} target: {}".format(
                        pt, self.target))
                    fig.savefig(os.path.join(dirname, "elbow.png"),
                                dpi=120)
                    plt.close(fig)
                results[(str(pt), int(target))] = {
                    "n_sequences": n,
                    "clusters": ks,
                    "distortions": distortions,
                    "distance_matrix": D,
                }
        return results

    def plot_grads(self, out_path=None):
        """Histogram of per-call cam gradient norms split by predicted
        class (reference: patient_gradcam.py:365-375 plot_grads).
        Requires the cam generator to have been built with
        ``record_grads=True``; returns (ards_norms, other_norms)."""
        grads = getattr(self.cam, "grads", [])
        preds = getattr(self.cam, "preds", [])
        if not grads:
            raise ValueError(
                "no recorded gradients: construct PatientGradCam with a "
                "cam built record_grads=True and run an op first")
        norms = np.array([
            float(np.sqrt((np.asarray(g) ** 2).sum())) for g in grads
        ])
        outputs = np.array([
            int(np.asarray(p).reshape(-1, p.shape[-1])[0].argmax())
            for p in preds
        ])
        ards = norms[outputs == 1]
        other = norms[outputs == 0]
        plt = _get_plt()
        if plt is not None:
            fig, ax = plt.subplots()
            ax.hist(ards, bins=20, label="ARDS", alpha=0.5)
            ax.hist(other, bins=20, label="Other", alpha=0.5)
            ax.legend()
            if out_path:
                fig.savefig(out_path, dpi=120)
            plt.close(fig)
        return ards, other

    def do_op(self, op, **kwargs):
        """Dispatch table covering the reference's full --ops surface
        (reference: patient_gradcam.py:384,421-437)."""
        return {
            "medians": self.do_medians,
            "averages": self.do_averages,
            "sample_seqs": self.do_sample_sequences,
            "read_cam": self.do_read_cam,
            "rand_sample": self.do_rand_sample,
            "dtw_clust": self.do_dtw_clust,
            "cam_by_hour": self.do_cam_by_hour,
        }[op](**kwargs)
