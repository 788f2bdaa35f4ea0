"""Per-patient GradCAM operations CLI.

Capability parity with the reference ops surface
(reference: deepards/patient_gradcam.py:30-437): for each patient in a
fold, compute cams over median/average breaths, sampled sequences, or full
reads, and save overlay plots under
``gradcam_results/<op>/<patho>/`` (layout documented in reference
README.md:127-160).  Plotting degrades to .npz dumps when matplotlib is
unavailable.
"""
import os

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


class PatientGradCam:
    def __init__(self, model, params, dataset, results_dir="gradcam_results",
                 cam_cls=MaxMinNormCam):
        self.cam = cam_cls(model, params)
        self.dataset = dataset
        self.results_dir = results_dir
        self.gt = dataset.get_ground_truth_df()

    def _patient_rows(self, patient_id):
        return self.gt[self.gt.patient == patient_id]

    def _patho_name(self, patient_id):
        rows = self._patient_rows(patient_id)
        return "ards" if int(rows.y.iloc[0]) == 1 else "non_ards"

    def _save(self, op, patient_id, breath, cam, suffix=""):
        patho = self._patho_name(patient_id)
        out_dir = os.path.join(self.results_dir, op, patho)
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

    def _patient_data(self, patient_id):
        idx = self._patient_rows(patient_id).index.to_numpy()
        return self.dataset.gather(idx)

    def do_medians(self):
        """Median breath per patient -> cam overlay
        (reference: patient_gradcam.py medians op)."""
        for pt in self.gt.patient.unique():
            data = self._patient_data(pt)["data"]
            med = np.median(
                data.reshape(-1, data.shape[-2], data.shape[-1]), axis=0
            )
            read = np.repeat(
                med[None], self.dataset.n_sub_batches, axis=0
            )
            target = int(self._patient_rows(pt).y.iloc[0])
            cam, _ = self.cam.generate_cam(read, target)
            self._save("medians", pt, med[0], cam)

    def do_averages(self):
        for pt in self.gt.patient.unique():
            data = self._patient_data(pt)["data"]
            avg = data.reshape(
                -1, data.shape[-2], data.shape[-1]
            ).mean(axis=0)
            read = np.repeat(avg[None], self.dataset.n_sub_batches, axis=0)
            target = int(self._patient_rows(pt).y.iloc[0])
            cam, _ = self.cam.generate_cam(read, target)
            self._save("averages", pt, avg[0], cam)

    def do_sample_sequences(self, n=2, rng=None):
        rng = rng or np.random.default_rng(0)
        for pt in self.gt.patient.unique():
            rows = self._patient_rows(pt)
            pick = rng.choice(rows.index.to_numpy(),
                              size=min(n, len(rows)), replace=False)
            target = int(rows.y.iloc[0])
            for i, idx in enumerate(pick):
                window = self.dataset.gather([idx])["data"][0]
                cam, _ = self.cam.generate_cam(window, target)
                breath = window.reshape(-1)[: window.shape[-1]]
                self._save("sample_seqs", pt, breath, cam,
                           suffix="-{}".format(i))

    def do_read_cam(self, rng=None):
        """Full 20-breath read cams (one cam row per breath)."""
        rng = rng or np.random.default_rng(0)
        for pt in self.gt.patient.unique():
            rows = self._patient_rows(pt)
            idx = int(rng.choice(rows.index.to_numpy()))
            window = self.dataset.gather([idx])["data"][0]
            target = int(rows.y.iloc[0])
            cams, _ = self.cam.generate_read_cam(window, target)
            for b in range(min(3, cams.shape[0])):
                self._save("read_cam", pt, window[b, 0], cams[b],
                           suffix="-b{}".format(b))

    def do_op(self, op):
        return {
            "medians": self.do_medians,
            "averages": self.do_averages,
            "sample_seqs": self.do_sample_sequences,
            "read_cam": self.do_read_cam,
        }[op]()
