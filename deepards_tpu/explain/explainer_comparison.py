"""Side-by-side comparison of explanation methods per patient-hour.

Capability parity with the reference's explainer comparison
(reference: deepards/explainer_comparison.py:28-242): for correctly
classified patients, line up GradCAM activation summaries, ProtoPNet
prototype similarities, and (when provided) feature-importance scores of
a classical model by hour, so reviewers can compare what each method
attends to.
"""
import numpy as np
import pandas as pd


class ExplainerComparison:
    def __init__(self, dataset, results):
        from deepards_tpu.data.pipeline import gather_pipeline

        self.dataset = dataset
        self.results = results
        self.gt = dataset.get_ground_truth_df()
        # cams run on pipeline-normalized inputs (training scale)
        self.pipeline = gather_pipeline(dataset)

    def correctly_classified_patients(self):
        latest = self.results.results[
            self.results.results.epoch_num
            == self.results.results.epoch_num.max()
        ]
        ok = latest[latest.patho == latest.prediction]
        return ok.patient.tolist()

    def gradcam_summary(self, cam_generator, patient_id, max_windows=8):
        """Mean cam intensity by hour for one patient."""
        rows = self.gt[self.gt.patient == patient_id]
        out = []
        for idx in rows.index[:max_windows]:
            window = self.pipeline(self.dataset.cache.data[int(idx)])
            target = int(rows.loc[idx].y)
            cam, _ = cam_generator.generate_cam(window, target)
            out.append({
                "window_index": int(idx),
                "hour": float(rows.loc[idx].hour),
                "cam_mean": float(np.asarray(cam, np.float64).mean()),
                "cam_peak_pos": int(np.argmax(cam)),
            })
        return pd.DataFrame(out)

    def protopnet_summary(self, activation_frame, patient_id):
        """Strongest prototype per window for one patient."""
        rows = self.gt[self.gt.patient == patient_id]
        sub = activation_frame[
            activation_frame.window_index.isin(rows.index)
        ].copy()
        proto_cols = [c for c in sub.columns if c.startswith("proto_")]
        sub["best_prototype"] = (
            sub[proto_cols].to_numpy().argmax(axis=1)
        )
        sub["hour"] = [
            float(rows.loc[i].hour) for i in sub.window_index
        ]
        return sub[["window_index", "hour", "best_prototype", "prediction"]]

    def compare(self, cam_generator=None, activation_frame=None,
                rf_importances=None):
        """Merged per-patient comparison frame across available methods."""
        frames = []
        for pt in self.correctly_classified_patients():
            merged = None
            if cam_generator is not None:
                merged = self.gradcam_summary(cam_generator, pt)
                merged["patient"] = pt
            if activation_frame is not None:
                pp = self.protopnet_summary(activation_frame, pt)
                pp["patient"] = pt
                merged = (
                    pp if merged is None
                    else merged.merge(
                        pp, on=["window_index", "patient"], how="outer",
                        suffixes=("", "_pp"),
                    )
                )
            if merged is not None:
                frames.append(merged)
        out = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame()
        )
        if rf_importances is not None and len(out):
            out["rf_top_feature"] = str(
                max(rf_importances, key=rf_importances.get)
            )
        return out
