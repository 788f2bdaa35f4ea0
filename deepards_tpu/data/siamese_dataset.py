"""Siamese triplet dataset: (window, positive, negative) per sample.

Capability parity with the reference SiameseNetworkDataset
(reference: deepards/dataset.py:1463-1620): positive = the next window of
the same patient, negative = a random window of another patient; patients
with a single window are dropped (:1491-1498); a large ventilator-bn gap
resets the "next window" chain so positives stay temporally adjacent
(:1530-1535 — approximated here by requiring consecutive cache windows).

Built as a thin sampling view over the dense WindowCache: triplets are
index triples resolved at gather time, so the device still sees plain
dense batches.
"""
import numpy as np

from deepards_tpu.data.dataset import ARDSRawDataset


class SiameseWindowDataset:
    def __init__(self, data_path=None, experiment_num=1, n_sub_batches=20,
                 dataset_type="unpadded_centered_sequences", cohort_file=None,
                 train=True, to_pickle=None, base_dataset=None, seed=42):
        if base_dataset is None:
            base_dataset = ARDSRawDataset(
                data_path,
                experiment_num,
                cohort_file,
                n_sub_batches,
                dataset_type,
                train=train,
                kfold_num=None,
                total_kfolds=None,
                holdout_set_type="main",
                seed=seed,
            )
        self.base = base_dataset
        self.train = train
        self._rng = np.random.default_rng(seed)
        self._build_index()
        if to_pickle:
            self.base.save(to_pickle)

    @property
    def n_sub_batches(self):
        return self.base.n_sub_batches

    @property
    def scaling_factors(self):
        return self.base.scaling_factors

    @scaling_factors.setter
    def scaling_factors(self, v):
        self.base.scaling_factors = v

    def _build_index(self):
        cache = self.base.cache
        pt_idx = cache.patient_idx
        self.anchor_idx = []
        self.pos_idx = []
        by_patient = {}
        for i in range(len(cache)):
            by_patient.setdefault(int(pt_idx[i]), []).append(i)
        # drop single-window patients; anchor = window w, positive = w+1
        for pt, idxs in by_patient.items():
            if len(idxs) < 2:
                continue
            for a, b in zip(idxs[:-1], idxs[1:]):
                self.anchor_idx.append(a)
                self.pos_idx.append(b)
        self.anchor_idx = np.asarray(self.anchor_idx, np.int64)
        self.pos_idx = np.asarray(self.pos_idx, np.int64)
        self._by_patient = by_patient

    def __len__(self):
        return len(self.anchor_idx)

    def current_indices(self):
        return np.arange(len(self), dtype=np.int64)

    def sample_triplet_indices(self, rel_indices):
        """rel_indices -> (anchor, pos, neg) ABSOLUTE cache indices —
        the host-cheap half of triplet sampling, so callers can gather
        the windows on device from an uploaded cache."""
        cache = self.base.cache
        a = self.anchor_idx[rel_indices]
        p = self.pos_idx[rel_indices]
        neg = np.empty(len(a), np.int64)
        for k, ai in enumerate(a):
            own = int(cache.patient_idx[ai])
            while True:
                j = int(self._rng.integers(0, len(cache)))
                if int(cache.patient_idx[j]) != own:
                    neg[k] = j
                    break
        return a, p, neg

    def sample_triplets(self, rel_indices):
        """rel_indices -> (seq, pos, neg) raw window arrays."""
        cache = self.base.cache
        a, p, neg = self.sample_triplet_indices(rel_indices)
        return cache.data[a], cache.data[p], cache.data[neg]

    @classmethod
    def from_pickle(cls, path, *args, **kwargs):
        base = ARDSRawDataset.from_pickle(path)
        return cls(base_dataset=base)
