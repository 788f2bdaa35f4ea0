"""Host-side batch iteration over a window dataset.

Replaces the reference's torch DataLoader + per-item __getitem__
(reference: train_ards_detector.py:324-337): the whole cache is already a
dense array, so an epoch is just a shuffled index array chunked into
batches; each batch is one ``gather`` + one device_put, and normalization
runs on-device (deepards_tpu.data.pipeline).
"""
import numpy as np


class EpochLoader:
    def __init__(self, dataset, batch_size, shuffle=True, rng=None,
                 drop_last=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = rng or np.random.default_rng(0)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset.current_indices())
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def __iter__(self):
        idx = np.asarray(self.dataset.current_indices())
        if self.shuffle:
            idx = self.rng.permutation(idx)
        n = len(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            yield self.dataset.gather(idx[start : start + self.batch_size])
