"""KMedoids (PAM-style alternate) estimator with precomputed-metric
support.

Replaces the reference's vendored sklearn-extra-style implementation
(reference: deepards/mediods.py:24-433) with a compact alternating
assign/update algorithm over the distance matrix.
"""
import numpy as np


class KMedoids:
    def __init__(self, n_clusters=8, metric="euclidean", max_iter=300,
                 random_state=0):
        self.n_clusters = n_clusters
        self.metric = metric
        self.max_iter = max_iter
        self.random_state = random_state

    def _distances(self, X):
        if self.metric == "precomputed":
            return np.asarray(X, np.float64)
        X = np.asarray(X, np.float64)
        return np.sqrt(
            ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        )

    def fit(self, X):
        D = self._distances(X)
        n = D.shape[0]
        if self.n_clusters > n:
            raise ValueError(
                "n_clusters {} > n_samples {}".format(self.n_clusters, n)
            )
        rng = np.random.default_rng(self.random_state)
        medoids = rng.choice(n, self.n_clusters, replace=False)
        for _ in range(self.max_iter):
            labels = np.argmin(D[:, medoids], axis=1)
            new_medoids = medoids.copy()
            for k in range(self.n_clusters):
                members = np.nonzero(labels == k)[0]
                if len(members) == 0:
                    continue
                intra = D[np.ix_(members, members)].sum(axis=1)
                new_medoids[k] = members[np.argmin(intra)]
            if np.array_equal(np.sort(new_medoids), np.sort(medoids)):
                break
            medoids = new_medoids
        self.medoid_indices_ = medoids
        self.labels_ = np.argmin(D[:, medoids], axis=1)
        self.inertia_ = float(
            D[np.arange(n), medoids[self.labels_]].sum()
        )
        self._fit_D = D
        return self

    def predict(self, X):
        if self.metric == "precomputed":
            D = np.asarray(X, np.float64)
            return np.argmin(D[:, self.medoid_indices_], axis=1)
        D = self._distances(X)
        return np.argmin(D[:, self.medoid_indices_], axis=1)
