"""KMedoids estimator with precomputed-metric support.

Algorithm parity with the reference's vendored sklearn-extra-style
implementation (reference: deepards/mediods.py:24-433): alternating
assign/update over the distance matrix with the reference's exact
semantics — deterministic "heuristic" init (the k points with the
smallest distance-sum, mediods.py:340-344), labels assigned from the
medoids at the top of each iteration, per-cluster medoid adoption only
on STRICT cost improvement (mediods.py:222-255), and convergence when
the medoid set stops changing.  ``init='random'`` and
``init='k-medoids++'`` are also supported.

The default configuration is fully deterministic, so downstream
consumers (sim/dissim split pickers, PatientGradCam dtw_clust elbows)
reproduce the reference's cluster assignments on identical distance
matrices (pinned by tests/test_dtw.py's differential vs the reference's
own mediods.py).
"""
import numpy as np


class KMedoids:
    def __init__(self, n_clusters=8, metric="euclidean", init="heuristic",
                 max_iter=300, random_state=0):
        self.n_clusters = n_clusters
        self.metric = metric
        self.init = init
        self.max_iter = max_iter
        self.random_state = random_state

    def _distances(self, X):
        if self.metric == "precomputed":
            return np.asarray(X, np.float64)
        X = np.asarray(X, np.float64)
        return np.sqrt(
            ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        )

    def _initialize_medoids(self, D, rng):
        """(reference: mediods.py:332-350)"""
        n = len(D)
        if self.init == "random":
            return rng.choice(n, self.n_clusters)
        if self.init == "k-medoids++":
            return self._kpp_init(D, rng)
        if self.init == "heuristic":
            # k points with the smallest sum distance to every other
            return np.argpartition(
                D.sum(axis=1), self.n_clusters - 1
            )[: self.n_clusters].copy()
        raise ValueError("init value '{}' not recognized".format(self.init))

    def _kpp_init(self, D, rng, n_local_trials=None):
        """k-means++-style seeding over the distance matrix
        (reference: mediods.py:352-433)."""
        n_samples = D.shape[0]
        centers = np.empty(self.n_clusters, dtype=int)
        if n_local_trials is None:
            n_local_trials = 2 + int(np.log(self.n_clusters))
        centers[0] = rng.integers(n_samples)
        closest_dist_sq = D[centers[0], :] ** 2
        current_pot = closest_dist_sq.sum()
        for c in range(1, self.n_clusters):
            rand_vals = rng.random(n_local_trials) * current_pot
            candidate_ids = np.searchsorted(
                np.cumsum(closest_dist_sq), rand_vals
            )
            distance_to_candidates = D[candidate_ids, :] ** 2
            best_candidate = None
            best_pot = None
            best_dist_sq = None
            for trial in range(n_local_trials):
                new_dist_sq = np.minimum(
                    closest_dist_sq, distance_to_candidates[trial]
                )
                new_pot = new_dist_sq.sum()
                if best_candidate is None or new_pot < best_pot:
                    best_candidate = candidate_ids[trial]
                    best_pot = new_pot
                    best_dist_sq = new_dist_sq
            centers[c] = best_candidate
            current_pot = best_pot
            closest_dist_sq = best_dist_sq
        return centers

    def _update_medoids_in_place(self, D, labels, medoids):
        """Per-cluster medoid adoption on STRICT improvement
        (reference: mediods.py:222-255)."""
        for k in range(self.n_clusters):
            members = np.nonzero(labels == k)[0]
            if len(members) == 0:
                continue
            in_cluster_costs = D[np.ix_(members, members)].sum(axis=1)
            min_idx = int(np.argmin(in_cluster_costs))
            min_cost = in_cluster_costs[min_idx]
            pos = np.nonzero(members == medoids[k])[0]
            if len(pos):
                curr_cost = in_cluster_costs[int(pos[0])]
            else:
                # A medoid can leave its own cluster when distance ties
                # (e.g. duplicated points) make argmin assign it to a
                # lower-indexed cluster.  The reference's vendored
                # estimator (mediods.py:248-250) takes
                # argmax(all-False) == 0 and silently costs the medoid
                # as members[0]; reproduce that deliberately so medoid
                # sets stay bit-identical on tied fixtures.
                curr_cost = in_cluster_costs[0]
            if min_cost < curr_cost:
                medoids[k] = members[min_idx]

    def fit(self, X):
        D = self._distances(X)
        n = D.shape[0]
        if self.n_clusters > n:
            raise ValueError(
                "n_clusters {} > n_samples {}".format(self.n_clusters, n)
            )
        rng = np.random.default_rng(self.random_state)
        medoids = np.asarray(self._initialize_medoids(D, rng))
        labels = None
        for _ in range(self.max_iter):
            old = medoids.copy()
            # assign from the medoids at the TOP of the iteration; ties
            # break toward the lower cluster index (reference argmin over
            # D[medoids, :] axis=0, mediods.py:192)
            labels = np.argmin(D[medoids, :], axis=0)
            self._update_medoids_in_place(D, labels, medoids)
            if np.array_equal(old, medoids):
                break
        self.medoid_indices_ = medoids
        self.labels_ = labels
        self.inertia_ = float(D[:, medoids].min(axis=1).sum())
        self._fit_D = D
        return self

    def predict(self, X):
        if self.metric == "precomputed":
            D = np.asarray(X, np.float64)
            return np.argmin(D[:, self.medoid_indices_], axis=1)
        D = self._distances(X)
        return np.argmin(D[:, self.medoid_indices_], axis=1)
