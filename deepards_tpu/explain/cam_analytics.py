"""GradCAM analytics: cluster-count search, PCA visualization,
cluster-prototype extraction, frequency-domain cam studies.

Capability parity with the reference cam analytics
(reference: deepards/gradcam.py:268-1062): elbow/silhouette/gap-statistic
cluster search over a cam matrix, PCA scatter of cam clusters, per-cluster
"prototype" sequences (closest row to each centroid), and butterworth-band
frequency studies of cams between pathophysiologies.
"""
import numpy as np
import pandas as pd


def _kmeans_fit(X, k, seed=0):
    from deepards_tpu.cli.create_datasets import _kmeans

    labels = _kmeans(X, k, seed=seed)
    centers = np.stack([
        X[labels == j].mean(axis=0) if (labels == j).any()
        else np.zeros(X.shape[1])
        for j in range(k)
    ])
    inertia = float(((X - centers[labels]) ** 2).sum())
    return labels, centers, inertia


def kmean_clust_search(X, max_clusts=10, nrefs=3, seed=0):
    """Elbow distortions/inertias, silhouette scores, and the
    gap-statistic-optimal cluster count
    (reference: gradcam.py:268-332).  Returns
    (distortions, inertias, silhouettes, best_k, gap_frame)."""
    from sklearn.metrics import silhouette_score

    X = np.asarray(X, np.float64)
    rng = np.random.default_rng(seed)
    ks = range(2, max_clusts)
    distortions, inertias, sil, gaps = [], [], [], []
    for k in ks:
        labels, centers, inertia = _kmeans_fit(X, k, seed)
        d = np.sqrt(((X[:, None] - centers[None]) ** 2).sum(-1))
        distortions.append(float(d.min(axis=1).mean()))
        inertias.append(inertia)
        try:
            sil.append(float(silhouette_score(X, labels)))
        except ValueError:
            sil.append(0.0)
        ref_disps = []
        for r in range(nrefs):
            ref = rng.random(X.shape)
            _, _, ref_inertia = _kmeans_fit(ref, k, seed + r + 1)
            ref_disps.append(ref_inertia)
        gaps.append(
            float(np.log(np.mean(ref_disps)) - np.log(max(inertia, 1e-12)))
        )
    gap_frame = pd.DataFrame({"clusterCount": list(ks), "gap": gaps})
    best_k = int(np.argmax(gaps)) + 2
    return distortions, inertias, sil, best_k, gap_frame


def pca_2d(X):
    """2-component PCA coordinates (for cam scatter plots;
    reference: gradcam.py:334-343)."""
    X = np.asarray(X, np.float64)
    Xc = X - X.mean(axis=0)
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    return Xc @ vt[:2].T


def viz_pca_clustering(X, out_path=None, max_k=6, seed=0):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    coords = pca_2d(X)
    ks = list(range(2, max_k))
    fig, axes = plt.subplots(1, len(ks), figsize=(3.2 * len(ks), 3))
    for ax, k in zip(np.atleast_1d(axes), ks):
        labels, _, _ = _kmeans_fit(np.asarray(X, np.float64), k, seed)
        for i in range(k):
            m = labels == i
            ax.scatter(coords[m, 0], coords[m, 1], s=8)
        ax.set_title("k={}".format(k))
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def cluster_prototypes(X, n_clust, dataset, sequence_map, seed=0):
    """Per-cluster prototype sequences: the window whose cam row lies
    closest to each centroid (reference: gradcam.py:346-374)."""
    X = np.asarray(X, np.float64)
    labels, centers, _ = _kmeans_fit(X, n_clust, seed)
    d = np.sqrt(((X[:, None] - centers[None]) ** 2).sum(-1))  # (N, K)
    closest = d.argmin(axis=0)  # (K,)
    out = []
    for k in range(n_clust):
        true_idx = int(sequence_map[int(closest[k])])
        out.append({
            "cluster": k,
            "window_index": true_idx,
            "sequence": dataset.cache.data[true_idx],
            "n_members": int((labels == k).sum()),
        })
    return out


def frequency_band_analytics(cams_by_patho, fs=50.0):
    """Per-patho cam spectral energy by band (the butterworth band study,
    reference: gradcam.py:376-1062 condensed): mean |FFT| energy of cams
    in low/mid/high bands per pathophysiology."""
    bands = {"0-2Hz": (0.0, 2.0), "2-8Hz": (2.0, 8.0), "8-25Hz": (8.0, 25.0)}
    rows = []
    for patho, cams in cams_by_patho.items():
        cams = np.asarray(cams, np.float64)
        if cams.size == 0:
            rows.append({"patho": patho, **{b: 0.0 for b in bands}})
            continue
        n = cams.shape[-1]
        freqs = np.fft.rfftfreq(n, d=1.0 / fs * (224.0 / n))
        spec = np.abs(np.fft.rfft(cams, axis=-1)).mean(axis=0)
        row = {"patho": patho}
        for name, (lo, hi) in bands.items():
            m = (freqs >= lo) & (freqs < hi)
            row[name] = float(spec[m].sum()) if m.any() else 0.0
        rows.append(row)
    return pd.DataFrame(rows)


def collect_cams(cam_generator, dataset, max_windows=64):
    """Cam matrix over the dataset's current windows + index map.
    Windows run through the fold pipeline first — cams must see inputs
    at the scale the checkpoint was trained at."""
    from deepards_tpu.data.pipeline import gather_pipeline

    pipeline = gather_pipeline(dataset)
    gt = dataset.get_ground_truth_df()
    X, seq_map, pathos = [], [], []
    for idx in gt.index[:max_windows]:
        window = pipeline(dataset.cache.data[int(idx)])
        target = int(gt.loc[int(idx)].y)
        cam, _ = cam_generator.generate_cam(window, target)
        X.append(np.asarray(cam, np.float64))
        seq_map.append(int(idx))
        pathos.append(target)
    return np.stack(X), seq_map, np.asarray(pathos)
