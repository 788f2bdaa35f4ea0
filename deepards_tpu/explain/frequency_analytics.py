"""Frequency-domain GradCAM studies: the full 1D/2D/butterworth cam
analytics suite (capability parity with reference deepards/gradcam.py
376-1062: ``one_d_analytics``, ``two_d_analytics``,
``butterworth_1d_analytics``, ``butter_plots``, ``one_two_d_comparison``
plus the fft splice/mask helpers at gradcam.py:236-266).

Structure shift from the reference: the reference interleaves data
collection, pandas munging, and seaborn calls in ~700 lines of script; here
each study is split into a pure data stage (returns DataFrames/arrays —
unit-testable) and a thin plot stage (matplotlib Agg, one PNG per study).
The cam collection loop batches windows through the jitted cam program
instead of one python dispatch per sample.
"""
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from deepards_tpu.explain.gradcam import upsample_cam


# ---- fft helpers (reference: gradcam.py:236-266) ---------------------------

def cam_process(cam, target_len=224, normalize=True):
    """Resize a cam to the sequence length and optionally 0-1 normalize
    (reference ``cam_process``, gradcam.py:236-245; cv2.resize ->
    jax.image.resize)."""
    cam = upsample_cam(np.asarray(cam, np.float64), target_len)
    cam = np.asarray(cam, np.float64)
    if normalize:
        cam = cam - cam.min()
        mx = cam.max()
        cam = cam / (mx if mx else 1.0)
    return cam


def get_fft(seq):
    """Recombine the (real, imag) channel pair of an fft-mode window into
    the complex shifted spectrum (reference: gradcam.py:247-252)."""
    seq = np.asarray(seq)
    return seq[:, 0, :] + 1j * seq[:, 1, :]


def fft_to_ts(seq):
    """(reference: gradcam.py:254-258)"""
    return np.fft.ifft(np.fft.ifftshift(get_fft(seq), axes=-1), axis=-1)


def fft_to_ts_with_mask(seq, mask):
    """Reconstruct the waveform keeping only masked frequency bins
    (reference: gradcam.py:261-265)."""
    fft = get_fft(seq) * np.asarray(mask)
    return np.fft.ifft(np.fft.ifftshift(fft, axes=-1), axis=-1)


def splice_frequencies(dst_seq, src_seq, freq_mask):
    """Replace dst's masked frequency channels with src's — the splicing
    experiment probing whether high-frequency content flips predictions
    (reference: gradcam.py:689-703).  Works on fft-mode windows (S, 2, L)
    with a boolean (L,) mask over the shifted frequency axis."""
    dst = np.array(dst_seq, copy=True)
    src = np.asarray(src_seq)
    num_mask = np.argwhere(np.asarray(freq_mask)).ravel()
    dst[:, :, num_mask] = src[:, :, num_mask]
    return dst


def representative_index(cams):
    """Row closest (L2) to the mean cam — the "representative waveform"
    pick (reference: gradcam.py:967-973)."""
    cams = np.asarray(cams, np.float64)
    avg = np.nanmean(cams, axis=0)
    return int(((cams - avg) ** 2).sum(axis=tuple(range(1, cams.ndim))).argmin())


# ---- cam collection ---------------------------------------------------------

@dataclass
class StudyCams:
    """Cams collected per predicted pathophysiology across folds."""

    cams: Dict[int, List[np.ndarray]] = field(
        default_factory=lambda: {0: [], 1: []}
    )
    seq_idxs: Dict[int, List[int]] = field(
        default_factory=lambda: {0: [], 1: []}
    )
    model_outs: Dict[int, List[np.ndarray]] = field(
        default_factory=lambda: {0: [], 1: []}
    )
    kfold_idxs: Dict[int, List[tuple]] = field(
        default_factory=lambda: {0: [], 1: []}
    )
    inputs_by_truth: Dict[int, List[np.ndarray]] = field(
        default_factory=lambda: {0: [], 1: []}
    )

    def as_arrays(self, patho):
        return np.asarray(self.cams[patho], np.float64)


def collect_study_cams(
    cam_factory,
    dataset,
    params_by_fold,
    n_samps=50,
    target_len=224,
    normalize=True,
    seed=0,
):
    """Per-fold cam sweep (the common loop of every reference study,
    gradcam.py:404-443/509-545/903-940): for each fold, instantiate the
    cam generator from that fold's params, sample windows, generate
    ground-truth-target cams, and bucket them by PREDICTED class.
    """
    rng = np.random.default_rng(seed)
    study = StudyCams()
    from deepards_tpu.data.pipeline import gather_pipeline

    for fold, params in params_by_fold.items():
        dataset.set_kfold_indexes_for_fold(fold)
        # cams must see pipeline-normalized inputs (the scale the fold's
        # checkpoint was trained at; reference scales in __getitem__)
        pipeline = gather_pipeline(dataset)
        gen = cam_factory(params)
        gt = dataset.get_ground_truth_df()
        n = min(n_samps, len(gt))
        if n_samps >= len(gt):
            picks = list(gt.index)
        else:
            picks = [int(rng.integers(0, len(gt))) for _ in range(n)]
            picks = [int(gt.index[p]) for p in picks]
        for idx in picks:
            idx = int(idx)
            window = pipeline(dataset.cache.data[idx])
            truth = int(gt.loc[idx].y)
            cam, out = gen.generate_cam(window, truth)
            cam = cam_process(cam, target_len, normalize)
            pred = int(np.asarray(out).argmax())
            study.cams[pred].append(cam)
            study.seq_idxs[pred].append(idx)
            study.model_outs[pred].append(np.asarray(out).ravel())
            study.kfold_idxs[pred].append((fold, idx))
            study.inputs_by_truth[truth].append(np.asarray(window))
    return study


# ---- data frames (the pure analytic cores) ---------------------------------

def cam_intensity_frame(study, freqs=None, target_len=224):
    """Long-form frame <Cam Intensity, Frequency, Patho> feeding the
    per-frequency intensity lineplot (reference: gradcam.py:446-455 (2D),
    589-594 (1D), 941-946 (butterworth — positional axis))."""
    if freqs is None:
        freqs = np.arange(target_len, dtype=np.float64)
    frames = []
    for patho in (1, 0):
        cams = study.as_arrays(patho)
        if cams.size == 0:
            continue
        cams2 = cams.reshape(len(cams), -1)
        reps = cams2.shape[1] // len(freqs)
        frames.append(pd.DataFrame({
            "Cam Intensity": cams2.ravel(),
            "Frequency": np.tile(np.repeat(freqs[None], reps, 0).ravel(),
                                 len(cams)),
            "Patho": patho,
        }))
    return pd.concat(frames, ignore_index=True)


def frequency_band_frame(study, idx_jump=14, target_len=224):
    """Input-intensity boxplot frame by frequency band <val, freq, patho>
    (reference: gradcam.py:552-563)."""
    rows = []
    for patho in (1, 0):
        imgs = study.inputs_by_truth[patho]
        if not imgs:
            continue
        arr = np.asarray(imgs, np.float64)  # (N, S, C, L)
        for start in range(0, target_len, idx_jump):
            vals = arr[..., 0, start:start + idx_jump].ravel()
            rows.append(pd.DataFrame({
                "val": vals, "freq": start, "patho": patho,
            }))
    return pd.concat(rows, ignore_index=True)


def zero_high_freq_sanity(seq, freqs, hz=15.0):
    """Zero all bins >= hz and return the masked window — the reference's
    "set high frequencies to 0" sanity check (gradcam.py:705-712)."""
    mask = ~(np.abs(np.asarray(freqs)) >= hz)
    out = np.array(seq, copy=True)
    out[:, :, ~mask] = 0.0
    return out


def _mean_ci_plot(ax, frame, x_col, y_col, hue_col, labels):
    """Mean line with an IQR band per hue — the matplotlib stand-in for
    the reference's seaborn lineplot."""
    for patho, label in labels.items():
        sub = frame[frame[hue_col] == patho]
        if not len(sub):
            continue
        g = sub.groupby(x_col)[y_col]
        mean = g.mean()
        lo = g.quantile(0.25)
        hi = g.quantile(0.75)
        ax.plot(mean.index, mean.values, label=label, lw=2)
        ax.fill_between(mean.index, lo.values, hi.values, alpha=0.25)
    ax.legend()
    ax.grid(axis="y")


# ---- the four studies -------------------------------------------------------

def _plot_intensity(frame, out_path, xlabel, title=None, xlim=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(16, 10))
    _mean_ci_plot(ax, frame, "Frequency", "Cam Intensity", "Patho",
                  {0: "Non-ARDS", 1: "ARDS"})
    ax.set_xlabel(xlabel, fontsize=16)
    ax.set_ylabel("Cam Intensity", fontsize=16)
    if xlim:
        ax.set_xlim(xlim)
    if title:
        ax.set_title(title, fontsize=18)
    fig.savefig(out_path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return out_path


def one_d_analytics(cam_factory, dataset, params_by_fold, out_dir,
                    n_samps=50, fs=50.0, target_len=224, seed=0):
    """1D fft-model cam study (reference: gradcam.py:474-745): cam
    intensity by frequency + input boxplot by frequency band + the
    high-frequency splice experiment on confident ARDS predictions.
    Returns {frames, pngs}."""
    os.makedirs(out_dir, exist_ok=True)
    freqs = np.fft.fftshift(np.fft.fftfreq(target_len, d=1.0 / fs))
    study = collect_study_cams(
        cam_factory, dataset, params_by_fold, n_samps,
        target_len, normalize=True, seed=seed,
    )
    intensity = cam_intensity_frame(study, freqs, target_len)
    bands = frequency_band_frame(study, idx_jump=14, target_len=target_len)

    pngs = [_plot_intensity(
        intensity, os.path.join(out_dir, "1d_cam_intensities.png"),
        "Frequency", xlim=(-25.2, 25.2),
    )]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(16, 10))
    starts = sorted(bands.freq.unique())
    for off, (patho, label) in enumerate(
        {0: "Non-ARDS", 1: "ARDS"}.items()
    ):
        data = [
            bands[(bands.freq == s) & (bands.patho == patho)].val.values
            for s in starts
        ]
        pos = np.arange(len(starts)) + (off - 0.5) * 0.35
        ax.boxplot(data, positions=pos, widths=0.3, showfliers=False,
                   label=label)
    ax.set_xticks(np.arange(len(starts)))
    ax.set_xticklabels(["{}".format(round(freqs[s], 1)) for s in starts],
                       fontsize=10)
    ax.set_xlabel("Frequency Start", fontsize=16)
    ax.grid(axis="y")
    p = os.path.join(out_dir, "fft_freq_box.png")
    fig.savefig(p, dpi=200, bbox_inches="tight")
    plt.close(fig)
    pngs.append(p)

    # splice experiment: graft >=15Hz content of confident ARDS windows
    # into non-ARDS windows and record the prediction shift
    splices = splice_experiment(
        cam_factory, dataset, params_by_fold, study, freqs, seed=seed
    )
    return {
        "intensity": intensity,
        "bands": bands,
        "splices": splices,
        "pngs": pngs,
    }


def splice_experiment(cam_factory, dataset, params_by_fold, study, freqs,
                      hz=15.0, conf=0.95, max_pairs=5, seed=0):
    """High-frequency splice probe (reference: gradcam.py:678-703): for
    ARDS windows predicted with softmax > conf, splice their >= hz bins
    into a random other-class window and record before/after outputs."""
    from deepards_tpu.data.pipeline import gather_pipeline

    rng = np.random.default_rng(seed)
    freq_mask = np.abs(freqs) >= hz
    results = []
    if not study.kfold_idxs[0]:
        return pd.DataFrame(results)
    # pipelines hold per-fold mu/std + the (fold-invariant) butter SOS;
    # build each fold's once — per-sample rebuilds re-run the scipy
    # filter design and re-upload the device constants every iteration
    pipes = {}

    def pipe_for(fold):
        if fold not in pipes:
            dataset.set_kfold_indexes_for_fold(fold)
            pipes[fold] = gather_pipeline(dataset)
        return pipes[fold]

    for i, out in enumerate(study.model_outs[1]):
        ex = np.exp(out - out.max())
        if (ex / ex.sum())[1] <= conf:
            continue
        fold, idx = study.kfold_idxs[1][i]
        seq = pipe_for(fold)(dataset.cache.data[idx])
        o_fold, o_idx = study.kfold_idxs[0][
            int(rng.integers(0, len(study.kfold_idxs[0])))
        ]
        other = pipe_for(o_fold)(dataset.cache.data[o_idx])
        gen = cam_factory(params_by_fold[o_fold])
        _, out_before = gen.generate_cam(other, 0)
        spliced = splice_frequencies(other, seq, freq_mask)
        _, out_after = gen.generate_cam(spliced, 0)
        results.append({
            "ards_idx": idx,
            "other_idx": o_idx,
            "before_ards_logit": float(np.asarray(out_before).ravel()[1]),
            "after_ards_logit": float(np.asarray(out_after).ravel()[1]),
            "flipped": bool(
                np.asarray(out_after).ravel().argmax() == 1
            ),
        })
        if len(results) >= max_pairs:
            break
    return pd.DataFrame(results)


def two_d_analytics(cam_factory, dataset, params_by_fold, out_dir,
                    n_samps=50, fs=50.0, target_len=224, seed=0):
    """2D fft-model cam study (reference: gradcam.py:376-471): per-pixel
    cams resized to (L, L), intensity aggregated over the frequency
    axis."""
    os.makedirs(out_dir, exist_ok=True)
    freqs = np.fft.fftshift(np.fft.fftfreq(target_len, d=1.0 / fs))

    def factory_2d(params):
        gen = cam_factory(params)

        class TwoD:
            def generate_cam(self, window, target):
                cam, out = gen.generate_cam(window, target)
                cam2 = np.asarray(cam, np.float64)
                if cam2.ndim == 1:
                    cam2 = np.repeat(cam2[None], target_len, axis=0)
                return cam2, out

        return TwoD()

    study = collect_study_cams(
        factory_2d, dataset, params_by_fold, n_samps,
        target_len, normalize=False, seed=seed,
    )
    intensity = cam_intensity_frame(study, freqs, target_len)
    png = _plot_intensity(
        intensity,
        os.path.join(out_dir, "2d_cam_unnormalized_intensities.png"),
        "Frequency", xlim=(-25.2, 25.2),
    )
    return {"intensity": intensity, "pngs": [png]}


def butterworth_1d_analytics(cam_factory, dataset, dataset_no_filter,
                             params_by_fold, experiment, hz_low, hz_high,
                             out_dir, n_samps=50, target_len=224, seed=0):
    """Band-filtered cam study (reference: gradcam.py:878-1054): cam
    intensity by sample position on a butterworth-filtered dataset, plus
    the representative (closest-to-mean-cam) sequences and their
    unfiltered counterparts as median "prototypes"."""
    os.makedirs(out_dir, exist_ok=True)
    study = collect_study_cams(
        cam_factory, dataset, params_by_fold, n_samps,
        target_len, normalize=True, seed=seed,
    )
    intensity = cam_intensity_frame(study, None, target_len)
    pngs = [_plot_intensity(
        intensity,
        os.path.join(out_dir, "{}-{}-{}hz-gradcam.png".format(
            experiment, hz_low, hz_high)),
        "", title="{}-{}Hz Gradcam".format(hz_low, hz_high),
    )]

    protos = {}
    for patho in (1, 0):
        cams = study.as_arrays(patho)
        if cams.size == 0:
            continue
        rep = representative_index(cams)
        fold, idx = study.kfold_idxs[patho][rep]
        for tag, dat in (("filtered", dataset),
                         ("no_filter", dataset_no_filter)):
            dat.set_kfold_indexes_for_fold(fold)
            # prototypes plot in physical units; cache rows are RAW
            # here (normalization AND filtering happen on device), so
            # the filtered panel must run the row through the dataset's
            # own butter filter — without it both panels would show the
            # identical raw median, never the band-limited signal
            seq = np.asarray(dat.cache.data[idx], np.float64)
            if tag == "filtered":
                import jax.numpy as jnp

                from deepards_tpu.data.pipeline import (
                    design_butter_sos,
                    sosfilt,
                )

                sos = design_butter_sos(dat.butter_low, dat.butter_high)
                if sos is not None:
                    seq = np.asarray(sosfilt(
                        jnp.asarray(sos, jnp.float32),
                        jnp.asarray(seq, jnp.float32),
                    ), np.float64)
            protos[(patho, tag)] = np.median(seq, axis=0).ravel()
        protos[(patho, "mean_cam")] = np.nanmean(cams, axis=0).ravel()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(20, 10))
    for col, patho in enumerate((1, 0)):
        name = "ARDS" if patho else "Non-ARDS"
        if (patho, "mean_cam") not in protos:
            continue
        ax = axes[0][col]
        ax2 = ax.twinx()
        ax2.plot(protos[(patho, "filtered")], lw=2, color="tab:green",
                 label="Prototype")
        ax.plot(protos[(patho, "mean_cam")], lw=3, alpha=0.6,
                label="Mean Cam")
        ax.set_title(name)
        ax.grid(axis="y")
        axes[1][col].plot(protos[(patho, "no_filter")], lw=2,
                          label="Prototype No Filter")
        axes[1][col].grid(axis="y")
        axes[1][col].legend(loc="upper right")
    fig.suptitle("{}-{}Hz Cam and Mean Prototypes".format(hz_low, hz_high),
                 fontsize=18)
    p = os.path.join(out_dir, "{}-{}-{}hz-prototypes.png".format(
        experiment, hz_low, hz_high))
    fig.savefig(p, dpi=200, bbox_inches="tight")
    plt.close(fig)
    pngs.append(p)
    return {"intensity": intensity, "prototypes": protos, "pngs": pngs}


def butter_plots(dataset_no_filter, index, experiment, hz_low, hz_high,
                 out_dir, fold=0, breath_idx=None, fs=50.0, seed=0):
    """Single-breath butterworth band plot (reference:
    gradcam.py:1062-1093) using the device sosfilt pipeline."""
    from scipy.signal import butter

    from deepards_tpu.data.pipeline import sosfilt

    os.makedirs(out_dir, exist_ok=True)
    if hz_low == 0:
        sos = butter(10, hz_high, fs=fs, output="sos", btype="lowpass")
    elif hz_high >= fs / 2:
        sos = butter(10, hz_low, fs=fs, output="sos", btype="highpass")
    else:
        sos = butter(10, (hz_low, hz_high), fs=fs, output="sos",
                     btype="bandpass")
    dataset_no_filter.set_kfold_indexes_for_fold(fold)
    rng = np.random.default_rng(seed)
    seq = np.asarray(dataset_no_filter.cache.data[index], np.float64)
    if breath_idx is None:
        breath_idx = int(rng.integers(0, seq.shape[0]))
    signal = np.asarray(sosfilt(
        np.asarray(sos, np.float32),
        seq[breath_idx].ravel()[None].astype(np.float32),
    ))[0]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4, 4))
    ax.plot(signal, lw=1.35, label="flow")
    ax.grid(axis="y")
    ax.set_xticks([])
    ax.set_yticks([])
    for s in ("top", "left", "right", "bottom"):
        ax.spines[s].set_visible(False)
    p = os.path.join(out_dir, "butterworth-plt-{}-idx{}-{}-{}hz.png".format(
        experiment, index, hz_low, hz_high))
    fig.savefig(p, dpi=400, bbox_inches="tight", pad_inches=0.0)
    plt.close(fig)
    return p, signal


def one_two_d_comparison(cam_factory_1d, cam_factory_2d, dataset_1d,
                         dataset_2d, params_1d, params_2d, out_dir,
                         n_pairs=4, target_len=224, seed=0):
    """Side-by-side 1D vs 2D cam overlays per breath (reference:
    gradcam.py:747-876, simplified to the per-pair overlay PNGs)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    pngs = []
    from deepards_tpu.data.pipeline import gather_pipeline

    for fold in sorted(params_1d):
        dataset_1d.set_kfold_indexes_for_fold(fold)
        dataset_2d.set_kfold_indexes_for_fold(fold)
        pipe1 = gather_pipeline(dataset_1d)
        pipe2 = gather_pipeline(dataset_2d)
        g1 = cam_factory_1d(params_1d[fold])
        g2 = cam_factory_2d(params_2d[fold])
        gt = dataset_1d.get_ground_truth_df()
        for _ in range(max(1, n_pairs // len(params_1d))):
            idx = int(gt.index[int(rng.integers(0, len(gt)))])
            seq1 = pipe1(dataset_1d.cache.data[idx])
            seq2 = pipe2(
                dataset_2d.cache.data[idx % len(dataset_2d.cache.data)]
            )
            target = int(gt.loc[idx].y)
            breath_n = int(rng.integers(0, seq1.shape[0]))
            cam1, _ = g1.generate_read_cam(seq1, target)
            cam1 = cam_process(cam1[breath_n], target_len, True)
            cam2, _ = g2.generate_cam(seq2, target)
            cam2 = cam_process(np.asarray(cam2, np.float64).ravel(),
                               target_len, True)
            fig, axes = plt.subplots(1, 2, figsize=(12, 5))
            w1 = np.asarray(seq1[breath_n]).ravel()[:target_len]
            w2 = np.asarray(seq2).reshape(seq2.shape[0], -1)[
                breath_n % seq2.shape[0]][:target_len]
            axes[0].plot(w1)
            axes[0].scatter(np.arange(len(w1)), w1, c=cam1[:len(w1)],
                            vmin=0, vmax=1)
            axes[0].set_title("1d")
            axes[1].plot(w2)
            axes[1].scatter(np.arange(len(w2)), w2, c=cam2[:len(w2)],
                            vmin=0, vmax=1)
            axes[1].set_title("2d")
            p = os.path.join(out_dir, "i{}-b{}.png".format(idx, breath_n))
            fig.savefig(p, dpi=200)
            plt.close(fig)
            pngs.append(p)
    return pngs
