"""Dataset-type / filter illustration figures.

Capability parity with the reference's paper figure generator
(reference: aim2_dl_v_rf_compr/main_graph_code.py): per-dataset-type
example window plots (padded, continuous, centered, downsampled rows),
plus butterworth / FFT-filter / downsample overlays of a sample flow
window (main_graph_code.py:320-392 ``butter_plots``/``downsample_plots``).
The filtered views are produced by the same jitted pipeline ops training
uses (data/pipeline.py), so the figures double as a visual check of the
runtime transforms.
"""
import argparse
import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _remove_spines(ax):
    for side in ("top", "right", "left", "bottom"):
        ax.spines[side].set_visible(False)
    ax.set_xticks([])
    ax.set_yticks([])


def window_figs(dataset, out_dir, n_examples=3):
    """One figure per example window: each sub-batch row stacked
    vertically (the reference's padded_*/continuous* panels,
    main_graph_code.py:91-316)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    written = []
    idx = dataset.current_indices()[:n_examples]
    for n, i in enumerate(idx):
        window = np.asarray(dataset.cache.data[int(i)])  # (S, C, L)
        n_rows = min(window.shape[0], 5)
        fig, axes = plt.subplots(nrows=n_rows, figsize=(8, 1.2 * n_rows))
        if n_rows == 1:
            axes = [axes]
        for r in range(n_rows):
            axes[r].plot(window[r][0], lw=0.8)
            _remove_spines(axes[r])
        name = "{}_{}.png".format(dataset.dataset_type, n + 1)
        path = os.path.join(out_dir, name)
        fig.savefig(path, dpi=120, bbox_inches="tight", pad_inches=0.0)
        plt.close(fig)
        written.append(path)
    return written


def butter_figs(flow, out_dir, cutoffs=(20, 15, 10, 6, 2)):
    """Baseline + butterworth-lowpass overlays — the same frequency set
    the reference studied (main_graph_code.py:320-375,
    matlabscipy_butterworth_compr.py:10)."""
    from deepards_tpu.data.pipeline import design_butter_sos, sosfilt

    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for hz in cutoffs:
        # (low, None) is the reference dispatch's lowpass arm
        # (dataset.py:546-559)
        sos = design_butter_sos(hz, None)
        filt = np.asarray(sosfilt(sos, flow))
        fig, ax = plt.subplots(figsize=(6, 2.5))
        ax.plot(flow, lw=0.8, color="#888", label="raw")
        ax.plot(filt, lw=0.9, label="butter lowpass {}hz".format(hz))
        _remove_spines(ax)
        ax.legend(frameon=False, fontsize=7)
        path = os.path.join(out_dir, "butterworth-{}hz.png".format(hz))
        fig.savefig(path, dpi=120, bbox_inches="tight", pad_inches=0.0)
        plt.close(fig)
        written.append(path)
    return written


def fft_filter_figs(flow, out_dir, bands=((0, 10), (0, 6), (0, 2))):
    """FFT band-filter overlays (main_graph_code.py:346-361)."""
    from deepards_tpu.data.pipeline import fft_band_filter

    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for lo, hi in bands:
        filt = np.asarray(fft_band_filter(flow, lo, hi))
        fig, ax = plt.subplots(figsize=(6, 2.5))
        ax.plot(flow, lw=0.8, color="#888", label="raw")
        ax.plot(filt, lw=0.9, label="fft {}-{}hz".format(lo, hi))
        _remove_spines(ax)
        ax.legend(frameon=False, fontsize=7)
        path = os.path.join(out_dir, "fft-filt-{}-{}hz.png".format(lo, hi))
        fig.savefig(path, dpi=120, bbox_inches="tight", pad_inches=0.0)
        plt.close(fig)
        written.append(path)
    return written


def downsample_figs(flow, out_dir, factors=(2.0, 4.0)):
    """Downsample + re-pad views (main_graph_code.py:379-392)."""
    from deepards_tpu.data.pipeline import fft_resample

    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for factor in factors:
        new_len = int(round(len(flow) / factor))
        ds = np.asarray(fft_resample(flow, new_len))
        fig, ax = plt.subplots(figsize=(6, 2.5))
        ax.plot(np.linspace(0, len(flow), len(flow)), flow, lw=0.8,
                color="#888", label="raw")
        ax.plot(np.linspace(0, len(flow), new_len), ds, lw=0.9,
                label="downsampled {}x".format(factor))
        _remove_spines(ax)
        ax.legend(frameon=False, fontsize=7)
        path = os.path.join(out_dir,
                            "downsampled-{}x.png".format(factor))
        fig.savefig(path, dpi=120, bbox_inches="tight", pad_inches=0.0)
        plt.close(fig)
        written.append(path)
    return written


def generate_all(dataset, out_dir, n_examples=3):
    written = window_figs(dataset, out_dir, n_examples)
    i = int(dataset.current_indices()[0])
    flow = np.asarray(dataset.cache.data[i][0][0], np.float32)
    written += butter_figs(flow, out_dir)
    written += fft_filter_figs(flow, out_dir)
    written += downsample_figs(flow, out_dir)
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-dataset-figs")
    parser.add_argument("--train-from-pickle", required=True)
    parser.add_argument("-o", "--out-dir", default="dataset_figs")
    parser.add_argument("--n-examples", type=int, default=3)
    args = parser.parse_args(argv)

    from deepards_tpu.data.dataset import ARDSRawDataset

    ds = ARDSRawDataset.from_pickle(args.train_from_pickle)
    if ds.total_kfolds:
        ds.set_kfold_indexes_for_fold(0)
    for path in generate_all(ds, args.out_dir, args.n_examples):
        print("wrote", path)


if __name__ == "__main__":
    main()
