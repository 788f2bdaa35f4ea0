"""Jitted device-side batch transforms.

Everything the reference did per-item inside ``Dataset.__getitem__``
(normalization, Butterworth filtering, post-hoc downsampling, FFT band
filtering; reference: deepards/dataset.py:1343-1404) becomes one fused,
jit-compiled batch transform here — XLA fuses the elementwise chain into
the surrounding compute, and data reaches the device exactly once.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import butter


def design_butter_sos(butter_low, butter_high, fs=50.0, order=10):
    """Host-side SOS design mirroring the reference's quirky dispatch
    (reference: deepards/dataset.py:546-559).  Returns (n_sections, 6)
    float32 array or None."""
    if butter_low is not None and butter_high is None:
        sos = butter(order, butter_low, fs=fs, output="sos", btype="lowpass")
    elif butter_low == 0:
        sos = butter(order, butter_high, fs=fs, output="sos", btype="lowpass")
    elif butter_low is None and butter_high is not None:
        sos = butter(order, butter_high, fs=fs, output="sos", btype="highpass")
    elif butter_high == 25:
        sos = butter(order, butter_low, fs=fs, output="sos", btype="highpass")
    elif butter_low is not None and butter_high is not None:
        sos = butter(
            order, (butter_low, butter_high), fs=fs, output="sos",
            btype="bandpass",
        )
    else:
        return None
    return np.asarray(sos, dtype=np.float32)


@jax.jit
def sosfilt(sos, x):
    """Cascaded-biquad IIR filter along the last axis (zero initial state),
    numerically identical to scipy.signal.sosfilt.

    The time recursion is inherently sequential, so we ``lax.scan`` over the
    L axis carrying direct-form-II-transposed state for every section; the
    section chain is unrolled inside the step (sections are few and static)
    and the per-step work is elementwise across the whole batch (VPU-wide).
    """
    sos = jnp.asarray(sos, dtype=x.dtype)
    n_sections = sos.shape[0]
    batch_shape = x.shape[:-1]

    def step(state, xt):
        out = xt
        new_state = []
        for s in range(n_sections):
            z1, z2 = state[s]
            y = sos[s, 0] * out + z1
            z1n = sos[s, 1] * out - sos[s, 4] * y + z2
            z2n = sos[s, 2] * out - sos[s, 5] * y
            new_state.append((z1n, z2n))
            out = y
        return new_state, out

    zeros = jnp.zeros(batch_shape, x.dtype)
    init = [(zeros, zeros) for _ in range(n_sections)]
    _, y = jax.lax.scan(step, init, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1)


@functools.partial(jax.jit, static_argnames=("new_len",))
def fft_resample(x, new_len):
    """scipy.signal.resample equivalent (FFT method, last axis) in jnp."""
    n = x.shape[-1]
    xf = jnp.fft.rfft(x, axis=-1)
    nyq = new_len // 2 + 1
    if new_len < n:
        xf = jax.lax.slice_in_dim(xf, 0, nyq, axis=x.ndim - 1)
        if new_len % 2 == 0:
            # scipy folds the conjugate half onto the nyquist bin when
            # downsampling to an even length: double it to match
            xf = xf.at[..., nyq - 1].multiply(2.0)
    else:
        pad = [(0, 0)] * xf.ndim
        pad[-1] = (0, nyq - xf.shape[-1])
        xf = jnp.pad(xf, pad)
    return jnp.fft.irfft(xf, n=new_len, axis=-1) * (new_len / n)


@functools.partial(jax.jit, static_argnames=("low", "high", "fs"))
def fft_band_filter(x, low, high, fs=50.0):
    """Zero out frequency bins outside (low, high) Hz
    (reference: deepards/dataset.py:1393-1400)."""
    n = x.shape[-1]
    freqs = np.fft.fftfreq(n, d=1.0 / fs)
    mask = (np.abs(freqs) > low) & (np.abs(freqs) < high)
    xf = jnp.fft.fft(x, axis=-1)
    xf = xf * jnp.asarray(mask, dtype=xf.dtype)
    return jnp.fft.ifft(xf, axis=-1).real


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_padded", "has_butter", "post_hoc_downsampling", "fft_low",
        "fft_high", "zero_mu",
    ),
)
def transform_batch(
    data,
    mu,
    std,
    sos,
    is_padded=False,
    has_butter=False,
    post_hoc_downsampling=None,
    fft_low=None,
    fft_high=None,
    zero_mu=False,
):
    """Normalize + filter a raw batch (B, S, C, L).

    - padded types only subtract mu where data != 0
      (reference: deepards/dataset.py:1375-1379, 1406-1409)
    - zero_mu replicates the transforms-active behavior of forcing mu=0
      (reference: deepards/dataset.py:1371-1373)
    """
    mu = jnp.where(zero_mu, jnp.zeros_like(mu), mu)
    mu_b = mu.reshape(1, 1, -1, 1)
    std_b = std.reshape(1, 1, -1, 1)
    if is_padded:
        data = jnp.where(data != 0, (data - mu_b) / std_b, data / std_b)
    else:
        data = (data - mu_b) / std_b
    if has_butter:
        data = sosfilt(sos, data)
    if post_hoc_downsampling is not None:
        old_len = data.shape[-1]
        new_len = int(old_len / post_hoc_downsampling)
        resamp = fft_resample(data, new_len)
        data = jnp.pad(
            resamp,
            ((0, 0), (0, 0), (0, 0), (0, old_len - new_len)),
        )
    if fft_low is not None and fft_high is not None:
        data = fft_band_filter(data, fft_low, fft_high)
    return data


class BatchPipeline:
    """Bundles a dataset's transform configuration into one callable.

    Built once per (dataset, fold); holds mu/std and the SOS taps so the
    jitted transform re-traces only when static config changes.
    """

    def __init__(self, dataset):
        self.is_padded = "padded_breath_by_breath" in dataset.dataset_type
        sos = design_butter_sos(dataset.butter_low, dataset.butter_high)
        self.sos = (
            jnp.zeros((1, 6), jnp.float32) if sos is None else jnp.asarray(sos)
        )
        self.has_butter = sos is not None
        self.post_hoc_downsampling = dataset.post_hoc_downsampling
        self.fft_low = dataset.fft_filtering_low
        self.fft_high = dataset.fft_filtering_high
        self.zero_mu = dataset.transforms is not None
        mu, std = dataset.scaling_for_current_fold()
        self.mu = jnp.asarray(mu)
        self.std = jnp.asarray(std)

    def __call__(self, data):
        return transform_batch(
            data,
            self.mu,
            self.std,
            self.sos,
            is_padded=self.is_padded,
            has_butter=self.has_butter,
            post_hoc_downsampling=self.post_hoc_downsampling,
            fft_low=self.fft_low,
            fft_high=self.fft_high,
            zero_mu=self.zero_mu,
        )


def gather_pipeline(dataset):
    """Normalization for host-side gathered windows on explain/analysis
    surfaces.

    ``ARDSRawDataset.gather`` returns RAW rows (normalization/filtering
    runs on device inside the train step), but the reference scales in
    ``dataset.__getitem__`` BEFORE GradCam/prototype analysis sees the
    data (reference: deepards/dataset.py:1364-1375).  Every consumer
    that feeds gathered windows straight to ``model.apply`` must route
    them through this first, or a trained checkpoint runs on inputs at a
    different scale than training.  ImgARDSDataset normalizes inside its
    own ``gather``, so it maps to identity.
    """
    if getattr(dataset, "images", None) is not None:
        return lambda x: np.asarray(x, np.float32)
    pipe = BatchPipeline(dataset)

    def apply(x):
        x = np.asarray(x, np.float32)
        squeeze = x.ndim == 3  # single (S, C, L) window
        if squeeze:
            x = x[None]
        out = np.asarray(pipe(jnp.asarray(x)))
        return out[0] if squeeze else out

    return apply
