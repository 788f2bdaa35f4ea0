import numpy as np
import pytest
import scipy.signal as ss

import jax.numpy as jnp

from deepards_tpu.data.pipeline import (
    design_butter_sos,
    fft_band_filter,
    fft_resample,
    sosfilt,
    transform_batch,
)


@pytest.fixture()
def batch(rng):
    return rng.normal(size=(2, 4, 1, 224)).astype(np.float32)


def test_sosfilt_matches_scipy(batch):
    sos = design_butter_sos(None, 10.0)  # highpass branch in reference map
    assert sos is not None
    ours = np.asarray(sosfilt(jnp.asarray(sos), jnp.asarray(batch)))
    theirs = ss.sosfilt(sos.astype(np.float64), batch.astype(np.float64),
                        axis=-1)
    # float32 cascade vs float64 scipy: agreement bounded by f32 roundoff
    # accumulated over 5 sections; parity of the algorithm, not the dtype
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_butter_design_branches():
    # low only -> lowpass (reference quirk: butter_low used as cutoff)
    assert design_butter_sos(5.0, None) is not None
    # low==0 -> lowpass at high
    assert design_butter_sos(0, 10.0) is not None
    # high only -> highpass
    assert design_butter_sos(None, 10.0) is not None
    # both -> bandpass
    sos = design_butter_sos(1.0, 10.0)
    assert sos is not None and sos.shape[0] == 10  # order-10 bandpass
    assert design_butter_sos(None, None) is None


def test_fft_resample_matches_scipy(batch):
    x = batch.astype(np.float64)
    for new_len in (56, 112):
        ours = np.asarray(fft_resample(jnp.asarray(x), new_len))
        theirs = ss.resample(x, new_len, axis=-1)
        # float32 compute vs float64 scipy
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-5)


def test_fft_band_filter_matches_reference_math(batch):
    x = batch.astype(np.float64)
    low, high = 0.5, 5.0
    ours = np.asarray(fft_band_filter(jnp.asarray(x), low, high))
    freqs = np.fft.fftshift(np.fft.fftfreq(224, d=0.02))
    mask = np.logical_and(np.abs(freqs) > low, np.abs(freqs) < high)
    filtered = np.fft.fftshift(np.fft.fft(x, axis=-1), axes=-1)
    filtered[:, :, :, ~mask] = 0
    theirs = np.fft.ifft(np.fft.ifftshift(filtered, axes=-1), axis=-1).real
    # float32 fft vs float64 numpy
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)


def test_normalize_unpadded(batch):
    mu = np.array([0.3], np.float32)
    std = np.array([2.0], np.float32)
    out = np.asarray(
        transform_batch(
            jnp.asarray(batch), jnp.asarray(mu), jnp.asarray(std),
            jnp.zeros((1, 6), jnp.float32),
        )
    )
    np.testing.assert_allclose(out, (batch - 0.3) / 2.0, rtol=1e-5)


def test_normalize_padded_keeps_zeros(batch):
    b = batch.copy()
    b[:, :, :, 100:] = 0.0
    mu = np.array([0.3], np.float32)
    std = np.array([2.0], np.float32)
    out = np.asarray(
        transform_batch(
            jnp.asarray(b), jnp.asarray(mu), jnp.asarray(std),
            jnp.zeros((1, 6), jnp.float32), is_padded=True,
        )
    )
    # zero padding stays exactly zero
    assert np.all(out[:, :, :, 100:] == 0)
    np.testing.assert_allclose(
        out[:, :, :, :100], (b[:, :, :, :100] - 0.3) / 2.0, rtol=1e-5
    )


def test_post_hoc_downsample_shape(batch):
    out = np.asarray(
        transform_batch(
            jnp.asarray(batch),
            jnp.zeros(1, jnp.float32),
            jnp.ones(1, jnp.float32),
            jnp.zeros((1, 6), jnp.float32),
            post_hoc_downsampling=2.0,
        )
    )
    assert out.shape == batch.shape
    # second half is re-padding zeros (reference: deepards/dataset.py:1384-1391)
    assert np.all(out[:, :, :, 112:] == 0)
    assert np.abs(out[:, :, :, :112]).sum() > 0
