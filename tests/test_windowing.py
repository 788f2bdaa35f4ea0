import numpy as np
import pytest

from deepards_tpu.data.windowing import (
    SEQ_LEN,
    assemble_windows,
    pad_breath,
    rows_to_cache,
    should_drop_frame,
    spaced_pad_breath,
    stretch_breath,
)


def _stream(breaths, patient="1"):
    for i, flow in enumerate(breaths):
        yield patient, {
            "flow": np.asarray(flow, dtype=np.float64),
            "vent_bn": 100 + i,
            "_target": np.array([0.0, 1.0], np.float32),
        }, 0.1 * i


def test_pad_breath():
    out = pad_breath(np.ones(50))
    assert out.shape == (SEQ_LEN,)
    assert out[:50].sum() == 50
    assert out[50:].sum() == 0
    # long breaths truncate
    out = pad_breath(np.arange(300.0))
    assert out.shape == (SEQ_LEN,)
    assert out[-1] == 223


def test_stretch_breath():
    out = stretch_breath(np.sin(np.linspace(0, np.pi, 60)))
    assert out.shape == (SEQ_LEN,)
    # resampled signal preserves rough amplitude
    assert 0.9 < out.max() < 1.1


def test_spaced_pad():
    out = spaced_pad_breath(np.ones(56))
    assert out.shape == (SEQ_LEN,)
    assert np.count_nonzero(out) == 56


def test_breath_by_breath_assembly():
    breaths = [np.full(40 + i, float(i + 1)) for i in range(25)]
    rows, dropped = assemble_windows(
        _stream(breaths), "padded_breath_by_breath", n_sub_batches=5
    )
    # 25 breaths -> 5 windows of 5 breaths
    assert len(rows) == 5
    pt, data, meta, target, hours = rows[0]
    assert data.shape == (5, 1, SEQ_LEN)
    # first window first breath is all 1.0 over its 40 samples
    assert data[0, 0, :40].sum() == 40
    assert data[0, 0, 40:].sum() == 0
    np.testing.assert_array_equal(target, [0, 1])
    assert len(hours) == 5


def test_unpadded_centered_semantics():
    # each breath 100 samples: sub-seq = first 224 samples of consecutive
    # breaths; after a sub-seq completes, the next starts at a breath start
    breaths = [np.full(100, float(i + 1)) for i in range(12)]
    rows, _ = assemble_windows(
        _stream(breaths), "unpadded_centered_sequences", n_sub_batches=2
    )
    assert len(rows) >= 1
    data = rows[0][1]
    assert data.shape == (2, 1, SEQ_LEN)
    # sub-seq 0: breaths 1,2 then 24 samples of breath 3
    np.testing.assert_array_equal(data[0, 0, :100], 1.0)
    np.testing.assert_array_equal(data[0, 0, 100:200], 2.0)
    np.testing.assert_array_equal(data[0, 0, 200:], 3.0)
    # centered: sub-seq 1 starts fresh at breath 4 (remainder of 3 dropped)
    np.testing.assert_array_equal(data[1, 0, :100], 4.0)


def test_unpadded_regular_carries_over():
    breaths = [np.full(100, float(i + 1)) for i in range(12)]
    rows, _ = assemble_windows(
        _stream(breaths), "unpadded_sequences", n_sub_batches=2
    )
    data = rows[0][1]
    # regular: leftover 76 samples of breath 3 carry into sub-seq 1
    np.testing.assert_array_equal(data[1, 0, :76], 3.0)
    np.testing.assert_array_equal(data[1, 0, 76:176], 4.0)


def test_drop_frame_on_vent_bn_gap():
    assert not should_drop_frame([1, 2, 3, 4, 5], 5)
    assert should_drop_frame([1, 2, 50, 51, 52], 5)
    # 2^16 wraparound is forgiven
    bns = [65534, 65535, 65536, 1, 2]
    assert not should_drop_frame(bns, 5)


def test_frame_drop_bookkeeping():
    def stream():
        for i in range(10):
            vent_bn = 100 + i if i < 5 else 500 + i  # big gap mid-window
            yield "1", {
                "flow": np.full(224, 1.0),
                "vent_bn": vent_bn,
                "_target": np.array([1.0, 0.0], np.float32),
            }, 0.0

    rows, dropped = assemble_windows(
        stream(), "padded_breath_by_breath", n_sub_batches=10
    )
    assert len(rows) == 0
    assert dropped == {"1": 1}


def test_bm_target_mode():
    insp = 40 * np.sin(np.linspace(0, np.pi, 60))
    expir = -35 * np.exp(-5 * np.arange(100) * 0.02)
    flow = np.concatenate([insp, expir])

    def stream():
        for i in range(4):
            yield "1", {
                "flow": flow,
                "pressure": np.linspace(20, 5, len(flow)),
                "vent_bn": i,
                "_target": np.array([1.0, 0.0], np.float32),
            }, 0.0

    rows, _ = assemble_windows(
        stream(), "padded_breath_by_breath_with_full_bm_target",
        n_sub_batches=20,
    )
    assert len(rows) == 4
    pt, data, meta, target, hours = rows[0]
    assert data.shape == (1, 1, SEQ_LEN)
    assert target.shape == (9,)
    assert not np.any(np.isnan(target))


def test_flow_time_features_mode():
    insp = 40 * np.sin(np.linspace(0, np.pi, 60))
    expir = -35 * np.exp(-5 * np.arange(100) * 0.02)
    flow = np.concatenate([insp, expir])

    def stream():
        for i in range(6):
            yield "1", {
                "flow": flow,
                "pressure": np.linspace(20, 5, len(flow)),
                "vent_bn": i,
                "_target": np.array([0.0, 1.0], np.float32),
            }, 0.0

    rows, _ = assemble_windows(
        stream(), "padded_breath_by_breath_with_flow_time_features",
        n_sub_batches=3,
    )
    assert len(rows) == 2
    pt, data, meta, target, hours = rows[0]
    assert meta.shape == (3, 9)
    np.testing.assert_array_equal(target, [0, 1])


def test_rows_to_cache():
    breaths = [np.full(120, 1.0) for _ in range(20)]
    rows, dropped = assemble_windows(
        _stream(breaths), "padded_breath_by_breath", n_sub_batches=4
    )
    cache = rows_to_cache(rows, dropped)
    assert cache.data.shape == (5, 4, 1, SEQ_LEN)
    assert cache.target.shape == (5, 2)
    assert cache.patients == ["1"]
    assert len(cache) == 5


def test_stretched_breath_by_breath_assembly():
    """Short breaths are FFT-stretched to 224, long breaths truncated."""
    breaths = [np.sin(np.linspace(0, np.pi, 60)) * 30 for _ in range(4)]
    rows, _ = assemble_windows(
        _stream(breaths), "stretched_breath_by_breath", n_sub_batches=4
    )
    assert len(rows) == 1
    data = rows[0][1]
    assert data.shape == (4, 1, SEQ_LEN)
    # stretched: no zero padding tail, energy spread across full window
    assert np.abs(data[0, 0, -10:]).sum() > 0


def test_spaced_padded_assembly():
    breaths = [np.ones(56) for _ in range(4)]
    rows, _ = assemble_windows(
        _stream(breaths), "spaced_padded_breath_by_breath", n_sub_batches=4
    )
    data = rows[0][1]
    # spaced: samples distributed with zero gaps, count preserved
    assert np.count_nonzero(data[0, 0]) == 56
    nz = np.nonzero(data[0, 0])[0]
    assert nz[-1] > 200  # spread over the full window


def test_downsampled_centered_assembly():
    """Breaths are resampled by 1/factor before window accumulation."""
    breaths = [np.full(100, float(i + 1)) for i in range(24)]
    rows, _ = assemble_windows(
        _stream(breaths), "unpadded_centered_downsampled_sequences",
        n_sub_batches=2, unpadded_downsample_factor=4.0,
    )
    assert len(rows) >= 1
    data = rows[0][1]
    # 100-sample breaths downsample to 25 -> ~9 breaths per 224 sub-seq
    # first 25 samples come from breath 1 (approximately constant 1.0)
    assert abs(float(np.median(data[0, 0, :20])) - 1.0) < 0.2
    assert abs(float(np.median(data[0, 0, 30:45])) - 2.0) < 0.3


def test_autoencoder_target_is_nan():
    breaths = [np.full(100, 1.0) for _ in range(24)]

    def stream():
        for i, flow in enumerate(breaths):
            yield "1", {
                "flow": np.asarray(flow),
                "vent_bn": 100 + i,
                "_target": np.array([np.nan, np.nan], np.float32),
            }, 0.0

    rows, _ = assemble_windows(
        stream(), "unpadded_downsampled_autoencoder_sequences",
        n_sub_batches=2, unpadded_downsample_factor=4.0,
    )
    cache = rows_to_cache(rows, autoencoder_target=True)
    assert np.isnan(cache.target).all()
