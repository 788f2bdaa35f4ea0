"""Differential oracle tests for data/breath.py against the VENDORED
legacy implementation (ucdpvanalysis-1.5/algorithms/SAM.py, shipped inside
the reference checkout at build/static/ucdpvanalysis-1.5.tar.gz).

The legacy module is extracted and imported at test time (read-only, no
code copied) and both implementations run over a corpus of synthetic
breaths covering the awkward regimes: nubbins (no expiration), low-flow
"dribble" exhalation (< 5 l/min, exercises findx0 clause 4), double
triggers, trailing-positive waves (exercises findx02's never-flushed
final run), and noise.  x0 drift directly changes dataset contents
(truncate_lim, bm targets), so these must be EXACT matches.
"""
import importlib.util
import os
import tarfile

import numpy as np
import pytest

TARBALL = "/root/reference/build/static/ucdpvanalysis-1.5.tar.gz"
DT = 0.02


@pytest.fixture(scope="module")
def sam(tmp_path_factory):
    if not os.path.exists(TARBALL):
        pytest.skip("vendored ucdpvanalysis tarball not available")
    root = tmp_path_factory.mktemp("ucdpv")
    with tarfile.open(TARBALL) as tf:
        tf.extractall(root)
    pkg_root = os.path.join(str(root), "ucdpvanalysis-1.5")
    path = os.path.join(pkg_root, "algorithms", "SAM.py")
    # legacy module imports the removed scipy.integrate.simps alias
    import scipy.integrate

    if not hasattr(scipy.integrate, "simps"):
        scipy.integrate.simps = scipy.integrate.simpson
    import sys

    sys.path.insert(0, pkg_root)  # SAM imports utilikilt/algorithms
    try:
        spec = importlib.util.spec_from_file_location("legacy_sam", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(pkg_root)
    return mod


def _breath_corpus():
    """Synthetic breaths across the regimes the heuristics branch on."""
    rng = np.random.default_rng(42)
    corpus = []
    t = np.arange(120) * DT

    # normal breath: sharp inspiration, exponential exhalation
    for peak in (30.0, 60.0):
        insp = peak * np.sin(np.linspace(0, np.pi, 30)) ** 0.7
        exp = -peak * 0.8 * np.exp(-np.linspace(0, 4, 90))
        corpus.append(np.concatenate([insp, exp]))

    # dribble exhalation: never reaches -5 (findx0 clause 4 territory)
    insp = 25.0 * np.sin(np.linspace(0, np.pi, 25)) ** 0.8
    exp = -3.0 * np.exp(-np.linspace(0, 2, 80))
    corpus.append(np.concatenate([insp, exp]))

    # nubbin: no negative flow at all
    corpus.append(np.abs(10 + 5 * np.sin(np.linspace(0, 3, 60))))

    # double trigger: two positive humps, second smaller
    h1 = 40 * np.sin(np.linspace(0, np.pi, 30))
    dip = -20 * np.sin(np.linspace(0, np.pi, 10))
    h2 = 18 * np.sin(np.linspace(0, np.pi, 20))
    exp = -30 * np.exp(-np.linspace(0, 3, 60))
    corpus.append(np.concatenate([h1, dip, h2, exp]))

    # trailing-positive wave: ends while still positive (unflushed run)
    corpus.append(
        np.concatenate([
            20 * np.sin(np.linspace(0, np.pi, 30)),
            -25 * np.exp(-np.linspace(0, 2, 30)),
            5 + 3 * np.sin(np.linspace(0, 2, 25)),
        ])
    )

    # zero-heavy / tiny breaths
    corpus.append(np.zeros(20))
    corpus.append(np.array([1.0, -6.0, -7.0, -2.0]))

    # random noisy breaths
    for _ in range(40):
        n_i = int(rng.integers(10, 50))
        n_e = int(rng.integers(10, 100))
        peak = float(rng.uniform(5, 70))
        insp = peak * np.sin(np.linspace(0, np.pi, n_i)) ** rng.uniform(
            0.5, 2
        )
        etau = rng.uniform(1, 5)
        exp = -peak * rng.uniform(0.3, 1.0) * np.exp(
            -np.linspace(0, etau, n_e)
        )
        wave = np.concatenate([insp, exp])
        wave += rng.normal(0, rng.uniform(0.1, 3.0), wave.shape)
        corpus.append(wave)
    return corpus


def _legacy_x0s(sam, flow):
    flow_l = [float(v) for v in flow]
    t_l = [round(DT * (i + 1), 6) for i in range(len(flow_l))]
    d = sam.find_x0s_multi_algorithms(flow_l, t_l, t_l[-1], DT)
    return int(d["x01index"]), int(d["x02index"])


def test_x0_detectors_exact(sam):
    from deepards_tpu.data.breath import (
        _first_neg_crossing,
        _largest_pos_auc_end,
        find_x0_index,
    )

    for k, flow in enumerate(_breath_corpus()):
        if len(flow) < 2:
            continue
        ref_x01, ref_x02 = _legacy_x0s(sam, flow)
        assert _first_neg_crossing(flow) == ref_x01, (
            "x01 mismatch on breath {}".format(k)
        )
        assert _largest_pos_auc_end(flow) == ref_x02, (
            "x02 mismatch on breath {}".format(k)
        )
        t_l = [round(DT * (i + 1), 6) for i in range(len(flow))]
        _, ref_x0 = sam.x0_heuristic(
            {"x01index": ref_x01, "x02index": ref_x02}, 1, t_l
        )
        assert find_x0_index(flow) == int(ref_x0), (
            "heuristic x0 mismatch on breath {}".format(k)
        )


def test_tv_exact(sam):
    """legacy_prefix mode is bit-exact with the vendored calcTV3
    (including its never-reset holding array); the default "run" mode is
    the corrected integration and must agree wherever the legacy bug has
    no effect (single leading inspiration starting positive)."""
    from deepards_tpu.data.breath import calc_tv, find_x0_index

    for k, flow in enumerate(_breath_corpus()):
        if len(flow) < 2:
            continue
        x0 = find_x0_index(flow)
        ref_tvi, ref_tve = sam.calcTV3([float(v) for v in flow], DT, x0)
        tvi, tve = calc_tv(flow, x0, mode="legacy_prefix")
        np.testing.assert_allclose(
            [tvi, tve], [float(ref_tvi), float(ref_tve)],
            rtol=1e-10, atol=1e-10,
            err_msg="legacy tv mismatch on breath {}".format(k),
        )


def test_tv_run_mode_agrees_on_clean_breaths(sam):
    from deepards_tpu.data.breath import calc_tv, find_x0_index

    # single positive inspiration from sample 0, single exhalation: the
    # legacy prefix accumulation coincides with per-run integration
    flow = np.concatenate([
        40 * np.sin(np.linspace(0.1, np.pi - 0.1, 30)),
        -30 * np.exp(-np.linspace(0, 3, 60)),
        np.array([2.0, -1.0]),  # flush the final negative run
    ])
    x0 = find_x0_index(flow)
    ref_tvi, ref_tve = sam.calcTV3([float(v) for v in flow], DT, x0)
    tvi, tve = calc_tv(flow, x0)
    np.testing.assert_allclose(tvi, float(ref_tvi), rtol=1e-10)


def test_slope_and_mean_flow_exact(sam):
    from deepards_tpu.data.breath import (
        _mean_flow_from_pef,
        _slope_minf_to_zero,
    )

    for k, flow in enumerate(_breath_corpus()):
        if len(flow) < 2:
            continue
        flow_l = [float(v) for v in flow]
        t_l = [round(DT * (i + 1), 6) for i in range(len(flow_l))]
        pef = min(flow_l)
        for t_off in (0.0, 0.16):
            ref = sam.find_slope_from_minf_to_zero(
                t_l, flow_l, pef, t_offset=t_off
            )
            got = _slope_minf_to_zero(flow, t_offset=t_off)
            if np.isnan(ref) or np.isnan(got):
                assert np.isnan(ref) and np.isnan(got), (
                    "slope NaN mismatch on breath {} off {}: ref={} got={}"
                    .format(k, t_off, ref, got)
                )
            else:
                np.testing.assert_allclose(
                    got, ref, rtol=1e-9,
                    err_msg="slope mismatch on breath {}".format(k),
                )
        ref_mean = sam.find_mean_flow_from_pef(flow_l, pef, 0.16)
        got_mean = _mean_flow_from_pef(flow)
        if np.isnan(ref_mean) or np.isnan(got_mean):
            assert np.isnan(ref_mean) and np.isnan(got_mean)
        else:
            np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-9)
