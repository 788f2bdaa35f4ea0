import glob
import os

import numpy as np
import pandas as pd

from deepards_tpu.data.breath import (
    FLOW_TIME_FEATURE_NAMES,
    find_x0_index,
    flow_time_features,
)
from deepards_tpu.data.reader import read_processed_file, write_processed_file
from deepards_tpu.data.synthetic import generate_cohort, synth_breath


def test_reader_roundtrip(tmp_path):
    breaths = [
        {
            "flow": np.sin(np.linspace(0, 2 * np.pi, 50)) * 30,
            "pressure": np.ones(50) * 10,
            "rel_bn": i + 1,
            "vent_bn": 100 + i,
            "abs_bs": "2017-01-01 00-00-0{}.000000".format(i),
        }
        for i in range(3)
    ]
    raw_path = str(tmp_path / "pt.raw.npy")
    write_processed_file(breaths, raw_path)
    out = list(read_processed_file(raw_path))
    assert len(out) == 3
    for i, b in enumerate(out):
        assert b["rel_bn"] == i + 1
        assert b["vent_bn"] == 100 + i
        np.testing.assert_allclose(b["flow"], breaths[i]["flow"], rtol=1e-5)
        np.testing.assert_allclose(
            b["pressure"], breaths[i]["pressure"], rtol=1e-5
        )
        assert b["abs_bs"] == breaths[i]["abs_bs"]


def test_x0_on_ideal_breath():
    # 60 samples positive half-sine then negative decay: x0 should land
    # at the inspiratory/expiratory boundary
    insp = 40 * np.sin(np.linspace(0, np.pi, 60))
    expir = -35 * np.exp(-5 * np.arange(80) * 0.02)
    flow = np.concatenate([insp, expir])
    x0 = find_x0_index(flow)
    assert 55 <= x0 <= 65


def test_flow_time_features_sane():
    rng = np.random.default_rng(7)
    flow, pressure = synth_breath(rng, is_ards=False)
    feats = flow_time_features(flow, pressure)
    named = dict(zip(FLOW_TIME_FEATURE_NAMES, feats))
    assert 0.5 < named["iTime"] < 2.0
    assert 0.5 < named["eTime"] < 4.0
    assert 5 < named["inst_RR"] < 40
    assert named["I:E ratio"] > 0
    assert 0 < named["tve:tvi ratio"] < 2.5
    assert named["dyn_compliance"] > 0
    assert named["mean_flow_from_pef"] < 0


def test_ards_vs_other_features_separate():
    """ARDS synthetic breaths should have higher RR / lower compliance."""
    rng = np.random.default_rng(11)
    rr = {True: [], False: []}
    for is_ards in (True, False):
        for _ in range(30):
            flow, pressure = synth_breath(rng, is_ards)
            feats = dict(
                zip(FLOW_TIME_FEATURE_NAMES, flow_time_features(flow, pressure))
            )
            rr[is_ards].append(feats["inst_RR"])
    assert np.mean(rr[True]) > np.mean(rr[False])


def test_generate_cohort_layout(tmp_path):
    data_path = str(tmp_path)
    cohort_file = generate_cohort(
        data_path, n_patients=4, n_breaths_per_patient=40, seed=3,
        subdirs=("all_data", "aim1_70_30_training"),
    )
    cohort = pd.read_csv(cohort_file)
    assert len(cohort) == 4
    assert set(cohort["Pathophysiology"]) == {"ARDS", "COPD"}
    raws = glob.glob(
        os.path.join(data_path, "experiment1", "all_data", "raw", "*", "*.raw.npy")
    )
    assert len(raws) == 4
    # holdout subdir symlinked
    assert os.path.isdir(
        os.path.join(data_path, "experiment1", "aim1_70_30_training", "raw")
    )
    # readable end to end
    b = next(read_processed_file(raws[0]))
    assert len(b["flow"]) >= 21
