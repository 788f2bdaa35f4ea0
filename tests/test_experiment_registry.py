"""The generated experiment registry covers the reference's 215 files.

For every yml under the reference's ``experiment_files/`` the generator
must produce a file of the same name whose semantic content matches —
machine-specific keys (paths, pickles, GPU flags) excluded.
(reference: deepards/experiment_files/*.yml, SURVEY §2.1)
"""
import glob
import os

import pytest
import yaml

from deepards_tpu.config import config as config_mod
from deepards_tpu.config.generate_experiments import (
    experiments,
    reference_experiments,
    write_all,
)

REF_DIR = "/root/reference/deepards/experiment_files"

# keys that carry machine-local paths or GPU-era runtime knobs; both
# config systems treat them as inert attributes, and the generator
# deliberately omits them (pass paths on the CLI instead)
MACHINE_KEYS = {
    "data_path", "cohort_file", "train_from_pickle", "test_from_pickle",
    "train_to_pickle", "test_to_pickle", "save_model", "load_checkpoint",
    "save_model_per_epoch", "cuda_no_dp", "loader_threads",
    "no_print_progress",
}


def _semantic(d):
    return {k: v for k, v in (d or {}).items() if k not in MACHINE_KEYS}


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("generated_exps"))
    write_all(out)
    return out


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference checkout not present")
def test_every_reference_experiment_name_is_generated(generated):
    ref_names = sorted(
        os.path.basename(p)[:-4]
        for p in glob.glob(os.path.join(REF_DIR, "*.yml"))
    )
    assert len(ref_names) >= 215
    ours = {os.path.basename(p)[:-4]
            for p in glob.glob(os.path.join(generated, "*.yml"))}
    missing = [n for n in ref_names if n not in ours]
    assert missing == []


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference checkout not present")
def test_generated_semantics_match_reference(generated):
    mismatches = []
    for path in sorted(glob.glob(os.path.join(REF_DIR, "*.yml"))):
        name = os.path.basename(path)
        with open(path) as f:
            ref = _semantic(yaml.safe_load(f))
        with open(os.path.join(generated, name)) as f:
            ours = _semantic(yaml.safe_load(f))
        if ref != ours:
            diff = {
                k: (ref.get(k, "<unset>"), ours.get(k, "<unset>"))
                for k in set(ref) | set(ours)
                if ref.get(k, "<unset>") != ours.get(k, "<unset>")
            }
            mismatches.append((name, diff))
    assert mismatches == []


def test_registry_configs_load_through_configuration(generated):
    """Every generated file round-trips through the Configuration merge
    and resolves its network/dataset names against the registry."""
    from deepards_tpu.models.registry import NETWORK_MAP

    defaults = config_mod.load_defaults()
    for path in sorted(glob.glob(os.path.join(generated, "*.yml"))):
        with open(path) as f:
            conf = yaml.safe_load(f)
        merged = dict(defaults)
        merged.update(conf)
        net = merged["network"]
        assert net in NETWORK_MAP, (path, net)


def test_reference_names_win_over_extras():
    exps = experiments()
    ref = reference_experiments()
    for name, conf in ref.items():
        assert exps[name] == conf
