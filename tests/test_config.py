import argparse

import yaml

from deepards_tpu.config import Configuration, load_defaults


def _ns(**kwargs):
    ns = argparse.Namespace()
    ns.config_override = None
    for k, v in kwargs.items():
        setattr(ns, k, v)
    return ns


def test_defaults_load():
    d = load_defaults()
    assert d["network"] == "cnn_linear"
    assert d["base_network"] == "densenet18"
    assert d["dataset_type"] == "unpadded_centered_sequences"
    assert d["n_sub_batches"] == 20
    assert d["batch_size"] == 16
    assert d["learning_rate"] == 0.001


def test_cli_wins_over_defaults():
    conf = Configuration(_ns(network="cnn_lstm"))
    assert conf.network == "cnn_lstm"


def test_none_cli_does_not_override():
    conf = Configuration(_ns(network=None))
    assert conf.network == "cnn_linear"


def test_override_file_precedence(tmp_path):
    override = tmp_path / "exp.yml"
    override.write_text(yaml.dump({"network": "cnn_lstm", "epochs": 3}))
    ns = _ns(network=None, epochs=None)
    ns.config_override = str(override)
    conf = Configuration(ns)
    assert conf.network == "cnn_lstm"
    assert conf.epochs == 3

    # CLI beats override file
    ns2 = _ns(network="cnn_transformer")
    ns2.config_override = str(override)
    conf2 = Configuration(ns2)
    assert conf2.network == "cnn_transformer"
    assert conf2.epochs == 3


def test_unknown_cli_arg_kept_even_if_none():
    conf = Configuration(_ns(some_flag=None))
    assert conf.some_flag is None


def test_programmatic_overrides():
    conf = Configuration(overrides={"epochs": 1, "kfolds": 5})
    assert conf.epochs == 1
    assert conf.kfolds == 5


def test_reference_experiment_yml_compatible(tmp_path):
    # mirror of reference experiment_files/unpadded_centered_nb20_cnn_linear.yml
    override = tmp_path / "quickstart.yml"
    override.write_text(yaml.dump({
        "clip_val": 0.01,
        "clip_grad": True,
        "dataset_type": "unpadded_centered_sequences",
        "oversample_minority": True,
        "kfolds": 5,
        "epochs": 10,
        "batch_size": 16,
        "network": "cnn_linear",
        "n_sub_batches": 20,
        "random_kfold": False,
    }))
    ns = _ns(clip_grad=None, oversample_minority=None)
    ns.config_override = str(override)
    conf = Configuration(ns)
    assert conf.clip_grad is True
    assert conf.oversample_minority is True
    assert conf.kfolds == 5


def test_generated_experiment_registry():
    """Every generated experiment yml loads through Configuration and
    names a registered network/dataset type."""
    import os

    from deepards_tpu.config import Configuration
    from deepards_tpu.config.generate_experiments import OUT_DIR, write_all
    from deepards_tpu.data.windowing import ALL_DATASET_TYPES
    from deepards_tpu.models.registry import NETWORK_MAP

    names = write_all()
    assert len(names) >= 100
    for name in names:
        path = os.path.join(OUT_DIR, name + ".yml")
        assert os.path.exists(path)

        class Args:
            config_override = path

        conf = Configuration(parser_args=Args())
        assert conf.network in NETWORK_MAP, name
        assert conf.dataset_type in ALL_DATASET_TYPES, name
