"""Config system with 3-level precedence merge.

Precedence (highest wins): CLI args > experiment override yml > defaults.yml.
Boolean "true_false_flag" CLI args default to None so that yml-set booleans
survive the merge.  Mirrors the behavior of the reference config system
(reference: deepards/config.py:6-22, deepards/defaults.yml:1-9) so that
reference experiment yml files work unmodified.
"""
import os

import yaml

_DEFAULTS_PATH = os.path.join(os.path.dirname(__file__), "defaults.yml")


def load_defaults():
    with open(_DEFAULTS_PATH) as f:
        return yaml.load(f, Loader=yaml.FullLoader)


class Configuration(object):
    """Merged run configuration.

    Accepts either an argparse.Namespace (like the reference) or a plain
    dict of overrides for programmatic use.  Attributes resolve from the
    merged config dict.
    """

    def __init__(self, parser_args=None, overrides=None):
        self.conf = load_defaults()

        override_path = None
        if parser_args is not None and getattr(parser_args, "config_override", None):
            override_path = parser_args.config_override
        if override_path:
            with open(override_path) as f:
                file_overrides = yaml.load(f, Loader=yaml.FullLoader) or {}
            for k, v in file_overrides.items():
                self.conf[k] = v

        if parser_args is not None:
            # CLI wins, but only for args explicitly set (non-None) or args
            # that have no default entry at all (reference: config.py:17-19).
            for k, v in parser_args.__dict__.items():
                if v is not None or k not in self.conf:
                    self.conf[k] = v

        if overrides:
            for k, v in overrides.items():
                self.conf[k] = v

    def get(self, key, default=None):
        return self.conf.get(key, default)

    def __getattr__(self, attr):
        if attr == "conf":
            raise AttributeError(attr)
        try:
            return self.conf[attr]
        except KeyError:
            raise AttributeError(attr)

    def __contains__(self, key):
        return key in self.conf

    def __repr__(self):
        return "Configuration({})".format(self.conf)
