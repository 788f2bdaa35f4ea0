from deepards_tpu.config.config import Configuration, load_defaults

__all__ = ["Configuration", "load_defaults"]
