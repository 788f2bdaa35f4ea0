"""Native (C++) host-side kernels, loaded via ctypes."""
from deepards_tpu.ops.native.build import load_native_dtw

__all__ = ["load_native_dtw"]
