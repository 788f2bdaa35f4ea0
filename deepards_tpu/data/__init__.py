from deepards_tpu.data.reader import read_processed_file, write_processed_file
from deepards_tpu.data.breath import (
    find_x0_index,
    flow_time_features,
    FLOW_TIME_FEATURE_NAMES,
)

__all__ = [
    "read_processed_file",
    "write_processed_file",
    "find_x0_index",
    "flow_time_features",
    "FLOW_TIME_FEATURE_NAMES",
]
