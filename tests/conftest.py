"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard way to test TPU sharding logic without a pod
(SURVEY.md §4): XLA is forced to expose 8 host devices so
Mesh/pjit/shard_map paths execute real collectives.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# this box has 1 CPU core; persist XLA compilations across test runs
import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/deepards_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_cohort(tmp_path_factory):
    """Small on-disk synthetic cohort shared across the suite."""
    from deepards_tpu.data.synthetic import generate_cohort

    data_path = str(tmp_path_factory.mktemp("cohort"))
    cohort_file = generate_cohort(
        data_path,
        n_patients=8,
        n_breaths_per_patient=260,
        seed=1234,
        subdirs=("all_data", "aim1_70_30_training", "aim1_70_30_testing"),
    )
    return {"data_path": data_path, "cohort_file": cohort_file}


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
