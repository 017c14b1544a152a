"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment's sitecustomize registers a tunneled TPU backend
(JAX_PLATFORMS=axon) in every python process; for hermetic + fast unit tests
we force the CPU backend with 8 virtual devices via jax.config (env vars are
too late — the plugin is registered at interpreter startup).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated suite runs skip XLA compiles
_cache = os.path.join(os.path.expanduser("~"), ".cache", "pafuse_jax_tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def synthetic_dataset():
    from pafuse_tpu.data import h3wb
    ds = h3wb.make_synthetic(subjects=("S1", "S8"), actions_per_subject=1,
                             frames_per_action=70, seed=0)
    return ds
