"""Test fixtures.

Forces an 8-device virtual CPU platform BEFORE jax initializes, so
multi-chip sharding tests run without TPU hardware (the TPU-world
equivalent of a fake backend — SURVEY §4 takeaways).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# installed; the config API reliably selects the virtual 8-device CPU.
jax.config.update("jax_platforms", "cpu")
import pytest  # noqa: E402

from pigan_thz_tpu import default_config  # noqa: E402
from pigan_thz_tpu.config import DataConfig  # noqa: E402
from pigan_thz_tpu.data import synthetic_dataset  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return default_config().replace(data=DataConfig(num_samples=256))


@pytest.fixture(scope="session")
def small_ds(cfg):
    return synthetic_dataset(cfg.data, key=jax.random.PRNGKey(7))
