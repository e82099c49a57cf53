"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform env vars before the first `import jax` anywhere in the
test process (SURVEY.md §4: multi-chip sharding is validated on forced CPU
host devices; the real chip is exercised only by bench.py)."""

import os

# Force, not setdefault: the driver environment pre-sets JAX_PLATFORMS to the
# real TPU (axon), where f32 matmuls are demoted and parity tolerances break.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_store_dir(tmp_path):
    return str(tmp_path / "store")
