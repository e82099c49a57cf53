"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the experimental `axon` TPU plugin
and bakes JAX_PLATFORMS=axon into the process before any user code runs, so
env vars alone can't redirect the platform — jax has already imported. The
backend itself is still uninitialized at conftest time, so
`jax.config.update('jax_platforms', 'cpu')` wins (SURVEY.md §4: multi-chip
sharding is validated on forced CPU host devices; the real chip is
exercised only by bench.py)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


@pytest.fixture(autouse=True)
def _test_watchdog(request):
    """Per-test wall-clock bound (round-2 VERDICT weak #7: one wedged
    relay call or subprocess could eat the whole CI budget). On expiry
    faulthandler dumps EVERY thread's stack and exits the session — a
    diagnosed hard failure beats a silent hang. Slow-marked tests get a
    longer leash (TSAN stress, multihost subprocesses)."""
    import faulthandler

    timeout = 900 if request.node.get_closest_marker("slow") else 300
    faulthandler.dump_traceback_later(timeout, exit=True)
    yield
    faulthandler.cancel_dump_traceback_later()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_store_dir(tmp_path):
    return str(tmp_path / "store")
