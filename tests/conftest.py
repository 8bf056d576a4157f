"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports.

Multi-chip sharding tests (SURVEY.md section 4 'implication for the rebuild')
run on jax's host-platform device emulation; the real-TPU path is exercised by
bench.py and the driver's __graft_entry__ checks instead.
"""
import os

# Force-override: the environment exports JAX_PLATFORMS=axon (the TPU tunnel)
# and a site hook re-injects it into jax.config, so both the env var and the
# config entry must be pinned to cpu.  SFTPU_TEST_TPU=1 skips the pin so the
# TPU-only tests (pallas kernels, @skipif backend != 'tpu') can run on-chip:
#   SFTPU_TEST_TPU=1 pytest tests/test_transformer.py -k flash
_ON_TPU = os.environ.get("SFTPU_TEST_TPU", "0") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(314)
