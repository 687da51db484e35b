"""Test config: force a fake 8-device CPU mesh so the suite is hermetic and
sharding tests need no TPU (SURVEY.md §4 test strategy).

The axon sitecustomize imports jax and registers the TPU backend at
interpreter start, so env vars are too late — use jax.config instead."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process, artifacts)")
