"""Test harness config: run everything on a virtual 8-device CPU mesh.

Note: this image boots JAX via a sitecustomize that registers a remote-TPU
("axon") backend before our code runs, so JAX_PLATFORMS in os.environ is
already consumed. `jax.config.update("jax_platforms", ...)` still wins as
long as no backend has been initialised — which is the case at conftest
import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (train->eval loops)"
    )
