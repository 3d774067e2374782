"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(`finmath_tpu.parallel`) is exercised without TPU hardware. The env vars
must be set before JAX initializes its backends, hence at conftest import
time (pytest imports conftest before test modules). The shell may export
``JAX_PLATFORMS=axon`` (the real-TPU tunnel) and the axon plugin ignores a
late env override, so we also pin the platform through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
