"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(`finmath_tpu.parallel`) is exercised without TPU hardware. These env vars
must be set before JAX initializes its backends, hence at conftest import
time (pytest imports conftest before test modules).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
