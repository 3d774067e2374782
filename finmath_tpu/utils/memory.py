"""Device memory introspection.

The reference dedicates ~440 lines to a hand-rolled device memory pool with
WeakReference recycling and GC-pressure backoff (DeviceMemoryPool,
RandomVariableCuda.java:119-558) because JCuda buffers are manually managed.
Under JAX/XLA the runtime owns buffer lifetime (reference counting +
donation), so the pool is structurally obsolete — what remains worth
keeping is its *observability* contract: the free-memory percentage the
reference polls via cudaMemGetInfo (:435-449) and prints in
BrownianMotionMemoryTest (:54-59). This module provides that.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax


@dataclass
class DeviceMemoryInfo:
    bytes_in_use: Optional[int]
    bytes_limit: Optional[int]
    peak_bytes_in_use: Optional[int]

    @property
    def free_fraction(self) -> Optional[float]:
        if self.bytes_limit in (None, 0) or self.bytes_in_use is None:
            return None
        return 1.0 - self.bytes_in_use / self.bytes_limit

    def __repr__(self):
        if self.bytes_limit:
            return (f"DeviceMemoryInfo(in_use={self.bytes_in_use/2**20:.1f}MiB, "
                    f"limit={self.bytes_limit/2**20:.1f}MiB, "
                    f"free={100*self.free_fraction:.1f}%)")
        return "DeviceMemoryInfo(unavailable)"


def get_device_memory_info(device=None) -> DeviceMemoryInfo:
    """Memory stats of a device (the cudaMemGetInfo analog). Some backends
    (virtual CPU devices) expose no stats — fields come back None."""
    device = device or jax.devices()[0]
    stats = {}
    try:
        stats = device.memory_stats() or {}
    except (AttributeError, NotImplementedError, jax.errors.JaxRuntimeError):
        pass
    return DeviceMemoryInfo(
        bytes_in_use=stats.get("bytes_in_use"),
        bytes_limit=stats.get("bytes_limit"),
        peak_bytes_in_use=stats.get("peak_bytes_in_use"),
    )


def live_device_arrays() -> int:
    """Number of live device arrays (leak canary for tests)."""
    return sum(1 for _ in jax.live_arrays())
