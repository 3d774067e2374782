"""Runtime configuration: device selection, compilation cache, logging.

The reference's config surface is Java system properties — notably
``net.finmath.montecarlo.opencl.RandomVariableCuda.deviceIndex`` (negative
values wrap from the end of the device list, RandomVariableCuda.java:72-83,
:161-180) — plus a ``logging.properties`` wiring a ``net.finmath`` logger.
Here the analogous knobs are environment variables:

* ``FINMATH_TPU_DEVICE_INDEX``  — which device to use (negative wraps).
* ``FINMATH_TPU_CACHE_DIR``     — persistent XLA compilation cache
  directory ('' disables). TPU compiles of the big calibration programs
  take minutes over a cold backend; the persistent cache makes every
  process after the first start hot.

and the ``finmath_tpu`` logger hierarchy (analog of ``net.finmath``).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import jax

logger = logging.getLogger("finmath_tpu")

_DEFAULT_CACHE = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "finmath_tpu", "jax",
)


def cache_scope() -> str:
    """Platform scope for the persistent XLA cache directory.

    The JAX persistent cache stores *serialized executables*. An XLA:CPU
    executable embeds host machine features (AVX level etc.); loading one
    compiled on a different host raises ``cpu_aot_loader`` errors and can
    SIGILL (the reference fails loudly on device mismatch instead —
    RandomVariableCuda.java:167 ``setExceptionsEnabled(true)``; the PTX
    cache keys ``-arch sm_XY`` into the filename, JCudaUtils.java:63-75).
    We therefore scope the directory per backend, and on CPU additionally
    per host-feature digest, so a mismatched entry is simply never seen.

    The backend name comes from ``JAX_PLATFORMS``/``jax_platforms`` when
    set (every CPU context in this project sets it — conftest, dryrun
    driver) so reading it does NOT initialize the backend; only when unset
    do we ask ``jax.default_backend()`` (a TPU context, where the backend
    is about to be initialized anyway)."""
    plats = os.environ.get("JAX_PLATFORMS") or ""
    try:
        cfg = jax.config.jax_platforms
        if cfg:
            plats = cfg
    except AttributeError:
        pass
    backend = plats.split(",")[0].strip().lower() if plats.strip() else ""
    if not backend:
        backend = jax.default_backend().lower()
    if backend != "cpu":
        return backend
    import hashlib
    import platform as _platform

    feat = _platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feat += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return f"cpu-{hashlib.sha1(feat.encode()).hexdigest()[:12]}"


def enable_compilation_cache(path: str = None) -> str | None:
    """Enable JAX's persistent compilation cache, scoped per backend (and
    per host-feature digest on CPU — see :func:`cache_scope`). Returns the
    directory in use, or None if disabled via FINMATH_TPU_CACHE_DIR=''."""
    cache_dir = path if path is not None else os.environ.get(
        "FINMATH_TPU_CACHE_DIR", _DEFAULT_CACHE
    )
    if not cache_dir:
        return None
    cache_dir = os.path.join(cache_dir, cache_scope())
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    logger.debug("persistent compilation cache at %s", cache_dir)
    return cache_dir


def select_device(index: int = None):
    """Pick the default device by index; negative wraps from the end
    (reference deviceIndex semantics). Reads FINMATH_TPU_DEVICE_INDEX when
    ``index`` is None. Returns the chosen device (or None = JAX default)."""
    if index is None:
        raw = os.environ.get("FINMATH_TPU_DEVICE_INDEX")
        if raw is None:
            return None
        index = int(raw)
    devices = jax.devices()
    # reference semantics (RandomVariableCuda.java:177): negative wraps
    # from the end ONCE; an out-of-range index fails loudly instead of
    # silently selecting an unintended device
    resolved = index if index >= 0 else len(devices) + index
    if not 0 <= resolved < len(devices):
        raise ValueError(
            f"device index {index} out of range for {len(devices)} devices")
    device = devices[resolved]
    jax.config.update("jax_default_device", device)
    logger.info("selected device %s", device)
    return device
