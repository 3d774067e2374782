"""ctypes wrapper around the native host RNG (see host_rng.cpp).

Provides MT19937 / java.util.Random-LCG uniforms and inverse-CDF normals
for the CPU baseline Brownian legs. Falls back to NumPy (PCG uniforms +
scipy-free AS241 via the native lib being absent -> numpy's own normals)
when no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger("finmath_tpu.native")

_SRC = Path(__file__).with_name("host_rng.cpp")
_LIB_PATH = Path(__file__).with_name("_host_rng.so")
_lock = threading.Lock()
_lib = None
_build_failed = False

ALGORITHM_MERSENNE = 0
ALGORITHM_JAVA_LCG = 1


def _load() -> ctypes.CDLL | None:
    """Compile (once) and load the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                       str(_SRC), "-o", str(_LIB_PATH)]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.rng_create.restype = ctypes.c_void_p
            lib.rng_create.argtypes = [ctypes.c_int, ctypes.c_uint64]
            lib.rng_destroy.argtypes = [ctypes.c_void_p]
            lib.rng_fill_uniform.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
            lib.rng_fill_normal.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t, ctypes.c_double]
            lib.rng_inverse_normal_cdf.restype = ctypes.c_double
            lib.rng_inverse_normal_cdf.argtypes = [ctypes.c_double]
            _lib = lib
        except Exception as exc:  # toolchain missing, compile error, ...
            logger.warning("native host RNG unavailable (%s); using NumPy fallback", exc)
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


class HostRandomGenerator:
    """Sequential host RNG with finmath-compatible algorithms.

    algorithm: "mersenne" (MT19937, the BrownianMotionLazyInit leg) or
    "java" (java.util.Random 48-bit LCG, the BrownianMotionJavaRandom leg).
    """

    def __init__(self, seed: int, algorithm: str = "mersenne"):
        self.seed = int(seed)
        self.algorithm = algorithm
        algo_id = {"mersenne": ALGORITHM_MERSENNE, "java": ALGORITHM_JAVA_LCG}[algorithm]
        lib = _load()
        if lib is not None:
            self._lib = lib
            self._handle = lib.rng_create(algo_id, ctypes.c_uint64(self.seed))
            self._numpy = None
        else:
            if algorithm == "java":
                # the NumPy fallback cannot reproduce java.util.Random's
                # LCG; refusing beats silently returning a different stream
                raise RuntimeError(
                    "algorithm='java' requires the native host RNG "
                    "(g++ unavailable or build failed); use "
                    "algorithm='mersenne' or install a C++ toolchain"
                )
            self._lib = None
            self._handle = None
            self._numpy = np.random.Generator(np.random.MT19937(self.seed))

    def __del__(self):
        lib, handle = getattr(self, "_lib", None), getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.rng_destroy(handle)
            self._handle = None

    def normals(self, n: int, stddev: float = 1.0) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        if self._lib is not None:
            self._lib.rng_fill_normal(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n, float(stddev),
            )
        else:
            # match the native path's METHOD (inverse-CDF of uniforms), so
            # the fallback differs only in generator internals
            from scipy.special import ndtri

            u = self._numpy.random(n)
            out[:] = (ndtri(u) * stddev).astype(np.float32)
        return out

    def uniforms(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        if self._lib is not None:
            self._lib.rng_fill_uniform(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
            )
        else:
            out[:] = self._numpy.random(n).astype(np.float32)
        return out


def inverse_normal_cdf(p: float) -> float:
    """AS241 inverse normal CDF (native if available, else a NumPy port is
    not provided — callers needing it without the native lib should use
    scipy/jax equivalents)."""
    lib = _load()
    if lib is None:
        from jax.scipy.stats import norm  # lazy; matches to ~1e-9

        import jax.numpy as jnp

        return float(norm.ppf(jnp.float64(p)))
    return float(lib.rng_inverse_normal_cdf(float(p)))
