"""ctypes wrapper around the native host RNG (see host_rng.cpp).

Provides MT19937 / java.util.Random-LCG uniforms and inverse-CDF normals
for the CPU baseline Brownian legs. 'mersenne' is the canonical 32-bit
MT19937 with genrand_res53 doubles (finmath's MersenneTwister is the same
reference generator). When no C++ toolchain is available, a vectorized
NumPy implementation of the SAME generator takes over (bit-identical
uniform stream; normals then use scipy's ndtri instead of AS241, which
agree to ~1e-9).
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


class _MT19937Res53:
    """Canonical 32-bit MT19937 (init_genrand seeding, genrand_res53
    doubles) vectorized in NumPy — BIT-IDENTICAL to the native C++
    'mersenne' generator (std::mt19937 + res53), so the fallback produces
    the same stream as the native path instead of a different generator
    under the same name."""

    _N, _M = 624, 397
    _MATRIX_A = np.uint32(0x9908B0DF)
    _UPPER = np.uint32(0x80000000)
    _LOWER = np.uint32(0x7FFFFFFF)

    def __init__(self, seed: int):
        mt = np.empty(self._N, dtype=np.uint32)
        mt[0] = seed & 0xFFFFFFFF
        for i in range(1, self._N):
            prev = int(mt[i - 1])
            mt[i] = (1812433253 * (prev ^ (prev >> 30)) + i) & 0xFFFFFFFF
        self._mt = mt
        self._buf = np.empty(0, dtype=np.uint32)

    def _twist(self) -> np.ndarray:
        """One full twist + tempering: 624 fresh 32-bit outputs."""
        mt, N, M = self._mt, self._N, self._M
        new = np.empty(N, dtype=np.uint32)
        # the reference C loop reads updated entries for i >= N-M, so the
        # vectorization happens in the same three chunks it uses
        y = (mt[: N - M] & self._UPPER) | (mt[1 : N - M + 1] & self._LOWER)
        new[: N - M] = mt[M:] ^ (y >> np.uint32(1)) \
            ^ np.where(y & np.uint32(1), self._MATRIX_A, np.uint32(0))
        # second chunk reads new[kk - (N-M)] — a sequential dependency at
        # lag N-M — so it is vectorized in lag-sized sub-chunks whose
        # sources were fully written by the preceding sub-chunk
        lag = N - M
        for lo in range(N - M, N - 1, lag):
            hi = min(lo + lag, N - 1)
            y = (mt[lo:hi] & self._UPPER) | (mt[lo + 1 : hi + 1] & self._LOWER)
            new[lo:hi] = new[lo - lag : hi - lag] ^ (y >> np.uint32(1)) \
                ^ np.where(y & np.uint32(1), self._MATRIX_A, np.uint32(0))
        y = (mt[N - 1] & self._UPPER) | (new[0] & self._LOWER)
        new[N - 1] = new[M - 1] ^ (y >> np.uint32(1)) \
            ^ (self._MATRIX_A if y & np.uint32(1) else np.uint32(0))
        self._mt = new
        out = new.copy()
        out ^= out >> np.uint32(11)
        out ^= (out << np.uint32(7)) & np.uint32(0x9D2C5680)
        out ^= (out << np.uint32(15)) & np.uint32(0xEFC60000)
        out ^= out >> np.uint32(18)
        return out

    def _words(self, n: int) -> np.ndarray:
        chunks = [self._buf]
        have = len(self._buf)
        while have < n:
            w = self._twist()
            chunks.append(w)
            have += len(w)
        all_w = np.concatenate(chunks)
        self._buf = all_w[n:]
        return all_w[:n]

    def random(self, n: int) -> np.ndarray:
        """n genrand_res53 doubles in [0, 1)."""
        w = self._words(2 * n)
        a = (w[0::2] >> np.uint32(5)).astype(np.float64)   # 27 bits
        b = (w[1::2] >> np.uint32(6)).astype(np.float64)   # 26 bits
        return (a * 67108864.0 + b) * (1.0 / 9007199254740992.0)


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
            # bit-identical to the native 'mersenne' stream (canonical
            # MT19937 + genrand_res53) — NOT numpy's SeedSequence-seeded
            # MT19937, whose stream would differ under the same name
            self._numpy = _MT19937Res53(self.seed)

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
            # same uniform stream as the native path (bit-identical
            # MT19937); only the ICDF differs (ndtri vs AS241, ~1e-9).
            # Clamp the 2^-53-probability exact 0 away from -inf like the
            # native path does.
            from scipy.special import ndtri

            u = np.maximum(self._numpy.random(n), 2.0 ** -54)
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
