"""Ahead-of-time program persistence via ``jax.export``.

The round-4 compile-anatomy study (BENCHMARKS.md) showed a fresh
process pays 140-475 s to stand up the stoch-vol calibration program
set even with a warm persistent XLA cache — tracing + lowering happen
on the host, in front of every cache. ``jax.export`` serializes the
lowered StableHLO itself: a later process deserializes and goes
straight to XLA compilation (which the persistent cache then serves),
measured 32.6 s for the full five-program 81,920-path set vs 140-475 s
cold — the properly structural analog of the reference's PTX cache
(JCudaUtils.java:50-53), one level higher than XLA's own cache.

Artifacts are keyed by a config hash that includes the package version:
a mismatched or unreadable artifact simply falls back to the normal
jit path (never an error). Exported programs pin the platform they
were lowered for; artifacts exported on TPU do not load on CPU (the
loader's verification rejects them — again a clean fallback).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from . import config as _config  # noqa: F401  (package config side effects)

FORMAT_VERSION = 1

_SOURCE_DIGEST = None


def _source_digest() -> str:
    """Digest of the package sources that shape the lowered programs —
    any code edit invalidates every artifact (a stale program silently
    reproducing OLD semantics would be a correctness bug, not a cache
    miss). Computed once per process; cheap (a few hundred KB)."""
    global _SOURCE_DIGEST
    if _SOURCE_DIGEST is None:
        import finmath_tpu

        root = os.path.dirname(os.path.abspath(finmath_tpu.__file__))
        h = hashlib.sha1()
        for sub in ("models", "ops", "parallel"):
            d = os.path.join(root, sub)
            for dirpath, _, files in sorted(os.walk(d)):
                for f in sorted(files):
                    if f.endswith(".py"):
                        p = os.path.join(dirpath, f)
                        h.update(f.encode())
                        with open(p, "rb") as fh:
                            h.update(fh.read())
        _SOURCE_DIGEST = h.hexdigest()
    return _SOURCE_DIGEST


def _key(*parts) -> str:
    """Artifact key: format version, package version, jax/jaxlib versions
    (the serialized StableHLO calling convention is a jax implementation
    detail — a jaxlib upgrade must miss cleanly rather than rely on
    ``export.deserialize`` failing; the reference's PTX cache keys the
    arch into the filename the same way, JCudaUtils.java:63-75), and a
    digest of the package sources that shaped the lowering."""
    import jax
    import jaxlib

    from .. import __version__ as pkg_version

    h = hashlib.sha1()
    h.update(repr((FORMAT_VERSION, pkg_version, jax.__version__,
                   jaxlib.__version__, _source_digest())
                  + parts).encode())
    return h.hexdigest()[:20]


def default_cache_dir() -> str:
    base = os.environ.get("FINMATH_TPU_CACHE_DIR",
                          os.path.expanduser("~/.cache/finmath_tpu"))
    return os.path.join(base, "aot")


def save_program(directory: str, name: str, config_parts, jitted,
                 *args) -> Optional[str]:
    """Export ``jitted`` (traced on ``args``) and write it under a
    config-keyed filename. Returns the path, or None on any failure
    (export is strictly best-effort)."""
    try:
        from jax import export

        exp = export.export(jitted)(*args)
        data = exp.serialize()
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(
            directory, f"{name}-{_key(*tuple(config_parts))}.bin")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)
        return path
    except Exception:
        return None


def load_program(directory: str, name: str, config_parts):
    """Deserialize a previously exported program; returns a callable
    ``f(*args)`` or None when absent/unreadable/mismatched — including
    a platform mismatch (exported programs pin their lowering platform;
    a TPU artifact must never be callable from a CPU-pinned context)."""
    path = os.path.join(
        directory, f"{name}-{_key(*tuple(config_parts))}.bin")
    try:
        import jax
        from jax import export

        with open(path, "rb") as fh:
            data = fh.read()
        exp = export.deserialize(data)
        if jax.default_backend().lower() not in (
                p.lower() for p in exp.platforms):
            return None
        return exp.call
    except Exception:
        return None
