"""Multi-chip scaling: the Monte-Carlo path axis over a device mesh.

The reference is single-device by design — its only "multi-device" feature
is selecting one GPU by index (/root/reference/.../RandomVariableCuda.java:
161-180), and its scaling limit is one device's memory (README.md:31-35,
">= 12 GB for large runs"). The TPU-native answer is structural instead:
Monte-Carlo paths are embarrassingly parallel, so we shard the [paths] axis
over a ``jax.sharding.Mesh`` with ``shard_map``. Each chip generates its own
path block from a counter-based key fold (no RNG broadcast), simulates
locally, and reductions (``getAverage`` etc.) become a local f64 sum +
``psum`` over ICI. This is the NCCL-analog the reference never had
(SURVEY.md §2 parallelism table, §5 "distributed communication backend").

Everything here also runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) for testing without hardware.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.precise_math import exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE

PATH_AXIS = "paths"


def make_path_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the path axis (data parallel over Monte-Carlo paths).
    Fails loudly when fewer devices are available than requested — a
    silently smaller mesh would fold different per-device RNG streams
    than the intended configuration."""
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"need {num_devices} devices, have {len(devices)}; set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{num_devices} (with JAX_PLATFORMS=cpu) to emulate")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (PATH_AXIS,))


def sharded_mean(mesh: Mesh):
    """Returns a jitted function computing the f64-accumulated mean of a
    path-sharded f32 vector: local sum + psum over ICI (the multi-chip
    ``getAverage``)."""

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(PATH_AXIS), out_specs=P())
    def _mean(x):
        local = jnp.sum(x.astype(ACC_DTYPE), keepdims=True)
        total = jax.lax.psum(local, PATH_AXIS)
        return total

    def mean(x):
        return float(_mean(x)[0]) / x.shape[0]

    return mean


def _mesh_cache_key(mesh: Mesh):
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)


_MC_PRICE_CACHE: dict = {}


def mc_price_sharded(mesh: Mesh, seed: int, total_paths: int, num_steps: int,
                     s0: float, r: float, sigma, maturity: float,
                     strike: float):
    """European-call MC price with paths sharded across the mesh.

    Each device folds the seed with its mesh position, simulates its block
    of paths entirely locally, and the final expectation is one psum.
    ``sigma`` may be a traced value — the function is differentiable, so
    calibration gradients flow through the collective.

    The shard_mapped program is cached per (mesh, statics): a fresh
    closure every call would re-trace and pay a remote compile-cache
    round trip per "warm" call (measured 30 s at 16M paths over the TPU
    tunnel vs sub-second cached).
    """
    key = (_mesh_cache_key(mesh), seed, total_paths, num_steps,
           float(s0), float(r), float(maturity), float(strike))
    cached = _MC_PRICE_CACHE.get(key)
    if cached is not None:
        return cached(jnp.asarray(sigma, dtype=jnp.float64))
    n_dev = mesh.devices.size
    if total_paths % n_dev:
        raise ValueError(f"total_paths {total_paths} not divisible by mesh size {n_dev}")
    paths_per_dev = total_paths // n_dev
    dt = maturity / num_steps

    @partial(shard_map, mesh=mesh, in_specs=(P(PATH_AXIS), P()), out_specs=P())
    def _local(dev_ids, sigma_):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), dev_ids[0])
        sqrt_dt = jnp.sqrt(jnp.asarray(dt)).astype(FLOAT_DTYPE)
        drift = ((r - 0.5 * sigma_ * sigma_) * dt).astype(FLOAT_DTYPE)
        vol = sigma_.astype(FLOAT_DTYPE)

        def step(log_s, k):
            dw = jax.random.normal(k, (paths_per_dev,), dtype=FLOAT_DTYPE) * sqrt_dt
            return log_s + drift + vol * dw, None

        keys = jax.random.split(key, num_steps)
        log_s0 = jnp.full((paths_per_dev,), jnp.log(s0), dtype=FLOAT_DTYPE)
        # initial carry is a replicated constant but the evolved carry is
        # device-varying; mark it varying for shard_map's vma typing
        log_s0 = jax.lax.pcast(log_s0, (PATH_AXIS,), to="varying")
        log_st, _ = jax.lax.scan(step, log_s0, keys)
        payoff = jnp.maximum(exp32(log_st) - jnp.asarray(strike, FLOAT_DTYPE), 0.0)
        local_sum = jnp.sum(payoff.astype(ACC_DTYPE), keepdims=True)
        return jax.lax.psum(local_sum, PATH_AXIS)

    dev_ids = jnp.arange(n_dev, dtype=jnp.int32)

    @jax.jit
    def price(sigma_arr):
        total = _local(dev_ids, sigma_arr)[0]
        return total / total_paths * jnp.exp(-r * maturity)

    _MC_PRICE_CACHE[key] = price
    return price(jnp.asarray(sigma, dtype=jnp.float64))
