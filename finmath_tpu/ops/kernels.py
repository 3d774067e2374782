"""Pallas TPU kernels for the hot Monte-Carlo paths.

XLA already fuses the elementwise chains of the RandomVariable API
(SURVEY.md §7: the reference's 29 tiny CUDA kernels collapse into fused TPU
loops), and measured on a v5 lite chip the f64-accumulated reductions are
fast (0.04 ms for a 1M-element sum), so neither needs hand-written kernels.
What XLA does NOT do well is keep a whole *time-stepping loop* resident in
VMEM: a lax.scan writes the carry back to HBM every step and re-launches,
so a 1M-path x 100-step Euler sweep costs ~200 HBM round-trips of the state
vector plus per-step scheduling.

``bs_paths_kernel`` is the Pallas answer for the flagship Black-Scholes
workload (reference benchmark row README.md:215): each program owns a
(64, 128)-lane tile of paths, seeds the per-core PRNG once, and runs ALL
time steps in registers/VMEM — hardware PRNG bits -> Box-Muller normals
(both outputs used) -> Euler update — writing only the final per-tile
payoffs. HBM traffic drops from O(steps * paths) to O(paths).

Measured (v5 lite, 1M paths x 100 steps, round 2, same-process
comparisons): BS 29.6 ms kernel vs 30.7 ms scan; Asian 30.0 ms vs 34.0 ms
(the round-1 Asian kernel LOST 47-vs-39 by discarding half of each
Box-Muller pair — fixed); both are near the normal-generation throughput
bound, so the wins are moderate. The structural advantage (state never
leaves VMEM) grows with per-path state size — the LMM path kernel
(ops/lmm_kernel.py), whose state is the whole forward curve, runs 2.5x
faster than the scan engine (33.3 ms vs 83.8 ms at 409,600 paths x 10
steps x 40 libors).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precise_math import log32
from .random_variable import ACC_DTYPE

_TILE = (64, 128)
_TILE_SIZE = _TILE[0] * _TILE[1]
_TWO_PI = 2.0 * math.pi


def _draw_normal_pair(shape=_TILE):
    """Two standard normals per tile via Box-Muller, BOTH outputs used.

    Two draws of 24-bit uniforms in (0, 1); bitcast to unsigned first
    (prng_random_bits yields int32 — an arithmetic shift would keep the
    sign and produce negative "uniforms"); values are < 2^24 so the int32
    reinterpretation is exact (Mosaic has no uint32->f32 cast)."""
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 8
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 8
    u1 = pltpu.bitcast(bits1, jnp.int32).astype(jnp.float32) \
        * jnp.float32(2 ** -24) + jnp.float32(2 ** -25)
    u2 = pltpu.bitcast(bits2, jnp.int32).astype(jnp.float32) \
        * jnp.float32(2 ** -24)
    # the TPU-native log is only ~3.7e-4 accurate, which measurably biases
    # the normals' variance (observed ~0.2% high on LMM swaption prices);
    # the ~1-ULP fdlibm log32 removes it (bit-twiddling lowers fine in
    # Mosaic)
    r = jnp.sqrt(jnp.float32(-2.0) * log32(u1))
    theta = jnp.float32(_TWO_PI) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def make_z_row_source(normals_ref, draw_shape):
    """Trace-time factory for a per-row [1, lanes] normal source inside a
    Pallas kernel: pops rows from buffered Box-Muller draws (BOTH outputs
    consumed — the round-1 Asian kernel lost half its RNG work by
    discarding the sine output), or reads successive rows of an injected
    ``normals_ref`` block (the CI interpreter path, which cannot honor
    prng_seed). Shared by the LMM path kernels."""
    state = {"rows": [], "row": 0}

    def next_z():
        if normals_ref is not None:
            r = state["row"]
            state["row"] += 1
            return normals_ref[0, r:r + 1]
        if not state["rows"]:
            z1, z2 = _draw_normal_pair(draw_shape)
            state["rows"] = [z1[i:i + 1] for i in range(draw_shape[0])] \
                + [z2[i:i + 1] for i in range(draw_shape[0])]
        return state["rows"].pop(0)

    return next_z


def _bs_kernel(seed_ref, params_ref, payoff_ref, *, num_steps: int):
    """One tile of paths: full Euler sweep in VMEM.

    params layout (SMEM f32 [6]): [log_s0, drift_per_step, vol_sqrt_dt,
    strike, unused, unused]."""
    pid = pl.program_id(0).astype(jnp.int32)
    # decorrelate tiles with a Weyl/Knuth mix of the seed and program id
    pltpu.prng_seed(seed_ref[0].astype(jnp.int32)
                    + pid * jnp.int32(-1640531527))

    log_s0 = params_ref[0]
    drift = params_ref[1]
    vol_sqrt_dt = params_ref[2]
    strike = params_ref[3]

    def double_step(_, log_s):
        z1, z2 = _draw_normal_pair()
        return log_s + (drift + drift) + vol_sqrt_dt * (z1 + z2)

    log_s = jnp.full(_TILE, log_s0, dtype=jnp.float32)
    # int32 bounds: with jax_enable_x64 a plain-int fori_loop index becomes
    # i64, which Mosaic cannot lower
    log_s = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(num_steps // 2), double_step, log_s
    )
    if num_steps % 2:
        z1, _ = _draw_normal_pair()
        log_s = log_s + drift + vol_sqrt_dt * z1
    payoff_ref[0] = jnp.maximum(jnp.exp(log_s) - strike, 0.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def bs_paths_kernel(seed: int, num_paths: int, num_steps: int,
                    s0, r, sigma, maturity, strike):
    """European-call payoffs for ``num_paths`` (rounded up to tile size)
    Monte-Carlo paths, fully fused in one Pallas kernel. Returns the
    discounted MC price (f64 reduction outside the kernel)."""
    num_tiles = pl.cdiv(num_paths, _TILE_SIZE)
    dt = maturity / num_steps
    params = jnp.asarray(
        [jnp.log(s0), (r - 0.5 * sigma * sigma) * dt,
         sigma * jnp.sqrt(dt), strike, 0.0, 0.0],
        dtype=jnp.float32,
    )
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)

    # trace the kernel in 32-bit mode: under jax_enable_x64 stray i64
    # scalars (loop indices, program ids) appear in the Mosaic IR, which
    # the TPU compiler cannot lower
    with jax.enable_x64(False):
        payoffs = pl.pallas_call(
            functools.partial(_bs_kernel, num_steps=num_steps),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1,) + _TILE, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles,) + _TILE, jnp.float32),
        )(seed_arr, params)

    # paths beyond num_paths (tile padding) are excluded from the mean
    flat = payoffs.reshape(-1)[:num_paths]
    mean = jnp.sum(flat.astype(ACC_DTYPE)) / num_paths
    return mean * jnp.exp(-r * maturity)


def mc_european_call_price_pallas(seed: int, num_paths: int, num_steps: int,
                                  initial_value: float, risk_free_rate: float,
                                  volatility: float, maturity: float,
                                  strike: float) -> float:
    """Drop-in alternative to models.black_scholes.mc_european_call_price
    with the whole path loop resident on-core."""
    return float(
        bs_paths_kernel(
            int(seed), int(num_paths), int(num_steps),
            jnp.float64(initial_value), jnp.float64(risk_free_rate),
            jnp.float64(volatility), jnp.float64(maturity), jnp.float64(strike),
        )
    )


# ---------------------------------------------------------------------------
# Asian (arithmetic-average) option — the path-dependent variant, fully
# on-core with both Box-Muller outputs consumed across consecutive steps
# (the round-1 version discarded the sine output — half the RNG/log/sqrt
# work per normal; see BENCHMARKS.md for the measured scan-vs-kernel rows).
# ---------------------------------------------------------------------------

def _asian_kernel(seed_ref, params_ref, payoff_ref, *, num_steps: int):
    """params (SMEM f32 [6]): [log_s0, drift, vol_sqrt_dt, strike, 0, 0].
    Pays max(avg(S_1..S_n) - K, 0) with the arithmetic average over all
    time-step observations."""
    pid = pl.program_id(0).astype(jnp.int32)
    pltpu.prng_seed(seed_ref[0].astype(jnp.int32)
                    + pid * jnp.int32(-1640531527))
    log_s0 = params_ref[0]
    drift = params_ref[1]
    vol_sqrt_dt = params_ref[2]
    strike = params_ref[3]

    def double_step(_, carry):
        log_s, sum_s = carry
        z1, z2 = _draw_normal_pair()
        log_s = log_s + drift + vol_sqrt_dt * z1
        sum_s = sum_s + jnp.exp(log_s)
        log_s = log_s + drift + vol_sqrt_dt * z2
        sum_s = sum_s + jnp.exp(log_s)
        return log_s, sum_s

    log_s = jnp.full(_TILE, log_s0, dtype=jnp.float32)
    sum_s = jnp.zeros(_TILE, dtype=jnp.float32)
    log_s, sum_s = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(num_steps // 2), double_step, (log_s, sum_s)
    )
    if num_steps % 2:
        z1, _ = _draw_normal_pair()
        log_s = log_s + drift + vol_sqrt_dt * z1
        sum_s = sum_s + jnp.exp(log_s)
    avg = sum_s / jnp.float32(num_steps)
    payoff_ref[0] = jnp.maximum(avg - strike, 0.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def asian_paths_kernel(seed: int, num_paths: int, num_steps: int,
                       s0, r, sigma, maturity, strike):
    num_tiles = pl.cdiv(num_paths, _TILE_SIZE)
    dt = maturity / num_steps
    params = jnp.asarray(
        [jnp.log(s0), (r - 0.5 * sigma * sigma) * dt,
         sigma * jnp.sqrt(dt), strike, 0.0, 0.0],
        dtype=jnp.float32,
    )
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)
    with jax.enable_x64(False):
        payoffs = pl.pallas_call(
            functools.partial(_asian_kernel, num_steps=num_steps),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1,) + _TILE, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles,) + _TILE, jnp.float32),
        )(seed_arr, params)
    flat = payoffs.reshape(-1)[:num_paths]
    mean = jnp.sum(flat.astype(ACC_DTYPE)) / num_paths
    return mean * jnp.exp(-r * maturity)


def mc_asian_call_price_pallas(seed: int, num_paths: int, num_steps: int,
                               initial_value: float, risk_free_rate: float,
                               volatility: float, maturity: float,
                               strike: float) -> float:
    """Arithmetic-average Asian call, fully on-core (the observation dates
    are the Euler time steps)."""
    return float(
        asian_paths_kernel(
            int(seed), int(num_paths), int(num_steps),
            jnp.float64(initial_value), jnp.float64(risk_free_rate),
            jnp.float64(volatility), jnp.float64(maturity), jnp.float64(strike),
        )
    )
