"""Pallas TPU kernel: a full LMM path sweep with the forward-rate state
resident on-core.

VERDICT round-1 item 6: the place VMEM residency pays is the LMM — its
per-path state is the whole forward curve ([n_libors, paths] plus the spot
account), so the XLA scan engine (models/lmm/model.py) writes an
O(n_libors * paths) carry to HBM on every time step. This kernel keeps a
[n_libors, 8, 128] tile of state in VMEM for ALL steps: hardware PRNG ->
Box-Muller -> drift prefix sum -> Euler update, emitting only the
discounted swaption payoffs.

Scope (the ATM headline configuration, LIBORMarketModelCalibrationATMTest):
spot measure, NORMAL state space, ONE factor (the test's numberOfFactors=1,
:275-278), no local/stochastic vol, simulation grid == tenor grid, one
(exercise, tenor, strike) swaption. The kernel is a PRICER — calibration
needs derivatives, which stay on the differentiable scan engine; this is
the "fast revaluation" path (price a book on a calibrated model).

The RNG stream is the on-core PRNG (per-tile seeds), not the engine's
Threefry stream, so prices agree statistically, not pathwise. Measured
numbers live in BENCHMARKS.md ("LMM path kernel").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import _draw_normal_pair
from .random_variable import ACC_DTYPE

_PTILE = (8, 128)                 # paths per program
_PTILE_SIZE = _PTILE[0] * _PTILE[1]


def _lmm_kernel(seed_ref, scal_ref, vol_ref, l0_ref, delta_ref, out_ref, *,
                num_steps: int, num_libors: int, exercise: int, periods: int):
    """One tile of paths, all Euler steps in VMEM.

    seed (SMEM i32 [1]); scal (SMEM f32 [4]): [dt, sqrt_dt, strike, 0];
    vol (VMEM f32 [num_steps, num_libors]): sigma_i(t_s) * R_i (1 factor);
    l0 (VMEM f32 [num_libors, 1, 1]); delta (VMEM f32 [num_libors, 1, 1]).
    out (VMEM f32 tile): discounted payoff max(1 - P_end - K*ann, 0)/N.
    """
    pid = pl.program_id(0).astype(jnp.int32)
    pltpu.prng_seed(seed_ref[0].astype(jnp.int32)
                    + pid * jnp.int32(-1640531527))
    dt = scal_ref[0]
    sqrt_dt = scal_ref[1]
    strike = scal_ref[2]

    delta = delta_ref[...]                                   # [n, 1, 1]
    libor_idx = jax.lax.broadcasted_iota(jnp.int32, (num_libors, 1, 1), 0)

    L0 = l0_ref[...] * jnp.ones((num_libors,) + _PTILE, dtype=jnp.float32)
    N0 = jnp.ones(_PTILE, dtype=jnp.float32)

    def euler_step(s, carry, z):
        L, N = carry
        alive = (libor_idx >= s + 1).astype(jnp.float32)     # [n, 1, 1]
        # spot account accrues period s at its (frozen) fixing L_s
        N = N * (jnp.float32(1.0) + dt * jax.lax.dynamic_index_in_dim(
            L, s, axis=0, keepdims=False))
        lam = vol_ref[s][:, None, None] * alive              # [n, 1, 1] * bc
        # spot-measure drift: prefix sum over libors of delta*lam/(1+delta*L)
        c = (delta * lam) / (jnp.float32(1.0) + delta * L)   # [n, 8, 128]
        prefix = jnp.cumsum(c, axis=0)
        mu = lam * prefix
        L = L + alive * (mu * dt + lam * (sqrt_dt * z)[None])
        return L, N

    def double_step(i, carry):
        z1, z2 = _draw_normal_pair(_PTILE)
        s = i * 2
        carry = euler_step(s, carry, z1)
        carry = euler_step(s + 1, carry, z2)
        return carry

    L, N = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(num_steps // 2), double_step, (L0, N0)
    )
    if num_steps % 2:
        z1, _ = _draw_normal_pair(_PTILE)
        L, N = euler_step(jnp.int32(num_steps - 1), (L, N), z1)

    # collect at T_exercise: bond cumprod over the swap periods
    in_swap = jnp.logical_and(libor_idx >= exercise,
                              libor_idx < exercise + periods)
    r = jnp.where(in_swap, jnp.float32(1.0) / (jnp.float32(1.0) + delta * L),
                  jnp.float32(1.0))
    cp = jnp.cumprod(r, axis=0)                              # [n, 8, 128]
    ann = jnp.sum(jnp.where(in_swap, cp * delta, jnp.float32(0.0)), axis=0)
    p_end = cp[num_libors - 1]                               # all later r == 1
    payoff = jnp.maximum(jnp.float32(1.0) - p_end - strike * ann, 0.0)
    out_ref[0] = payoff / N


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5),
                   static_argnames=("interpret",))
def lmm_swaption_kernel(seed: int, num_paths: int, num_libors: int,
                        exercise: int, periods: int, num_steps: int,
                        vol_table, initial_forwards, deltas, dt, strike,
                        interpret: bool = False):
    """Monte-Carlo E[payoff / N(T_e)] for a payer swaption on a spot-measure
    NORMAL one-factor LMM, path state fully VMEM-resident. ``num_steps``
    should be the exercise step index (simulating past it is wasted work).
    """
    num_tiles = pl.cdiv(num_paths, _PTILE_SIZE)
    vol = jnp.asarray(vol_table, dtype=jnp.float32)[:num_steps]
    l0 = jnp.asarray(initial_forwards, dtype=jnp.float32)[:, None, None]
    dl = jnp.asarray(deltas, dtype=jnp.float32)[:, None, None]
    scal = jnp.stack([jnp.asarray(dt), jnp.sqrt(jnp.asarray(dt)),
                      jnp.asarray(strike), jnp.asarray(0.0)]).astype(jnp.float32)
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)

    with jax.enable_x64(False):
        payoffs = pl.pallas_call(
            functools.partial(
                _lmm_kernel, num_steps=num_steps, num_libors=num_libors,
                exercise=exercise, periods=periods),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1,) + _PTILE, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles,) + _PTILE, jnp.float32),
            interpret=interpret,
        )(seed_arr, scal, vol, l0, dl)

    flat = payoffs.reshape(-1)[:num_paths]
    return jnp.sum(flat.astype(ACC_DTYPE)) / num_paths
