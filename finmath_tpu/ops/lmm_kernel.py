"""Pallas TPU kernel: a full LMM path sweep with the forward-rate state
resident on-core.

VERDICT round-1 item 6: the place VMEM residency pays is the LMM — its
per-path state is the whole forward curve ([n_libors, paths] plus the spot
account), so the XLA scan engine (models/lmm/model.py) writes an
O(n_libors * paths) carry to HBM on every time step. This kernel keeps a
[n_libors, 128] tile of state in VMEM/registers for ALL steps: hardware
PRNG -> Box-Muller -> drift prefix sum -> Euler update, emitting only the
discounted swaption payoffs.

Layout notes (Mosaic): the libor axis lives on SUBLANES and the path axis
on LANES, so per-libor scalars broadcast as [n, 1] sublane vectors and
per-path scalars as [1, 128] lane vectors — no relayouts. The time loop is
fully unrolled in Python (num_steps is static), which makes every row
index static (Mosaic has no dynamic_slice/cumsum lowerings) and lets one
(8, 128) Box-Muller pair feed 16 consecutive steps with zero wasted
normals. Prefix sums/products run as Hillis-Steele doubling along the
sublane axis.

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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import make_z_row_source
from .random_variable import ACC_DTYPE

_LANES = 128                      # paths per program
_DRAW = (8, _LANES)               # one PRNG draw feeds 16 steps


def _prefix_scan(x, n, op, identity):
    """Hillis-Steele inclusive scan along the sublane (libor) axis."""
    shift = 1
    while shift < n:
        pad = jnp.full_like(x[:shift], identity)
        x = op(x, jnp.concatenate([pad, x[:-shift]], axis=0))
        shift *= 2
    return x


def _lmm_kernel(seed_ref, scal_ref, volT_ref, l0_ref, delta_ref, out_ref, *,
                num_steps: int, num_libors: int, exercise: int, periods: int,
                normals_ref=None):
    """One [num_libors, 128] tile of paths, all Euler steps unrolled.

    seed (SMEM i32 [1]); scal (SMEM f32 [4]): [dt, sqrt_dt, strike, 0];
    volT (VMEM f32 [num_libors, num_steps]): sigma_i(t_s) * R_i, TRANSPOSED
    so a time step is a [n, 1] sublane column; l0/delta (VMEM f32 [n, 1]).
    out (VMEM f32 [1, 128]): discounted payoff max(1-P_end-K*ann, 0)/N.

    ``normals_ref`` (optional VMEM [num_steps_pad, 128] block per tile):
    externally supplied standard normals instead of the on-core PRNG — the
    CI path that lets the interpreter validate the Euler arithmetic
    against a NumPy reference exactly (the interpreter does not honor
    prng_seed, so the PRNG path is only statistically testable on TPU).
    """
    pid = pl.program_id(0).astype(jnp.int32)
    if normals_ref is None:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32)
                        + pid * jnp.int32(-1640531527))
    dt = scal_ref[0]
    sqrt_dt = scal_ref[1]
    strike = scal_ref[2]

    delta = delta_ref[...]                                   # [n, 1]
    n = num_libors
    one = jnp.float32(1.0)

    L = l0_ref[...] * jnp.ones((n, _LANES), dtype=jnp.float32)
    N = jnp.ones((1, _LANES), dtype=jnp.float32)

    next_z = make_z_row_source(normals_ref, _DRAW)
    for s in range(num_steps):
        z = next_z()                                         # [1, 128]
        # spot account accrues period s at its (frozen) fixing L_s over
        # the period's OWN accrual fraction delta_s (== dt on the uniform
        # benchmark grid, but not in general — the scan engine accrues
        # with deltas, models/lmm/model.py)
        N = N * (one + delta[s:s + 1] * L[s:s + 1])
        lam = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) >= s + 1,
            volT_ref[:, s:s + 1], jnp.float32(0.0))          # [n, 1]
        # spot-measure drift: prefix sum of delta*lam/(1+delta*L)
        c = (delta * lam) / (one + delta * L)                # [n, 128]
        prefix = _prefix_scan(c, n, jnp.add, 0.0)
        L = L + lam * (prefix * dt + sqrt_dt * z)

    # collect at T_exercise: bond prefix-product over the swap periods
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    in_swap = jnp.logical_and(idx >= exercise, idx < exercise + periods)
    r = jnp.where(in_swap, one / (one + delta * L), one)
    cp = _prefix_scan(r, n, jnp.multiply, 1.0)               # [n, 128]
    ann = jnp.sum(jnp.where(in_swap, cp * delta, jnp.float32(0.0)),
                  axis=0, keepdims=True)                     # [1, 128]
    p_end = cp[exercise + periods - 1:exercise + periods]    # [1, 128]
    payoff = jnp.maximum(one - p_end - strike * ann, 0.0)
    # minimum VMEM block is (8, 128): broadcast the [1, 128] result and let
    # the host read row 0 of each tile
    out_ref[0] = jnp.broadcast_to(payoff / N, (8, _LANES))


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
    num_tiles = pl.cdiv(num_paths, _LANES)
    # [n, S]: one time step = one sublane column (no in-kernel transposes)
    volT = jnp.asarray(vol_table, dtype=jnp.float32)[:num_steps].T
    l0 = jnp.asarray(initial_forwards, dtype=jnp.float32)[:, None]
    dl = jnp.asarray(deltas, dtype=jnp.float32)[:, None]
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
                (1, 8, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles, 8, _LANES),
                                           jnp.float32),
            interpret=interpret,
        )(seed_arr, scal, volT, l0, dl)

    flat = payoffs[:, 0, :].reshape(-1)[:num_paths]
    return jnp.sum(flat.astype(ACC_DTYPE)) / num_paths


@functools.partial(jax.jit, static_argnums=(1, 2, 3),
                   static_argnames=("interpret",))
def lmm_swaption_kernel_with_normals(normals, num_libors: int,
                                     exercise: int, periods: int,
                                     vol_table, initial_forwards, deltas,
                                     dt, strike, interpret: bool = False):
    """PRNG-free variant: ``normals`` is [num_steps, num_paths] of standard
    normals supplied by the caller. This is the CI validation path — the
    identical Euler arithmetic runs under the Pallas interpreter on CPU and
    is compared elementwise against a NumPy reference (the on-core PRNG
    cannot be seeded there)."""
    num_steps, num_paths = normals.shape
    num_tiles = pl.cdiv(num_paths, _LANES)
    pad = num_tiles * _LANES - num_paths
    z = jnp.asarray(normals, dtype=jnp.float32)
    if pad:
        z = jnp.concatenate([z, jnp.zeros((num_steps, pad), jnp.float32)], 1)
    # [tiles, steps, 128] so each program gets its own [1, steps, 128] block
    z = z.reshape(num_steps, num_tiles, _LANES).transpose(1, 0, 2)

    volT = jnp.asarray(vol_table, dtype=jnp.float32)[:num_steps].T
    l0 = jnp.asarray(initial_forwards, dtype=jnp.float32)[:, None]
    dl = jnp.asarray(deltas, dtype=jnp.float32)[:, None]
    scal = jnp.stack([jnp.asarray(dt), jnp.sqrt(jnp.asarray(dt)),
                      jnp.asarray(strike), jnp.asarray(0.0)]).astype(jnp.float32)
    seed_arr = jnp.asarray([0], dtype=jnp.int32)

    def kernel(seed_ref, scal_ref, volT_ref, l0_ref, delta_ref, normals_ref,
               out_ref):
        _lmm_kernel(seed_ref, scal_ref, volT_ref, l0_ref, delta_ref, out_ref,
                    num_steps=num_steps, num_libors=num_libors,
                    exercise=exercise, periods=periods,
                    normals_ref=normals_ref)

    with jax.enable_x64(False):
        payoffs = pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, num_steps, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles, 8, _LANES),
                                           jnp.float32),
            interpret=interpret,
        )(seed_arr, scal, volT, l0, dl, z)

    flat = payoffs[:, 0, :].reshape(-1)[:num_paths]
    return jnp.sum(flat.astype(ACC_DTYPE)) / num_paths
