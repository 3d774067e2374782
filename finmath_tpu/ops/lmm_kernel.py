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


# ---------------------------------------------------------------------------
# round 5: the ATM CALIBRATION kernel — all ~156 surface swaptions collected
# in one path sweep (plus one 1/numeraire row per exercise event for the
# deterministic numeraire adjustment), batched over a leading parameter-set
# axis like the stoch-vol calibration kernel
# (ops/lmm_stochvol_kernel.py _sv_kernel_products). Because the ATM surface
# has ~170 output rows x hundreds of path tiles, per-path payoffs are NOT
# emitted: each (pset, tile) program ACCUMULATES its [rows, 128] lane sums
# into a block that persists across the (sequential) tile grid axis — the
# classic Pallas reduction pattern; the f64 lane reduction happens outside.
# ---------------------------------------------------------------------------


def _normal_lmm_kernel_products(scal_ref, volT_ref, l0_ref, delta_ref,
                                normals_ref, out_ref, *, num_libors: int,
                                num_factors: int, products, events,
                                p_pad: int, displaced: bool,
                                num_paths: int):
    """One (parameter set, path tile) program for the NORMAL-state-space
    multi-factor LMM without stochastic volatility (the ATM workload,
    LIBORMarketModelCalibrationATMTest.java:270-466).

    grid = (B, num_tiles), tile axis innermost/sequential. scal (SMEM f32
    [B, 8]): [dt, sqrt_dt, displacement, 0...]. volT block (1, F*n, S)
    picked by pset (sigma_i(t_s) * R_{i,f} factor-major). normals block
    (1, S*F, 128) picked by tile, consumed step-major. Output block
    (1, p_pad, 128) accumulates per-lane PATH SUMS across tiles: row k
    (< len(products)) is sum of payoff/N for product k, row
    len(products)+j is sum of 1/N at event j (the numeraire-adjustment
    denominator). Collection happens at the START of the exercise step,
    BEFORE accrual/evolution — the engine's collect ordering."""
    p = pl.program_id(0).astype(jnp.int32)
    i = pl.program_id(1)
    dt = scal_ref[p, 0]
    sqrt_dt = scal_ref[p, 1]
    disp = scal_ref[p, 2]

    n, F = num_libors, num_factors
    num_steps = max(e for e, _, _ in products)
    by_step = {}
    for k, (e, m, strike) in enumerate(products):
        by_step.setdefault(e, []).append((k, m, strike))
    ev_of_step = {e: j for j, e in enumerate(events)}

    one = jnp.float32(1.0)
    delta = delta_ref[...]                                   # [n, 1]
    L = l0_ref[...] * jnp.ones((n, _LANES), dtype=jnp.float32)
    N = jnp.ones((1, _LANES), dtype=jnp.float32)

    next_z = make_z_row_source(normals_ref, _DRAW)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    P = len(products)
    rows = [None] * (P + len(events))

    def collect(s):
        inv_n = one / N
        rows[P + ev_of_step[s]] = inv_n
        for k, m, strike in by_step[s]:
            in_swap = jnp.logical_and(iota >= s, iota < s + m)
            r = jnp.where(in_swap, one / (one + delta * L), one)
            cp = _prefix_scan(r, n, jnp.multiply, 1.0)
            ann = jnp.sum(jnp.where(in_swap, cp * delta, jnp.float32(0.0)),
                          axis=0, keepdims=True)
            p_end = cp[s + m - 1:s + m]
            payoff = jnp.maximum(one - p_end - jnp.float32(strike) * ann, 0.0)
            rows[k] = payoff * inv_n

    for s in range(num_steps + 1):
        if s in by_step:
            collect(s)
        if s == num_steps:
            break
        zs = [next_z() for _ in range(F)]                     # [1, 128] each
        N = N * (one + delta[s:s + 1] * L[s:s + 1])
        alive = iota >= s + 1
        lf = (L + disp) if displaced else None
        mt = delta / (one + delta * L)
        mu = jnp.zeros((n, _LANES), dtype=jnp.float32)
        diffusion = jnp.zeros((n, _LANES), dtype=jnp.float32)
        for f in range(F):
            base = jnp.where(alive, volT_ref[0, f * n:(f + 1) * n, s:s + 1],
                             jnp.float32(0.0))                # [n, 1]
            lam = base * lf if displaced else base
            mu = mu + lam * _prefix_scan(mt * lam, n, jnp.add, 0.0)
            diffusion = diffusion + lam * (sqrt_dt * zs[f])
        L = jnp.clip(L + mu * dt + diffusion,
                     jnp.float32(-1e3), jnp.float32(1e3))

    pad = [jnp.zeros((1, _LANES), jnp.float32)] * (p_pad - len(rows))
    stacked = jnp.concatenate(rows + pad, axis=0)             # [p_pad, 128]
    # the z source zero-pads the path axis to a whole tile; those pad
    # "paths" still simulate and would pollute the lane sums — zero them
    # here (per-path-output kernels slice instead; an accumulator cannot)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    valid = (i.astype(jnp.int32) * _LANES + lane) < num_paths
    stacked = jnp.where(valid, stacked, jnp.float32(0.0))

    @pl.when(i == 0)
    def _init():
        out_ref[0] = stacked

    @pl.when(i != 0)
    def _accumulate():
        out_ref[0] = out_ref[0] + stacked


def lmm_atm_swaptions_batch(z_tiles, volT_b, scal_b, initial_forwards,
                            deltas, *, num_libors: int, num_factors: int,
                            products, events, displaced: bool,
                            num_paths: int):
    """Traceable batched ATM-surface pricer: per-lane PATH SUMS
    ``[B, p_pad, LANES]`` (f32) — rows ``[0, P)`` are sums of
    payoff/numeraire per product, rows ``[P, P+E)`` sums of 1/numeraire
    per exercise event — for ``B`` parameter sets sharing one normal
    realization. The caller reduces lanes in f64, divides by num_paths
    and applies the deterministic numeraire adjustment
    (df(T_e) / E[1/N(T_e)]), mirroring LMMValuationEngine.values."""
    B = volT_b.shape[0]
    num_tiles, rows, _ = z_tiles.shape
    total = len(products) + len(events)
    p_pad = max(8, -(-total // 8) * 8)
    l0 = jnp.asarray(initial_forwards, dtype=jnp.float32).reshape(-1, 1)
    dl = jnp.asarray(deltas, dtype=jnp.float32).reshape(-1, 1)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(
                _normal_lmm_kernel_products, num_libors=num_libors,
                num_factors=num_factors, products=tuple(products),
                events=tuple(events), p_pad=p_pad, displaced=displaced,
                num_paths=num_paths),
            grid=(B, num_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, volT_b.shape[1], volT_b.shape[2]),
                             lambda p, i: (p, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, _LANES), lambda p, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, p_pad, _LANES), lambda p, i: (p, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, p_pad, _LANES), jnp.float32),
        )(scal_b.astype(jnp.float32), volT_b.astype(jnp.float32), l0, dl,
          z_tiles.astype(jnp.float32))
    return out


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
