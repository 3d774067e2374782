"""Pallas TPU kernel: stochastic-volatility LMM path sweep, VMEM-resident.

Extends ops/lmm_kernel.py (one-factor ATM configuration) to the published
benchmark model family (LIBORMarketModelCalibrationTest.java:269-275):
5-factor exponential covariance, blended local volatility
lam_i(t) = sigma_i(t) * ((1-b) L_i(t) + b L_i(0)) * R_i,f * sqrt(V(t)),
and the lognormal scaling process
V(t+dt) = V(t) * exp(nu dW_V - nu^2 dt / 2),  dW_V = rho dW_0 +
sqrt(1-rho^2) dW_extra — exactly the dynamics of the scan engine
(models/lmm/model.py _build_sim; see BENCHMARKS.md for the reconstruction
study). The whole forward-curve state ([n_libors, 128] tile), the spot
account and V stay on-core for all steps; only discounted payoffs leave.

Like the one-factor kernel this is a PRICER (fast revaluation of a
calibrated model — calibration needs derivatives and stays on the
differentiable scan engine). The time loop and the factor loop are
Python-unrolled (static S, F); per (step, factor) the spot-measure drift
prefix-sum runs as a Hillis-Steele doubling along the sublane (libor)
axis. Normals: F+1 rows per step from the on-core PRNG (Box-Muller with
the ~1-ULP log32), or injected via ``normals`` for the CI interpreter
validation path (the interpreter does not honor prng_seed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import make_z_row_source
from .lmm_kernel import _prefix_scan
from .random_variable import ACC_DTYPE

_LANES = 128
_DRAW = (8, _LANES)               # one PRNG draw pair yields 16 z-rows


def _prefix_sum(x, n):
    """Hillis-Steele inclusive prefix sum along the sublane axis."""
    return _prefix_scan(x, n, jnp.add, 0.0)


def _prefix_prod(x, n):
    return _prefix_scan(x, n, jnp.multiply, 1.0)


def _sv_kernel(seed_ref, scal_ref, volT_ref, l0_ref, delta_ref, out_ref, *,
               num_steps: int, num_libors: int, num_factors: int,
               exercise: int, periods: int, normals_ref=None):
    """One [num_libors, 128] path tile, all steps/factors unrolled.

    scal (SMEM f32 [8]): [dt, sqrt_dt, strike, blend, nu, rho,
    sqrt(1-rho^2), 0]. volT (VMEM f32 [F * n, S]): sigma_i(t_s) * R_{i,f}
    stacked factor-major so factor f is rows [f*n, (f+1)*n) and one time
    step is a sublane column.
    """
    pid = pl.program_id(0).astype(jnp.int32)
    if normals_ref is None:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32)
                        + pid * jnp.int32(-1640531527))
    dt, sqrt_dt, strike = scal_ref[0], scal_ref[1], scal_ref[2]
    blend, nu, rho, somega = scal_ref[3], scal_ref[4], scal_ref[5], scal_ref[6]

    n, F = num_libors, num_factors
    one = jnp.float32(1.0)
    delta = delta_ref[...]                                   # [n, 1]
    L0 = l0_ref[...] * jnp.ones((n, _LANES), dtype=jnp.float32)

    L = L0
    N = jnp.ones((1, _LANES), dtype=jnp.float32)
    V = jnp.ones((1, _LANES), dtype=jnp.float32)

    next_z = make_z_row_source(normals_ref, _DRAW)

    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for s in range(num_steps):
        zs = [next_z() for _ in range(F + 1)]                 # [1, 128] each
        # spot account accrues period s at its just-fixed L_s over the
        # period's OWN accrual fraction delta_s (== dt on the uniform
        # benchmark grid, but not in general)
        N = N * (one + delta[s:s + 1] * L[s:s + 1])
        alive = iota >= s + 1                                 # [n, 1]
        # blended local factor * sqrt(V): shared across factors
        lf = ((one - blend) * L + blend * L0) * jnp.sqrt(V)   # [n, 128]
        mt = delta / (one + delta * L)                        # [n, 128]
        mu = jnp.zeros((n, _LANES), dtype=jnp.float32)
        diffusion = jnp.zeros((n, _LANES), dtype=jnp.float32)
        for f in range(F):
            base = jnp.where(alive, volT_ref[f * n:(f + 1) * n, s:s + 1],
                             jnp.float32(0.0))               # [n, 1]
            lam = base * lf                                  # [n, 128]
            mu = mu + lam * _prefix_sum(mt * lam, n)
            diffusion = diffusion + lam * (sqrt_dt * zs[f])
        # f32 overflow guard on tail paths (same bounds as the scan
        # engine's evolve/V clamps — identity for every sane path)
        L = jnp.clip(L + mu * dt + diffusion,
                     jnp.float32(-1e3), jnp.float32(1e3))
        # lognormal variance step (martingale-corrected), driver correlated
        # with factor 0 — used from the NEXT step on, like the scan engine
        dw_v = sqrt_dt * (rho * zs[0] + somega * zs[F])
        V = jnp.minimum(
            V * jnp.exp(nu * dw_v - jnp.float32(0.5) * nu * nu * dt),
            jnp.float32(1e6))

    # payoff at T_exercise
    in_swap = jnp.logical_and(iota >= exercise, iota < exercise + periods)
    r = jnp.where(in_swap, one / (one + delta * L), one)
    cp = _prefix_prod(r, n)
    ann = jnp.sum(jnp.where(in_swap, cp * delta, jnp.float32(0.0)),
                  axis=0, keepdims=True)
    p_end = cp[exercise + periods - 1:exercise + periods]
    payoff = jnp.maximum(one - p_end - strike * ann, 0.0)
    out_ref[0] = jnp.broadcast_to(payoff / N, (8, _LANES))


def _pack_inputs(vol_table, factor_matrix, initial_forwards, deltas,
                 num_steps, dt, strike, blend, nu, rho):
    """Host-side packing shared by the PRNG and injected-normals variants."""
    vt = jnp.asarray(vol_table, dtype=jnp.float32)[:num_steps]   # [S, n]
    R = jnp.asarray(factor_matrix, dtype=jnp.float32)            # [n, F]
    # [F, n, S] -> [F*n, S]: volT[f*n + i, s] = sigma_i(s) * R_{i,f}
    volT = (vt.T[None, :, :] * R.T[:, :, None]).reshape(-1, num_steps)
    l0 = jnp.asarray(initial_forwards, dtype=jnp.float32)[:, None]
    dl = jnp.asarray(deltas, dtype=jnp.float32)[:, None]
    rho32 = jnp.float32(rho)
    scal = jnp.stack([
        jnp.float32(dt), jnp.sqrt(jnp.float32(dt)), jnp.float32(strike),
        jnp.float32(blend), jnp.float32(nu), rho32,
        jnp.sqrt(jnp.maximum(jnp.float32(1.0) - rho32 * rho32,
                             jnp.float32(1e-12))),
        jnp.float32(0.0),
    ])
    return volT, l0, dl, scal


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6),
                   static_argnames=("interpret",))
def lmm_stochvol_swaption_kernel(seed: int, num_paths: int, num_libors: int,
                                 num_factors: int, exercise: int,
                                 periods: int, num_steps: int,
                                 vol_table, factor_matrix, initial_forwards,
                                 deltas, dt, strike, blend, nu, rho,
                                 interpret: bool = False):
    """Monte-Carlo E[payoff / N(T_e)] for a payer swaption under the
    stoch-vol benchmark LMM, path state fully VMEM-resident."""
    num_tiles = pl.cdiv(num_paths, _LANES)
    volT, l0, dl, scal = _pack_inputs(
        vol_table, factor_matrix, initial_forwards, deltas,
        num_steps, dt, strike, blend, nu, rho)
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)

    with jax.enable_x64(False):
        payoffs = pl.pallas_call(
            functools.partial(
                _sv_kernel, num_steps=num_steps, num_libors=num_libors,
                num_factors=num_factors, exercise=exercise, periods=periods),
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
# round 5: the CALIBRATION kernel — every benchmark product collected in one
# path sweep, batched over a leading parameter-set axis (finite-difference
# Jacobians / multi-start scoring ride the same compiled program). This is
# what puts the Pallas path into the production residual/jacobian stack
# (VERDICT round-4 item 1): the reference's design principle is that the
# calibration hot loop runs on the fastest device implementation
# (README.md:24-28, RandomVariableCuda.java:539-557).
# ---------------------------------------------------------------------------


def _sv_kernel_products(scal_ref, volT_ref, l0_ref, delta_ref, normals_ref,
                        out_ref, *, num_libors: int, num_factors: int,
                        products, p_pad: int):
    """One (parameter set, path tile) program: simulate to the LAST
    exercise step, collecting every product's discounted payoff on the way.

    grid = (B, num_tiles). scal (SMEM f32 [B, 8], row = pset):
    [dt, sqrt_dt, blend, nu, rho, sqrt(1-rho^2), 0, 0]; volT block
    (1, F*n, S) picked by pset; normals block (1, rows, 128) picked by
    path tile (rows consumed step-major, factors 0..F-1 then the V
    driver — exactly the engine's injected-increment order,
    models/lmm/model.py sim_step). ``products``: static tuple of
    (exercise_step, num_periods, strike); payoff rows land in product
    order, padded to ``p_pad``. Collection happens at the START of the
    exercise step, BEFORE that step's accrual/evolution — the engine's
    collect ordering."""
    p = pl.program_id(0).astype(jnp.int32)
    dt = scal_ref[p, 0]
    sqrt_dt = scal_ref[p, 1]
    blend, nu = scal_ref[p, 2], scal_ref[p, 3]
    rho, somega = scal_ref[p, 4], scal_ref[p, 5]

    n, F = num_libors, num_factors
    num_steps = max(e for e, _, _ in products)
    by_step = {}
    for k, (e, m, strike) in enumerate(products):
        by_step.setdefault(e, []).append((k, m, strike))

    one = jnp.float32(1.0)
    delta = delta_ref[...]                                   # [n, 1]
    L0 = l0_ref[...] * jnp.ones((n, _LANES), dtype=jnp.float32)
    L = L0
    N = jnp.ones((1, _LANES), dtype=jnp.float32)
    # the scaling process is carried in LOG space: the engine carries V in
    # f64, and a 20-step f32 PRODUCT of exp() terms picks up the TPU fast-
    # exp's few-ULP SYSTEMATIC bias (the hedge-simulation finding,
    # BENCHMARKS.md) which the chaotic calibrated basin then amplifies;
    # log V accumulates ADDITIVELY (unbiased rounding) and one fresh
    # exp(0.5 log V) per step never compounds
    logV = jnp.zeros((1, _LANES), dtype=jnp.float32)

    next_z = make_z_row_source(normals_ref, _DRAW)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    rows = [None] * len(products)

    def collect(s):
        for k, m, strike in by_step[s]:
            in_swap = jnp.logical_and(iota >= s, iota < s + m)
            r = jnp.where(in_swap, one / (one + delta * L), one)
            cp = _prefix_prod(r, n)
            ann = jnp.sum(jnp.where(in_swap, cp * delta, jnp.float32(0.0)),
                          axis=0, keepdims=True)
            p_end = cp[s + m - 1:s + m]
            payoff = jnp.maximum(one - p_end - jnp.float32(strike) * ann, 0.0)
            rows[k] = payoff / N

    for s in range(num_steps + 1):
        if s in by_step:
            collect(s)
        if s == num_steps:
            break
        zs = [next_z() for _ in range(F + 1)]                 # [1, 128] each
        N = N * (one + delta[s:s + 1] * L[s:s + 1])
        alive = iota >= s + 1
        sqrtV = jnp.exp(jnp.float32(0.5) * logV)
        lf = ((one - blend) * L + blend * L0) * sqrtV
        mt = delta / (one + delta * L)
        mu = jnp.zeros((n, _LANES), dtype=jnp.float32)
        diffusion = jnp.zeros((n, _LANES), dtype=jnp.float32)
        for f in range(F):
            base = jnp.where(alive, volT_ref[0, f * n:(f + 1) * n, s:s + 1],
                             jnp.float32(0.0))
            lam = base * lf
            mu = mu + lam * _prefix_sum(mt * lam, n)
            diffusion = diffusion + lam * (sqrt_dt * zs[f])
        L = jnp.clip(L + mu * dt + diffusion,
                     jnp.float32(-1e3), jnp.float32(1e3))
        dw_v = sqrt_dt * (rho * zs[0] + somega * zs[F])
        # running cap at V = 1e6, exactly the engine's min-per-step clamp
        logV = jnp.minimum(logV + nu * dw_v - jnp.float32(0.5) * nu * nu * dt,
                           jnp.float32(13.815511))

    pad = [jnp.zeros((1, _LANES), jnp.float32)] * (p_pad - len(products))
    out_ref[0, 0] = jnp.concatenate(rows + pad, axis=0)


def lmm_stochvol_swaptions_batch(z_tiles, volT_b, scal_b, initial_forwards,
                                 deltas, *, num_libors: int,
                                 num_factors: int, products):
    """Traceable multi-product batched pricer: returns per-path discounted
    payoffs ``[B, num_tiles, P_pad, LANES]`` (f32) for ``len(products)``
    swaptions under ``B`` parameter sets sharing ONE normal realization
    (common random numbers — exactly what a finite-difference Jacobian
    wants). Call inside jit; the caller owns the f64 reduction,
    finite-masking and implied-vol inversion.

    ``z_tiles``: [num_tiles, rows, LANES] f32 standard normals,
    rows = max_exercise_step * (F+1), path tile t covering paths
    [t*128, (t+1)*128). ``volT_b``: [B, F*n, S] f32 (sigma_i(t_s)*R_{i,f}
    factor-major). ``scal_b``: [B, 8] f32 rows
    [dt, sqrt_dt, blend, nu, rho, sqrt(1-rho^2), 0, 0]."""
    B = volT_b.shape[0]
    num_tiles, rows, _ = z_tiles.shape
    P = len(products)
    p_pad = max(8, -(-P // 8) * 8)
    l0 = jnp.asarray(initial_forwards, dtype=jnp.float32).reshape(-1, 1)
    dl = jnp.asarray(deltas, dtype=jnp.float32).reshape(-1, 1)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(
                _sv_kernel_products, num_libors=num_libors,
                num_factors=num_factors, products=tuple(products),
                p_pad=p_pad),
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
                (1, 1, p_pad, _LANES), lambda p, i: (p, i, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, num_tiles, p_pad, _LANES),
                                           jnp.float32),
        )(scal_b.astype(jnp.float32), volT_b.astype(jnp.float32), l0, dl,
          z_tiles.astype(jnp.float32))
    return out


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4),
                   static_argnames=("interpret",))
def lmm_stochvol_swaption_kernel_with_normals(
        normals, num_libors: int, num_factors: int, exercise: int,
        periods: int, vol_table, factor_matrix, initial_forwards, deltas,
        dt, strike, blend, nu, rho, interpret: bool = False):
    """PRNG-free CI-validation variant: ``normals`` is
    [num_steps * (num_factors + 1), num_paths] of standard normals, rows
    consumed in (step-major, factor 0..F-1, then the V driver) order —
    the interpreter runs the identical arithmetic on CPU for elementwise
    comparison against a NumPy reference."""
    rows, num_paths = normals.shape
    num_steps = rows // (num_factors + 1)
    if num_steps * (num_factors + 1) != rows:
        raise ValueError("normals rows must be num_steps * (num_factors+1)")
    num_tiles = pl.cdiv(num_paths, _LANES)
    pad = num_tiles * _LANES - num_paths
    z = jnp.asarray(normals, dtype=jnp.float32)
    if pad:
        z = jnp.concatenate([z, jnp.zeros((rows, pad), jnp.float32)], 1)
    z = z.reshape(rows, num_tiles, _LANES).transpose(1, 0, 2)

    volT, l0, dl, scal = _pack_inputs(
        vol_table, factor_matrix, initial_forwards, deltas,
        num_steps, dt, strike, blend, nu, rho)
    seed_arr = jnp.asarray([0], dtype=jnp.int32)

    def kernel(seed_ref, scal_ref, volT_ref, l0_ref, delta_ref, normals_ref,
               out_ref):
        _sv_kernel(seed_ref, scal_ref, volT_ref, l0_ref, delta_ref, out_ref,
                   num_steps=num_steps, num_libors=num_libors,
                   num_factors=num_factors, exercise=exercise,
                   periods=periods, normals_ref=normals_ref)

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
                pl.BlockSpec((1, rows, _LANES), lambda i: (i, 0, 0),
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
