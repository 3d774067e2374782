"""Multilevel Monte Carlo (Giles 2008) for discretization-biased
payoffs, with the coupled two-resolution path kernel fused on device.

Capability map: capabilities-plus (neither the reference nor
finmath-lib ships MLMC); it completes the framework's
efficiency-technique family (antithetic, control variates, Sobol QMC,
importance sampling — all measured in BENCHMARKS.md) with the standard
tool for payoffs whose discrete-monitoring bias decays slowly — the
lookback/barrier class, where the continuity gap is O(sqrt(dt)) and a
single-level estimator needs a very fine grid.

Method: levels l = 0..L simulate the SAME Brownian path at two
resolutions (fine: m0 2^l steps; coarse: half — the coarse increment is
the sum of the two fine ones, the exact coupling), and estimate the
telescoping corrections Y_l = P_fine - P_coarse. E[P_L] =
sum_l E[Y_l]; Var(Y_l) decays like 2^{-l/2} for the lookback minimum
(strong order 1/2 of the extremum), so most samples sit on the cheap
coarse levels. Sample sizes follow Giles' optimal allocation
N_l ~ sqrt(V_l / C_l) with the standard eps^-2 normalization.

TPU-first notes: each level is ONE fused jitted kernel — a lax.scan
over coarse steps whose body consumes TWO fine normals (fine update
twice, coarse once, running minima carried in f32, packed f64 sums out,
one transfer per level). Level kernels are compiled per (steps, paths)
shape; the driver reuses them across the adaptive iterations."""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE


@partial(jax.jit, static_argnums=(1, 2, 3))
def _lookback_level_kernel(key, n: int, coarse_steps: int, level0: bool,
                           s0, r, sig, maturity):
    """Coupled-level sums for the floating-strike lookback call
    payoff P = S_T - min S (undiscounted). Fine grid = 2 * coarse
    grid (level0: the coarse path alone). Returns packed f64
    [sum_Y, sum_Y2, sum_Pf, sum_Pf2]."""
    dt_f = maturity / (2 * coarse_steps)
    vol_f = sig * jnp.sqrt(jnp.asarray(dt_f, FLOAT_DTYPE))
    drift_f = (r - 0.5 * sig * sig) * dt_f

    def step(carry, k):
        lf, mf, lc, mc = carry
        k1, k2 = jax.random.split(k)
        z1 = jax.random.normal(k1, (n,), dtype=FLOAT_DTYPE)
        z2 = jax.random.normal(k2, (n,), dtype=FLOAT_DTYPE)
        lf1 = lf + drift_f + vol_f * z1
        mf = jnp.minimum(mf, lf1)
        lf2 = lf1 + drift_f + vol_f * z2
        mf = jnp.minimum(mf, lf2)
        # exact coupling: the coarse increment is the SUM of the fine
        # ones (same Brownian path at half resolution)
        lc = lc + 2.0 * drift_f + vol_f * (z1 + z2)
        mc = jnp.minimum(mc, lc)
        return (lf2, mf, lc, mc), None

    zeros = jnp.zeros((n,), dtype=FLOAT_DTYPE)
    keys = jax.random.split(key, coarse_steps)
    (lf, mf, lc, mc), _ = jax.lax.scan(
        step, (zeros, zeros, zeros, zeros), keys)
    # Giles' lookback treatment: shift the discrete minimum by the
    # Broadie-Glasserman-Kou beta1 sigma sqrt(dt) OF ITS OWN GRID —
    # this lifts the weak rate from O(sqrt(dt)) to O(dt), and the
    # telescoping stays exact because level l's coarse payoff uses the
    # same definition as level l-1's fine payoff (same grid, same shift)
    beta1 = 0.5825971579390107
    shift_f = beta1 * vol_f
    shift_c = beta1 * vol_f * math.sqrt(2.0)
    p_f = s0 * (jnp.exp(lf.astype(ACC_DTYPE))
                - jnp.exp((jnp.minimum(mf, 0.0) - shift_f)
                          .astype(ACC_DTYPE)))
    p_c = s0 * (jnp.exp(lc.astype(ACC_DTYPE))
                - jnp.exp((jnp.minimum(mc, 0.0) - shift_c)
                          .astype(ACC_DTYPE)))
    y = p_f - p_c if not level0 else p_c
    return jnp.stack([jnp.sum(y), jnp.sum(y * y),
                      jnp.sum(p_f), jnp.sum(p_f * p_f)])


@dataclass
class MLMCResult:
    value: float
    stderr: float
    levels: List[int]
    samples: List[int]
    level_means: List[float]
    level_vars: List[float]
    total_fine_steps: float          #: cost proxy: sum N_l * steps_l
    bias_estimate: float


def mlmc_lookback_call(initial_value: float, risk_free_rate: float,
                       volatility: float, maturity: float,
                       eps: float = 0.02, m0: int = 4,
                       max_level: int = 9, n_pilot: int = 20_000,
                       seed: int = 1234) -> MLMCResult:
    """Continuously-monitored floating-strike lookback call by MLMC,
    to target RMS accuracy ``eps`` (same units as the price). The
    closed-form oracle is ``analytic.lookback_floating_strike_value``.

    Giles' adaptive driver: pilot-estimate V_l, allocate
    N_l = ceil(2 eps^-2 sqrt(V_l/C_l) sum_k sqrt(V_k C_k)), add levels
    until the weak-error (bias) estimate |Y_L| / (2^gamma - 1) < eps/2
    with the post-BGK-shift weak rate gamma = 1."""
    s0 = jnp.asarray(initial_value, dtype=FLOAT_DTYPE)
    rr = jnp.asarray(risk_free_rate, dtype=FLOAT_DTYPE)
    sg = jnp.asarray(volatility, dtype=FLOAT_DTYPE)
    tt = jnp.asarray(maturity, dtype=FLOAT_DTYPE)
    df = math.exp(-risk_free_rate * maturity)
    key = jax.random.PRNGKey(seed)

    def run_level(level: int, n: int, draw: int):
        k = jax.random.fold_in(jax.random.fold_in(key, level), draw)
        coarse = m0 * 2 ** max(level - 1, 0)
        out = np.asarray(_lookback_level_kernel(
            k, int(n), int(coarse), level == 0, s0, rr, sg, tt))
        return out

    sums: Dict[int, np.ndarray] = {}
    counts: Dict[int, int] = {}
    draws: Dict[int, int] = {}

    def add_samples(level: int, n: int):
        if n <= 0:
            return
        d = draws.get(level, 0)
        out = run_level(level, n, d)
        draws[level] = d + 1
        sums[level] = sums.get(level, np.zeros(4)) + out
        counts[level] = counts.get(level, 0) + n

    def stats(level: int):
        s = sums[level]
        n = counts[level]
        mean = s[0] / n
        var = max(s[1] / n - mean * mean, 1e-30)
        return mean, var

    # pilot
    levels = [0, 1, 2]
    for lv in levels:
        add_samples(lv, n_pilot)

    gamma = 1.0                      # weak rate after the BGK shift
    for _ in range(50):              # adaptive refinement
        # optimal allocation (cost C_l ~ fine steps of the level)
        cost = [m0 * 2 ** max(lv, 0) for lv in levels]
        vs = [stats(lv)[1] for lv in levels]
        lam = sum(math.sqrt(v * c) for v, c in zip(vs, cost))
        targets = [int(math.ceil(2.0 * eps ** -2 * df * df
                                 * math.sqrt(v / c) * lam))
                   for v, c in zip(vs, cost)]
        extra = [max(t - counts[lv], 0) for t, lv in zip(targets, levels)]
        for lv, e in zip(levels, extra):
            add_samples(lv, min(e, 2_000_000))
        # bias check on the finest level
        mean_l, _ = stats(levels[-1])
        bias = abs(mean_l) / (2.0 ** gamma - 1.0) * df
        converged_n = all(counts[lv] >= 0.95 * t
                          for lv, t in zip(levels, targets))
        if bias > eps / math.sqrt(2.0) and len(levels) <= max_level:
            levels.append(levels[-1] + 1)
            add_samples(levels[-1], n_pilot)
        elif converged_n:
            break

    value = df * sum(stats(lv)[0] for lv in levels)
    stderr = df * math.sqrt(sum(stats(lv)[1] / counts[lv]
                                for lv in levels))
    return MLMCResult(
        value=float(value), stderr=float(stderr), levels=list(levels),
        samples=[counts[lv] for lv in levels],
        level_means=[float(stats(lv)[0]) for lv in levels],
        level_vars=[float(stats(lv)[1]) for lv in levels],
        total_fine_steps=float(sum(
            counts[lv] * m0 * 2 ** max(lv, 0) for lv in levels)),
        bias_estimate=float(abs(stats(levels[-1])[0]) * df))
