"""Hedge simulation and realized-variance products: the delta-hedged
portfolio and the variance swap.

Capability map: finmath-lib ships
``montecarlo.assetderivativevaluation.products
.BlackScholesDeltaHedgedPortfolio`` (simulate the discrete delta hedge
along every path; its value must reproduce the option and its residual
is the discretization hedge error) and a realized-variance payoff
family. Both are pathwise loops over the full grid — exactly the
workload the reference's eager device vector API was built for
(SURVEY §3.2 hot path); here each is ONE fused ``lax.scan``.

TPU-first notes: the hedge scan carries (shares, cash) f32 [paths]
state over the date axis, evaluating the Black-Scholes delta N(d1)
in-scan (one erf per step — VPU math, no host round trip); reductions
accumulate f64. Self-validation is built into the payoff structure:
the discounted hedged-portfolio mean IS the option price (any
discretization), while the hedge-error standard deviation must shrink
like sqrt(dt) as the rebalancing grid refines — both asserted in
tests/test_hedging.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE
from .equity_products import _deterministic_dfs, _grid_times_up_to


@partial(jax.jit, static_argnums=(7,))
def _delta_hedge_kernel(assets_with_s0, times, r, sigma, strike,
                        maturity, v0, is_call: bool):
    """assets_with_s0: [T+1, paths] including t=0; times: [T+1] f64
    grid (0 first). Returns [3]: (discounted portfolio mean,
    hedge-error mean, hedge-error std) where hedge error =
    portfolio(T) - payoff(T), both in time-T money.

    Precision note: TPU's fast f32 exp/log/erf carry a few-ULP
    SYSTEMATIC error per evaluation; compounded over hundreds of
    identical accrual steps it biased the hedge-error mean by +0.04 on
    a 12.0 premium at 250 x 1M (63 sigma) while the CPU run of the
    same f32 kernel was clean. Fix: the cash leg is carried in f64
    (emulated — two [paths] vectors, measured cost small) with the
    accrual factor computed in f64, and the delta's log runs through
    the framework's ~1-ULP log32; erf stays f32 because only the
    DIFFERENCE of adjacent deltas enters the cash leg (its systematic
    component cancels)."""
    from ..ops.precise_math import log32
    sign = 1.0 if is_call else -1.0
    sqrt2 = jnp.asarray(math.sqrt(2.0), FLOAT_DTYPE)
    rf = r.astype(FLOAT_DTYPE)
    sigf = sigma.astype(FLOAT_DTYPE)

    def delta(s, t):
        tau = jnp.maximum(maturity - t, 1e-12).astype(FLOAT_DTYPE)
        d1 = (log32(s / strike)
              + (rf + 0.5 * sigf * sigf) * tau) / (sigf * jnp.sqrt(tau))
        nd1 = 0.5 * (1.0 + jax.lax.erf(d1 / sqrt2))
        return nd1 if is_call else nd1 - 1.0

    s0 = assets_with_s0[0]
    d = delta(s0, times[0].astype(FLOAT_DTYPE))
    cash = v0.astype(ACC_DTYPE) - d.astype(ACC_DTYPE) \
        * s0.astype(ACC_DTYPE)                   # self-financing start

    def step(carry, xs):
        d_prev, cash = carry
        s, t, dt = xs
        cash = cash * jnp.exp(r * dt)            # f64 accrual
        d_new = delta(s, t.astype(FLOAT_DTYPE))
        cash = cash - (d_new - d_prev).astype(ACC_DTYPE) \
            * s.astype(ACC_DTYPE)                # rebalance
        return (d_new, cash), None

    dts = times[1:] - times[:-1]
    (d_last, cash), _ = jax.lax.scan(
        step, (d, cash), (assets_with_s0[1:], times[1:], dts))
    s_t = assets_with_s0[-1]
    portfolio = d_last.astype(ACC_DTYPE) * s_t.astype(ACC_DTYPE) + cash
    payoff = jnp.maximum(
        sign * (s_t.astype(ACC_DTYPE) - strike.astype(ACC_DTYPE)), 0.0)
    err = portfolio - payoff
    df = jnp.exp(-r.astype(ACC_DTYPE) * maturity)
    pv = portfolio * df
    n = pv.shape[0]
    mean_pv = jnp.sum(pv) / n
    mean_err = jnp.sum(err) / n
    std_err = jnp.sqrt(jnp.sum((err - mean_err) ** 2) / (n - 1))
    return jnp.stack([mean_pv, mean_err, std_err])


class DeltaHedgedPortfolio:
    """Discrete Black-Scholes delta hedge of a European option,
    rebalanced on the facade's grid
    (finmath BlackScholesDeltaHedgedPortfolio): starts with the
    analytic premium, trades delta(t, S_t) at every grid date. The
    discounted terminal portfolio reprices the option for ANY
    rebalancing grid; the terminal hedge error is the discretization
    residual (std ~ sqrt(dt))."""

    def __init__(self, maturity: float, strike: float,
                 is_call: bool = True):
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.is_call = bool(is_call)

    def simulate(self, model) -> dict:
        from .analytic import black_scholes_option_value
        from .black_scholes import BlackScholesModel
        bs = getattr(model, "model", None)
        if not isinstance(bs, BlackScholesModel):
            raise NotImplementedError(
                "the BS delta hedge needs a Black-Scholes facade")
        times = _grid_times_up_to(model, self.maturity)
        assets = model.get_asset_values(times)
        s0_row = jnp.full((1, assets.shape[1]), bs.initial_value,
                          dtype=assets.dtype)
        v0 = black_scholes_option_value(
            bs.initial_value, bs.risk_free_rate, bs.volatility,
            self.maturity, self.strike, self.is_call)
        out = np.asarray(_delta_hedge_kernel(
            jnp.concatenate([s0_row, assets], axis=0),
            jnp.asarray([0.0] + times, dtype=ACC_DTYPE),
            jnp.asarray(bs.risk_free_rate, dtype=ACC_DTYPE),
            jnp.asarray(bs.volatility, dtype=ACC_DTYPE),
            jnp.asarray(self.strike, dtype=FLOAT_DTYPE),
            jnp.asarray(self.maturity, dtype=ACC_DTYPE),
            jnp.asarray(v0, dtype=ACC_DTYPE), self.is_call))
        return {"value": float(out[0]), "premium": v0,
                "hedge_error_mean": float(out[1]),
                "hedge_error_std": float(out[2])}

    def get_value(self, model) -> float:
        """Discounted terminal hedge-portfolio mean — must equal the
        option value on any grid (finmath's getValue contract)."""
        return self.simulate(model)["value"]

    getValue = get_value


@jax.jit
def _variance_swap_kernel(assets_with_s0, df, inv_t):
    la = jnp.log(assets_with_s0)
    dlog = la[1:] - la[:-1]                      # [T, paths] f32
    rv = jnp.sum((dlog * dlog).astype(ACC_DTYPE), axis=0) * inv_t
    n = rv.shape[0]
    mean = jnp.sum(rv) / n
    std = jnp.sqrt(jnp.sum((rv - mean) ** 2) / (n - 1))
    return jnp.stack([mean * df, std / jnp.sqrt(1.0 * n) * df, mean])


class VarianceSwap:
    """Pays the annualized realized variance of log returns on the
    facade's grid at maturity: RV = (1/T) sum (ln S_{i+1}/S_i)^2.
    ``get_value`` returns df * E[RV]; ``fair_strike`` the undiscounted
    expectation (the quoted variance-swap strike). Model-free oracle
    under Black-Scholes: E[RV] = sigma^2 + (r - sigma^2/2)^2 dt (the
    drift-squared term is the known discrete-sampling bias); under
    Merton the jump contribution lambda (mu_J^2 + sigma_J^2) adds on
    (tested against both)."""

    def __init__(self, maturity: float):
        self.maturity = float(maturity)

    def get_value_and_error(self, model) -> tuple:
        times = _grid_times_up_to(model, self.maturity)
        assets = model.get_asset_values(times)
        s0 = _spot(model)
        s0_row = jnp.full((1, assets.shape[1]), s0, dtype=assets.dtype)
        df = _deterministic_dfs(model, [self.maturity])[0]
        out = np.asarray(_variance_swap_kernel(
            jnp.concatenate([s0_row, assets], axis=0),
            jnp.asarray(df, dtype=ACC_DTYPE),
            jnp.asarray(1.0 / self.maturity, dtype=ACC_DTYPE)))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    def fair_strike(self, model) -> float:
        times = _grid_times_up_to(model, self.maturity)
        assets = model.get_asset_values(times)
        s0 = _spot(model)
        s0_row = jnp.full((1, assets.shape[1]), s0, dtype=assets.dtype)
        df = _deterministic_dfs(model, [self.maturity])[0]
        out = np.asarray(_variance_swap_kernel(
            jnp.concatenate([s0_row, assets], axis=0),
            jnp.asarray(df, dtype=ACC_DTYPE),
            jnp.asarray(1.0 / self.maturity, dtype=ACC_DTYPE)))
        return float(out[2])

    getValue = get_value


def _spot(model) -> float:
    inner = getattr(model, "model", None) or getattr(model, "params", None)
    s0 = getattr(inner, "initial_value", None)
    if s0 is None:
        raise NotImplementedError(
            "facade does not expose initial_value for the t=0 row")
    return float(s0)
