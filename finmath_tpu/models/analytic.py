"""Closed-form valuation formulas (Black-Scholes, Black'76, Bachelier) and
implied-volatility inversion.

TPU-idiomatic equivalents of the finmath-lib ``AnalyticFormulas`` the
reference tests compare against (e.g. MonteCarloBlackScholesModelTest
asserts |MC - analytic| < 0.005, /root/reference/.../MonteCarloBlackScholes
ModelTest.java:146-156; the swaption calibration targets are produced from
Black/Bachelier vols, LIBORMarketModelCalibrationATMTest.java:188-269).

All formulas are plain float64 host math (they price scalars, not paths) —
but ``jnp``-friendly vectorized variants are provided for use inside jitted
calibration losses.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf as _jnp_erf


def _norm_cdf(x):
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def black_scholes_option_value(initial_value: float, risk_free_rate: float,
                               volatility: float, maturity: float,
                               strike: float, is_call: bool = True) -> float:
    """European option under Black-Scholes."""
    if maturity <= 0 or volatility <= 0:
        fwd = initial_value * math.exp(risk_free_rate * maturity)
        intrinsic = max(fwd - strike, 0.0) if is_call else max(strike - fwd, 0.0)
        return math.exp(-risk_free_rate * maturity) * intrinsic
    sqrt_t = math.sqrt(maturity)
    d1 = (
        math.log(initial_value / strike)
        + (risk_free_rate + 0.5 * volatility * volatility) * maturity
    ) / (volatility * sqrt_t)
    d2 = d1 - volatility * sqrt_t
    if is_call:
        return initial_value * _norm_cdf(d1) - strike * math.exp(
            -risk_free_rate * maturity
        ) * _norm_cdf(d2)
    return strike * math.exp(-risk_free_rate * maturity) * _norm_cdf(
        -d2
    ) - initial_value * _norm_cdf(-d1)


def black_formula(forward: float, strike: float, volatility: float,
                  maturity: float, payoff_unit: float = 1.0) -> float:
    """Black'76: undiscounted lognormal option value times payoffUnit
    (the swaption annuity). Used for lognormal swaption quoting."""
    if maturity <= 0 or volatility <= 0:
        return payoff_unit * max(forward - strike, 0.0)
    sqrt_t = math.sqrt(maturity)
    d1 = (math.log(forward / strike) + 0.5 * volatility**2 * maturity) / (
        volatility * sqrt_t
    )
    d2 = d1 - volatility * sqrt_t
    return payoff_unit * (forward * _norm_cdf(d1) - strike * _norm_cdf(d2))


def bachelier_formula(forward: float, strike: float, volatility: float,
                      maturity: float, payoff_unit: float = 1.0) -> float:
    """Bachelier (normal) model option value times payoffUnit. ATM swaption
    vols in the calibration test are normal vols
    (ref. LIBORMarketModelCalibrationATMTest.java:188-236)."""
    if maturity <= 0:
        return payoff_unit * max(forward - strike, 0.0)
    if volatility <= 0:
        return payoff_unit * max(forward - strike, 0.0)
    sqrt_t = math.sqrt(maturity)
    d = (forward - strike) / (volatility * sqrt_t)
    return payoff_unit * (
        (forward - strike) * _norm_cdf(d)
        + volatility * sqrt_t * math.exp(-0.5 * d * d) / math.sqrt(2.0 * math.pi)
    )


def black_implied_volatility(forward: float, strike: float, maturity: float,
                             value: float, payoff_unit: float = 1.0,
                             tol: float = 1e-12, max_iter: int = 200) -> float:
    """Invert Black'76 by bisection (robust for calibration error
    reporting; the differentiable Newton inverter lives in
    models.lmm.model.black_implied_vol_jnp)."""
    target = value / payoff_unit
    intrinsic = max(forward - strike, 0.0)
    if target <= intrinsic + 1e-16:
        return 0.0
    lo, hi = 1e-8, 5.0
    for _ in range(max_iter):
        mid = 0.5 * (lo + hi)
        v = black_formula(forward, strike, mid, maturity)
        if v < target:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol:
            break
    return 0.5 * (lo + hi)


def bachelier_implied_volatility(forward: float, strike: float, maturity: float,
                                 value: float, payoff_unit: float = 1.0,
                                 tol: float = 1e-12, max_iter: int = 200) -> float:
    """Invert the Bachelier formula by bisection."""
    target = value / payoff_unit
    intrinsic = max(forward - strike, 0.0)
    if target <= intrinsic + 1e-16:
        return 0.0
    lo, hi = 1e-10, 2.0
    for _ in range(max_iter):
        mid = 0.5 * (lo + hi)
        v = bachelier_formula(forward, strike, mid, maturity)
        if v < target:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol:
            break
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# jnp-vectorized variants for use inside jitted losses
# ---------------------------------------------------------------------------

def jnp_norm_cdf(x):
    return 0.5 * (1.0 + _jnp_erf(x / jnp.sqrt(2.0)))


def black_formula_jnp(forward, strike, volatility, maturity, payoff_unit=1.0):
    sqrt_t = jnp.sqrt(jnp.maximum(maturity, 1e-16))
    vol = jnp.maximum(volatility, 1e-12)
    d1 = (jnp.log(forward / strike) + 0.5 * vol**2 * maturity) / (vol * sqrt_t)
    d2 = d1 - vol * sqrt_t
    value = forward * jnp_norm_cdf(d1) - strike * jnp_norm_cdf(d2)
    intrinsic = jnp.maximum(forward - strike, 0.0)
    return payoff_unit * jnp.where(
        (maturity <= 0) | (volatility <= 0), intrinsic, value
    )


def bachelier_formula_jnp(forward, strike, volatility, maturity, payoff_unit=1.0):
    sqrt_t = jnp.sqrt(jnp.maximum(maturity, 1e-16))
    vol = jnp.maximum(volatility, 1e-12)
    d = (forward - strike) / (vol * sqrt_t)
    value = (forward - strike) * jnp_norm_cdf(d) + vol * sqrt_t * jnp.exp(
        -0.5 * d * d
    ) / jnp.sqrt(2.0 * jnp.pi)
    intrinsic = jnp.maximum(forward - strike, 0.0)
    return payoff_unit * jnp.where(maturity <= 0, intrinsic, value)
