"""Bachelier (normal) equity/rate model and the displaced-lognormal
smile model: exact fused MC engines + closed-form pricers.

Capability map (the reference repo's host library finmath-lib ships
both): ``net.finmath.montecarlo.assetderivativevaluation.models
.BachelierModel`` (dS = r S dt + sigma dW — an Euler ProcessModel
there; here ALSO an exact engine, the linear SDE has a Gaussian
solution) and ``...models.DisplacedLognormalModel`` (smile via shift).
The normal family is where negative underlyings/strikes are priced —
the regime the LMM's NORMAL quotes already use
(``analytic.bachelier_formula``).

Conventions, stated because the literature varies:

* Bachelier dynamics are the finmath SDE ``dS = r S dt + sigma dW``
  (NOT driftless): S_T is Gaussian with mean S0 e^{rT} and variance
  ``sigma^2 (e^{2rT} - 1) / (2r)`` (-> sigma^2 T as r -> 0). The
  closed form is the Bachelier formula on the forward with that exact
  variance — the MC and the formula agree to MC error by construction.
* The displaced model is the market-standard SHIFTED-BLACK convention:
  under the T-forward measure the shifted forward F + d is a driftless
  lognormal, so ``call = df * Black(F + d, K + d, sigma, T)`` and the
  MC simulates the shifted GBM exactly. (finmath's MC variant puts the
  displacement in a risk-neutral SDE ``dS = r S dt + sigma (S + d) dW``
  — DisplacedLognormalModel.java — which coincides with shifted Black
  for r = 0 and differs at order r otherwise; the shifted-Black form is
  the one with the exact closed form and the market-quote meaning.)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise_math import exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE
from .analytic import bachelier_formula, black_formula


# ---------------------------------------------------------------------------
# Bachelier
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BachelierParams:
    initial_value: float
    risk_free_rate: float
    volatility: float       # ABSOLUTE (normal) volatility, units of S

    def __post_init__(self):
        if self.volatility <= 0:
            raise ValueError("volatility must be positive")


def bachelier_terminal_std(params: BachelierParams, maturity: float) -> float:
    """Exact std of S_T: sigma * sqrt((e^{2rT} - 1) / (2r))."""
    r = params.risk_free_rate
    if abs(r) < 1e-12:
        return params.volatility * math.sqrt(maturity)
    return params.volatility * math.sqrt(math.expm1(2.0 * r * maturity)
                                         / (2.0 * r))


def bachelier_analytic_price(params: BachelierParams, maturity: float,
                             strikes, is_call: bool = True) -> np.ndarray:
    """Exact European price: Bachelier formula on the forward
    S0 e^{rT} with the exact terminal std (strikes may be negative)."""
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    fwd = params.initial_value * math.exp(params.risk_free_rate * maturity)
    df = math.exp(-params.risk_free_rate * maturity)
    s_t = bachelier_terminal_std(params, maturity)
    vol = s_t / math.sqrt(maturity)
    call = np.array([bachelier_formula(fwd, k, vol, maturity,
                                       payoff_unit=df) for k in strikes])
    if is_call:
        return call
    return call - df * (fwd - strikes)


@partial(jax.jit, static_argnums=(1, 2))
def _mc_bachelier_kernel(key, num_paths: int, antithetic: bool,
                         fwd, std, df, strikes):
    """Exact single-draw terminal sampling (the Gaussian solution needs
    no time stepping at all): S_T = fwd + std * Z."""
    half = num_paths // 2 if antithetic else num_paths
    z = jax.random.normal(key, (half,), dtype=jnp.float32)
    if antithetic:
        z = jnp.concatenate([z, -z])
    st = fwd.astype(FLOAT_DTYPE) + std.astype(FLOAT_DTYPE) \
        * z.astype(FLOAT_DTYPE)
    mean_st = jnp.sum(st.astype(ACC_DTYPE)) / num_paths * df
    payoff = jnp.maximum(st[None, :]
                         - strikes[:, None].astype(FLOAT_DTYPE), 0.0)
    prices = jnp.sum(payoff.astype(ACC_DTYPE), axis=1) / num_paths * df
    return jnp.concatenate([mean_st[None], prices])


def mc_bachelier_european_prices(params: BachelierParams, maturity: float,
                                 strikes, num_paths: int = 100_000,
                                 seed: int = 3141,
                                 antithetic: bool = False):
    """Exact-terminal MC: ``(prices [K], discounted_forward)`` in one
    fused device program (one normal per path — the Gaussian solution
    of the linear SDE)."""
    if antithetic and num_paths % 2:
        raise ValueError("antithetic needs an even num_paths")
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    fwd = params.initial_value * math.exp(params.risk_free_rate * maturity)
    out = np.asarray(_mc_bachelier_kernel(
        jax.random.PRNGKey(seed), int(num_paths), bool(antithetic),
        jnp.float64(fwd),
        jnp.float64(bachelier_terminal_std(params, maturity)),
        jnp.float64(math.exp(-params.risk_free_rate * maturity)),
        jnp.asarray(strikes)))
    return out[1:], float(out[0])


# ---------------------------------------------------------------------------
# displaced lognormal (shifted Black)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DisplacedLognormalParams:
    """Shifted-Black smile model under the T-forward measure:
    F_t + displacement is a driftless lognormal with volatility
    ``volatility``; ``displacement > -min(F)`` keeps it positive.
    ``displacement -> 0`` recovers Black-Scholes; large displacement
    approaches the normal (Bachelier) smile with absolute vol
    ``volatility * displacement``."""

    initial_value: float
    risk_free_rate: float
    volatility: float
    displacement: float

    def __post_init__(self):
        if self.volatility <= 0:
            raise ValueError("volatility must be positive")
        if self.initial_value + self.displacement <= 0:
            raise ValueError("initial_value + displacement must be "
                             "positive (the shifted asset is lognormal)")


def displaced_analytic_price(params: DisplacedLognormalParams,
                             maturity: float, strikes,
                             is_call: bool = True) -> np.ndarray:
    """call = df * Black(F + d, K + d, sigma, T); exact (strikes above
    ``-displacement``)."""
    p = params
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    if np.any(strikes + p.displacement <= 0):
        raise ValueError("strikes must exceed -displacement")
    fwd = p.initial_value * math.exp(p.risk_free_rate * maturity)
    df = math.exp(-p.risk_free_rate * maturity)
    call = np.array([
        black_formula(fwd + p.displacement, k + p.displacement,
                      p.volatility, maturity, payoff_unit=df)
        for k in strikes])
    if is_call:
        return call
    return call - df * (fwd - strikes)


@partial(jax.jit, static_argnums=(1, 2))
def _mc_displaced_kernel(key, num_paths: int, antithetic: bool,
                         fwd_shifted, disp, sigma, maturity, df, strikes):
    half = num_paths // 2 if antithetic else num_paths
    z = jax.random.normal(key, (half,), dtype=jnp.float32)
    if antithetic:
        z = jnp.concatenate([z, -z])
    z = z.astype(FLOAT_DTYPE)
    sig = sigma.astype(FLOAT_DTYPE)
    sq = jnp.sqrt(maturity).astype(FLOAT_DTYPE)
    x = exp32(-0.5 * sig * sig * maturity.astype(FLOAT_DTYPE)
              + sig * sq * z)
    ft = fwd_shifted.astype(FLOAT_DTYPE) * x - disp.astype(FLOAT_DTYPE)
    mean_ft = jnp.sum(ft.astype(ACC_DTYPE)) / num_paths * df
    payoff = jnp.maximum(ft[None, :]
                         - strikes[:, None].astype(FLOAT_DTYPE), 0.0)
    prices = jnp.sum(payoff.astype(ACC_DTYPE), axis=1) / num_paths * df
    return jnp.concatenate([mean_ft[None], prices])


def mc_displaced_european_prices(params: DisplacedLognormalParams,
                                 maturity: float, strikes,
                                 num_paths: int = 100_000,
                                 seed: int = 3141,
                                 antithetic: bool = False):
    """Exact-terminal MC of the shifted GBM: ``(prices [K],
    discounted_forward)`` in one fused device program."""
    if antithetic and num_paths % 2:
        raise ValueError("antithetic needs an even num_paths")
    p = params
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    fwd = p.initial_value * math.exp(p.risk_free_rate * maturity)
    out = np.asarray(_mc_displaced_kernel(
        jax.random.PRNGKey(seed), int(num_paths), bool(antithetic),
        jnp.float64(fwd + p.displacement), jnp.float64(p.displacement),
        jnp.float64(p.volatility), jnp.float64(maturity),
        jnp.float64(math.exp(-p.risk_free_rate * maturity)),
        jnp.asarray(strikes)))
    return out[1:], float(out[0])
