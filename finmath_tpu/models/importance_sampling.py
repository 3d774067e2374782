"""Importance sampling for deep out-of-the-money options: exponential
tilting of the terminal Brownian draw with the exact likelihood-ratio
weight.

Capability map: completes the framework's variance-reduction family
(antithetic variates, geometric control variates, Sobol QMC — all
measured in BENCHMARKS.md). finmath-lib exposes the same lever through
its ``BrownianMotionWithShift``-style decorators; the reference repo
ships none (cuRAND raw streams only), so this is a capabilities-plus
module.

Method (Black-Scholes, exact terminal law): under Q the terminal draw
is Z ~ N(0,1); sample instead Z ~ N(mu, 1) and weight each path by the
Radon-Nikodym derivative exp(-mu Z + mu^2/2). The variance-optimal
tilt for a call puts the sampling mean AT the strike:

    mu* = (ln(K/S0) - (r - sigma^2/2) T) / (sigma sqrt(T))

(for K <= forward, mu* <= 0 adds nothing; the tilt is clamped at 0 so
the estimator never degrades the ATM case). The estimator is unbiased
for ANY mu — the tests assert closed-form agreement at every tilt and
the measured stderr reduction at deep OTM strikes (x100+ at 3x spot).

TPU-first notes: one fused jitted kernel — draw, tilt, weight, payoff,
f64-accumulated mean/stderr, one packed transfer. The weight enters in
LOG space (exp32 once) so extreme tilts stay finite in f32.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise_math import exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE


@partial(jax.jit, static_argnums=(1, 8))
def _is_kernel(key, num_paths: int, s0, r, sigma, maturity, strike, mu,
               is_call: bool):
    z = jax.random.normal(key, (num_paths,), dtype=FLOAT_DTYPE) + mu
    sq = sigma * jnp.sqrt(maturity)
    log_st = jnp.log(s0) + (r - 0.5 * sigma * sigma) * maturity + sq * z
    sign = 1.0 if is_call else -1.0
    # payoff * likelihood ratio, assembled in log space: the tilt
    # weight exp(-mu z + mu^2/2) underflows/overflows f32 alone at
    # |mu| ~ 10, but log(payoff) + log(weight) stays in range wherever
    # the payoff is nonzero
    itm = sign * (exp32(log_st) - strike) > 0.0
    log_pay = jnp.where(
        itm,
        jnp.log(jnp.abs(exp32(log_st) - strike) + 1e-38)
        - mu * z + 0.5 * mu * mu,
        -jnp.inf)
    pay = jnp.where(itm, exp32(log_pay), 0.0).astype(ACC_DTYPE)
    df = jnp.exp(-r.astype(ACC_DTYPE) * maturity)
    pv = pay * df
    n = num_paths
    mean = jnp.sum(pv) / n
    var = jnp.sum((pv - mean) ** 2) / (n - 1)
    return jnp.stack([mean, jnp.sqrt(var / n)])


def mc_european_price_importance_sampled(
        seed: int, num_paths: int, initial_value: float,
        risk_free_rate: float, volatility: float, maturity: float,
        strike: float, is_call: bool = True,
        drift_shift: Optional[float] = None) -> tuple:
    """(price, stderr) of a European option by exponentially-tilted
    exact-terminal sampling. ``drift_shift=None`` uses the
    variance-optimal mu* (clamped toward the money); 0.0 reproduces
    plain Monte Carlo on the identical stream."""
    if drift_shift is None:
        mu = (math.log(strike / initial_value)
              - (risk_free_rate - 0.5 * volatility**2) * maturity) \
            / (volatility * math.sqrt(maturity))
        # never tilt AWAY from the payoff region
        mu = max(mu, 0.0) if is_call else min(mu, 0.0)
    else:
        mu = float(drift_shift)
    out = np.asarray(_is_kernel(
        jax.random.PRNGKey(seed), int(num_paths),
        jnp.asarray(initial_value, dtype=FLOAT_DTYPE),
        jnp.asarray(risk_free_rate, dtype=FLOAT_DTYPE),
        jnp.asarray(volatility, dtype=FLOAT_DTYPE),
        jnp.asarray(maturity, dtype=FLOAT_DTYPE),
        jnp.asarray(strike, dtype=FLOAT_DTYPE),
        jnp.asarray(mu, dtype=FLOAT_DTYPE), bool(is_call)))
    return float(out[0]), float(out[1])
