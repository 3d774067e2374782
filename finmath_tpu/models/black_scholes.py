"""Black-Scholes model under the Euler scheme, plus a fully-fused jitted
Monte-Carlo pricer.

Equivalent of finmath-lib's ``BlackScholesModel`` + ``MonteCarloAssetModel``
as driven by the reference test (/root/reference/.../MonteCarloBlackScholes
ModelTest.java:125-146): Euler evolution of log S with drift r - sigma^2/2,
payoff max(S-K, 0), numeraire exp(r t).

Two API levels:

* ``BlackScholesModel`` + ``EulerScheme`` — the object API mirroring the
  reference's layering (for users porting finmath code); and
* ``mc_european_call_price`` — the TPU-first path: ONE jitted function from
  seed to price, where XLA fuses RNG + 100 Euler steps + payoff + f64
  reduction into a handful of device loops. This is the shape every hot
  workload should take (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.precise_math import exp32, gather_component_exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariableTPU
from .brownian_motion import BrownianMotion
from .process import EulerScheme, ProcessModel
from .time_discretization import TimeDiscretization


class BlackScholesModel(ProcessModel):
    """dS = r S dt + sigma S dW, evolved in log coordinates (LOGNORMAL
    state space, like finmath's BlackScholesModel)."""

    def __init__(self, initial_value: float, risk_free_rate: float,
                 volatility: float):
        self.initial_value = float(initial_value)
        self.risk_free_rate = float(risk_free_rate)
        self.volatility = float(volatility)

    def get_number_of_components(self) -> int:
        return 1

    def get_number_of_factors(self) -> int:
        return 1

    def initial_state(self, num_paths: int) -> jax.Array:
        return jnp.full((1, num_paths), math.log(self.initial_value),
                        dtype=FLOAT_DTYPE)

    def drift(self, time_index, state) -> jax.Array:
        mu = self.risk_free_rate - 0.5 * self.volatility * self.volatility
        return jnp.full_like(state, mu)

    def factor_loadings(self, time_index, state) -> jax.Array:
        return jnp.full(state.shape[:1] + (1,) + state.shape[1:],
                        self.volatility, dtype=state.dtype)

    def apply_state_space_transform(self, component: int, x: jax.Array) -> jax.Array:
        return exp32(x)

    def numeraire(self, time: float) -> RandomVariableTPU:
        return RandomVariableTPU(time, math.exp(self.risk_free_rate * time))

    def __hash__(self):
        return hash((self.initial_value, self.risk_free_rate, self.volatility))

    def __eq__(self, other):
        return (
            isinstance(other, BlackScholesModel)
            and (self.initial_value, self.risk_free_rate, self.volatility)
            == (other.initial_value, other.risk_free_rate, other.volatility)
        )


class MonteCarloBlackScholesModel:
    """Simulation facade: model + Euler scheme + asset/numeraire accessors
    (the role of finmath's MonteCarloAssetModel)."""

    def __init__(self, time_discretization: TimeDiscretization, num_paths: int,
                 model: BlackScholesModel, seed: int = 3141,
                 brownian: BrownianMotion = None, mesh=None):
        self.model = model
        self.brownian = brownian or BrownianMotion(
            time_discretization, 1, num_paths, seed
        )
        self.process = EulerScheme(model, self.brownian, mesh=mesh)

    def get_asset_value(self, time: float, asset_index: int = 0) -> RandomVariableTPU:
        ti = self.process.time_discretization.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return self.process.get_process_value(ti, asset_index)

    def get_asset_values(self, times, asset_index: int = 0) -> jax.Array:
        """[len(times), paths] asset matrix in ONE device program —
        through the TPU tunnel every eager per-date slice costs a full
        dispatch RTT; exercise-schedule consumers (Longstaff-Schwartz)
        use this batched accessor instead."""
        td = self.process.time_discretization
        idx = []
        for t in times:
            ti = td.get_time_index(t)
            if ti < 0:
                raise ValueError(f"time {t} not on the simulation grid")
            idx.append(ti)
        states = self.process._lazy_states()
        return gather_component_exp32(states, jnp.asarray(idx),
                              jnp.asarray(asset_index))

    def get_numeraire(self, time: float) -> RandomVariableTPU:
        return self.model.numeraire(time)

    def get_monte_carlo_weights(self, time: float) -> RandomVariableTPU:
        n = self.process.get_number_of_paths()
        return RandomVariableTPU(0.0, 1.0 / n)

    def get_number_of_paths(self) -> int:
        return self.process.get_number_of_paths()

    getAssetValue = get_asset_value
    getNumeraire = get_numeraire
    getNumberOfPaths = get_number_of_paths


class EuropeanOption:
    """European call/put on the simulated asset (finmath's EuropeanOption)."""

    def __init__(self, maturity: float, strike: float, is_call: bool = True):
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.is_call = is_call

    def get_value_random_variable(self, model: MonteCarloBlackScholesModel) -> RandomVariableTPU:
        asset = model.get_asset_value(self.maturity)
        if self.is_call:
            payoff = asset.sub(self.strike).floor(0.0)
        else:
            payoff = asset.bus(self.strike).floor(0.0)
        n_t = model.get_numeraire(self.maturity)
        n_0 = model.get_numeraire(0.0)
        return payoff.div(n_t).mult(n_0)

    def get_value(self, model: MonteCarloBlackScholesModel) -> float:
        return self.get_value_random_variable(model).get_average()

    def get_value_and_error(self, model) -> tuple:
        import numpy as np

        out = np.asarray(self.packed_value_and_error(model))
        return float(out[0]), float(out[1])

    def packed_value_and_error(self, model):
        """Traced [2] (value, stderr) on device — no host transfer; the
        building block of ``price_portfolio``'s one-transfer book
        (equity_products.py)."""
        import jax.numpy as jnp

        from ..ops.random_variable import ACC_DTYPE

        rv = self.get_value_random_variable(model)
        if rv.is_deterministic():
            return jnp.stack([jnp.asarray(rv.get_average(), ACC_DTYPE),
                              jnp.zeros((), ACC_DTYPE)])
        pay = rv.values.astype(ACC_DTYPE)
        n = pay.shape[-1]
        mean = jnp.sum(pay) / n
        var = jnp.sum((pay - mean) ** 2) / (n - 1)
        return jnp.stack([mean, jnp.sqrt(var / n)])

    getValue = get_value


# ---------------------------------------------------------------------------
# fused TPU-first pricer
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2, 3))
def _mc_bs_price_kernel(key, num_paths: int, num_steps: int, dtype,
                        s0, r, sigma, maturity, strike):
    """One fused graph: Threefry normals -> Euler scan on log S -> payoff ->
    f64-accumulated mean. No host round-trips, no per-op launches.

    ``dtype`` parameterizes the path-storage precision: float32 is the
    production contract, float64 the parity oracle. Normals are drawn in
    float32 either way so both precisions consume the identical Brownian
    stream (isolating arithmetic error — the 1e-6 parity contract)."""
    dt = maturity / num_steps
    sqrt_dt = jnp.sqrt(dt).astype(dtype)
    drift = ((r - 0.5 * sigma * sigma) * dt).astype(dtype)
    vol = jnp.asarray(sigma, dtype=dtype)

    def step(log_s, k):
        dw = jax.random.normal(k, (num_paths,), dtype=jnp.float32).astype(
            dtype) * sqrt_dt
        return log_s + drift + vol * dw, None

    keys = jax.random.split(key, num_steps)
    log_s0 = jnp.full((num_paths,), jnp.log(s0), dtype=dtype)
    log_st, _ = jax.lax.scan(step, log_s0, keys)
    st = exp32(log_st) if dtype == jnp.float32 else jnp.exp(log_st)
    payoff = jnp.maximum(st - strike.astype(dtype), 0.0)
    mean = jnp.sum(payoff.astype(ACC_DTYPE)) / num_paths
    return mean * jnp.exp(-r * maturity)


def mc_european_call_price(seed: int, num_paths: int, num_steps: int,
                           initial_value: float, risk_free_rate: float,
                           volatility: float, maturity: float,
                           strike: float, dtype=None) -> float:
    """European call MC price; the flagship single-chip workload
    (ref. benchmark row README.md:215 — 1M paths x 100 steps in 0.09 s on a
    GTX 1080). ``dtype=jnp.float64`` runs the double-precision oracle mode
    on the identical Brownian stream."""
    return float(
        _mc_bs_price_kernel(
            jax.random.PRNGKey(seed), int(num_paths), int(num_steps),
            jnp.dtype(dtype if dtype is not None else FLOAT_DTYPE),
            jnp.float64(initial_value), jnp.float64(risk_free_rate),
            jnp.float64(volatility), jnp.float64(maturity), jnp.float64(strike),
        )
    )


@partial(jax.jit, static_argnums=(1, 2))
def _mc_asian_price_kernel(key, num_paths: int, num_steps: int,
                           s0, r, sigma, maturity, strike):
    """Arithmetic-average Asian call (observations at every Euler step),
    XLA-scan variant; the Pallas on-core version lives in ops.kernels."""
    dt = maturity / num_steps
    sqrt_dt = jnp.sqrt(dt).astype(FLOAT_DTYPE)
    drift = ((r - 0.5 * sigma * sigma) * dt).astype(FLOAT_DTYPE)
    vol = jnp.asarray(sigma, dtype=FLOAT_DTYPE)

    def step(carry, k):
        log_s, sum_s = carry
        dw = jax.random.normal(k, (num_paths,), dtype=FLOAT_DTYPE) * sqrt_dt
        log_s = log_s + drift + vol * dw
        return (log_s, sum_s + exp32(log_s)), None

    keys = jax.random.split(key, num_steps)
    log_s0 = jnp.full((num_paths,), jnp.log(s0), dtype=FLOAT_DTYPE)
    sum_s0 = jnp.zeros((num_paths,), dtype=FLOAT_DTYPE)
    (log_st, sum_s), _ = jax.lax.scan(step, (log_s0, sum_s0), keys)
    avg = sum_s / num_steps
    payoff = jnp.maximum(avg - strike.astype(FLOAT_DTYPE), 0.0)
    mean = jnp.sum(payoff.astype(ACC_DTYPE)) / num_paths
    return mean * jnp.exp(-r * maturity)


def mc_asian_call_price(seed: int, num_paths: int, num_steps: int,
                        initial_value: float, risk_free_rate: float,
                        volatility: float, maturity: float,
                        strike: float) -> float:
    """Arithmetic-average Asian call MC price (XLA scan)."""
    return float(
        _mc_asian_price_kernel(
            jax.random.PRNGKey(seed), int(num_paths), int(num_steps),
            jnp.float64(initial_value), jnp.float64(risk_free_rate),
            jnp.float64(volatility), jnp.float64(maturity), jnp.float64(strike),
        )
    )
