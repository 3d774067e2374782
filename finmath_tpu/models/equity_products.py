"""Path-dependent equity products (digital, Asian, barrier, lookback)
as ONE fused jitted program each, generic over every equity simulation
facade in the framework.

Capability map: finmath-lib ships these in ``net.finmath.montecarlo
.assetderivativevaluation.products`` (``DigitalOption``, ``AsianOption``,
and the lookback/barrier payoffs its users compose via
``RandomVariable`` arithmetic); the reference repo itself only exercises
the European payoff (MonteCarloBlackScholesModelTest.java:143-144) but
its device vector API exists precisely so such payoffs run per-path on
the accelerator. Here each product consumes the ``[dates, paths]`` asset
matrix of any facade (``MonteCarloBlackScholesModel``,
``MonteCarloMertonModel``, ...) and reduces on device: one dispatch, one
packed (value, stderr) host transfer — the transfer-count rule this
framework measured through the TPU tunnel (~30 ms per separate host
read, BENCHMARKS.md).

TPU-first notes:

* Payoffs are branchless (``jnp.where`` masks, running ``jnp.minimum``/
  ``maximum`` in a fused reduction over the date axis) — no Python
  control flow under ``jit``; date counts are static so XLA unrolls or
  vectorizes the [T, paths] sweep as it sees fit.
* Path arrays stay f32 (storage dtype of the engines); the final
  mean/variance reductions accumulate in f64 (ACC_DTYPE) per the
  framework's reduction contract (SURVEY §7: f32 storage,
  f64-accumulated reductions).
* The barrier product optionally applies the Brownian-bridge
  continuity correction: per-step survival
  ``1 - exp(-2 ln(B/S_i) ln(B/S_{i+1}) / (sigma^2 dt))`` multiplied
  along the path — the standard unbiased continuous-monitoring
  estimator for lognormal dynamics (Gobet 2009 survey; needs the
  model's diffusion volatility, so it is gated on Black-Scholes
  facades).

Oracles: the matching closed forms live in ``models/analytic.py``
(digital, discrete geometric Asian, Reiner-Rubinstein barriers,
Goldman-Sosin-Gatto / Conze-Viswanathan lookbacks); the test suite
cross-validates MC and formulas against each other and through
no-arbitrage identities (in+out parity on the SAME path realization,
AM-GM Asian ordering, B->inf barrier limits).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE


def _mean_and_stderr(pay):
    """Packed [2] f64 (mean, MC standard error) of a [paths] payoff."""
    n = pay.shape[-1]
    p = pay.astype(ACC_DTYPE)
    mean = jnp.sum(p) / n
    var = jnp.sum((p - mean) ** 2) / (n - 1)
    return jnp.stack([mean, jnp.sqrt(var / n)])


def _deterministic_dfs(model, times) -> np.ndarray:
    """N(0)/N(t) for each t, requiring a deterministic numeraire (the
    equity facades). Mirrors american.py's guard."""
    n0 = model.get_numeraire(0.0)
    dfs = []
    for t in times:
        nt = model.get_numeraire(float(t))
        if not (nt.is_deterministic() and n0.is_deterministic()):
            raise NotImplementedError(
                "equity products need a deterministic numeraire; use the "
                "LMM product layer for stochastic rates")
        dfs.append(float(n0.get_average() / nt.get_average()))
    return np.asarray(dfs, dtype=np.float64)


def _grid_times_up_to(model, maturity: float) -> list:
    td = getattr(model, "time_discretization", None)
    if td is None:                         # BS facade: on the process
        td = model.process.time_discretization
    times = [float(t) for t in td.as_array()
             if 0.0 < float(t) <= maturity + 1e-12]
    if not times or abs(times[-1] - maturity) > 1e-9:
        raise ValueError(
            f"maturity {maturity} not on the simulation grid")
    return times


@partial(jax.jit, static_argnums=(3,))
def _digital_kernel(s_t, df, strike, is_call: bool):
    sign = 1.0 if is_call else -1.0
    pay = jnp.where(sign * (s_t - strike) > 0.0, df, 0.0)
    return _mean_and_stderr(pay)


class DigitalOption:
    """Cash-or-nothing digital: pays 1 at maturity if ITM
    (finmath-lib ``products.DigitalOption``)."""

    def __init__(self, maturity: float, strike: float, is_call: bool = True):
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.is_call = bool(is_call)

    def packed_value_and_error(self, model):
        """Traced [2] (value, stderr) on device — no host transfer; the
        building block of ``price_portfolio``'s one-transfer book."""
        s_t = model.get_asset_value(self.maturity).values
        df = _deterministic_dfs(model, [self.maturity])[0]
        return _digital_kernel(
            s_t, jnp.asarray(df, dtype=ACC_DTYPE),
            jnp.asarray(self.strike, dtype=FLOAT_DTYPE), self.is_call)

    def get_value_and_error(self, model) -> tuple:
        out = np.asarray(self.packed_value_and_error(model))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


@partial(jax.jit, static_argnums=(3, 4))
def _asian_kernel(assets, df, strike, is_call: bool, geometric: bool):
    sign = 1.0 if is_call else -1.0
    if geometric:
        avg = jnp.exp(jnp.mean(jnp.log(assets.astype(ACC_DTYPE)), axis=0))
    else:
        avg = jnp.mean(assets.astype(ACC_DTYPE), axis=0)
    pay = jnp.maximum(sign * (avg - strike), 0.0) * df
    return _mean_and_stderr(pay)


@partial(jax.jit, static_argnums=(4,))
def _asian_cv_kernel(assets, df, strike, geo_value, is_call: bool):
    """Arithmetic Asian with the geometric Asian as control variate:
    the geometric closed form is exact, so the corrected estimator is
    unbiased with the residual (arith - geo) variance. beta is fixed at
    1 (the classic choice; the payoffs are ~99% correlated here)."""
    sign = 1.0 if is_call else -1.0
    la = jnp.log(assets.astype(ACC_DTYPE))
    arith = jnp.mean(assets.astype(ACC_DTYPE), axis=0)
    geo = jnp.exp(jnp.mean(la, axis=0))
    pay_a = jnp.maximum(sign * (arith - strike), 0.0) * df
    pay_g = jnp.maximum(sign * (geo - strike), 0.0) * df
    return _mean_and_stderr(pay_a - pay_g) + jnp.stack(
        [jnp.asarray(geo_value, dtype=ACC_DTYPE),
         jnp.asarray(0.0, dtype=ACC_DTYPE)])


class AsianOption:
    """Arithmetic-average Asian option over explicit averaging dates
    (finmath-lib ``products.AsianOption``), paid at the last date.

    ``average="geometric"`` prices the geometric payoff instead;
    ``control_variate="geometric"`` keeps the arithmetic payoff but
    subtracts the geometric payoff pathwise and adds back its exact
    closed form — an order-of-magnitude stderr reduction under
    Black-Scholes dynamics (gated on a BS facade, which is the only
    family with that closed form)."""

    def __init__(self, averaging_times: Sequence[float], strike: float,
                 is_call: bool = True, average: str = "arithmetic",
                 control_variate: Optional[str] = None):
        self.averaging_times = [float(t) for t in averaging_times]
        if (not self.averaging_times
                or sorted(self.averaging_times) != self.averaging_times
                or self.averaging_times[0] <= 0.0):
            raise ValueError("averaging_times must be ascending, positive")
        if average not in ("arithmetic", "geometric"):
            raise ValueError("average must be 'arithmetic' or 'geometric'")
        if control_variate not in (None, "geometric"):
            raise ValueError("control_variate must be None or 'geometric'")
        if control_variate and average == "geometric":
            raise ValueError("the geometric payoff IS the control variate")
        self.strike = float(strike)
        self.is_call = bool(is_call)
        self.average = average
        self.control_variate = control_variate

    def packed_value_and_error(self, model):
        """Traced [2] (value, stderr) on device — no host transfer."""
        assets = model.get_asset_values(self.averaging_times)
        df = _deterministic_dfs(model, [self.averaging_times[-1]])[0]
        if self.control_variate == "geometric":
            from .analytic import geometric_asian_option_value
            from .black_scholes import BlackScholesModel
            bs = getattr(model, "model", None)
            if not isinstance(bs, BlackScholesModel):
                raise NotImplementedError(
                    "geometric control variate needs a Black-Scholes "
                    "facade (the geometric closed form)")
            geo = geometric_asian_option_value(
                bs.initial_value, bs.risk_free_rate, bs.volatility,
                self.averaging_times, self.strike, self.is_call)
            return _asian_cv_kernel(
                assets, jnp.asarray(df, dtype=ACC_DTYPE),
                jnp.asarray(self.strike, dtype=FLOAT_DTYPE), geo,
                self.is_call)
        return _asian_kernel(
            assets, jnp.asarray(df, dtype=ACC_DTYPE),
            jnp.asarray(self.strike, dtype=FLOAT_DTYPE), self.is_call,
            self.average == "geometric")

    def get_value_and_error(self, model) -> tuple:
        out = np.asarray(self.packed_value_and_error(model))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


@partial(jax.jit, static_argnums=(4, 5, 6))
def _barrier_bridge_kernel(assets_with_s0, df, strike, barrier,
                           up: bool, knock_in: bool, is_call: bool,
                           inv_var_dt=None, rebate: float = 0.0):
    """Brownian-bridge corrected barrier (lognormal dynamics).
    assets_with_s0: [T+1, paths] INCLUDING the t=0 row; inv_var_dt:
    [T] 1/(sigma^2 dt_k) per step. Survival of an out-option is the
    product over steps of 1 - exp(-2 a_k a_{k+1} / (sigma^2 dt)) with
    a = ln(S/B), clamped to 0 where an endpoint breaches.

    Memory shape: a lax.scan over the date axis carrying the f32
    [paths] survival — pathwise f64 here would triple the HBM traffic
    (emulated f64, the american.py measurement) and a materialized
    [T, paths] f64 log matrix alone is 2 GB at 250 x 1M; only the
    final reduction accumulates in f64."""
    sign = 1.0 if is_call else -1.0
    side = jnp.asarray(1.0 if up else -1.0, assets_with_s0.dtype)
    a0 = jnp.log(assets_with_s0[0] / barrier)

    def step(carry, xs):
        surv, a_prev = carry
        s_row, inv = xs
        a_cur = jnp.log(s_row / barrier)
        cross = jnp.exp(-2.0 * a_prev * a_cur * inv)
        fac = jnp.where((side * a_prev >= 0.0) | (side * a_cur >= 0.0),
                        0.0, 1.0 - jnp.clip(cross, 0.0, 1.0))
        return (surv * fac, a_cur), None

    (survival, _), _ = jax.lax.scan(
        step, (jnp.ones_like(a0), a0),
        (assets_with_s0[1:],
         inv_var_dt.astype(assets_with_s0.dtype)))
    vanilla = jnp.maximum(sign * (assets_with_s0[-1] - strike), 0.0)
    alive = (1.0 - survival) if knock_in else survival
    pay = vanilla * alive + rebate * (1.0 - alive)
    return _mean_and_stderr(pay.astype(ACC_DTYPE) * df)


class BarrierOption:
    """Single-barrier knock-in/knock-out European option, monitored on
    the facade's simulation grid (finmath-lib users compose this payoff
    from the RandomVariable API; the continuous-monitoring closed forms
    in ``analytic.py`` are the oracle).

    ``monitoring="discrete"`` knocks only on grid dates (the honest
    discrete contract); ``monitoring="bridge"`` applies the
    Brownian-bridge crossing-probability correction for a
    continuously-monitored contract — exact in expectation for
    lognormal dynamics, hence gated on Black-Scholes facades. A cash
    ``rebate`` is paid at maturity when the option is knocked out
    (out-types) or never knocked in (in-types)."""

    _TYPES = ("up-out", "down-out", "up-in", "down-in")

    def __init__(self, maturity: float, strike: float, barrier: float,
                 barrier_type: str, is_call: bool = True,
                 monitoring: str = "discrete", rebate: float = 0.0):
        if barrier_type not in self._TYPES:
            raise ValueError(f"barrier_type must be one of {self._TYPES}")
        if monitoring not in ("discrete", "bridge"):
            raise ValueError("monitoring must be 'discrete' or 'bridge'")
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.barrier = float(barrier)
        self.barrier_type = barrier_type
        self.is_call = bool(is_call)
        self.monitoring = monitoring
        self.rebate = float(rebate)

    def packed_value_and_error(self, model):
        """Traced [2] (value, stderr) on device — no host transfer."""
        times = _grid_times_up_to(model, self.maturity)
        assets = model.get_asset_values(times)
        df = _deterministic_dfs(model, [self.maturity])[0]
        up = self.barrier_type.startswith("up")
        knock_in = self.barrier_type.endswith("in")
        if self.monitoring == "bridge":
            from .black_scholes import BlackScholesModel
            bs = getattr(model, "model", None)
            if not isinstance(bs, BlackScholesModel):
                raise NotImplementedError(
                    "bridge monitoring needs lognormal dynamics "
                    "(Black-Scholes facade)")
            s0_row = jnp.full((1, assets.shape[1]), bs.initial_value,
                              dtype=assets.dtype)
            steps = np.diff([0.0] + times)
            inv = 1.0 / (bs.volatility**2 * steps)
            return _barrier_bridge_kernel(
                jnp.concatenate([s0_row, assets], axis=0),
                jnp.asarray(df, dtype=ACC_DTYPE),
                jnp.asarray(self.strike, dtype=FLOAT_DTYPE),
                jnp.asarray(self.barrier, dtype=FLOAT_DTYPE),
                up, knock_in, self.is_call,
                inv_var_dt=jnp.asarray(inv, dtype=ACC_DTYPE),
                rebate=self.rebate)
        return _barrier_discrete_kernel(
            assets, jnp.asarray(df, dtype=ACC_DTYPE),
            jnp.asarray(self.strike, dtype=FLOAT_DTYPE),
            jnp.asarray(self.barrier, dtype=FLOAT_DTYPE),
            up, knock_in, self.is_call, self.rebate)

    def get_value_and_error(self, model) -> tuple:
        out = np.asarray(self.packed_value_and_error(model))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _barrier_discrete_kernel(assets, df, strike, barrier,
                             up: bool, knock_in: bool, is_call: bool,
                             rebate: float):
    sign = 1.0 if is_call else -1.0
    vanilla = jnp.maximum(sign * (assets[-1] - strike), 0.0)
    side = 1.0 if up else -1.0
    breached = jnp.any(side * (assets - barrier) >= 0.0, axis=0)
    alive = jnp.where(breached, 1.0 if knock_in else 0.0,
                      0.0 if knock_in else 1.0)
    pay = vanilla * alive + rebate * (1.0 - alive)
    return _mean_and_stderr(pay * df)


@partial(jax.jit, static_argnums=(3, 4))
def _lookback_kernel(assets_with_s0, df, strike, kind: str,
                     fixed: bool):
    """assets_with_s0: [T+1, paths] including the t=0 spot row so the
    running extremum matches a fresh option's S0 seed. The extremum is
    taken in f32 (max/min of f32 values is EXACT — no accumulation);
    only the payoff reduction is f64."""
    s_t = assets_with_s0[-1].astype(ACC_DTYPE)
    if kind == "max":
        ext = jnp.max(assets_with_s0, axis=0).astype(ACC_DTYPE)
        pay = jnp.maximum(ext - strike, 0.0) if fixed else (ext - s_t)
    else:
        ext = jnp.min(assets_with_s0, axis=0).astype(ACC_DTYPE)
        pay = jnp.maximum(strike - ext, 0.0) if fixed else (s_t - ext)
    return _mean_and_stderr(pay * df)


class LookbackOption:
    """Lookback option on the facade's simulation grid. Types:
    ``floating-call`` pays S_T - min S, ``floating-put`` pays
    max S - S_T, ``fixed-call`` pays (max S - K)+, ``fixed-put`` pays
    (K - min S)+. Continuous-monitoring closed forms (GSG/CV) are the
    oracle; discrete monitoring biases the extremum toward the spot, so
    MC < closed form for max-types (tested with the Broadie-Glasserman-
    Kou sqrt(dt) correction)."""

    _TYPES = ("floating-call", "floating-put", "fixed-call", "fixed-put")

    def __init__(self, maturity: float, lookback_type: str,
                 strike: Optional[float] = None):
        if lookback_type not in self._TYPES:
            raise ValueError(f"lookback_type must be one of {self._TYPES}")
        fixed = lookback_type.startswith("fixed")
        if fixed and strike is None:
            raise ValueError("fixed-strike lookback needs a strike")
        if not fixed and strike is not None:
            raise ValueError("floating-strike lookback takes no strike")
        self.maturity = float(maturity)
        self.lookback_type = lookback_type
        self.strike = float(strike) if fixed else 0.0

    def packed_value_and_error(self, model):
        """Traced [2] (value, stderr) on device — no host transfer."""
        times = _grid_times_up_to(model, self.maturity)
        assets = model.get_asset_values(times)
        df = _deterministic_dfs(model, [self.maturity])[0]
        s0 = _spot_of(model)
        s0_row = jnp.full((1, assets.shape[1]), s0, dtype=assets.dtype)
        kind = "min" if self.lookback_type in ("floating-call",
                                               "fixed-put") else "max"
        return _lookback_kernel(
            jnp.concatenate([s0_row, assets], axis=0),
            jnp.asarray(df, dtype=ACC_DTYPE),
            jnp.asarray(self.strike, dtype=ACC_DTYPE), kind,
            self.lookback_type.startswith("fixed"))

    def get_value_and_error(self, model) -> tuple:
        out = np.asarray(self.packed_value_and_error(model))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


def _spot_of(model) -> float:
    """The t=0 asset value of a facade (initial_value on the underlying
    model object; every equity family carries it)."""
    inner = getattr(model, "model", None) or getattr(model, "params", None)
    s0 = getattr(inner, "initial_value", None)
    if s0 is None:
        raise NotImplementedError(
            "facade does not expose initial_value for the t=0 row")
    return float(s0)


# ---------------------------------------------------------------------------
# portfolio pricing: one transfer for a whole book
# ---------------------------------------------------------------------------

def price_portfolio(model, products) -> list:
    """[(value, stderr)] for a product book with ONE packed host
    transfer.

    JAX dispatch is asynchronous, so the per-product kernels pipeline on
    the device; what costs ~30 ms of tunnel RTT apiece is each
    product's separate device->host READ (the ``np.asarray`` in
    ``get_value_and_error`` — the transfer-count rule, BENCHMARKS.md).
    Here every product contributes its traced [2] (value, stderr)
    via ``packed_value_and_error`` and the stacked [N, 2] matrix comes
    back in a single read: per-product incremental cost is the kernel's
    ~ms of device compute, not the RTT floor. Works for ANY product
    exposing ``packed_value_and_error(model)`` — the equity exotics,
    ``EuropeanOption``, the Hull-White book (TARN, Bermudan), ... —
    mirroring the reference's break-even story (README.md:24-28) under
    WAN-RTT economics."""
    if not products:
        return []
    packed = [p.packed_value_and_error(model) for p in products]
    out = np.asarray(jnp.stack(packed))
    return [(float(v), float(e)) for v, e in out]
