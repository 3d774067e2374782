"""Multi-asset (correlated) Black-Scholes model and rainbow products:
exchange (Margrabe), best-of/worst-of (Stulz), basket, spread (Kirk).

Capability map: finmath-lib's ``montecarlo.assetderivativevaluation
.models.MultiAssetBlackScholesModel`` (vector of initial values +
factor loadings from vol x Cholesky(correlation)) with the
``ExchangeOption`` product; the reference repo's device layer is
single-asset-agnostic (any number of RandomVariables), so the
capability transfers to the path-vector engine unchanged — here it is
one fused Euler scan whose per-step diffusion is a [assets, factors] x
[factors, paths] MXU contraction.

TPU-first notes:

* The correlated increments are applied by ``einsum('cfp,fp->cp')``
  inside the shared ``EulerScheme`` scan — the correlation matrix rides
  the MXU at HIGHEST precision (the framework's f32 parity contract for
  matmuls), and the log-space Euler step is EXACT for GBM at every
  grid point (no discretization bias).
* Rainbow payoffs consume ONE [assets, paths] terminal gather
  (``get_all_asset_values``) — one device program, one packed
  (value, stderr) transfer, never a per-asset eager slice (each eager
  read costs a ~30 ms dispatch RTT through the TPU tunnel).
* Closed-form oracles: Margrabe (1978) exchange, Stulz (1982) two-asset
  min/max via a Gauss-Legendre bivariate normal CDF, exact geometric
  basket (lognormal), Kirk (1995) spread approximation — all host f64,
  cross-validated against the MC kernels and each other
  (min+max parity, Margrabe = zero-strike spread) in
  ``tests/test_multi_asset.py``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise_math import exp32, gather_exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariableTPU
from .analytic import _norm_cdf, black_scholes_option_value
from .brownian_motion import BrownianMotion
from .equity_products import _mean_and_stderr
from .process import EulerScheme, ProcessModel
from .time_discretization import TimeDiscretization


class MultiAssetBlackScholesModel(ProcessModel):
    """d correlated geometric Brownian motions under the risk-neutral
    measure (finmath's MultiAssetBlackScholesModel): asset i has
    initial value S0_i, volatility sigma_i, and instantaneous
    correlation rho_ij; factor loadings are sigma_i * chol(rho)_i.
    Simulated in log space (exact at grid points)."""

    def __init__(self, initial_values: Sequence[float],
                 risk_free_rate: float, volatilities: Sequence[float],
                 correlation):
        self.initial_values = tuple(float(s) for s in initial_values)
        self.risk_free_rate = float(risk_free_rate)
        self.volatilities = tuple(float(v) for v in volatilities)
        corr = np.asarray(correlation, dtype=np.float64)
        d = len(self.initial_values)
        if len(self.volatilities) != d or corr.shape != (d, d):
            raise ValueError(
                "initial_values, volatilities and correlation must agree "
                f"on the asset count (got {d}, {len(self.volatilities)}, "
                f"{corr.shape})")
        if not np.allclose(corr, corr.T, atol=1e-12):
            raise ValueError("correlation must be symmetric")
        if not np.allclose(np.diag(corr), 1.0, atol=1e-12):
            raise ValueError("correlation must have unit diagonal")
        # chol raises on non-PSD, the honest failure mode
        chol = np.linalg.cholesky(corr)
        self.correlation = corr
        self._loadings = np.asarray(
            np.diag(self.volatilities) @ chol, dtype=np.float64)

    # -- ProcessModel interface (log coordinates) --
    def get_number_of_components(self) -> int:
        return len(self.initial_values)

    def get_number_of_factors(self) -> int:
        return len(self.initial_values)

    def initial_state(self, num_paths: int) -> jax.Array:
        logs0 = np.log(np.asarray(self.initial_values))[:, None]
        return jnp.broadcast_to(
            jnp.asarray(logs0, dtype=FLOAT_DTYPE),
            (len(self.initial_values), num_paths))

    def drift(self, time_index, state) -> jax.Array:
        mu = np.asarray([self.risk_free_rate - 0.5 * v * v
                         for v in self.volatilities])[:, None]
        return jnp.broadcast_to(jnp.asarray(mu, dtype=FLOAT_DTYPE),
                                state.shape)

    def factor_loadings(self, time_index, state) -> jax.Array:
        lam = jnp.asarray(self._loadings, dtype=FLOAT_DTYPE)[:, :, None]
        return jnp.broadcast_to(
            lam, lam.shape[:2] + (state.shape[-1],))

    def apply_state_space_transform(self, component: int,
                                    x: jax.Array) -> jax.Array:
        return exp32(x)

    def numeraire(self, time: float) -> RandomVariableTPU:
        return RandomVariableTPU(0.0, math.exp(self.risk_free_rate * time))

    def __hash__(self):
        return hash((self.initial_values, self.risk_free_rate,
                     self.volatilities, self.correlation.tobytes()))

    def __eq__(self, other):
        return (isinstance(other, MultiAssetBlackScholesModel)
                and self.initial_values == other.initial_values
                and self.risk_free_rate == other.risk_free_rate
                and self.volatilities == other.volatilities
                and np.array_equal(self.correlation, other.correlation))


class MonteCarloMultiAssetBlackScholesModel:
    """Simulation facade over the correlated GBM vector, mirroring
    MonteCarloBlackScholesModel's surface plus the [assets, paths]
    terminal gather the rainbow products consume."""

    def __init__(self, time_discretization: TimeDiscretization,
                 num_paths: int, model: MultiAssetBlackScholesModel,
                 seed: int = 3141, brownian: BrownianMotion = None,
                 mesh=None):
        self.model = model
        self.brownian = brownian or BrownianMotion(
            time_discretization, model.get_number_of_factors(),
            num_paths, seed)
        self.process = EulerScheme(model, self.brownian, mesh=mesh)

    def get_asset_value(self, time: float,
                        asset_index: int = 0) -> RandomVariableTPU:
        ti = self.process.time_discretization.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return self.process.get_process_value(ti, asset_index)

    def get_asset_values(self, times, asset_index: int = 0) -> jax.Array:
        from .black_scholes import MonteCarloBlackScholesModel
        return MonteCarloBlackScholesModel.get_asset_values(
            self, times, asset_index)

    def get_all_asset_values(self, time: float) -> jax.Array:
        """[assets, paths] at one date in ONE device program."""
        ti = self.process.time_discretization.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return gather_exp32(self.process._lazy_states(), jnp.asarray(ti))

    def get_numeraire(self, time: float) -> RandomVariableTPU:
        return self.model.numeraire(time)

    def get_number_of_paths(self) -> int:
        return self.process.get_number_of_paths()

    getAssetValue = get_asset_value
    getNumeraire = get_numeraire
    getNumberOfPaths = get_number_of_paths


# ---------------------------------------------------------------------------
# Rainbow products (one fused kernel each over the [assets, paths] gather)
# ---------------------------------------------------------------------------

@jax.jit
def _exchange_kernel(s1, s2, df):
    pay = jnp.maximum(s1 - s2, 0.0)
    return _mean_and_stderr(pay.astype(ACC_DTYPE) * df)


class ExchangeOption:
    """Pays max(S_a - S_b, 0) at maturity (finmath-lib
    ``products.ExchangeOption``); Margrabe (1978) is the oracle."""

    def __init__(self, maturity: float, asset_index_1: int = 0,
                 asset_index_2: int = 1):
        self.maturity = float(maturity)
        self.i1, self.i2 = int(asset_index_1), int(asset_index_2)

    def get_value_and_error(self, model) -> tuple:
        assets = model.get_all_asset_values(self.maturity)
        df = float(model.get_numeraire(0.0).get_average()
                   / model.get_numeraire(self.maturity).get_average())
        out = np.asarray(_exchange_kernel(
            assets[self.i1], assets[self.i2],
            jnp.asarray(df, dtype=ACC_DTYPE)))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


@partial(jax.jit, static_argnums=(3, 4))
def _rainbow_kernel(assets, df, strike, on_max: bool, is_call: bool):
    ext = jnp.max(assets, axis=0) if on_max else jnp.min(assets, axis=0)
    sign = 1.0 if is_call else -1.0
    pay = jnp.maximum(sign * (ext - strike), 0.0)
    return _mean_and_stderr(pay.astype(ACC_DTYPE) * df)


class RainbowOption:
    """European option on the best/worst of several assets:
    kind in {'call-on-max','call-on-min','put-on-max','put-on-min'}.
    The two-asset Stulz (1982) closed forms are the oracle."""

    _KINDS = ("call-on-max", "call-on-min", "put-on-max", "put-on-min")

    def __init__(self, maturity: float, strike: float, kind: str,
                 asset_indices: Optional[Sequence[int]] = None):
        if kind not in self._KINDS:
            raise ValueError(f"kind must be one of {self._KINDS}")
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.kind = kind
        self.asset_indices = (None if asset_indices is None
                              else [int(i) for i in asset_indices])

    def get_value_and_error(self, model) -> tuple:
        assets = model.get_all_asset_values(self.maturity)
        if self.asset_indices is not None:
            assets = assets[jnp.asarray(self.asset_indices)]
        df = float(model.get_numeraire(0.0).get_average()
                   / model.get_numeraire(self.maturity).get_average())
        out = np.asarray(_rainbow_kernel(
            assets, jnp.asarray(df, dtype=ACC_DTYPE),
            jnp.asarray(self.strike, dtype=FLOAT_DTYPE),
            self.kind.endswith("max"), self.kind.startswith("call")))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


@partial(jax.jit, static_argnums=(4, 5))
def _basket_kernel(assets, weights, df, strike, is_call: bool,
                   geometric: bool):
    w = weights[:, None]
    if geometric:
        basket = jnp.exp(jnp.sum(
            w * jnp.log(assets.astype(ACC_DTYPE)), axis=0))
    else:
        basket = jnp.sum(w * assets.astype(ACC_DTYPE), axis=0)
    sign = 1.0 if is_call else -1.0
    pay = jnp.maximum(sign * (basket - strike), 0.0)
    return _mean_and_stderr(pay * df)


@partial(jax.jit, static_argnums=(5,))
def _basket_cv_kernel(assets, weights, df, strike, geo_value,
                      is_call: bool):
    """Arithmetic basket with the exact geometric basket as control
    variate (same construction as the Asian CV)."""
    w = weights[:, None]
    la = jnp.log(assets.astype(ACC_DTYPE))
    arith = jnp.sum(w * assets.astype(ACC_DTYPE), axis=0)
    geo = jnp.exp(jnp.sum(w * la, axis=0))
    sign = 1.0 if is_call else -1.0
    pay_a = jnp.maximum(sign * (arith - strike), 0.0) * df
    pay_g = jnp.maximum(sign * (geo - strike), 0.0) * df
    return _mean_and_stderr(pay_a - pay_g) + jnp.stack(
        [jnp.asarray(geo_value, dtype=ACC_DTYPE),
         jnp.asarray(0.0, dtype=ACC_DTYPE)])


class BasketOption:
    """European option on a weighted basket sum(w_i S_i(T)).
    ``average='geometric'`` prices the geometric basket (exactly
    lognormal — its closed form is the oracle and the control
    variate); ``control_variate='geometric'`` corrects the arithmetic
    payoff with it."""

    def __init__(self, maturity: float, weights: Sequence[float],
                 strike: float, is_call: bool = True,
                 average: str = "arithmetic",
                 control_variate: Optional[str] = None):
        if average not in ("arithmetic", "geometric"):
            raise ValueError("average must be 'arithmetic' or 'geometric'")
        if control_variate not in (None, "geometric"):
            raise ValueError("control_variate must be None or 'geometric'")
        if control_variate and average == "geometric":
            raise ValueError("the geometric payoff IS the control variate")
        self.maturity = float(maturity)
        self.weights = [float(w) for w in weights]
        if any(w <= 0 for w in self.weights):
            raise ValueError("basket weights must be positive")
        self.strike = float(strike)
        self.is_call = bool(is_call)
        self.average = average
        self.control_variate = control_variate

    def get_value_and_error(self, model) -> tuple:
        assets = model.get_all_asset_values(self.maturity)
        if assets.shape[0] != len(self.weights):
            raise ValueError(
                f"{len(self.weights)} weights for {assets.shape[0]} assets")
        df = float(model.get_numeraire(0.0).get_average()
                   / model.get_numeraire(self.maturity).get_average())
        w = jnp.asarray(self.weights, dtype=ACC_DTYPE)
        if self.control_variate == "geometric":
            m = model.model
            geo = geometric_basket_option_value(
                m.initial_values, m.risk_free_rate, m.volatilities,
                m.correlation, self.weights, self.maturity, self.strike,
                self.is_call)
            out = np.asarray(_basket_cv_kernel(
                assets, w, jnp.asarray(df, dtype=ACC_DTYPE),
                jnp.asarray(self.strike, dtype=ACC_DTYPE), geo,
                self.is_call))
        else:
            out = np.asarray(_basket_kernel(
                assets, w, jnp.asarray(df, dtype=ACC_DTYPE),
                jnp.asarray(self.strike, dtype=ACC_DTYPE), self.is_call,
                self.average == "geometric"))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


@jax.jit
def _spread_kernel(s1, s2, df, strike):
    pay = jnp.maximum(s1.astype(ACC_DTYPE) - s2.astype(ACC_DTYPE)
                      - strike, 0.0)
    return _mean_and_stderr(pay * df)


class SpreadOption:
    """Pays (S_a - S_b - K)+ at maturity. K=0 reduces to the exchange
    option (Margrabe exact); Kirk (1995) is the approximate oracle for
    K != 0."""

    def __init__(self, maturity: float, strike: float,
                 asset_index_1: int = 0, asset_index_2: int = 1):
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.i1, self.i2 = int(asset_index_1), int(asset_index_2)

    def get_value_and_error(self, model) -> tuple:
        assets = model.get_all_asset_values(self.maturity)
        df = float(model.get_numeraire(0.0).get_average()
                   / model.get_numeraire(self.maturity).get_average())
        out = np.asarray(_spread_kernel(
            assets[self.i1], assets[self.i2],
            jnp.asarray(df, dtype=ACC_DTYPE),
            jnp.asarray(self.strike, dtype=ACC_DTYPE)))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


# ---------------------------------------------------------------------------
# Closed-form oracles (host f64)
# ---------------------------------------------------------------------------

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(128)


def bivariate_normal_cdf(a: float, b: float, rho: float) -> float:
    """P(X <= a, Y <= b) for standard bivariate normals with
    correlation rho, by 128-point Gauss-Legendre quadrature of the
    Drezner-Wesolowsky identity
    M(a,b,rho) = Phi(a)Phi(b) + (1/2pi) int_0^rho f(r) dr
    (accurate to ~1e-12 for |rho| <= 0.999; the degenerate limits are
    handled exactly)."""
    a, b, rho = float(a), float(b), float(rho)
    if not -1.0 <= rho <= 1.0:
        raise ValueError("rho must be in [-1, 1]")
    if rho >= 1.0:
        return _norm_cdf(min(a, b))
    if rho <= -1.0:
        return max(0.0, _norm_cdf(a) + _norm_cdf(b) - 1.0)
    r = 0.5 * rho * (_GL_NODES + 1.0)          # map [-1,1] -> [0, rho]
    one_m = 1.0 - r * r
    integrand = np.exp(-(a * a + b * b - 2.0 * r * a * b)
                       / (2.0 * one_m)) / np.sqrt(one_m)
    # dr = (rho/2) dx carries the sign of rho
    return float(_norm_cdf(a) * _norm_cdf(b)
                 + 0.5 * rho * (_GL_WEIGHTS * integrand).sum()
                 / (2.0 * math.pi))


def margrabe_exchange_value(s1: float, s2: float, vol1: float, vol2: float,
                            rho: float, maturity: float) -> float:
    """Margrabe (1978): E[df (S1(T) - S2(T))+] = S1 N(d1) - S2 N(d2)
    with sigma^2 = vol1^2 + vol2^2 - 2 rho vol1 vol2 (rate-free)."""
    sig = math.sqrt(max(vol1**2 + vol2**2 - 2.0 * rho * vol1 * vol2, 0.0))
    if sig == 0.0 or maturity <= 0.0:
        return max(s1 - s2, 0.0)
    sq = sig * math.sqrt(maturity)
    d1 = (math.log(s1 / s2) + 0.5 * sq * sq) / sq
    return s1 * _norm_cdf(d1) - s2 * _norm_cdf(d1 - sq)


def stulz_rainbow_value(s1: float, s2: float, risk_free_rate: float,
                        vol1: float, vol2: float, rho: float,
                        maturity: float, strike: float,
                        kind: str) -> float:
    """Stulz (1982) two-asset rainbow closed forms, b = r:
    'call-on-min' directly; 'call-on-max' = C1 + C2 - call-on-min;
    puts via the rainbow parity p = c(K) - c(0) + K df."""
    r, t, k = float(risk_free_rate), float(maturity), float(strike)
    if kind not in RainbowOption._KINDS:
        raise ValueError(f"kind must be one of {RainbowOption._KINDS}")

    def call_on_min(kk: float) -> float:
        if kk <= 0.0:
            # (min - 0)+ = min; df E[min] = S1 + S2 - df E[max] and
            # df E[max] = C1(0) + C2(0) - c_min(0) is circular — use
            # min = S2 - (S2 - S1)+ : df E[min] = s2 - margrabe(s2, s1)
            return s2 - margrabe_exchange_value(s2, s1, vol2, vol1,
                                                rho, t)
        sig = math.sqrt(max(vol1**2 + vol2**2 - 2.0 * rho * vol1 * vol2,
                            1e-300))
        sq = sig * math.sqrt(t)
        d = (math.log(s1 / s2) + 0.5 * sig**2 * t) / sq
        y1 = (math.log(s1 / kk) + (r + 0.5 * vol1**2) * t) \
            / (vol1 * math.sqrt(t))
        y2 = (math.log(s2 / kk) + (r + 0.5 * vol2**2) * t) \
            / (vol2 * math.sqrt(t))
        rho1 = (rho * vol2 - vol1) / sig
        rho2 = (rho * vol1 - vol2) / sig
        return (s1 * bivariate_normal_cdf(y1, -d, rho1)
                + s2 * bivariate_normal_cdf(y2, d - sq, rho2)
                - kk * math.exp(-r * t) * bivariate_normal_cdf(
                    y1 - vol1 * math.sqrt(t), y2 - vol2 * math.sqrt(t),
                    rho))

    s1, s2 = float(s1), float(s2)

    def call_on_max(kk: float) -> float:
        return (black_scholes_option_value(s1, r, vol1, t, kk)
                + black_scholes_option_value(s2, r, vol2, t, kk)
                - call_on_min(kk)) if kk > 0.0 else \
            (s1 + s2 - call_on_min(0.0))

    if kind == "call-on-min":
        return call_on_min(k)
    if kind == "call-on-max":
        return call_on_max(k)
    if kind == "put-on-min":
        return call_on_min(k) - call_on_min(0.0) + k * math.exp(-r * t)
    return call_on_max(k) - call_on_max(0.0) + k * math.exp(-r * t)


def geometric_basket_option_value(initial_values, risk_free_rate: float,
                                  volatilities, correlation, weights,
                                  maturity: float, strike: float,
                                  is_call: bool = True) -> float:
    """Exact closed form for the geometric basket prod S_i^{w_i}:
    a product of lognormals is lognormal with
    m = sum w_i (ln S0_i + (r - sigma_i^2/2) T), v = T w' Sigma w."""
    s0 = np.asarray(initial_values, dtype=np.float64)
    vol = np.asarray(volatilities, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    corr = np.asarray(correlation, dtype=np.float64)
    t, r, k = float(maturity), float(risk_free_rate), float(strike)
    cov = corr * np.outer(vol, vol)
    m = float(w @ (np.log(s0) + (r - 0.5 * vol**2) * t))
    v = float(w @ cov @ w) * t
    df = math.exp(-r * t)
    if v <= 0.0:
        g = math.exp(m)
        intr = max(g - k, 0.0) if is_call else max(k - g, 0.0)
        return df * intr
    sv = math.sqrt(v)
    d1 = (m - math.log(k) + v) / sv
    d2 = d1 - sv
    fwd = math.exp(m + 0.5 * v)
    if is_call:
        return df * (fwd * _norm_cdf(d1) - k * _norm_cdf(d2))
    return df * (k * _norm_cdf(-d2) - fwd * _norm_cdf(-d1))


def kirk_spread_approximation(s1: float, s2: float, risk_free_rate: float,
                              vol1: float, vol2: float, rho: float,
                              maturity: float, strike: float) -> float:
    """Kirk (1995) lognormal-ratio approximation for (S1 - S2 - K)+,
    b = r: Black'76 on F1 vs F2 + K e^{rT}-forwarded strike with the
    blended volatility. Exact at K = 0 (reduces to Margrabe)."""
    t, r, k = float(maturity), float(risk_free_rate), float(strike)
    f1 = s1 * math.exp(r * t)
    f2 = s2 * math.exp(r * t)
    fk = f2 + k
    a = f2 / fk
    sig = math.sqrt(max(vol1**2 - 2.0 * rho * vol1 * vol2 * a
                        + (vol2 * a) ** 2, 0.0))
    df = math.exp(-r * t)
    if sig <= 0.0 or t <= 0.0:
        return df * max(f1 - fk, 0.0)
    sq = sig * math.sqrt(t)
    d1 = (math.log(f1 / fk) + 0.5 * sq * sq) / sq
    return df * (f1 * _norm_cdf(d1) - fk * _norm_cdf(d1 - sq))
