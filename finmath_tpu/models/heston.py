"""Heston stochastic-volatility equity model: fused Monte-Carlo engines
(full-truncation Euler and Andersen's Quadratic-Exponential scheme with
martingale correction), a semi-analytic characteristic-function pricer,
and surface calibration.

Capability map (the reference repo's host library finmath-lib ships this
model family; the repo itself stops at Black-Scholes + LMM):

* ``net.finmath.montecarlo.assetderivativevaluation.models.HestonModel``
  — Euler simulation with a truncation ``Scheme`` (FULL_TRUNCATION /
  REFLECTION); mapped here to ``HestonModel`` (object API over the shared
  ``EulerScheme``) and the fused ``mc_heston_european_prices`` engine
  with ``scheme="euler"`` (full truncation) or the stronger ``"qe"``
  (Andersen 2008 QE-M — not in finmath at all).
* ``net.finmath.fouriermethod.models.HestonModel`` + Carr-Madan pricing
  — mapped to ``heston_characteristic_prices`` (Gauss-Legendre
  integration of the Gatheral P1/P2 form of the characteristic function
  in the Albrecher et al. "little Heston trap" branch-stable
  formulation).

TPU-first design notes:

* The MC engines are ONE jitted graph each — counter-based Threefry
  draws, a lax.scan over time steps with [paths]-wide elementwise
  bodies, the whole STRIKE VECTOR priced from the same terminal state,
  and f64-accumulated means — no per-op dispatch, no host round trips.
  The QE scheme's regime switch (quadratic vs exponential sampling) is
  branchless: both regimes are computed and ``jnp.where``-selected,
  which is exactly how a warp-divergent GPU implementation wants to be
  rewritten for a vector machine.
* The characteristic-function pricer is small dense f64 complex math
  (hundreds of quadrature nodes x strikes); complex128 has no TPU
  kernels, so it deliberately runs host-side in NumPy — it is the
  CALIBRATION oracle and regression net for the device MC, not a device
  workload.
* Float-storage contract matches the rest of the framework: paths in
  f32 (``dtype=jnp.float64`` switches the oracle mode on the identical
  Brownian stream), reductions accumulate in f64.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise_math import exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariableTPU
from .process import EulerScheme, ProcessModel
from .time_discretization import TimeDiscretization


@dataclass(frozen=True)
class HestonParams:
    """Heston dynamics under the risk-neutral measure:

    dS = r S dt + sqrt(V) S dW_S
    dV = kappa (theta - V) dt + xi sqrt(V) dW_V,   d<W_S, W_V> = rho dt

    ``theta`` is the long-run VARIANCE (not vol), ``v0`` the initial
    variance, ``xi`` the vol-of-vol."""

    initial_value: float
    risk_free_rate: float
    v0: float
    kappa: float
    theta: float
    xi: float
    rho: float

    def __post_init__(self):
        if self.initial_value <= 0:
            raise ValueError("initial_value must be positive")
        if min(self.v0, self.kappa, self.theta, self.xi) <= 0:
            raise ValueError("v0, kappa, theta, xi must be positive")
        if not -1.0 < self.rho < 1.0:
            raise ValueError("rho must lie in (-1, 1)")

    @property
    def feller_ratio(self) -> float:
        """2 kappa theta / xi^2 — >= 1 means the variance cannot reach 0."""
        return 2.0 * self.kappa * self.theta / (self.xi * self.xi)


# ---------------------------------------------------------------------------
# semi-analytic pricing via the characteristic function (host, f64 complex)
# ---------------------------------------------------------------------------

def _heston_pj(params: HestonParams, maturity: float, strikes: np.ndarray,
               j: int, nodes: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """P_j (j=1,2) of the Heston call formula by Gauss-Legendre quadrature
    of the Gatheral form, in the Albrecher et al. (2007) "little Heston
    trap" branch: with c = 1/g the complex log stays on the principal
    branch for all maturities, so no phase unwrapping is needed."""
    p = params
    x = math.log(p.initial_value)
    a = p.kappa * p.theta
    u_j = 0.5 if j == 1 else -0.5
    b_j = p.kappa - p.rho * p.xi if j == 1 else p.kappa

    phi = nodes.astype(np.complex128)                        # [Q]
    ixp = 1j * phi
    d = np.sqrt((p.rho * p.xi * ixp - b_j) ** 2
                - p.xi ** 2 * (2.0 * u_j * ixp - phi ** 2))
    # little-trap: c = (b - rho xi i phi - d) / (b - rho xi i phi + d)
    num = b_j - p.rho * p.xi * ixp - d
    den = b_j - p.rho * p.xi * ixp + d
    c = num / den
    e_dt = np.exp(-d * maturity)
    big_d = num / p.xi ** 2 * (1.0 - e_dt) / (1.0 - c * e_dt)
    big_c = (p.risk_free_rate * ixp * maturity
             + a / p.xi ** 2 * (num * maturity
                                - 2.0 * np.log((1.0 - c * e_dt)
                                               / (1.0 - c))))
    f = np.exp(big_c + big_d * p.v0 + ixp * x)               # [Q]
    lnk = np.log(np.asarray(strikes, dtype=np.float64))      # [K]
    integrand = np.real(
        np.exp(-np.outer(lnk, phi) * 1j) * (f / ixp)[None, :])  # [K, Q]
    return 0.5 + (integrand @ weights) / np.pi


def heston_characteristic_prices(params: HestonParams, maturity: float,
                                 strikes, is_call: bool = True,
                                 num_nodes: int = 256,
                                 upper: float = 400.0) -> np.ndarray:
    """European option prices by the Heston semi-closed formula:
    ``call = S0 P1 - K e^{-rT} P2`` with P1/P2 computed by ``num_nodes``
    point Gauss-Legendre quadrature on (0, ``upper``]. Puts via
    put-call parity (exact). The calibration oracle and the regression
    net of the MC engines."""
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    if maturity <= 0:
        raise ValueError("maturity must be positive")
    if np.any(strikes <= 0):
        raise ValueError("strikes must be positive")
    nodes, weights = np.polynomial.legendre.leggauss(int(num_nodes))
    nodes = 0.5 * (nodes + 1.0) * upper
    weights = 0.5 * upper * weights
    p1 = _heston_pj(params, maturity, strikes, 1, nodes, weights)
    p2 = _heston_pj(params, maturity, strikes, 2, nodes, weights)
    df = math.exp(-params.risk_free_rate * maturity)
    call = params.initial_value * p1 - strikes * df * p2
    if is_call:
        return call
    return call - params.initial_value + strikes * df


# ---------------------------------------------------------------------------
# fused Monte-Carlo engines
# ---------------------------------------------------------------------------

_QE_PSI_C = 1.5  # Andersen's regime switch threshold


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _mc_heston_kernel(key, num_paths: int, num_steps: int, scheme: str,
                      antithetic: bool, dtype,
                      s0, r, v0, kappa, theta, xi, rho, maturity,
                      strikes):
    """One fused graph: Threefry draws -> time scan of (log S, V) ->
    strike-vector payoffs -> f64 means. Returns ``[2 + K]``:
    ``[E[S_T] e^{-rT}, E[V_T], call prices...]`` — the forward row is the
    martingale diagnostic, packed into the SAME transfer (the tunnel
    RTT rule: one device->host read per pricing call).

    ``scheme="euler"``: full-truncation Euler (Lord et al. 2010) — the
    finmath HestonModel.Scheme.FULL_TRUNCATION analog.
    ``scheme="qe"``: Andersen (2008) quadratic-exponential with the
    martingale correction (QE-M), branchless across the psi regimes.
    """
    dt = maturity / num_steps
    half = num_paths // 2 if antithetic else num_paths
    dtype = jnp.dtype(dtype)

    s0 = s0.astype(dtype)
    rr = r.astype(dtype)
    v0 = v0.astype(dtype)
    kappa = kappa.astype(dtype)
    theta = theta.astype(dtype)
    xi = xi.astype(dtype)
    rho = rho.astype(dtype)
    dt_ = jnp.asarray(dt, dtype=dtype)
    sqrt_dt = jnp.sqrt(dt_)
    rho_perp = jnp.sqrt(1.0 - rho * rho)

    if scheme == "qe":
        # per-step constants (Andersen eqs. 17-27, 33-39)
        e_kdt = jnp.exp(-kappa * dt_)
        c1 = xi * xi * e_kdt * (1.0 - e_kdt) / kappa
        c2 = theta * xi * xi * (1.0 - e_kdt) ** 2 / (2.0 * kappa)
        g1 = jnp.asarray(0.5, dtype=dtype)
        g2 = jnp.asarray(0.5, dtype=dtype)
        k0 = -rho * kappa * theta * dt_ / xi
        k1 = g1 * dt_ * (kappa * rho / xi - 0.5) - rho / xi
        k2 = g2 * dt_ * (kappa * rho / xi - 0.5) + rho / xi
        k3 = g1 * dt_ * (1.0 - rho * rho)
        k4 = g2 * dt_ * (1.0 - rho * rho)
        big_a = k2 + 0.5 * k4

        def step(carry, k):
            log_s, v = carry
            ku, kz = jax.random.split(k)
            u = jax.random.uniform(ku, (half,), dtype=jnp.float32,
                                   minval=1e-7, maxval=1.0 - 1e-7)
            zs = jax.random.normal(kz, (half,), dtype=jnp.float32)
            if antithetic:
                u = jnp.concatenate([u, 1.0 - u])
                zs = jnp.concatenate([zs, -zs])
            u = u.astype(dtype)
            zs = zs.astype(dtype)

            m = theta + (v - theta) * e_kdt
            s2 = v * c1 + c2
            psi = s2 / jnp.maximum(m * m, 1e-30)
            # quadratic regime (psi <= psi_c): v' = a (b + Zv)^2
            psi_q = jnp.minimum(psi, _QE_PSI_C)
            two_over = 2.0 / psi_q
            b2 = two_over - 1.0 + jnp.sqrt(two_over
                                           * jnp.maximum(two_over - 1.0,
                                                         0.0))
            a_q = m / (1.0 + b2)
            zv = jax.scipy.special.ndtri(u)
            b_q = jnp.sqrt(b2)
            v_quad = a_q * (b_q + zv) ** 2
            # exponential regime (psi > psi_c): mass p at 0 + exp tail
            psi_e = jnp.maximum(psi, _QE_PSI_C)
            p_mass = (psi_e - 1.0) / (psi_e + 1.0)
            beta = (1.0 - p_mass) / jnp.maximum(m, 1e-30)
            v_exp = jnp.where(
                u <= p_mass, 0.0,
                jnp.log((1.0 - p_mass)
                        / jnp.maximum(1.0 - u, 1e-30)) / beta)
            quad = psi <= _QE_PSI_C
            v_new = jnp.where(quad, v_quad, v_exp)
            # martingale correction K0* (Andersen section 3.3): exact
            # E[exp] under the discretized dynamics; valid while
            # A < beta resp. 2 A a < 1 (holds for usable step sizes)
            exp_m = jnp.exp(big_a * b2 * a_q / (1.0 - 2.0 * big_a * a_q)
                            ) / jnp.sqrt(jnp.maximum(
                                1.0 - 2.0 * big_a * a_q, 1e-30))
            exp_e = p_mass + beta * (1.0 - p_mass) \
                / jnp.maximum(beta - big_a, 1e-30)
            k0_star = -jnp.log(jnp.where(quad, exp_m, exp_e)) \
                - (k1 + 0.5 * k3) * v
            log_s = (log_s + rr * dt_ + k0_star + k1 * v + k2 * v_new
                     + jnp.sqrt(jnp.maximum(k3 * v + k4 * v_new, 0.0))
                     * zs)
            return (log_s, v_new), None
    elif scheme == "euler":
        def step(carry, k):
            log_s, v = carry
            k1_, k2_ = jax.random.split(k)
            z1 = jax.random.normal(k1_, (half,), dtype=jnp.float32)
            z2 = jax.random.normal(k2_, (half,), dtype=jnp.float32)
            if antithetic:
                z1 = jnp.concatenate([z1, -z1])
                z2 = jnp.concatenate([z2, -z2])
            z1 = z1.astype(dtype)
            z2 = z2.astype(dtype)
            vp = jnp.maximum(v, 0.0)                  # full truncation
            sqrt_vp = jnp.sqrt(vp)
            dw_v = z1 * sqrt_dt
            dw_s = (rho * z1 + rho_perp * z2) * sqrt_dt
            log_s = log_s + (rr - 0.5 * vp) * dt_ + sqrt_vp * dw_s
            v = v + kappa * (theta - vp) * dt_ + xi * sqrt_vp * dw_v
            return (log_s, v), None
    else:
        raise ValueError(f"unknown scheme {scheme!r}")

    keys = jax.random.split(key, num_steps)
    log_s = jnp.full((num_paths,), jnp.log(s0), dtype=dtype)
    v = jnp.full((num_paths,), v0, dtype=dtype)
    (log_s, v), _ = jax.lax.scan(step, (log_s, v), keys)
    st = exp32(log_s) if dtype == jnp.float32 else jnp.exp(log_s)
    df = jnp.exp(-r * maturity)
    fwd = jnp.sum(st.astype(ACC_DTYPE)) / num_paths * df
    var_t = jnp.sum(jnp.maximum(v, 0.0).astype(ACC_DTYPE)) / num_paths
    payoff = jnp.maximum(st[None, :] - strikes[:, None].astype(dtype), 0.0)
    prices = jnp.sum(payoff.astype(ACC_DTYPE), axis=1) / num_paths * df
    return jnp.concatenate([jnp.stack([fwd, var_t]), prices])


def mc_heston_european_prices(params: HestonParams, maturity: float,
                              strikes, num_paths: int = 100_000,
                              num_steps: int = 64, seed: int = 3141,
                              scheme: str = "qe",
                              antithetic: bool = False,
                              dtype=None):
    """European call prices for a strike vector in ONE fused device
    program. Returns ``(prices [K], discounted_forward, expected_var)``
    — the forward is the martingale diagnostic (must equal S0 up to MC
    error; the QE-M correction makes it exact in expectation).

    ``dtype=jnp.float64`` runs the f64 oracle on the identical draw
    stream (the framework's parity contract)."""
    if antithetic and num_paths % 2:
        raise ValueError("antithetic needs an even num_paths")
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    out = np.asarray(_mc_heston_kernel(
        jax.random.PRNGKey(seed), int(num_paths), int(num_steps),
        str(scheme), bool(antithetic),
        jnp.dtype(dtype if dtype is not None else FLOAT_DTYPE),
        jnp.float64(params.initial_value),
        jnp.float64(params.risk_free_rate),
        jnp.float64(params.v0), jnp.float64(params.kappa),
        jnp.float64(params.theta), jnp.float64(params.xi),
        jnp.float64(params.rho), jnp.float64(maturity),
        jnp.asarray(strikes)))
    return out[2:], float(out[0]), float(out[1])


# ---------------------------------------------------------------------------
# object API (finmath HestonModel + EulerSchemeFromProcessModel shape)
# ---------------------------------------------------------------------------

class HestonModel(ProcessModel):
    """Two-component ProcessModel (log S, V) with full-truncation drift
    and loadings — drive it with the shared ``EulerScheme`` exactly like
    ``BlackScholesModel`` (the finmath object-API shape:
    HestonModel + EulerSchemeFromProcessModel). Component 0 is the
    asset (exp transform), component 1 the variance."""

    def __init__(self, params: HestonParams):
        self.params = params

    def get_number_of_components(self) -> int:
        return 2

    def get_number_of_factors(self) -> int:
        return 2

    def initial_state(self, num_paths: int) -> jax.Array:
        p = self.params
        return jnp.stack([
            jnp.full((num_paths,), math.log(p.initial_value),
                     dtype=FLOAT_DTYPE),
            jnp.full((num_paths,), p.v0, dtype=FLOAT_DTYPE),
        ])

    def drift(self, time_index, state) -> jax.Array:
        p = self.params
        vp = jnp.maximum(state[1], 0.0)
        return jnp.stack([
            p.risk_free_rate - 0.5 * vp,
            p.kappa * (p.theta - vp),
        ])

    def factor_loadings(self, time_index, state) -> jax.Array:
        p = self.params
        sqrt_vp = jnp.sqrt(jnp.maximum(state[1], 0.0))
        rho_perp = math.sqrt(1.0 - p.rho * p.rho)
        zeros = jnp.zeros_like(sqrt_vp)
        # factor 0 drives the variance; the asset sees rho of it
        return jnp.stack([
            jnp.stack([p.rho * sqrt_vp, rho_perp * sqrt_vp]),
            jnp.stack([p.xi * sqrt_vp, zeros]),
        ])

    def apply_state_space_transform(self, component: int,
                                    x: jax.Array) -> jax.Array:
        return exp32(x) if component == 0 else x

    def numeraire(self, time: float) -> RandomVariableTPU:
        return RandomVariableTPU(
            time, math.exp(self.params.risk_free_rate * time))

    @property
    def initial_value(self) -> float:
        return self.params.initial_value

    @property
    def risk_free_rate(self) -> float:
        return self.params.risk_free_rate

    def __hash__(self):
        return hash(self.params)

    def __eq__(self, other):
        return isinstance(other, HestonModel) and self.params == other.params


class MonteCarloHestonModel:
    """Simulation facade over the Heston ProcessModel through the
    shared EulerScheme (full-truncation, the finmath
    HestonModel.Scheme.FULL_TRUNCATION analog): the same surface as
    ``MonteCarloBlackScholesModel``, so the ENTIRE equity product zoo
    (European, digital, Asian, discrete barrier/lookback, variance
    swap, Bermudan LS) prices under stochastic volatility unchanged.
    ``get_asset_values`` gathers the full [dates, paths] matrix in ONE
    jitted program (the tunnel transfer rule); asset_index 1 exposes
    the variance path (no transform)."""

    def __init__(self, time_discretization: TimeDiscretization,
                 num_paths: int, model, seed: int = 3141,
                 brownian=None, mesh=None):
        from .brownian_motion import BrownianMotion
        if isinstance(model, HestonParams):
            model = HestonModel(model)
        self.model = model
        self.brownian = brownian or BrownianMotion(
            time_discretization, 2, num_paths, seed)
        self.process = EulerScheme(model, self.brownian, mesh=mesh)

    def get_asset_value(self, time: float,
                        asset_index: int = 0) -> RandomVariableTPU:
        ti = self.process.time_discretization.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return self.process.get_process_value(ti, asset_index)

    def get_asset_values(self, times, asset_index: int = 0) -> jax.Array:
        from ..ops.precise_math import gather_component_exp32
        td = self.process.time_discretization
        idx = []
        for t in times:
            ti = td.get_time_index(t)
            if ti < 0:
                raise ValueError(f"time {t} not on the simulation grid")
            idx.append(ti)
        states = self.process._lazy_states()
        if asset_index == 0:
            return gather_component_exp32(states, jnp.asarray(idx),
                                          jnp.asarray(0))
        return states[jnp.asarray(idx), asset_index]

    def get_numeraire(self, time: float) -> RandomVariableTPU:
        return self.model.numeraire(time)

    def get_number_of_paths(self) -> int:
        return self.process.get_number_of_paths()

    getAssetValue = get_asset_value
    getNumeraire = get_numeraire
    getNumberOfPaths = get_number_of_paths


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HestonCalibrationResult:
    params: HestonParams
    rms_price_error: float
    iterations: int
    converged: bool


def _to_unconstrained(p: HestonParams) -> np.ndarray:
    return np.array([
        math.log(p.v0), math.log(p.kappa), math.log(p.theta),
        math.log(p.xi), math.atanh(p.rho),
    ])


def _from_unconstrained(y: np.ndarray, s0: float, r: float) -> HestonParams:
    y = np.clip(y, -30.0, 30.0)
    return HestonParams(
        initial_value=s0, risk_free_rate=r,
        v0=math.exp(y[0]), kappa=math.exp(y[1]), theta=math.exp(y[2]),
        xi=math.exp(y[3]), rho=math.tanh(np.clip(y[4], -7.0, 7.0)),
    )


def calibrate_heston(s0: float, r: float,
                     maturities: Sequence[float],
                     strikes: Sequence[Sequence[float]],
                     target_prices: Sequence[Sequence[float]],
                     x0: Optional[HestonParams] = None,
                     max_iterations: int = 200,
                     accuracy: float = 1e-9) -> HestonCalibrationResult:
    """Calibrate (v0, kappa, theta, xi, rho) to a European call surface
    by Levenberg-Marquardt on the characteristic-function pricer
    (host f64; each residual evaluation is microseconds of quadrature,
    so the FD Jacobian is essentially free). Parameters are optimized
    in an unconstrained chart (log for the positives, atanh for rho) —
    the LM step never leaves the admissible region.

    ``strikes[i]``/``target_prices[i]`` belong to ``maturities[i]``."""
    from .calibration import LevenbergMarquardt

    if len(maturities) != len(strikes) or len(strikes) != len(target_prices):
        raise ValueError("maturities, strikes, target_prices must align")
    targets = np.concatenate(
        [np.asarray(p, dtype=np.float64) for p in target_prices])

    def residuals(y: np.ndarray) -> np.ndarray:
        p = _from_unconstrained(y, s0, r)
        rows = [heston_characteristic_prices(p, t, k)
                for t, k in zip(maturities, strikes)]
        return np.concatenate(rows) - targets

    def jacobian(y: np.ndarray) -> np.ndarray:
        h = 1e-6
        cols = []
        for i in range(y.size):
            yp = y.copy()
            yp[i] += h
            ym = y.copy()
            ym[i] -= h
            cols.append((residuals(yp) - residuals(ym)) / (2 * h))
        return np.stack(cols, axis=1)

    start = x0 or HestonParams(s0, r, v0=0.04, kappa=1.0, theta=0.04,
                               xi=0.5, rho=-0.5)
    lm = LevenbergMarquardt(residuals, jacobian,
                            max_iterations=max_iterations,
                            accuracy=accuracy,
                            lower_bound=-np.inf, upper_bound=np.inf)
    res = lm.run(_to_unconstrained(start))
    p = _from_unconstrained(res.parameters, s0, r)
    rms = float(np.sqrt(np.mean(residuals(res.parameters) ** 2)))
    return HestonCalibrationResult(params=p, rms_price_error=rms,
                                   iterations=res.iterations,
                                   converged=res.converged)
