"""Merton (1976) jump-diffusion equity model: a fused Monte-Carlo engine
with branchless on-device Poisson jumps, the closed-form Poisson-mixture
series pricer, and surface calibration.

Capability map (the reference repo's host library finmath-lib ships this
model family; the repo itself stops at Black-Scholes + LMM):

* ``net.finmath.montecarlo.assetderivativevaluation.models.MertonModel``
  — jump-diffusion simulation (lognormal jump sizes parameterized by the
  mean/stddev of the LOG jump, a Brownian diffusion leg); mapped here to
  ``mc_merton_european_prices`` (fused engine) and the
  ``MonteCarloMertonModel`` facade that serves the object-API products
  (``EuropeanOption.get_value`` duck-types against it).
* ``net.finmath.fouriermethod.models.MertonModel`` + Fourier pricing —
  the semi-analytic leg; Merton's mixture series is exact for European
  options, so ``merton_series_prices`` plays that role (and is the
  calibration oracle / MC regression net).

TPU-first design notes:

* The MC engine is ONE jitted graph — Threefry draws, a lax.scan over
  time steps, the whole strike vector priced from the same terminal
  state, f64-accumulated means.
* The Poisson jump COUNT per step is sampled branchlessly by inverse
  CDF with a STATIC truncation ``max_jumps_per_step``: one uniform is
  compared against the running Poisson CDF, ``n = sum(u > cdf_k)`` —
  no rejection loop, no data-dependent control flow, pure vector math
  on the VPU. Truncation error is ~Poisson tail mass beyond the cap:
  for ``lam*dt <= 0.25`` and the default cap 16 it is below 1e-17.
  Conditional on ``n`` jumps, the log-jump increment is EXACTLY
  ``n*a + b*sqrt(n)*Z`` (a sum of n iid Normal(a, b) log jump sizes),
  so the scheme is exact in distribution at every grid point — there
  is no Euler bias to begin with (the drift is affine in log S).
* Float-storage contract matches the rest of the framework: paths in
  f32 (``dtype=jnp.float64`` switches the oracle mode on the identical
  draw stream), reductions accumulate in f64.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise_math import exp32, gather_exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariableTPU
from .analytic import black_scholes_option_value
from .time_discretization import TimeDiscretization


@dataclass(frozen=True)
class MertonParams:
    """Merton jump-diffusion under the risk-neutral measure:

    dS/S- = (r - lam*kappa) dt + sigma dW + (Y - 1) dN

    with ``N`` a Poisson process of intensity ``lam = jump_intensity``,
    iid lognormal jump factors ``log Y ~ Normal(jump_size_mean,
    jump_size_std)`` (the LOG-jump parameterization, like finmath's
    ``MertonModel(jumpIntensity, jumpSizeMean, jumpSizeStdDev)``), and
    the martingale compensator ``kappa = E[Y] - 1
    = exp(a + b^2/2) - 1``."""

    initial_value: float
    risk_free_rate: float
    volatility: float
    jump_intensity: float
    jump_size_mean: float
    jump_size_std: float

    def __post_init__(self):
        if self.initial_value <= 0:
            raise ValueError("initial_value must be positive")
        if self.volatility <= 0:
            raise ValueError("volatility must be positive")
        if self.jump_intensity < 0:
            raise ValueError("jump_intensity must be >= 0")
        if self.jump_size_std < 0:
            raise ValueError("jump_size_std must be >= 0")

    @property
    def jump_compensator(self) -> float:
        """kappa = E[Y] - 1."""
        return math.expm1(self.jump_size_mean
                          + 0.5 * self.jump_size_std ** 2)


# ---------------------------------------------------------------------------
# closed form: Merton's Poisson-mixture series (exact for Europeans)
# ---------------------------------------------------------------------------

def merton_series_prices(params: MertonParams, maturity: float, strikes,
                         is_call: bool = True,
                         max_terms: int = 60) -> np.ndarray:
    """European option prices by Merton's conditioning series: given
    ``n`` jumps in [0, T] the terminal log price is Gaussian, so

    ``price = sum_n e^{-lam' T} (lam' T)^n / n! * BS(sigma_n, r_n)``

    with ``lam' = lam (1 + kappa)``, ``sigma_n^2 = sigma^2 + n b^2 / T``
    and ``r_n = r - lam kappa + n (a + b^2/2) / T`` (Merton 1976; the
    closed form finmath prices its Fourier MertonModel against). The
    series terms decay factorially; ``max_terms`` = 60 is overkill for
    any ``lam T`` below ~20. Puts via put-call parity (exact)."""
    p = params
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    if maturity <= 0:
        raise ValueError("maturity must be positive")
    if np.any(strikes <= 0):
        raise ValueError("strikes must be positive")
    a, b, lam = p.jump_size_mean, p.jump_size_std, p.jump_intensity
    kappa = p.jump_compensator
    lam_p = lam * (1.0 + kappa)
    call = np.zeros_like(strikes)
    log_w = -lam_p * maturity  # log of e^{-lam' T} (lam' T)^n / n!
    for n in range(max_terms):
        sigma_n = math.sqrt(p.volatility ** 2 + n * b * b / maturity)
        r_n = (p.risk_free_rate - lam * kappa
               + n * (a + 0.5 * b * b) / maturity)
        w = math.exp(log_w)
        if w > 1e-18 or n == 0:
            # the lam' weight e^{-lam'T}(lam'T)^n/n! equals the true
            # Poisson probability e^{-lamT}(lamT)^n/n! TIMES the
            # discount-rate shift e^{(r_n - r)T} — BS at rate r_n with
            # lam'-weights is already the r-discounted mixture term
            bs = np.array([
                black_scholes_option_value(p.initial_value, r_n, sigma_n,
                                           maturity, k) for k in strikes])
            call += w * bs
        log_w += math.log(max(lam_p * maturity, 1e-300)) - math.log(n + 1)
        if lam_p * maturity == 0.0:
            break
    if is_call:
        return call
    df = math.exp(-p.risk_free_rate * maturity)
    return call - p.initial_value + strikes * df


# ---------------------------------------------------------------------------
# fused Monte-Carlo engine
# ---------------------------------------------------------------------------

def _poisson_icdf_branchless(u, lam_dt, max_jumps: int):
    """Poisson counts by inverse CDF with a static cap: n = #{k : u > F(k)}.

    Pure vector math (no rejection loop): the running CDF
    F(k) = sum_{j<=k} e^{-lam dt} (lam dt)^j / j! is built by cumsum over
    a static [max_jumps] axis and compared against one uniform per
    sample. Exact up to the tail mass P[N > max_jumps]."""
    k = jnp.arange(max_jumps, dtype=ACC_DTYPE)
    log_pmf = (-lam_dt + k * jnp.log(jnp.maximum(lam_dt, 1e-300))
               - jax.lax.cumsum(jnp.log(jnp.maximum(k, 1.0))))
    cdf = jnp.cumsum(jnp.exp(log_pmf))                      # [max_jumps]
    return jnp.sum(u[None, :] > cdf[:, None], axis=0,
                   dtype=jnp.int32)                          # [paths]


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _mc_merton_kernel(key, num_paths: int, num_steps: int, max_jumps: int,
                      antithetic: bool, dtype,
                      s0, r, sigma, lam, a, b, maturity, strikes):
    """One fused graph: Threefry draws -> time scan of log S with
    branchless Poisson jumps -> strike-vector payoffs -> f64 means.
    Returns ``[1 + K]``: ``[E[S_T] e^{-rT}, call prices...]`` — the
    forward row is the martingale diagnostic, packed into the SAME
    transfer (one device->host read per pricing call)."""
    dt = maturity / num_steps
    half = num_paths // 2 if antithetic else num_paths
    dtype = jnp.dtype(dtype)

    kappa = jnp.expm1(a + 0.5 * b * b)
    lam_dt = lam * dt
    drift = ((r - 0.5 * sigma * sigma - lam * kappa) * dt).astype(dtype)
    sig_sqdt = (sigma * jnp.sqrt(dt)).astype(dtype)
    a_ = a.astype(dtype)
    b_ = b.astype(dtype)

    def step(log_s, k):
        kd, kj, ku = jax.random.split(k, 3)
        z_d = jax.random.normal(kd, (half,), dtype=jnp.float32)
        z_j = jax.random.normal(kj, (half,), dtype=jnp.float32)
        u = jax.random.uniform(ku, (half,), dtype=jnp.float32)
        if antithetic:
            z_d = jnp.concatenate([z_d, -z_d])
            z_j = jnp.concatenate([z_j, -z_j])
            u = jnp.concatenate([u, 1.0 - u])
        n = _poisson_icdf_branchless(u.astype(ACC_DTYPE), lam_dt,
                                     max_jumps).astype(dtype)
        # sum of n iid Normal(a, b) log jumps == Normal(n a, b sqrt(n))
        jump = n * a_ + b_ * jnp.sqrt(n) * z_j.astype(dtype)
        return log_s + drift + sig_sqdt * z_d.astype(dtype) + jump, None

    keys = jax.random.split(key, num_steps)
    log_s0 = jnp.full((num_paths,), jnp.log(s0), dtype=dtype)
    log_st, _ = jax.lax.scan(step, log_s0, keys)
    st = exp32(log_st) if dtype == jnp.float32 else jnp.exp(log_st)
    df = jnp.exp(-r * maturity)
    fwd = jnp.sum(st.astype(ACC_DTYPE)) / num_paths * df
    payoff = jnp.maximum(st[None, :] - strikes[:, None].astype(dtype), 0.0)
    prices = jnp.sum(payoff.astype(ACC_DTYPE), axis=1) / num_paths * df
    return jnp.concatenate([fwd[None], prices])


def mc_merton_european_prices(params: MertonParams, maturity: float,
                              strikes, num_paths: int = 100_000,
                              num_steps: int = 16, seed: int = 3141,
                              antithetic: bool = False,
                              max_jumps_per_step: int = 16,
                              dtype=None):
    """European call prices for a strike vector in ONE fused device
    program. Returns ``(prices [K], discounted_forward)`` — the forward
    must equal S0 up to MC error (the scheme is exact in distribution,
    so few steps suffice; steps only refine path OBSERVATION grids).

    ``dtype=jnp.float64`` runs the f64 oracle on the identical draw
    stream (the framework's parity contract)."""
    if antithetic and num_paths % 2:
        raise ValueError("antithetic needs an even num_paths")
    lam_dt = params.jump_intensity * maturity / num_steps
    # exact truncation tail mass P[N > cap] of the branchless sampler
    k = np.arange(max_jumps_per_step + 1)
    log_pmf = -lam_dt + k * np.log(max(lam_dt, 1e-300)) \
        - np.cumsum(np.log(np.maximum(k, 1)))
    tail = 1.0 - np.exp(log_pmf).sum()
    if tail > 1e-9:
        raise ValueError(
            f"lam*dt = {lam_dt:.3g} leaves tail mass {tail:.2g} beyond "
            f"the jump cap {max_jumps_per_step}; raise num_steps or "
            "max_jumps_per_step")
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    out = np.asarray(_mc_merton_kernel(
        jax.random.PRNGKey(seed), int(num_paths), int(num_steps),
        int(max_jumps_per_step), bool(antithetic),
        jnp.dtype(dtype if dtype is not None else FLOAT_DTYPE),
        jnp.float64(params.initial_value),
        jnp.float64(params.risk_free_rate),
        jnp.float64(params.volatility),
        jnp.float64(params.jump_intensity),
        jnp.float64(params.jump_size_mean),
        jnp.float64(params.jump_size_std),
        jnp.float64(maturity), jnp.asarray(strikes)))
    return out[1:], float(out[0])


# ---------------------------------------------------------------------------
# object API facade (finmath MonteCarloAssetModel shape)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2, 3))
def _merton_path_history(key, num_paths: int, num_steps: int, max_jumps: int,
                         s0, r, sigma, lam, a, b, dts):
    """Full log-price history [steps+1, paths] on the simulation grid —
    the facade's lazily cached state (finmath's process cache)."""
    kappa = jnp.expm1(a + 0.5 * b * b)
    mu = (r - 0.5 * sigma * sigma - lam * kappa).astype(FLOAT_DTYPE)
    sig = sigma.astype(FLOAT_DTYPE)
    a_ = a.astype(FLOAT_DTYPE)
    b_ = b.astype(FLOAT_DTYPE)

    def step(log_s, inp):
        k, dt = inp
        kd, kj, ku = jax.random.split(k, 3)
        z_d = jax.random.normal(kd, (num_paths,), dtype=FLOAT_DTYPE)
        z_j = jax.random.normal(kj, (num_paths,), dtype=FLOAT_DTYPE)
        u = jax.random.uniform(ku, (num_paths,), dtype=jnp.float32)
        n = _poisson_icdf_branchless(u.astype(ACC_DTYPE),
                                     (lam * dt).astype(ACC_DTYPE),
                                     max_jumps).astype(FLOAT_DTYPE)
        dt_f = dt.astype(FLOAT_DTYPE)
        log_s = (log_s + mu * dt_f + sig * jnp.sqrt(dt_f) * z_d
                 + n * a_ + b_ * jnp.sqrt(n) * z_j)
        return log_s, log_s

    keys = jax.random.split(key, dts.shape[0])
    log_s0 = jnp.full((num_paths,), jnp.log(s0), dtype=FLOAT_DTYPE)
    _, hist = jax.lax.scan(step, log_s0, (keys, dts))
    return jnp.concatenate([log_s0[None], hist], axis=0)


class MonteCarloMertonModel:
    """Simulation facade over the Merton dynamics: asset/numeraire
    accessors on a time grid, serving the object-API products
    (``EuropeanOption.get_value(model)`` works unchanged). The jump
    process is not a Brownian factor, so this facade owns its own fused
    path generator instead of the shared ``EulerScheme`` — same scheme
    as the pricing engine (exact in distribution at grid points)."""

    def __init__(self, time_discretization: TimeDiscretization,
                 num_paths: int, params: MertonParams, seed: int = 3141,
                 max_jumps_per_step: int = 16):
        self.params = params
        self.time_discretization = time_discretization
        self.num_paths = int(num_paths)
        self.seed = int(seed)
        self.max_jumps_per_step = int(max_jumps_per_step)
        self._log_states: Optional[jax.Array] = None

    def _states(self) -> jax.Array:
        if self._log_states is None:
            p = self.params
            self._log_states = _merton_path_history(
                jax.random.PRNGKey(self.seed), self.num_paths,
                self.time_discretization.get_number_of_time_steps(),
                self.max_jumps_per_step,
                jnp.float64(p.initial_value), jnp.float64(p.risk_free_rate),
                jnp.float64(p.volatility), jnp.float64(p.jump_intensity),
                jnp.float64(p.jump_size_mean), jnp.float64(p.jump_size_std),
                jnp.asarray(self.time_discretization.get_step_sizes()))
        return self._log_states

    def get_asset_value(self, time: float,
                        asset_index: int = 0) -> RandomVariableTPU:
        ti = self.time_discretization.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return RandomVariableTPU.of(
            self.time_discretization.get_time(ti),
            exp32(self._states()[ti]))

    def get_asset_values(self, times, asset_index: int = 0) -> jax.Array:
        """[len(times), paths] asset matrix in ONE device program (the
        batched accessor exercise-schedule consumers use — each eager
        per-date slice costs a dispatch RTT through the TPU tunnel)."""
        idx = []
        for t in times:
            ti = self.time_discretization.get_time_index(t)
            if ti < 0:
                raise ValueError(f"time {t} not on the simulation grid")
            idx.append(ti)
        return gather_exp32(self._states(), jnp.asarray(idx))

    def get_numeraire(self, time: float) -> RandomVariableTPU:
        return RandomVariableTPU(
            time, math.exp(self.params.risk_free_rate * time))

    def get_number_of_paths(self) -> int:
        return self.num_paths

    getAssetValue = get_asset_value
    getNumeraire = get_numeraire
    getNumberOfPaths = get_number_of_paths


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MertonCalibrationResult:
    params: MertonParams
    rms_price_error: float
    iterations: int
    converged: bool


def _to_unconstrained(p: MertonParams) -> np.ndarray:
    return np.array([
        math.log(p.volatility), math.log(max(p.jump_intensity, 1e-12)),
        p.jump_size_mean, math.log(max(p.jump_size_std, 1e-12)),
    ])


def _from_unconstrained(y: np.ndarray, s0: float, r: float) -> MertonParams:
    y = np.clip(y, -30.0, 30.0)
    return MertonParams(
        initial_value=s0, risk_free_rate=r,
        volatility=math.exp(y[0]), jump_intensity=math.exp(y[1]),
        jump_size_mean=float(y[2]), jump_size_std=math.exp(y[3]),
    )


def calibrate_merton(s0: float, r: float,
                     maturities: Sequence[float],
                     strikes: Sequence[Sequence[float]],
                     target_prices: Sequence[Sequence[float]],
                     x0: Optional[MertonParams] = None,
                     max_iterations: int = 200,
                     accuracy: float = 1e-9) -> MertonCalibrationResult:
    """Calibrate (sigma, lam, a, b) to a European call surface by
    Levenberg-Marquardt on the exact series pricer (host f64; each
    residual evaluation is microseconds, so the FD Jacobian is free).
    Positives are optimized in log; ``a`` is free.

    ``strikes[i]``/``target_prices[i]`` belong to ``maturities[i]``."""
    from .calibration import LevenbergMarquardt

    if len(maturities) != len(strikes) or len(strikes) != len(target_prices):
        raise ValueError("maturities, strikes, target_prices must align")
    targets = np.concatenate(
        [np.asarray(p, dtype=np.float64) for p in target_prices])

    def residuals(y: np.ndarray) -> np.ndarray:
        p = _from_unconstrained(y, s0, r)
        rows = [merton_series_prices(p, t, k)
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

    start = x0 or MertonParams(s0, r, volatility=0.2, jump_intensity=0.3,
                               jump_size_mean=-0.1, jump_size_std=0.2)
    lm = LevenbergMarquardt(residuals, jacobian,
                            max_iterations=max_iterations,
                            accuracy=accuracy,
                            lower_bound=-np.inf, upper_bound=np.inf)
    res = lm.run(_to_unconstrained(start))
    p = _from_unconstrained(res.parameters, s0, r)
    rms = float(np.sqrt(np.mean(residuals(res.parameters) ** 2)))
    return MertonCalibrationResult(params=p, rms_price_error=rms,
                                   iterations=res.iterations,
                                   converged=res.converged)
