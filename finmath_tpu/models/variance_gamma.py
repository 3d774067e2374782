"""Variance-Gamma (Madan-Carr-Chang 1998) pure-jump equity model:
fused gamma-subordinated Monte-Carlo engine and calibration against the
generic Fourier pricer.

Capability map (the reference repo's host library finmath-lib ships this
family): ``net.finmath.montecarlo.assetderivativevaluation.models
.VarianceGammaModel`` + ``net.finmath.montecarlo.processes
.VarianceGammaProcess`` (simulation), and ``net.finmath.fouriermethod
.models.VarianceGammaModel`` (characteristic function — mapped to
``fourier.variance_gamma_cf``).

Model: S_T = S0 exp((r + omega) t + X(t)), X a VG process —
Brownian motion with drift theta and volatility sigma evaluated at an
independent gamma clock G(t) with unit mean rate and variance nu:

  X(t) = theta G(t) + sigma W(G(t)),
  G(t+dt) - G(t) ~ Gamma(shape dt/nu, scale nu)

and omega = ln(1 - theta nu - sigma^2 nu / 2)/nu makes e^{-rt} S a
martingale. The time-changed representation makes the simulation EXACT
in distribution at every grid point (gamma increments are infinitely
divisible): steps place observation dates, they do not discretize.

TPU-first design notes: one jitted graph per pricing call — Threefry
gamma + normal draws inside a lax.scan (``jax.random.gamma`` lowers to
a fixed-shape rejection kernel, fine on the VPU), the whole strike
vector priced from the same terminal state, f64-accumulated means.
Antithetic mirroring flips ONLY the Brownian leg (u -> 1-u on the gamma
clock would distort its distribution through the rejection sampler, so
the clock is shared between the mirrored halves — variance reduction on
the conditional-Gaussian component, exactness untouched)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise_math import exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE
from .fourier import european_call_from_cf, variance_gamma_cf


@dataclass(frozen=True)
class VarianceGammaParams:
    """sigma: diffusion scale of the subordinated Brownian; theta: its
    drift (skew, typically negative); nu: variance rate of the gamma
    clock (excess kurtosis)."""

    initial_value: float
    risk_free_rate: float
    sigma: float
    theta: float
    nu: float

    def __post_init__(self):
        if self.initial_value <= 0:
            raise ValueError("initial_value must be positive")
        if self.sigma <= 0 or self.nu <= 0:
            raise ValueError("sigma and nu must be positive")
        if self.theta * self.nu + 0.5 * self.sigma ** 2 * self.nu >= 1.0:
            raise ValueError("inadmissible VG parameters: need "
                             "theta*nu + sigma^2*nu/2 < 1")

    @property
    def omega(self) -> float:
        return math.log(1.0 - self.theta * self.nu
                        - 0.5 * self.sigma ** 2 * self.nu) / self.nu


def vg_analytic_prices(params: VarianceGammaParams, maturity: float,
                       strikes, is_call: bool = True,
                       num_nodes: int = 512) -> np.ndarray:
    """European prices via the generic Gil-Pelaez pricer on the VG
    characteristic function — the calibration oracle and the MC
    regression net."""
    p = params
    cf = variance_gamma_cf(p.initial_value, p.risk_free_rate, p.sigma,
                           p.theta, p.nu, maturity)
    return european_call_from_cf(cf, p.risk_free_rate, maturity, strikes,
                                 is_call=is_call, num_nodes=num_nodes,
                                 initial_value=p.initial_value)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _mc_vg_kernel(key, num_paths: int, num_steps: int, antithetic: bool,
                  s0, r, sigma, theta, nu, omega, maturity, strikes):
    """One fused graph: gamma-clock + Brownian draws -> time scan of
    log S -> strike-vector payoffs -> f64 means. Returns ``[1 + K]``:
    ``[E[S_T] e^{-rT}, call prices...]`` (martingale diagnostic packed
    into the same single transfer)."""
    dt = maturity / num_steps
    half = num_paths // 2 if antithetic else num_paths
    shape_a = jnp.asarray(dt / nu, dtype=jnp.float32)

    drift = ((r + omega) * dt).astype(FLOAT_DTYPE)
    th = theta.astype(FLOAT_DTYPE)
    sg = sigma.astype(FLOAT_DTYPE)
    nu_f = nu.astype(FLOAT_DTYPE)

    def step(log_s, k):
        kg, kz = jax.random.split(k)
        g = jax.random.gamma(kg, shape_a, (half,),
                             dtype=jnp.float32) * nu_f
        z = jax.random.normal(kz, (half,), dtype=jnp.float32)
        if antithetic:
            g = jnp.concatenate([g, g])       # shared clock
            z = jnp.concatenate([z, -z])      # mirrored Brownian leg
        g = g.astype(FLOAT_DTYPE)
        z = z.astype(FLOAT_DTYPE)
        return log_s + drift + th * g + sg * jnp.sqrt(g) * z, None

    keys = jax.random.split(key, num_steps)
    log_s0 = jnp.full((num_paths,), jnp.log(s0), dtype=FLOAT_DTYPE)
    log_st, _ = jax.lax.scan(step, log_s0, keys)
    st = exp32(log_st) if FLOAT_DTYPE == jnp.float32 else jnp.exp(log_st)
    df = jnp.exp(-r * maturity)
    fwd = jnp.sum(st.astype(ACC_DTYPE)) / num_paths * df
    payoff = jnp.maximum(st[None, :] - strikes[:, None].astype(st.dtype),
                         0.0)
    prices = jnp.sum(payoff.astype(ACC_DTYPE), axis=1) / num_paths * df
    return jnp.concatenate([fwd[None], prices])


def mc_vg_european_prices(params: VarianceGammaParams, maturity: float,
                          strikes, num_paths: int = 100_000,
                          num_steps: int = 16, seed: int = 3141,
                          antithetic: bool = False):
    """European call prices for a strike vector in ONE fused device
    program. Returns ``(prices [K], discounted_forward)`` — the forward
    must equal S0 up to MC error (exact scheme; steps only place
    observation dates)."""
    if antithetic and num_paths % 2:
        raise ValueError("antithetic needs an even num_paths")
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    p = params
    out = np.asarray(_mc_vg_kernel(
        jax.random.PRNGKey(seed), int(num_paths), int(num_steps),
        bool(antithetic),
        jnp.float64(p.initial_value), jnp.float64(p.risk_free_rate),
        jnp.float64(p.sigma), jnp.float64(p.theta), jnp.float64(p.nu),
        jnp.float64(p.omega), jnp.float64(maturity),
        jnp.asarray(strikes)))
    return out[1:], float(out[0])


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VarianceGammaCalibrationResult:
    params: VarianceGammaParams
    rms_price_error: float
    iterations: int
    converged: bool


def calibrate_variance_gamma(s0: float, r: float,
                             maturities: Sequence[float],
                             strikes: Sequence[Sequence[float]],
                             target_prices: Sequence[Sequence[float]],
                             x0: Optional[VarianceGammaParams] = None,
                             max_iterations: int = 200,
                             accuracy: float = 1e-9
                             ) -> VarianceGammaCalibrationResult:
    """Calibrate (sigma, theta, nu) to a European call surface by
    Levenberg-Marquardt on the Fourier pricer (host f64). sigma/nu in
    log; theta mapped through the admissibility bound
    theta < (1 - sigma^2 nu/2)/nu by a shifted softplus-style chart so
    LM never leaves the admissible region."""
    from .calibration import LevenbergMarquardt

    if len(maturities) != len(strikes) or len(strikes) != len(target_prices):
        raise ValueError("maturities, strikes, target_prices must align")
    targets = np.concatenate(
        [np.asarray(t, dtype=np.float64) for t in target_prices])

    def from_y(y: np.ndarray) -> VarianceGammaParams:
        y = np.clip(y, -30.0, 30.0)
        sigma = math.exp(y[0])
        nu = math.exp(y[2])
        bound = (1.0 - 0.5 * sigma * sigma * nu) / nu
        # theta = bound - exp(y1): any real y1 stays admissible
        theta = bound - math.exp(np.clip(y[1], -30.0, 30.0))
        return VarianceGammaParams(s0, r, sigma, theta, nu)

    def to_y(p: VarianceGammaParams) -> np.ndarray:
        bound = (1.0 - 0.5 * p.sigma ** 2 * p.nu) / p.nu
        return np.array([math.log(p.sigma), math.log(bound - p.theta),
                         math.log(p.nu)])

    def residuals(y: np.ndarray) -> np.ndarray:
        p = from_y(y)
        rows = [vg_analytic_prices(p, t, k)
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

    start = x0 or VarianceGammaParams(s0, r, sigma=0.2, theta=-0.15,
                                      nu=0.2)
    lm = LevenbergMarquardt(residuals, jacobian,
                            max_iterations=max_iterations,
                            accuracy=accuracy,
                            lower_bound=-np.inf, upper_bound=np.inf)
    res = lm.run(to_y(start))
    p = from_y(res.parameters)
    rms = float(np.sqrt(np.mean(residuals(res.parameters) ** 2)))
    return VarianceGammaCalibrationResult(params=p, rms_price_error=rms,
                                          iterations=res.iterations,
                                          converged=res.converged)
