"""SABR stochastic-volatility smile model: Hagan asymptotic implied
vols (lognormal and normal/Bachelier quotes, with displacement), a
fused Monte-Carlo simulator, and smile calibration.

Capability map: finmath-lib ships the SABR family as analytic
functions — ``net.finmath.functions.AnalyticFormulas
.sabrHaganLognormalBlackVolatilityApproximation`` and the normal-vol
approximations (``sabrHaganNormalVolApproximation``,
``sabrBerestyckiNormalVolApproximation``) used by its swaption-cube
machinery (``net.finmath.singleswaprate``). The reference repo's
workloads quote swaptions in exactly these conventions
(LIBORMarketModelCalibrationATMTest NORMAL quotes; the benchmark's
lognormal quotes), so SABR is the standard smile-interpolation
companion. Dynamics (displacement d, beta in [0,1]):

    dF = alpha (F + d)^beta dW1,   dalpha = nu alpha dW2,
    d<W1, W2> = rho dt

TPU-first notes: the Hagan formulas are host f64 (scalar quotes) with
``jnp``-vectorized twins for use inside jitted calibration losses; the
MC simulator is one ``lax.scan`` over time steps (vol leg EXACT — a
lognormal with its Ito drift — and the forward leg log-Euler in the
displaced coordinate with absorption at F = -d, the standard scheme),
with the two correlated normals built from one Threefry stream.
Validation: MC implied vols vs the Hagan expansion at moderate smiles
(the expansion's own accuracy regime), martingale checks, and the
beta = 1, nu -> 0 Black / beta = 0 Bachelier degenerations
(tests/test_sabr.py)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE
from .analytic import (
    bachelier_implied_volatility,
    black_formula,
    black_implied_volatility,
)


@dataclass(frozen=True)
class SABRParams:
    """alpha: initial vol level; beta: CEV exponent in [0, 1];
    rho: vol-forward correlation; nu: vol-of-vol;
    displacement: shift d >= 0 (displaced/shifted SABR)."""
    alpha: float
    beta: float
    rho: float
    nu: float
    displacement: float = 0.0

    def __post_init__(self):
        if not 0.0 <= self.beta <= 1.0:
            raise ValueError("beta must be in [0, 1]")
        if not -1.0 < self.rho < 1.0:
            raise ValueError("rho must be in (-1, 1)")
        if self.alpha <= 0.0 or self.nu < 0.0:
            raise ValueError("alpha > 0 and nu >= 0 required")
        if self.displacement < 0.0:
            raise ValueError("displacement must be >= 0")


def _hagan_lognormal(f: float, k: float, t: float, alpha: float,
                     beta: float, rho: float, nu: float) -> float:
    """Hagan et al. 2002 eq. 2.17a (the industry-standard expansion)."""
    if f <= 0.0 or k <= 0.0:
        raise ValueError("forward and strike must be positive after "
                         "displacement; increase the displacement")
    omb = 1.0 - beta
    lfk = math.log(f / k)
    fkb = (f * k) ** (0.5 * omb)
    a1 = (omb * alpha) ** 2 / (24.0 * fkb * fkb)
    a2 = rho * beta * nu * alpha / (4.0 * fkb)
    a3 = (2.0 - 3.0 * rho * rho) * nu * nu / 24.0
    term_t = 1.0 + (a1 + a2 + a3) * t
    denom = fkb * (1.0 + omb**2 / 24.0 * lfk**2
                   + omb**4 / 1920.0 * lfk**4)
    if nu == 0.0 or abs(lfk) < 1e-14:
        return alpha / denom * term_t      # ATM/CEV limit: z/x(z) -> 1
    z = nu / alpha * fkb * lfk
    x = math.log((math.sqrt(1.0 - 2.0 * rho * z + z * z) + z - rho)
                 / (1.0 - rho))
    return alpha / denom * (z / x) * term_t


def sabr_lognormal_implied_volatility(params: SABRParams, forward: float,
                                      strike: float,
                                      maturity: float) -> float:
    """Black (lognormal) implied vol of the displaced-SABR smile
    (finmath AnalyticFormulas.sabrHaganLognormalBlackVolatility
    Approximation). Displacement shifts both forward and strike."""
    d = params.displacement
    return _hagan_lognormal(forward + d, strike + d, maturity,
                            params.alpha, params.beta, params.rho,
                            params.nu)


def sabr_normal_implied_volatility(params: SABRParams, forward: float,
                                   strike: float,
                                   maturity: float) -> float:
    """Bachelier (normal) implied vol of the SABR smile, Hagan et al.
    2002 eq. A.67 (finmath sabrHaganNormalVolApproximation family)."""
    d = params.displacement
    f, k = forward + d, strike + d
    if f <= 0.0 or k <= 0.0:
        raise ValueError("forward and strike must be positive after "
                         "displacement")
    alpha, beta, rho, nu = (params.alpha, params.beta, params.rho,
                            params.nu)
    t = maturity
    omb = 1.0 - beta
    lfk = math.log(f / k)
    fkb = (f * k) ** (0.5 * omb)
    num_series = 1.0 + lfk**2 / 24.0 + lfk**4 / 1920.0
    den_series = 1.0 + omb**2 / 24.0 * lfk**2 + omb**4 / 1920.0 * lfk**4
    b1 = -beta * (2.0 - beta) * alpha**2 / (24.0 * fkb * fkb)
    b2 = rho * alpha * nu * beta / (4.0 * fkb)
    b3 = (2.0 - 3.0 * rho**2) * nu**2 / 24.0
    term_t = 1.0 + (b1 + b2 + b3) * t
    lead = alpha * (f * k) ** (0.5 * beta) * num_series / den_series
    if nu == 0.0 or abs(lfk) < 1e-14:
        return lead * term_t
    zeta = nu / alpha * fkb * lfk
    x = math.log((math.sqrt(1.0 - 2.0 * rho * zeta + zeta**2)
                  + zeta - rho) / (1.0 - rho))
    return lead * (zeta / x) * term_t


def jnp_sabr_lognormal_implied_volatility(alpha, beta, rho, nu, forward,
                                          strikes, maturity,
                                          displacement=0.0):
    """jnp twin of the Hagan lognormal expansion (vectorized over
    strikes, differentiable — for jitted calibration losses and AAD
    smile risk)."""
    f = forward + displacement
    k = strikes + displacement
    omb = 1.0 - beta
    lfk = jnp.log(f / k)
    fkb = (f * k) ** (0.5 * omb)
    a1 = (omb * alpha) ** 2 / (24.0 * fkb * fkb)
    a2 = rho * beta * nu * alpha / (4.0 * fkb)
    a3 = (2.0 - 3.0 * rho * rho) * nu * nu / 24.0
    term_t = 1.0 + (a1 + a2 + a3) * maturity
    denom = fkb * (1.0 + omb**2 / 24.0 * lfk**2
                   + omb**4 / 1920.0 * lfk**4)
    z = nu / alpha * fkb * lfk
    sq = jnp.sqrt(1.0 - 2.0 * rho * z + z * z)
    x = jnp.log((sq + z - rho) / (1.0 - rho))
    # z/x -> 1 as z -> 0: series z/x = 1 + rho z/2 + ... ; switch to it
    # near ATM to keep the expression differentiable and finite
    small = jnp.abs(z) < 1e-6
    zsafe = jnp.where(small, 1.0, z)
    xsafe = jnp.where(small, 1.0, x)
    z_over_x = jnp.where(small, 1.0 + 0.5 * rho * z, zsafe / xsafe)
    return alpha / denom * z_over_x * term_t


# ---------------------------------------------------------------------------
# Monte-Carlo simulation (one fused scan)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2, 9))
def _sabr_terminal(key, num_paths: int, num_steps: int, f0, alpha, beta,
                   rho, nu, dt, antithetic: bool):
    """Terminal displaced forward X_T = F_T + d >= 0 (absorbed at 0).
    Log-Euler on X with the alpha leg exact; antithetic mirrors BOTH
    normals (the payoff is monotone in each)."""
    half = num_paths // 2 if antithetic else num_paths
    k1, k2 = jax.random.split(key)
    z1 = jax.random.normal(k1, (num_steps, half), dtype=FLOAT_DTYPE)
    z2 = jax.random.normal(k2, (num_steps, half), dtype=FLOAT_DTYPE)
    if antithetic:
        z1 = jnp.concatenate([z1, -z1], axis=1)
        z2 = jnp.concatenate([z2, -z2], axis=1)
    w2 = rho * z1 + jnp.sqrt(1.0 - rho * rho) * z2
    sqdt = jnp.sqrt(dt)

    def step(carry, zs):
        x, a = carry
        e1, e2 = zs
        # local lognormal step in X: dX = a X^beta dW1 ->
        # dlogX = a X^(beta-1) dW1 - 0.5 (a X^(beta-1))^2 dt
        sig_loc = a * jnp.where(x > 0.0, x, 1.0) ** (beta - 1.0)
        x_new = x * jnp.exp(sig_loc * sqdt * e1
                            - 0.5 * sig_loc * sig_loc * dt)
        x_new = jnp.where(x > 0.0, x_new, 0.0)       # absorbed
        # exact lognormal vol leg
        a_new = a * jnp.exp(nu * sqdt * e2 - 0.5 * nu * nu * dt)
        return (x_new, a_new), None

    x0 = jnp.full((num_paths,), f0, dtype=FLOAT_DTYPE)
    a0 = jnp.full((num_paths,), alpha, dtype=FLOAT_DTYPE)
    (x_t, _), _ = jax.lax.scan(step, (x0, a0), (z1, w2))
    return x_t


def mc_sabr_option_prices(params: SABRParams, forward: float,
                          maturity: float, strikes,
                          num_paths: int = 1_000_000,
                          num_steps: int = 64, seed: int = 1234,
                          antithetic: bool = True):
    """Undiscounted European call prices E[(F_T - K)+] under SABR by
    one fused MC program; returns (prices [K], mc_forward). Quotes are
    produced by inverting with the matching implied-vol convention."""
    d = params.displacement
    x_t = _sabr_terminal(
        jax.random.PRNGKey(seed), int(num_paths), int(num_steps),
        jnp.asarray(forward + d, dtype=FLOAT_DTYPE),
        jnp.asarray(params.alpha, dtype=FLOAT_DTYPE),
        jnp.asarray(params.beta, dtype=FLOAT_DTYPE),
        jnp.asarray(params.rho, dtype=FLOAT_DTYPE),
        jnp.asarray(params.nu, dtype=FLOAT_DTYPE),
        jnp.asarray(maturity / num_steps, dtype=FLOAT_DTYPE),
        bool(antithetic))
    ks = jnp.asarray(np.asarray(strikes, dtype=np.float64) + d,
                     dtype=ACC_DTYPE)

    @jax.jit
    def collect(x, ks):
        xa = x.astype(ACC_DTYPE)
        pay = jnp.maximum(xa[None, :] - ks[:, None], 0.0)
        # one packed transfer: [K prices, forward]
        return jnp.concatenate(
            [jnp.mean(pay, axis=1), jnp.mean(xa)[None]])

    out = np.asarray(collect(x_t, ks))
    return out[:-1], float(out[-1] - d)


@dataclass
class SABRCalibrationResult:
    params: SABRParams
    rms_vol_error: float
    iterations: int
    converged: bool


def calibrate_sabr(forward: float, maturity: float, strikes,
                   vols, quote_type: str = "lognormal",
                   beta: float = 0.5, displacement: float = 0.0,
                   x0: Optional[SABRParams] = None,
                   max_iterations: int = 200,
                   accuracy: float = 1e-10) -> SABRCalibrationResult:
    """Fit (alpha, rho, nu) at fixed beta/displacement to one smile of
    implied vols (the market convention: beta is chosen, not fitted).
    Levenberg-Marquardt in an unconstrained chart (log alpha, atanh
    rho, log nu) on the Hagan expansion — microsecond residuals, FD
    Jacobian. quote_type: 'lognormal' (Black) or 'normal'
    (Bachelier)."""
    from .calibration import LevenbergMarquardt

    if quote_type not in ("lognormal", "normal"):
        raise ValueError("quote_type must be 'lognormal' or 'normal'")
    ks = np.asarray(strikes, dtype=np.float64)
    target = np.asarray(vols, dtype=np.float64)
    if ks.shape != target.shape or ks.size < 3:
        raise ValueError("need >= 3 (strike, vol) pairs of equal length")
    fn = (sabr_lognormal_implied_volatility if quote_type == "lognormal"
          else sabr_normal_implied_volatility)

    def unpack(y):
        return SABRParams(alpha=math.exp(y[0]), beta=beta,
                          rho=math.tanh(y[1]), nu=math.exp(y[2]),
                          displacement=displacement)

    def residuals(y):
        p = unpack(y)
        return np.asarray([fn(p, forward, k, maturity) for k in ks]) \
            - target

    def jacobian(y):
        h = 1e-7
        cols = []
        for i in range(3):
            yp, ym = y.copy(), y.copy()
            yp[i] += h
            ym[i] -= h
            cols.append((residuals(yp) - residuals(ym)) / (2 * h))
        return np.stack(cols, axis=1)

    if x0 is None:
        # alpha from the ATM quote's leading term
        atm = float(np.interp(forward, ks, target))
        fpd = forward + displacement
        alpha0 = (atm * fpd ** (1.0 - beta) if quote_type == "lognormal"
                  else atm / fpd ** beta)
        x0 = SABRParams(alpha=max(alpha0, 1e-6), beta=beta, rho=0.0,
                        nu=0.5, displacement=displacement)
    y0 = np.array([math.log(x0.alpha), math.atanh(x0.rho),
                   math.log(max(x0.nu, 1e-8))])
    lm = LevenbergMarquardt(residuals, jacobian,
                            max_iterations=max_iterations,
                            accuracy=accuracy,
                            lower_bound=-np.inf, upper_bound=np.inf)
    res = lm.run(y0)
    p = unpack(res.parameters)
    return SABRCalibrationResult(
        params=p,
        rms_vol_error=float(
            np.sqrt(np.mean(residuals(res.parameters) ** 2))),
        iterations=res.iterations, converged=res.converged)


def mc_sabr_implied_vols(params: SABRParams, forward: float,
                         maturity: float, strikes,
                         quote_type: str = "lognormal",
                         **mc_kwargs):
    """MC smile in the requested quote convention (the validation hook
    for the Hagan expansion)."""
    prices, _ = mc_sabr_option_prices(params, forward, maturity, strikes,
                                      **mc_kwargs)
    inv = (black_implied_volatility if quote_type == "lognormal"
           else bachelier_implied_volatility)
    d = params.displacement if quote_type == "lognormal" else 0.0
    out = []
    for k, p in zip(np.asarray(strikes, dtype=np.float64), prices):
        if quote_type == "lognormal":
            # displaced quotes invert on the shifted pair
            out.append(inv(forward + d, k + d, maturity, float(p)))
        else:
            out.append(inv(forward, k, maturity, float(p)))
    return np.asarray(out)
