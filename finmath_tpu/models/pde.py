"""Finite-difference (PDE) pricing layer — batched theta-scheme on TPU.

TPU-native analog of finmath-lib's ``net.finmath.finitedifference``
package (``FDMThetaMethod``, ``FDMBlackScholesModel``,
``FDMConstantElasticityOfVarianceModel``, ``FDMEuropeanCallOption`` /
``FDMEuropeanPutOption``), which the CUDA extensions repo inherits as a
host-side capability; a finmath user migrating here expects it.  Design
departures from the Java original:

* The backward induction is one ``lax.scan`` over time steps; each step
  assembles the theta-scheme tridiagonal system for EVERY batch element
  (strike / volatility / scenario) at once and solves it with the
  O(log n)-depth associative-scan Thomas solver
  (`finmath_tpu.ops.tridiagonal`).  A strike strip or a vol ladder is ONE
  compiled program, not a Java loop of solves.
* Everything is float64: the solves are elementwise arithmetic, which
  TPU's emulated f64 supports (no LuDecomposition involved), and grids
  are tiny next to MC path arrays, so the 3x elementwise cost is noise.
* The solver is differentiable end-to-end — vega/rho come from
  ``jax.grad`` straight through the time scan and the tridiagonal
  prefix scans, instead of bump-and-reval.
* American exercise is an obstacle projection after each implicit step
  (Brennan-Schwartz-style operator splitting) with Rannacher start-up
  smoothing of the payoff kink.

Interior stencil: backward PDE  V_t + mu V_x + (sig2/2) V_xx - r V = 0,
central differences, theta-weighted in time (theta=0.5 Crank-Nicolson,
1.0 implicit Euler).  Boundary rows impose Gamma = 0 — linearity of V
in the UNDERLYING (Windcliff-Forsyth-Vetzal), not in the grid
coordinate — via a ghost-point substitution folded into the tridiagonal
row, so deep-ITM values track the exact forward parity S - K e^{-r tau}
on log grids, theta-weighted like the interior.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.tridiagonal import tridiagonal_matvec, tridiagonal_solve

__all__ = [
    "theta_scheme_solve",
    "FDMBlackScholesModel",
    "FDMConstantElasticityOfVarianceModel",
    "FDMLocalVolatilityModel",
    "FDMEuropeanCallOption",
    "FDMEuropeanPutOption",
    "FDMAmericanCallOption",
    "FDMAmericanPutOption",
    "FDMDigitalOption",
    "fdm_black_scholes_prices",
]


# ---------------------------------------------------------------------------
# core theta-scheme backward induction
# ---------------------------------------------------------------------------

def _assemble_rows(mu, sig2, r, dx, g_top, g_bot):
    """Spatial-operator tridiagonal rows with the Gamma=0 ghost
    substitution folded into the boundary rows: top ghost
    V_{n+1} = V_n + g_top (V_n - V_{n-1}), bottom ghost
    V_{-1} = V_0 + g_bot (V_0 - V_1); rows stay tridiagonal and get
    the SAME theta weighting as the interior."""
    lo_c = 0.5 * sig2 / dx ** 2 - mu / (2.0 * dx)
    up_c = 0.5 * sig2 / dx ** 2 + mu / (2.0 * dx)
    di_c = -sig2 / dx ** 2 - r
    LO = lo_c.at[..., -1].add(-g_top * up_c[..., -1])
    DI = (di_c.at[..., -1].add((1.0 + g_top) * up_c[..., -1])
              .at[..., 0].add((1.0 + g_bot) * lo_c[..., 0]))
    UP = up_c.at[..., 0].add(-g_bot * lo_c[..., 0])
    LO = LO.at[..., 0].set(0.0)
    UP = UP.at[..., -1].set(0.0)
    return LO, DI, UP


def _theta_core(terminal, mu, sig2, r, thetas, dx, dt, g_top, g_bot,
                obstacle, *, time_dep: bool):
    """Backward induction on plain arrays — the jit unit.

    ``mu/sig2/r`` carry a leading [steps] axis iff ``time_dep``;
    time-independent problems assemble the tridiagonal ONCE outside
    the scan, so the per-step work is just matvec + solve."""
    shape = jnp.broadcast_shapes(
        jnp.shape(terminal),
        jnp.shape(mu)[1:] if time_dep else jnp.shape(mu),
        jnp.shape(sig2)[1:] if time_dep else jnp.shape(sig2),
        jnp.shape(r)[1:] if time_dep else jnp.shape(r),
        (() if obstacle is None else jnp.shape(obstacle)))
    f64 = lambda a: jnp.asarray(a, dtype=jnp.float64)
    v0 = jnp.broadcast_to(f64(terminal), shape)

    def advance(v, th, LO, DI, UP):
        ex = (1.0 - th) * dt
        rhs = v + ex * tridiagonal_matvec(LO, DI, UP, v)
        im = th * dt
        v_new = tridiagonal_solve(-im * LO, 1.0 - im * DI, -im * UP, rhs)
        if obstacle is not None:
            v_new = jnp.maximum(v_new, obstacle)
        return v_new

    if time_dep:
        def step(v, xs):
            th, mu_t, sig2_t, r_t = xs
            LO, DI, UP = _assemble_rows(
                jnp.broadcast_to(f64(mu_t), shape),
                jnp.broadcast_to(f64(sig2_t), shape),
                jnp.broadcast_to(f64(r_t), shape), dx, g_top, g_bot)
            return advance(v, th, LO, DI, UP), None

        v, _ = lax.scan(step, v0, (thetas, f64(mu), f64(sig2), f64(r)))
    else:
        LO, DI, UP = _assemble_rows(jnp.broadcast_to(f64(mu), shape),
                                    jnp.broadcast_to(f64(sig2), shape),
                                    jnp.broadcast_to(f64(r), shape),
                                    dx, g_top, g_bot)
        v, _ = lax.scan(lambda v, th: (advance(v, th, LO, DI, UP), None),
                        v0, thetas)
    return v


# One compiled program per (shapes, time_dep, projected, backend) — models
# and products all funnel into this cache, so repeated pricing never
# retraces.  backend=None is the session default (TPU under axon).
_CORE_JIT = {}


def _core_call(backend, time_dep, *args):
    key = (backend, time_dep)
    if key not in _CORE_JIT:
        f = partial(_theta_core, time_dep=time_dep)
        kw = {} if backend is None else {"backend": backend}
        _CORE_JIT[key] = jax.jit(f, **kw)
    return _CORE_JIT[key](*args)


def _is_traced(*vals) -> bool:
    return any(isinstance(v, jax.core.Tracer) for v in vals)


# Below this many grid values a CPU solve (~7 ms for one 401-point
# option) beats the flat ~40-60 ms tunnel-RTT + emulated-f64 floor of
# the remote TPU; batches ride the TPU (81x401 strip: 39 ms TPU vs
# 590 ms CPU, measured).  Only consulted when the default backend is
# not already CPU.
_CPU_AUTO_THRESHOLD = 2048


def _host_payoff(payoff_fn, spots: np.ndarray) -> np.ndarray:
    """Evaluate a (jnp-based) payoff on the HOST CPU device and return
    numpy.  Without the pin, ``jnp.maximum(np_spots, k)`` commits the
    terminal array to the default device — one tunnel upload plus one
    readback per solve on the remote TPU (measured ~35 ms of the 46 ms
    single-solve wall)."""
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(payoff_fn(spots))


def theta_scheme_solve(x: jax.Array,
                       terminal: jax.Array,
                       coeff_fn: Optional[Callable[[jax.Array],
                                                   Tuple[jax.Array, jax.Array,
                                                         jax.Array]]],
                       maturity: float,
                       num_timesteps: int,
                       theta: float = 0.5,
                       rannacher: int = 2,
                       obstacle: Optional[jax.Array] = None,
                       underlying: Optional[jax.Array] = None,
                       coeffs: Optional[Tuple] = None,
                       backend: Optional[str] = "auto") -> jax.Array:
    """Solve V_t + mu V_x + (sig2/2) V_xx - r V = 0 backward from
    ``terminal`` at ``maturity`` to time 0 on the uniform grid ``x``
    (last axis; leading axes of ``terminal`` and of the coefficient
    arrays are batch).

    Coefficients, one of:

    * ``coeffs=(mu, sig2, r)`` — TIME-INDEPENDENT arrays broadcastable
      to ``[..., len(x)]``.  The fast path: the tridiagonal assembles
      once outside the time scan, and the whole induction is one cached
      jitted program (no retrace across model instances).
    * ``coeff_fn(t) -> (mu, sig2, r)`` — evaluated (vmapped) on the
      step-midpoint grid, second-order for Crank-Nicolson; the
      evaluation is eager, the induction jitted.

    The first ``rannacher`` steps run fully implicit (theta=1) to damp
    the terminal kink.  ``obstacle`` (same shape rules as ``terminal``)
    turns the scheme into the projected variant: V = max(V, obstacle)
    after every step — American exercise.

    ``underlying`` is S(x) on the grid (e.g. exp(x) for a log grid);
    boundary rows impose linearity of V in it (Gamma = 0) through a
    ghost point extrapolated quadratically in x, exact for payoffs that
    become affine in S at the edges.  Default: the grid itself, which
    reduces to the classic V_xx = 0 condition.

    ``backend``: "auto" (default) pins solves below ~2k grid values to
    the host CPU — a single small grid is dispatch-bound on the remote
    TPU — and leaves batches on the default device; None/"cpu"/"tpu"
    force a choice.  Inside a jit trace the setting is ignored and the
    solve inlines into the caller's program (so ``jax.grad`` /
    ``vmap`` / outer jits work untouched).
    """
    dt = maturity / num_timesteps
    steps = np.arange(num_timesteps)
    t_mid = maturity - (steps + 0.5) * dt
    thetas_np = np.where(steps < rannacher, 1.0, float(theta))

    if coeffs is not None:
        mu, sig2, r = coeffs
        time_dep = False
    elif coeff_fn is not None:
        mu, sig2, r = jax.vmap(coeff_fn)(jnp.asarray(t_mid))
        time_dep = True
    else:
        raise ValueError("provide coeffs=(mu, sig2, r) or coeff_fn")

    # Gamma=0 ghost-point folding factors (scalars, computed once).
    # Ghost underlying is the quadratic x-extrapolation of S(x): exact
    # for linear grids (g = 1 -> V_xx = 0) and second-order accurate
    # for exponential ones (g = 2 - e^{-dx} = e^{dx} + O(dx^3)).
    s = x if underlying is None else underlying
    traced = _is_traced(x, terminal, mu, sig2, r, s, obstacle)
    if traced:
        g_top = (s[-3] - 3.0 * s[-2] + 2.0 * s[-1]) / (s[-1] - s[-2])
        g_bot = (2.0 * s[0] - 3.0 * s[1] + s[2]) / (s[0] - s[1])
        dx = x[1] - x[0]
        thetas = jnp.asarray(thetas_np)
        return _theta_core(terminal, mu, sig2, r, thetas, dx, dt,
                           g_top, g_bot, obstacle, time_dep=time_dep)

    s_np = np.asarray(s, dtype=np.float64)
    g_top = float((s_np[-3] - 3.0 * s_np[-2] + 2.0 * s_np[-1])
                  / (s_np[-1] - s_np[-2]))
    g_bot = float((2.0 * s_np[0] - 3.0 * s_np[1] + s_np[2])
                  / (s_np[0] - s_np[1]))
    dx = float(np.asarray(x)[1] - np.asarray(x)[0])

    if backend == "auto":
        small = np.size(terminal) <= _CPU_AUTO_THRESHOLD
        backend = "cpu" if (small and jax.default_backend() != "cpu") else None
    elif backend == "tpu":
        backend = None
    if backend == "cpu":
        # keep inputs host-side so the CPU program doesn't drag
        # device->host transfers into every call
        conv = lambda a: None if a is None else np.asarray(a)
        terminal, mu, sig2, r, obstacle = map(
            conv, (terminal, mu, sig2, r, obstacle))
    return _core_call(backend, time_dep, terminal, mu, sig2, r,
                      thetas_np, dx, dt, g_top, g_bot, obstacle)


# ---------------------------------------------------------------------------
# models: grid construction + PDE coefficients
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FDMBlackScholesModel:
    """Black-Scholes FDM model on a uniform LOG-spot grid.

    Mirrors finmath-lib ``FDMBlackScholesModel`` (numTimesteps,
    numSpacesteps, numStandardDeviations, center, theta, initialValue,
    riskFreeRate, volatility); solving in x = log S makes the
    coefficients constant, so the implicit matrix assembles once per
    step regardless of batch width."""

    num_timesteps: int
    num_spacesteps: int
    num_standard_deviations: float
    center: float
    theta: float
    initial_value: float
    risk_free_rate: float
    volatility: float
    dividend_yield: float = 0.0
    rannacher: int = 2

    def grid(self, maturity: float) -> np.ndarray:
        drift = (self.risk_free_rate - self.dividend_yield
                 - 0.5 * self.volatility ** 2)
        width = (self.num_standard_deviations * self.volatility
                 * math.sqrt(maturity) + abs(drift) * maturity)
        # host numpy: grid construction must not cost tunnel dispatches
        return np.linspace(math.log(self.center) - width,
                           math.log(self.center) + width,
                           self.num_spacesteps + 1, dtype=np.float64)

    def coefficient_arrays(self, x) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
        mu = (self.risk_free_rate - self.dividend_yield
              - 0.5 * self.volatility ** 2)
        ones = np.ones(np.shape(x)[-1])
        return (mu * ones, self.volatility ** 2 * ones,
                self.risk_free_rate * ones)

    def coefficients(self, x):
        def coeff_fn(t):
            del t
            mu, sig2, r = self.coefficient_arrays(x)
            return jnp.asarray(mu), jnp.asarray(sig2), jnp.asarray(r)

        return coeff_fn

    def spots(self, x) -> np.ndarray:
        return np.exp(np.asarray(x))

    def solve(self, maturity: float, payoff_fn, american: bool = False,
              backend: Optional[str] = "auto"):
        x = self.grid(maturity)
        spots = np.exp(x)
        terminal = _host_payoff(payoff_fn, spots)
        v = theta_scheme_solve(
            x, terminal, None, maturity,
            self.num_timesteps, theta=self.theta, rannacher=self.rannacher,
            obstacle=terminal if american else None, underlying=spots,
            coeffs=self.coefficient_arrays(x), backend=backend)
        return spots, np.asarray(v)


@dataclass(frozen=True)
class FDMConstantElasticityOfVarianceModel:
    """CEV model dS = r S dt + sigma S^beta dW on a uniform SPOT grid.

    Mirrors finmath-lib ``FDMConstantElasticityOfVarianceModel``.  The
    grid is [low, high] around ``center`` with a lognormal-equivalent
    spread from sigma * center^(beta-1); at S=0 (beta<1) drift and
    diffusion vanish and the boundary row degenerates to pure
    discounting, which the linearity rows reproduce exactly."""

    num_timesteps: int
    num_spacesteps: int
    num_standard_deviations: float
    center: float
    theta: float
    initial_value: float
    risk_free_rate: float
    volatility: float
    exponent: float  # beta
    rannacher: int = 2

    def grid(self, maturity: float) -> np.ndarray:
        vol_ln = self.volatility * self.center ** (self.exponent - 1.0)
        spread = (self.num_standard_deviations * vol_ln
                  * math.sqrt(maturity))
        low = max(self.center * math.exp(-spread), 0.0)
        high = self.center * math.exp(spread)
        return np.linspace(low, high, self.num_spacesteps + 1,
                           dtype=np.float64)

    def coefficient_arrays(self, s) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
        s = np.asarray(s, dtype=np.float64)
        mu = self.risk_free_rate * s
        sig2 = (self.volatility ** 2) * s ** (2.0 * self.exponent)
        return mu, sig2, np.full_like(s, self.risk_free_rate)

    def coefficients(self, s):
        def coeff_fn(t):
            del t
            mu, sig2, r = self.coefficient_arrays(s)
            return jnp.asarray(mu), jnp.asarray(sig2), jnp.asarray(r)

        return coeff_fn

    def spots(self, s) -> np.ndarray:
        return np.asarray(s)

    def solve(self, maturity: float, payoff_fn, american: bool = False,
              backend: Optional[str] = "auto"):
        s = self.grid(maturity)
        terminal = _host_payoff(payoff_fn, s)
        v = theta_scheme_solve(
            s, terminal, None, maturity,
            self.num_timesteps, theta=self.theta, rannacher=self.rannacher,
            obstacle=terminal if american else None, underlying=s,
            coeffs=self.coefficient_arrays(s), backend=backend)
        return s, np.asarray(v)


@dataclass(frozen=True)
class FDMLocalVolatilityModel:
    """Dupire local-volatility backward PDE on the log-spot grid.

    sigma_loc^2(x, t) comes from the same ``local_variance`` autodiff
    extractor the MC `LocalVolatilityModel` uses
    (`models/local_vol.py`), so PDE and MC price the IDENTICAL local-vol
    dynamics — the PDE run is the noise-free oracle for the MC engine
    and vice versa.  No Java counterpart: finmath's FDM package stops at
    CEV; this is the capabilities-plus member of the family."""

    num_timesteps: int
    num_spacesteps: int
    num_standard_deviations: float
    theta: float
    initial_value: float
    risk_free_rate: float
    surface: object  # SSVISurface / DupireLocalVolSurface
    dividend_yield: float = 0.0
    reference_vol: float = 0.3  # grid-sizing scale
    t_floor: float = 1e-3
    min_variance: float = 1e-6
    max_variance: float = 16.0
    rannacher: int = 2

    def grid(self, maturity: float) -> np.ndarray:
        width = (self.num_standard_deviations * self.reference_vol
                 * math.sqrt(maturity)
                 + abs(self.risk_free_rate - self.dividend_yield)
                 * maturity)
        c = math.log(self.initial_value)
        return np.linspace(c - width, c + width,
                           self.num_spacesteps + 1, dtype=np.float64)

    def coefficients(self, x: jax.Array):
        from .local_vol import local_variance

        carry = self.risk_free_rate - self.dividend_yield
        logs0 = math.log(self.initial_value)

        xj = jnp.asarray(x)

        def coeff_fn(t):
            tt = jnp.maximum(t, self.t_floor)
            k = xj - logs0 - carry * tt
            v = local_variance(self.surface, k, tt)
            v = jnp.clip(v, self.min_variance, self.max_variance)
            mu = carry - 0.5 * v
            return mu, v, jnp.full_like(xj, self.risk_free_rate)

        return coeff_fn

    def spots(self, x) -> np.ndarray:
        return np.exp(np.asarray(x))

    def solve(self, maturity: float, payoff_fn, american: bool = False,
              backend: Optional[str] = "auto"):
        x = self.grid(maturity)
        spots = np.exp(x)
        terminal = _host_payoff(payoff_fn, spots)
        v = theta_scheme_solve(
            x, terminal, self.coefficients(x), maturity,
            self.num_timesteps, theta=self.theta, rannacher=self.rannacher,
            obstacle=terminal if american else None, underlying=spots,
            backend=backend)
        return spots, np.asarray(v)


# ---------------------------------------------------------------------------
# products (finmath FDM product surface)
# ---------------------------------------------------------------------------

class _FDMOption:
    """Shared getValue plumbing: returns (spots, values) grids like
    finmath's ``FDMEuropeanCallOption.getValue(time, model)`` double[][],
    plus an interpolated scalar at the model's initialValue."""

    american = False

    def __init__(self, maturity: float, strike: float):
        self.maturity = float(maturity)
        self.strike = float(strike)

    def payoff(self, spots: jax.Array) -> jax.Array:  # pragma: no cover
        raise NotImplementedError

    def get_value(self, evaluation_time: float, model):
        if evaluation_time != 0.0:
            raise NotImplementedError(
                "FDM products value at time 0 (as finmath's do)")
        return model.solve(self.maturity, self.payoff,
                           american=self.american)

    getValue = get_value

    def value(self, model) -> float:
        spots, values = self.get_value(0.0, model)
        return float(np.interp(model.initial_value, spots, values))


class FDMEuropeanCallOption(_FDMOption):
    def payoff(self, spots):
        return jnp.maximum(spots - self.strike, 0.0)


class FDMEuropeanPutOption(_FDMOption):
    def payoff(self, spots):
        return jnp.maximum(self.strike - spots, 0.0)


class FDMAmericanPutOption(FDMEuropeanPutOption):
    american = True


class FDMAmericanCallOption(FDMEuropeanCallOption):
    american = True


class FDMDigitalOption(_FDMOption):
    """Cash-or-nothing call: the payoff discontinuity is the stress test
    for the Rannacher start-up (oscillates badly under plain CN).

    The terminal condition is the CELL AVERAGE of the indicator (Pooley-
    Vetzal-Forsyth payoff averaging): a node's value is the fraction of
    its dual cell above the strike, which removes the O(dx) error from
    the strike landing between grid nodes."""

    def payoff(self, spots):
        mid = 0.5 * (spots[..., 1:] + spots[..., :-1])
        lower = jnp.concatenate([spots[..., :1], mid], axis=-1)
        upper = jnp.concatenate([mid, spots[..., -1:]], axis=-1)
        return jnp.clip((upper - self.strike) / (upper - lower), 0.0, 1.0)


# ---------------------------------------------------------------------------
# batched strike-strip pricer (one compiled solve for the whole strip)
# ---------------------------------------------------------------------------

def fdm_black_scholes_prices(initial_value: float, risk_free_rate: float,
                             volatility, maturity: float,
                             strikes: Sequence[float],
                             is_call: bool = True,
                             dividend_yield: float = 0.0,
                             american: bool = False,
                             num_timesteps: int = 200,
                             num_spacesteps: int = 400,
                             num_standard_deviations: float = 8.0,
                             theta: float = 0.5,
                             backend: Optional[str] = "auto") -> np.ndarray:
    """Price a whole strike strip (and optionally a vol ladder:
    ``volatility`` may be scalar or ``[n_vols, 1]``-shaped) in ONE
    theta-scheme solve — the batch rides the tridiagonal solver's
    leading axes.  Returns values interpolated at ``initial_value``,
    shape = broadcast(strikes, volatility)."""
    strikes = np.asarray(strikes, dtype=np.float64)
    vol = np.asarray(volatility, dtype=np.float64)
    sig2 = vol ** 2
    mu = risk_free_rate - dividend_yield - 0.5 * sig2
    vol_max = float(np.max(vol))
    width = (num_standard_deviations * vol_max * math.sqrt(maturity)
             + abs(risk_free_rate - dividend_yield) * maturity)
    x = np.linspace(math.log(initial_value) - width,
                    math.log(initial_value) + width,
                    num_spacesteps + 1, dtype=np.float64)
    spots = np.exp(x)
    sign = 1.0 if is_call else -1.0
    terminal = np.maximum(sign * (spots - strikes[..., None]), 0.0)

    ones = np.ones_like(x)
    coeffs = (np.asarray(mu)[..., None] * ones if np.ndim(mu) else mu * ones,
              np.asarray(sig2)[..., None] * ones if np.ndim(sig2)
              else sig2 * ones,
              np.full_like(x, risk_free_rate))

    v = theta_scheme_solve(x, terminal, None, maturity, num_timesteps,
                           theta=theta,
                           obstacle=terminal if american else None,
                           underlying=spots, coeffs=coeffs, backend=backend)
    # interpolate every batch row at the initial value (host side: v is
    # read back once, the interpolation is a scalar weight)
    v = np.asarray(v)
    xq = math.log(initial_value)
    idx = int(np.clip(np.searchsorted(x, xq) - 1, 0, x.shape[0] - 2))
    w = (xq - x[idx]) / (x[idx + 1] - x[idx])
    return v[..., idx] * (1.0 - w) + v[..., idx + 1] * w
