"""Dupire local-volatility model: SSVI implied surface -> exact-autodiff
local variance -> fused Euler MC, through the shared ``EulerScheme`` so
the entire equity product zoo prices under local volatility unchanged.

Capability map: finmath-lib ships local-volatility dynamics as model
classes around the reference (``net.finmath.montecarlo
.assetderivativevaluation.models.InhomogeneousDisplacedLognomalModel``,
the displaced/blended local-vol covariance wrappers the LMM benchmark
uses — LIBORMarketModelCalibrationTest.java:272-276 — and
``AnalyticFormulas`` smile machinery); a full Dupire surface model is
what its users assemble on top. The reference's device layer exists to
run exactly this kind of state-dependent per-path coefficient math on
the accelerator (SURVEY.md §2 #1/#3).

TPU-first notes:

* The implied surface is a smooth PARAMETRIC total-variance map
  w(k, T) (SSVI, Gatheral-Jacquier 2014), so Dupire's formula is
  evaluated with EXACT nested ``jax.jvp`` derivatives — no
  finite-difference stencils, no interpolation-grid noise, and the
  whole local-variance evaluation is pure fused VPU math inside the
  Euler ``lax.scan`` (compare the reference's per-op kernel-launch
  model, SURVEY.md §3.2). Any user-supplied jittable ``w(k, t)``
  works through ``DupireLocalVolSurface``.
* Dupire in total-variance form (Gatheral, The Volatility Surface,
  eq. 1.10):

      v_loc(k, T) = dw/dT / [ 1 - k/w dw/dk
                    + 1/4 (-1/4 - 1/w + k^2/w^2) (dw/dk)^2
                    + 1/2 d2w/dk2 ]

  with k = log(K / F_T) the forward log-moneyness. The denominator is
  the butterfly-arbitrage density factor: it is clamped at a small
  positive floor (grad-safely) so a mildly arbitrageable input surface
  degrades to capped variance instead of NaN paths.
* Path state is log S in f32 (framework storage contract); the
  per-step local-vol evaluation is one-shot (not an iterated
  accrual), so the few-ULP TPU transcendental bias documented in
  hedging.py does not accumulate through it. Reductions are f64.

Validation strategy (tests/test_local_vol.py): with eta = 0 the SSVI
surface is flat in strike and the model is EXACTLY Black-Scholes with
term vol sqrt(theta(T)/T) — a closed-form oracle; with skew on, the MC
must REPRICE the input surface: Black-inverting the MC vanilla prices
returns sigma_SSVI(k, T) within the MC/discretization error. That
round-trip (surface -> Dupire -> MC -> surface) exercises every term
of the formula.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise_math import exp32, gather_component_exp32
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariableTPU
from .brownian_motion import BrownianMotion
from .process import EulerScheme, ProcessModel
from .time_discretization import TimeDiscretization


# ---------------------------------------------------------------------------
# implied total-variance surfaces
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SSVISurface:
    """Gatheral-Jacquier SSVI total implied variance

        w(k, T) = theta(T)/2 * (1 + rho phi k + sqrt((phi k + rho)^2
                                                     + 1 - rho^2)),
        phi = eta / theta(T)^gamma,

    with the ATM total-variance backbone

        theta(T) = sigma_inf^2 T + (sigma0^2 - sigma_inf^2) tau
                   (1 - exp(-T / tau))

    (short-end ATM vol ``sigma0`` decaying to ``sigma_inf`` on scale
    ``tau`` — increasing in T whenever both vols are positive, so the
    backbone is calendar-arbitrage-free by construction).

    ``eta = 0`` gives a strike-flat surface (pure term structure);
    ``rho`` tilts the skew. All methods are jnp-traceable and accept
    scalars or arrays in ``k`` and ``t``.
    """

    sigma0: float
    sigma_inf: float
    tau: float
    rho: float
    eta: float
    gamma: float = 0.4

    def __post_init__(self):
        if not -1.0 < self.rho < 1.0:
            raise ValueError("need -1 < rho < 1")
        if self.eta < 0.0 or self.sigma0 <= 0.0 or self.sigma_inf <= 0.0:
            raise ValueError("need eta >= 0 and positive ATM vols")
        if not 0.0 < self.gamma < 1.0:
            raise ValueError("need 0 < gamma < 1")
        if self.tau <= 0.0:
            raise ValueError("need tau > 0")

    def theta(self, t):
        """ATM total variance backbone (increasing, theta(0) = 0)."""
        s0 = self.sigma0 * self.sigma0
        si = self.sigma_inf * self.sigma_inf
        return si * t + (s0 - si) * self.tau * (
            1.0 - jnp.exp(-t / self.tau))

    def total_variance(self, k, t):
        """w(k, t); k = log-moneyness vs the forward, t > 0."""
        th = self.theta(t)
        phi = self.eta * th ** (-self.gamma)
        x = phi * k
        return 0.5 * th * (
            1.0 + self.rho * x
            + jnp.sqrt((x + self.rho) ** 2 + 1.0 - self.rho * self.rho))

    def implied_volatility(self, k, t):
        return jnp.sqrt(self.total_variance(k, t) / t)

    def validate(self, t_max: float, n: int = 64) -> None:
        """Gatheral-Jacquier Thm 4.2 sufficient butterfly conditions,
        checked on a grid up to ``t_max`` (the backbone is calendar-free
        by construction): theta phi (1 + |rho|) <= 4 and
        theta phi^2 (1 + |rho|) <= 4. Raises ValueError on violation."""
        ts = np.linspace(t_max / n, t_max, n)
        th = np.asarray(jax.vmap(self.theta)(jnp.asarray(ts)))
        phi = self.eta * th ** (-self.gamma)
        lim = 4.0 / (1.0 + abs(self.rho))
        worst1 = float(np.max(th * phi))
        worst2 = float(np.max(th * phi * phi))
        if worst1 > lim or worst2 > lim:
            raise ValueError(
                f"SSVI butterfly condition violated up to t={t_max}: "
                f"max theta*phi={worst1:.3f}, max theta*phi^2={worst2:.3f}, "
                f"limit {lim:.3f}")


@dataclass(frozen=True)
class DupireLocalVolSurface:
    """Adapter for a user-supplied jittable total-variance function
    ``w(k, t)`` (both may be arrays); anything smooth works, e.g. a
    per-expiry SVI interpolation expressed in jnp."""

    w: Callable

    def total_variance(self, k, t):
        return self.w(k, t)

    def implied_volatility(self, k, t):
        return jnp.sqrt(self.w(k, t) / t)


# ---------------------------------------------------------------------------
# Dupire local variance by exact nested-jvp derivatives
# ---------------------------------------------------------------------------

def local_variance(surface, k, t, denominator_floor: float = 0.05):
    """Dupire local variance v_loc(k, t) from the total-variance surface,
    all three derivatives by exact forward-mode autodiff (nested
    ``jax.jvp`` — elementwise dual numbers, fully fusable on the VPU).

    ``k`` may be any array; ``t`` a scalar (in-scan use) or an array
    broadcastable against ``k``. The butterfly denominator is clamped at
    ``denominator_floor`` and dw/dT at 0 (grad-safe), so a surface with
    mild static arbitrage yields capped-but-finite variance."""
    k = jnp.asarray(k)
    t = jnp.asarray(t, dtype=k.dtype)
    ones_k = jnp.ones_like(k)

    def w_of_k(kk):
        return surface.total_variance(kk, jnp.broadcast_to(t, kk.shape)
                                      if t.ndim else t)

    w, wk = jax.jvp(w_of_k, (k,), (ones_k,))
    _, wkk = jax.jvp(lambda kk: jax.jvp(w_of_k, (kk,), (ones_k,))[1],
                     (k,), (ones_k,))
    tt = jnp.broadcast_to(t, k.shape) if t.ndim == 0 else t
    _, wt = jax.jvp(lambda s: surface.total_variance(k, s),
                    (tt,), (jnp.ones_like(tt),))

    kw = k / w
    denom = (1.0 - kw * wk
             + 0.25 * (-0.25 - 1.0 / w + kw * kw) * wk * wk
             + 0.5 * wkk)
    return jnp.maximum(wt, 0.0) / jnp.maximum(denom, denominator_floor)


# ---------------------------------------------------------------------------
# the ProcessModel
# ---------------------------------------------------------------------------

class LocalVolatilityModel(ProcessModel):
    """dS = (r - q) S dt + sigma_loc(S, t) S dW evolved in log
    coordinates: d log S = (r - q - v_loc/2) dt + sqrt(v_loc) dW with
    v_loc = Dupire local variance at (k_t, t),
    k_t = log(S_t / F_t) = log S_t - log S0 - (r - q) t.

    The left-point Euler coefficient uses t floored at ``t_floor``
    (default: half the first step) because w(., 0) = 0 makes the raw
    formula 0/0 at the origin; the t -> 0 limit of v_loc is finite and
    the floor evaluates it just inside the surface. sqrt(v_loc) is
    clamped to [min_vol, max_vol] — the same grad-safe robustness
    pattern as the LMM's f32 overflow clamps."""

    def __init__(self, initial_value: float, risk_free_rate: float,
                 surface, time_discretization: TimeDiscretization,
                 dividend_yield: float = 0.0,
                 min_vol: float = 1e-4, max_vol: float = 4.0,
                 t_floor: Optional[float] = None,
                 denominator_floor: float = 0.05):
        self.initial_value = float(initial_value)
        self.risk_free_rate = float(risk_free_rate)
        self.dividend_yield = float(dividend_yield)
        self.surface = surface
        self.min_vol = float(min_vol)
        self.max_vol = float(max_vol)
        self.denominator_floor = float(denominator_floor)
        td = time_discretization
        n = td.get_number_of_time_steps()
        times = np.asarray([td.get_time(i) for i in range(n + 1)])
        if t_floor is None:
            t_floor = 0.5 * float(times[1] - times[0])
        self.t_floor = float(t_floor)
        # left-point coefficient times, floored away from w(.,0)=0
        coeff_times = np.maximum(times[:-1], self.t_floor)
        self._coeff_times = jnp.asarray(coeff_times, dtype=FLOAT_DTYPE)
        # value-based identity so equal-config fresh instances share the
        # EulerScheme's compiled scan (no retrace per pricing call)
        self._static_key = (
            self.initial_value, self.risk_free_rate, self.dividend_yield,
            surface, self.min_vol, self.max_vol, self.denominator_floor,
            self.t_floor, tuple(float(t) for t in coeff_times))

    def __hash__(self):
        return hash(self._static_key)

    def __eq__(self, other):
        return (isinstance(other, LocalVolatilityModel)
                and self._static_key == other._static_key)

    def get_number_of_components(self) -> int:
        return 1

    def get_number_of_factors(self) -> int:
        return 1

    def initial_state(self, num_paths: int) -> jax.Array:
        return jnp.full((1, num_paths), math.log(self.initial_value),
                        dtype=FLOAT_DTYPE)

    def _local_vol(self, time_index, state: jax.Array) -> jax.Array:
        t = self._coeff_times[time_index]
        carry = jnp.asarray(self.risk_free_rate - self.dividend_yield,
                            dtype=state.dtype)
        k = state - jnp.asarray(math.log(self.initial_value),
                                dtype=state.dtype) - carry * t
        v = local_variance(self.surface, k, t,
                           denominator_floor=self.denominator_floor)
        return jnp.clip(jnp.sqrt(jnp.maximum(v, 0.0)),
                        self.min_vol, self.max_vol)

    def drift(self, time_index, state: jax.Array) -> jax.Array:
        sig = self._local_vol(time_index, state)
        return (self.risk_free_rate - self.dividend_yield
                - 0.5 * sig * sig)

    def factor_loadings(self, time_index, state: jax.Array) -> jax.Array:
        sig = self._local_vol(time_index, state)
        return sig[:, None, :]

    def apply_state_space_transform(self, component: int,
                                    x: jax.Array) -> jax.Array:
        return exp32(x)

    def numeraire(self, time: float) -> RandomVariableTPU:
        return RandomVariableTPU(
            time, math.exp(self.risk_free_rate * time))


class MonteCarloLocalVolModel:
    """Simulation facade (the ``MonteCarloBlackScholesModel`` surface),
    so every equity product — digital, Asian, barrier, lookback,
    Bermudan LS, forward-start, autocallable — prices under local
    volatility unchanged."""

    def __init__(self, time_discretization: TimeDiscretization,
                 num_paths: int, model: LocalVolatilityModel,
                 seed: int = 3141, brownian: BrownianMotion = None,
                 mesh=None):
        self.model = model
        self.brownian = brownian or BrownianMotion(
            time_discretization, 1, num_paths, seed)
        self.process = EulerScheme(model, self.brownian, mesh=mesh)

    def get_asset_value(self, time: float,
                        asset_index: int = 0) -> RandomVariableTPU:
        ti = self.process.time_discretization.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return self.process.get_process_value(ti, asset_index)

    def get_asset_values(self, times, asset_index: int = 0) -> jax.Array:
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

    def get_number_of_paths(self) -> int:
        return self.process.get_number_of_paths()

    getAssetValue = get_asset_value
    getNumeraire = get_numeraire
    getNumberOfPaths = get_number_of_paths


# ---------------------------------------------------------------------------
# fused vanilla-grid pricer (for surface round-trip validation / bench)
# ---------------------------------------------------------------------------

@jax.jit
def _vanilla_grid_kernel(assets, dfs, strikes):
    """[expiries, paths] asset matrix x [strikes] -> packed
    [expiries, strikes, 2] f64 (value, stderr) in ONE program / ONE
    transfer (the tunnel transfer rule)."""
    pay = jnp.maximum(assets[:, None, :] - strikes[None, :, None], 0.0)
    p = pay.astype(ACC_DTYPE) * dfs[:, None, None]
    n = p.shape[-1]
    mean = jnp.sum(p, axis=-1) / n
    var = jnp.sum((p - mean[..., None]) ** 2, axis=-1) / (n - 1)
    return jnp.stack([mean, jnp.sqrt(var / n)], axis=-1)


def european_call_values(model, strikes: Sequence[float],
                         expiries: Sequence[float]) -> np.ndarray:
    """Discounted European call values (and MC stderr) for a full
    strike x expiry grid in one device program: [expiries, strikes, 2].
    Round-trip test: Black-invert these against the input surface."""
    from .equity_products import _deterministic_dfs
    assets = model.get_asset_values([float(t) for t in expiries])
    dfs = _deterministic_dfs(model, expiries)
    return np.asarray(_vanilla_grid_kernel(
        assets, jnp.asarray(dfs, dtype=ACC_DTYPE),
        jnp.asarray(np.asarray(strikes, dtype=np.float64),
                    dtype=FLOAT_DTYPE)))
