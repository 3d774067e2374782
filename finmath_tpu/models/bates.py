"""Bates (1996) stochastic-volatility jump-diffusion: Heston variance
plus lognormal jumps in the asset — the standard equity model family
combining smile dynamics (stochastic vol) with short-dated skew
(jumps).

Capability map: finmath-lib ships Bates as a characteristic function
(``net.finmath.fouriermethod.models.BatesModel``) priced by its Fourier
layer; the reference's device layer (SURVEY.md §2 #1/#3) exists to run
the corresponding Monte-Carlo dynamics on the accelerator. Here both
legs are first class: the host-side CF (composed from the framework's
Heston and Merton CFs, models/fourier.py) is the oracle, and a fused
TPU kernel simulates the full dynamics

    dS = (r - lam kappa_J) S dt + sqrt(V) S dW_S + (e^J - 1) S dN
    dV = kappa (theta - V) dt + xi sqrt(V) dW_V,  d<W_S,W_V> = rho dt
    J ~ Normal(a, b),  N ~ Poisson(lam),  kappa_J = e^{a + b^2/2} - 1

TPU-first notes:

* One fused graph per pricing call: Threefry draws -> lax.scan over
  (log S, V) with full-truncation variance (Lord et al.) and BRANCHLESS
  Poisson jump counts (the static-cap inverse-CDF sampler shared with
  the Merton engine, models/merton.py:148 — no rejection loops, no
  dynamic shapes) -> strike-vector payoffs -> f64 means, one transfer.
* Sum of n iid Normal(a, b) log-jumps is sampled exactly as
  Normal(n a, b sqrt(n)) — one normal per (path, step) regardless of
  the jump count.
* The CF factorizes exactly: phi_Bates = phi_Heston x phi_jumps with
  phi_jumps(u) = exp(lam T (e^{iua - b^2 u^2/2} - 1) - iu lam kappa_J T);
  the Gil-Pelaez pricer's phi(-i) martingale assertion then checks the
  COMPOSED drift (a compensator bug cannot hide).

Validation strategy (tests/test_bates.py): CF degenerations (lam -> 0
is Heston, xi -> 0 with v0 = theta is Merton, both CFs already
independently validated), MC vs CF across strikes, the martingale
diagnostic, and the facade pricing the equity product zoo.
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
from .fourier import CharacteristicFunction, european_call_from_cf, heston_cf
from .heston import HestonParams
from .merton import _poisson_icdf_branchless
from .time_discretization import TimeDiscretization


@dataclass(frozen=True)
class BatesParams:
    """Heston diffusion parameters plus the Merton jump triple."""

    initial_value: float
    risk_free_rate: float
    v0: float
    kappa: float
    theta: float
    xi: float
    rho: float
    jump_intensity: float
    jump_size_mean: float
    jump_size_std: float

    def __post_init__(self):
        # reuse the Heston validation (raises on bad diffusion params)
        _ = self.heston
        if self.jump_intensity < 0 or self.jump_size_std < 0:
            raise ValueError("need jump_intensity >= 0 and "
                             "jump_size_std >= 0")

    @property
    def heston(self) -> HestonParams:
        return HestonParams(self.initial_value, self.risk_free_rate,
                            self.v0, self.kappa, self.theta, self.xi,
                            self.rho)

    @property
    def jump_compensator(self) -> float:
        """kappa_J = E[e^J] - 1."""
        return math.expm1(self.jump_size_mean
                          + 0.5 * self.jump_size_std ** 2)


# ---------------------------------------------------------------------------
# characteristic function (host f64 complex — the pricing oracle)
# ---------------------------------------------------------------------------

def bates_cf(params: BatesParams, maturity: float) -> CharacteristicFunction:
    """phi(u) = E[e^{iu ln S_T}]: the Heston CF (already carrying the
    r-drift martingale) times the compensated compound-Poisson factor.
    phi(-i) = S0 e^{rT} survives the composition exactly — the jump
    factor is 1 at u = -i by construction."""
    h = heston_cf(params.heston, maturity)
    lam = params.jump_intensity
    a, b = params.jump_size_mean, params.jump_size_std
    kj = params.jump_compensator

    def cf(u):
        u = np.asarray(u, dtype=np.complex128)
        jump = lam * maturity * (np.exp(1j * u * a - 0.5 * b * b * u * u)
                                 - 1.0) - 1j * u * lam * kj * maturity
        return h(u) * np.exp(jump)
    return cf


def bates_characteristic_prices(params: BatesParams, maturity: float,
                                strikes, is_call: bool = True,
                                num_nodes: int = 512,
                                upper: float = 400.0) -> np.ndarray:
    """European prices by Gil-Pelaez inversion of the Bates CF, with
    the martingale drift assertion active."""
    return european_call_from_cf(
        bates_cf(params, maturity), params.risk_free_rate, maturity,
        strikes, is_call=is_call, num_nodes=num_nodes, upper=upper,
        initial_value=params.initial_value)


# ---------------------------------------------------------------------------
# fused Monte-Carlo kernel
# ---------------------------------------------------------------------------

def _bates_step_factory(num_paths: int, half: int, max_jumps: int,
                        antithetic: bool, dtype,
                        r, kappa, theta, xi, rho, lam, a, b, kj):
    """Shared scan body: full-truncation Heston Euler + branchless
    per-step jumps. Takes (log_s, v) carry and (key, dt) input."""
    rho_perp = jnp.sqrt(1.0 - rho * rho)

    def step(carry, inp):
        log_s, v = carry
        k, dt = inp
        k1_, k2_, kj_, ku_ = jax.random.split(k, 4)
        z1 = jax.random.normal(k1_, (half,), dtype=jnp.float32)
        z2 = jax.random.normal(k2_, (half,), dtype=jnp.float32)
        z_j = jax.random.normal(kj_, (half,), dtype=jnp.float32)
        u = jax.random.uniform(ku_, (half,), dtype=jnp.float32,
                               minval=1e-7, maxval=1.0 - 1e-7)
        if antithetic:
            z1 = jnp.concatenate([z1, -z1])
            z2 = jnp.concatenate([z2, -z2])
            z_j = jnp.concatenate([z_j, -z_j])
            u = jnp.concatenate([u, 1.0 - u])
        z1 = z1.astype(dtype)
        z2 = z2.astype(dtype)
        dt_ = dt.astype(dtype)
        sqrt_dt = jnp.sqrt(dt_)
        vp = jnp.maximum(v, 0.0)                      # full truncation
        sqrt_vp = jnp.sqrt(vp)
        n = _poisson_icdf_branchless(u.astype(ACC_DTYPE),
                                     (lam * dt).astype(ACC_DTYPE),
                                     max_jumps).astype(dtype)
        jump = n * a.astype(dtype) \
            + b.astype(dtype) * jnp.sqrt(n) * z_j.astype(dtype)
        dw_v = z1 * sqrt_dt
        dw_s = (rho * z1 + rho_perp * z2).astype(dtype) * sqrt_dt
        log_s = (log_s + (r - lam * kj - 0.5 * vp).astype(dtype) * dt_
                 + sqrt_vp * dw_s + jump)
        v = v + (kappa * (theta - vp)).astype(dtype) * dt_ \
            + (xi * sqrt_vp).astype(dtype) * dw_v
        return (log_s, v), log_s
    return step


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _mc_bates_kernel(key, num_paths: int, num_steps: int, max_jumps: int,
                     antithetic: bool, dtype,
                     s0, r, v0, kappa, theta, xi, rho, lam, a, b,
                     maturity, strikes):
    """One fused graph -> ``[2 + K]``: ``[E[S_T] e^{-rT}, E[V_T],
    call prices...]`` in a single transfer (tunnel RTT rule)."""
    dt = maturity / num_steps
    half = num_paths // 2 if antithetic else num_paths
    dtype = jnp.dtype(dtype)
    kj = jnp.expm1(a + 0.5 * b * b)
    step = _bates_step_factory(num_paths, half, max_jumps, antithetic,
                               dtype, r, kappa, theta, xi, rho, lam,
                               a, b, kj)
    keys = jax.random.split(key, num_steps)
    dts = jnp.full((num_steps,), dt)
    log_s = jnp.full((num_paths,), jnp.log(s0), dtype=dtype)
    v = jnp.full((num_paths,), v0, dtype=dtype)
    (log_s, v), _ = jax.lax.scan(step, (log_s, v), (keys, dts))
    st = exp32(log_s) if dtype == jnp.float32 else jnp.exp(log_s)
    df = jnp.exp(-r * maturity)
    fwd = jnp.sum(st.astype(ACC_DTYPE)) / num_paths * df
    var_t = jnp.sum(jnp.maximum(v, 0.0).astype(ACC_DTYPE)) / num_paths
    payoff = jnp.maximum(st[None, :] - strikes[:, None].astype(dtype), 0.0)
    prices = jnp.sum(payoff.astype(ACC_DTYPE), axis=1) / num_paths * df
    return jnp.concatenate([jnp.stack([fwd, var_t]), prices])


def _jump_tail_guard(lam_dt: float, max_jumps: int) -> None:
    k = np.arange(max_jumps + 1)
    log_pmf = -lam_dt + k * np.log(max(lam_dt, 1e-300)) \
        - np.cumsum(np.log(np.maximum(k, 1)))
    tail = 1.0 - np.exp(log_pmf).sum()
    if tail > 1e-9:
        raise ValueError(
            f"lam*dt = {lam_dt:.3g} leaves tail mass {tail:.2g} beyond "
            f"the jump cap {max_jumps}; raise num_steps or "
            "max_jumps_per_step")


def mc_bates_european_prices(params: BatesParams, maturity: float,
                             strikes, num_paths: int = 100_000,
                             num_steps: int = 64, seed: int = 3141,
                             antithetic: bool = False,
                             max_jumps_per_step: int = 16,
                             dtype=None):
    """European call prices for a strike vector in ONE fused device
    program. Returns ``(prices [K], discounted_forward, expected_var)``;
    the forward must equal S0 up to MC error (martingale diagnostic).

    ``dtype=jnp.float64`` runs the f64 oracle on the identical draw
    stream (the framework's parity contract)."""
    if antithetic and num_paths % 2:
        raise ValueError("antithetic needs an even num_paths")
    _jump_tail_guard(params.jump_intensity * maturity / num_steps,
                     max_jumps_per_step)
    strikes = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
    out = np.asarray(_mc_bates_kernel(
        jax.random.PRNGKey(seed), int(num_paths), int(num_steps),
        int(max_jumps_per_step), bool(antithetic),
        jnp.dtype(dtype if dtype is not None else FLOAT_DTYPE),
        jnp.float64(params.initial_value),
        jnp.float64(params.risk_free_rate),
        jnp.float64(params.v0), jnp.float64(params.kappa),
        jnp.float64(params.theta), jnp.float64(params.xi),
        jnp.float64(params.rho), jnp.float64(params.jump_intensity),
        jnp.float64(params.jump_size_mean),
        jnp.float64(params.jump_size_std),
        jnp.float64(maturity), jnp.asarray(strikes)))
    return out[2:], float(out[0]), float(out[1])


# ---------------------------------------------------------------------------
# object API facade (finmath MonteCarloAssetModel shape)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2, 3))
def _bates_path_history(key, num_paths: int, num_steps: int,
                        max_jumps: int, s0, r, v0, kappa, theta, xi,
                        rho, lam, a, b, dts):
    """Full log-price history [steps+1, paths] on the simulation grid —
    the facade's lazily cached state (finmath's process cache)."""
    kj = jnp.expm1(a + 0.5 * b * b)
    step = _bates_step_factory(num_paths, num_paths, max_jumps, False,
                               FLOAT_DTYPE, r, kappa, theta, xi, rho,
                               lam, a, b, kj)
    keys = jax.random.split(key, dts.shape[0])
    log_s0 = jnp.full((num_paths,), jnp.log(s0), dtype=FLOAT_DTYPE)
    v = jnp.full((num_paths,), v0, dtype=FLOAT_DTYPE)
    _, hist = jax.lax.scan(step, (log_s0, v), (keys, dts))
    return jnp.concatenate([log_s0[None], hist], axis=0)


class MonteCarloBatesModel:
    """``MonteCarloBlackScholesModel`` surface over Bates dynamics, so
    the equity product zoo (digitals, Asians, barriers, American LS,
    autocallables...) prices under stochastic vol + jumps unchanged."""

    def __init__(self, time_discretization: TimeDiscretization,
                 num_paths: int, params: BatesParams, seed: int = 3141,
                 max_jumps_per_step: int = 16):
        self.params = params
        self._td = time_discretization
        self._num_paths = int(num_paths)
        self._seed = int(seed)
        self._max_jumps = int(max_jumps_per_step)
        dts = np.asarray(time_discretization.get_step_sizes(),
                         dtype=np.float64)
        _jump_tail_guard(params.jump_intensity * float(dts.max()),
                         self._max_jumps)
        self._dts = jnp.asarray(dts)
        self._hist = None

    def _states(self) -> jax.Array:
        if self._hist is None:
            p = self.params
            self._hist = _bates_path_history(
                jax.random.PRNGKey(self._seed), self._num_paths,
                self._td.get_number_of_time_steps(), self._max_jumps,
                jnp.float64(p.initial_value),
                jnp.float64(p.risk_free_rate), jnp.float64(p.v0),
                jnp.float64(p.kappa), jnp.float64(p.theta),
                jnp.float64(p.xi), jnp.float64(p.rho),
                jnp.float64(p.jump_intensity),
                jnp.float64(p.jump_size_mean),
                jnp.float64(p.jump_size_std), self._dts)
        return self._hist

    def get_asset_value(self, time: float,
                        asset_index: int = 0) -> RandomVariableTPU:
        ti = self._td.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return RandomVariableTPU.of(time, exp32(self._states()[ti]))

    def get_asset_values(self, times, asset_index: int = 0) -> jax.Array:
        idx = []
        for t in times:
            ti = self._td.get_time_index(t)
            if ti < 0:
                raise ValueError(f"time {t} not on the simulation grid")
            idx.append(ti)
        return gather_exp32(self._states(), jnp.asarray(idx))

    def get_numeraire(self, time: float) -> RandomVariableTPU:
        return RandomVariableTPU(
            time, math.exp(self.params.risk_free_rate * time))

    def get_number_of_paths(self) -> int:
        return self._num_paths

    getAssetValue = get_asset_value
    getNumeraire = get_numeraire
    getNumberOfPaths = get_number_of_paths
