"""Commodity: the Schwartz-Smith two-factor model — short-term
mean-reverting deviations plus a long-term Brownian equilibrium level,
with the closed-form futures curve and options on futures, exact
Monte-Carlo simulation, and calendar-spread options (Margrabe exact at
zero strike).

Capability map: commodities are the remaining classic asset family
next to the equity/rates/FX/credit/inflation layers already in the
framework; Schwartz-Smith (Management Science 2000) is the market
standard. Under the risk-neutral measure:

  ln S(t) = chi(t) + xi(t)
  d chi = (-kappa chi - lambda_chi) dt + sigma_chi dW_chi
  d xi  = mu_star dt + sigma_xi dW_xi,      corr(W_chi, W_xi) = rho

Both factors are Gaussian, so:

* Futures: F(0,T) = E[S(T)] = exp(e^{-kT} chi0 + xi0 + A(T)) with the
  closed-form A(T) (risk-neutral drift + half total variance).
* Option on F(.,T) expiring at t: ln F(t,T) is Gaussian with the
  closed-form variance v^2(t,T) — Black-76.
* Calendar spread F(t,T1) - F(t,T2): two jointly lognormal legs with
  closed-form covariance — Margrabe EXACT at zero strike, MC for
  struck spreads.

TPU-first notes: the simulation is ONE lax.scan with the EXACT joint
per-step Gaussian transition of (chi, xi) (host-precomputed 2x2
Cholesky per step — the same design as ``hull_white.py`` and
``cross_currency.py``); pricers are fused device programs with
f64-accumulated means + stderrs packed into one transfer."""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariableTPU
from .analytic import _norm_cdf
from .time_discretization import TimeDiscretization


class SchwartzSmithModel:
    """Parameters: chi0/xi0 initial factors, kappa > 0 mean reversion,
    sigma_chi/sigma_xi > 0, rho in (-1, 1), mu_star the risk-neutral
    equilibrium drift, lambda_chi the short-term risk premium (enters
    the risk-neutral chi drift)."""

    def __init__(self, chi0: float, xi0: float, kappa: float,
                 sigma_chi: float, sigma_xi: float, rho: float,
                 mu_star: float = 0.0, lambda_chi: float = 0.0):
        if kappa <= 0 or sigma_chi <= 0 or sigma_xi <= 0:
            raise ValueError("kappa and volatilities must be positive")
        if not -1.0 < rho < 1.0:
            raise ValueError("rho must be in (-1, 1)")
        self.chi0 = float(chi0)
        self.xi0 = float(xi0)
        self.kappa = float(kappa)
        self.s_chi = float(sigma_chi)
        self.s_xi = float(sigma_xi)
        self.rho = float(rho)
        self.mu_star = float(mu_star)
        self.lam = float(lambda_chi)

    # ------------------------------------------------------------------
    def _a(self, tau) -> np.ndarray:
        """A(tau): risk-neutral drift of ln S plus half its variance."""
        tau = np.asarray(tau, dtype=np.float64)
        k = self.kappa
        e = np.exp(-k * tau)
        var = (self.s_chi ** 2 * (1.0 - e * e) / (2.0 * k)
               + self.s_xi ** 2 * tau
               + 2.0 * self.rho * self.s_chi * self.s_xi
               * (1.0 - e) / k)
        return (self.mu_star * tau - self.lam * (1.0 - e) / k
                + 0.5 * var)

    def futures_price(self, maturity) -> np.ndarray:
        """F(0, T) = E^Q[S(T)] (commodity futures carry no discounting
        in the martingale identity: the futures price IS the
        expectation)."""
        tau = np.asarray(maturity, dtype=np.float64)
        return np.exp(np.exp(-self.kappa * tau) * self.chi0 + self.xi0
                      + self._a(tau))

    def log_futures_covariance(self, t: float, mat1: float,
                               mat2: float) -> float:
        """Cov[ln F(t, T1), ln F(t, T2)] — ln F(t,T) = e^{-k(T-t)}
        chi(t) + xi(t) + A(T-t), so everything follows from the factor
        covariances at t."""
        if t < 0 or mat1 < t or mat2 < t:
            raise ValueError("need 0 <= t <= maturities")
        k = self.kappa
        v_chi = self.s_chi ** 2 * (1.0 - math.exp(-2 * k * t)) / (2 * k)
        v_xi = self.s_xi ** 2 * t
        c = self.rho * self.s_chi * self.s_xi \
            * (1.0 - math.exp(-k * t)) / k
        b1 = math.exp(-k * (mat1 - t))
        b2 = math.exp(-k * (mat2 - t))
        return b1 * b2 * v_chi + v_xi + (b1 + b2) * c

    def log_futures_variance(self, t: float, maturity: float) -> float:
        return self.log_futures_covariance(t, maturity, maturity)

    def option_on_future(self, expiry: float, maturity: float,
                         strike: float, discount_factor: float = 1.0,
                         is_call: bool = True) -> float:
        """European option expiring at ``expiry`` on F(expiry,
        ``maturity``): Black-76 with the closed-form v^2 (F(t,T) is a
        Q-martingale, lognormal)."""
        if not 0.0 < expiry <= maturity:
            raise ValueError("need 0 < expiry <= maturity")
        f = float(self.futures_price(maturity))
        v2 = self.log_futures_variance(expiry, maturity)
        sp = math.sqrt(max(v2, 0.0))
        if sp < 1e-14:
            intrinsic = (f - strike) if is_call else (strike - f)
            return discount_factor * max(intrinsic, 0.0)
        d1 = (math.log(f / strike) + 0.5 * v2) / sp
        d2 = d1 - sp
        if is_call:
            return discount_factor * (f * _norm_cdf(d1)
                                      - strike * _norm_cdf(d2))
        return discount_factor * (strike * _norm_cdf(-d2)
                                  - f * _norm_cdf(-d1))

    def calendar_spread_margrabe(self, expiry: float, mat1: float,
                                 mat2: float,
                                 discount_factor: float = 1.0) -> float:
        """(F(t,T1) - F(t,T2))^+ at zero strike: Margrabe EXACT (both
        legs jointly lognormal with closed-form covariance)."""
        f1 = float(self.futures_price(mat1))
        f2 = float(self.futures_price(mat2))
        v = (self.log_futures_variance(expiry, mat1)
             + self.log_futures_variance(expiry, mat2)
             - 2.0 * self.log_futures_covariance(expiry, mat1, mat2))
        sp = math.sqrt(max(v, 1e-30))
        d1 = (math.log(f1 / f2) + 0.5 * v) / sp
        return discount_factor * (f1 * _norm_cdf(d1)
                                  - f2 * _norm_cdf(d1 - sp))


# ---------------------------------------------------------------------------
# exact simulation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2))
def _ss_scan(key, num_paths: int, antithetic: bool, e_k, l11, l21, l22,
             path_zero=None):
    """Exact per-step transition of the MEAN-ZERO factors:
    chi' = chi e^{-k dt} + l11 Z1; xi' = xi + l21 Z1 + l22 Z2
    (the deterministic means are exact host f64, added in the
    pricers). Histories [steps+1, paths].

    ``path_zero``: optional [num_paths] f32 zeros state template — a
    mesh-sharded one (NamedSharding over the path axis) partitions the
    scan and histories over the device mesh via XLA SPMD propagation on
    the identical partitionable-Threefry stream (the credit-layer
    pattern, models/credit.py _wwr_scan)."""
    half = num_paths // 2 if antithetic else num_paths

    def step(carry, inp):
        chi, xi = carry
        k, ek, a, b, c = inp
        k1, k2 = jax.random.split(k)
        z1 = jax.random.normal(k1, (half,), dtype=jnp.float32)
        z2 = jax.random.normal(k2, (half,), dtype=jnp.float32)
        if antithetic:
            z1 = jnp.concatenate([z1, -z1])
            z2 = jnp.concatenate([z2, -z2])
        z1 = z1.astype(FLOAT_DTYPE)
        z2 = z2.astype(FLOAT_DTYPE)
        chi = chi * ek.astype(FLOAT_DTYPE) + a.astype(FLOAT_DTYPE) * z1
        xi = xi + b.astype(FLOAT_DTYPE) * z1 + c.astype(FLOAT_DTYPE) * z2
        return (chi, xi), (chi, xi)

    steps = e_k.shape[0]
    keys = jax.random.split(key, steps)
    if path_zero is None:
        path_zero = jnp.zeros((num_paths,), dtype=FLOAT_DTYPE)
    chi0 = path_zero
    xi0 = path_zero
    _, (chis, xis) = jax.lax.scan(
        step, (chi0, xi0), (keys, e_k, l11, l21, l22))
    return (jnp.concatenate([chi0[None], chis], axis=0),
            jnp.concatenate([xi0[None], xis], axis=0))


@jax.jit
def _ss_futures_core(chi, xi, decay, a_tau, chi_mean, xi_mean):
    """Packed [2K] (means, stderrs) of F(t, T_k) = exp(decay_k chi(t)
    + xi(t) + A(tau_k) + deterministic means)."""
    lnf = (decay[:, None] * (chi.astype(ACC_DTYPE) + chi_mean)
           + (xi.astype(ACC_DTYPE) + xi_mean) + a_tau[:, None])
    f = jnp.exp(lnf)
    m = jnp.mean(f, axis=1)
    se = jnp.sqrt(jnp.maximum(jnp.mean(f * f, axis=1) - m * m, 0.0)
                  / f.shape[1])
    return jnp.concatenate([m, se])


@jax.jit
def _ss_option_core(chi, xi, decay, a_tau, chi_mean, xi_mean, strikes,
                    signs, df):
    """Packed [2K]: option prices + stderrs on ONE future F(t, T) for a
    strike vector (decay/a_tau scalars here)."""
    f = jnp.exp(decay * (chi.astype(ACC_DTYPE) + chi_mean)
                + (xi.astype(ACC_DTYPE) + xi_mean) + a_tau)
    pay = df * jnp.maximum(signs[:, None] * (f[None, :]
                                             - strikes[:, None]), 0.0)
    m = jnp.mean(pay, axis=1)
    se = jnp.sqrt(jnp.maximum(jnp.mean(pay * pay, axis=1) - m * m, 0.0)
                  / f.shape[0])
    return jnp.concatenate([m, se])


@jax.jit
def _ss_spread_core(chi, xi, d1, d2, a1, a2, chi_mean, xi_mean, strike,
                    df):
    """Packed [2]: calendar-spread option (F1 - F2 - K)^+ mean + se."""
    c = chi.astype(ACC_DTYPE) + chi_mean
    x = xi.astype(ACC_DTYPE) + xi_mean
    f1 = jnp.exp(d1 * c + x + a1)
    f2 = jnp.exp(d2 * c + x + a2)
    pay = df * jnp.maximum(f1 - f2 - strike, 0.0)
    m = jnp.mean(pay)
    se = jnp.sqrt(jnp.maximum(jnp.mean(pay * pay) - m * m, 0.0)
                  / pay.shape[0])
    return jnp.stack([m, se])


class SchwartzSmithSimulation:
    """Exact MC of (chi, xi) on a grid. The factor paths are simulated
    MEAN-ZERO in f32 (the deterministic means — mean reversion of
    chi0, risk premia, mu_star drift — are exact host f64 added inside
    the pricers), the standard drift/path split of the framework."""

    def __init__(self, model: SchwartzSmithModel,
                 time_discretization: TimeDiscretization,
                 num_paths: int = 200_000, seed: int = 1729,
                 antithetic: bool = True,
                 mesh=None, path_axis: str = "paths"):
        """``mesh``: optional ``jax.sharding.Mesh`` — the path axis of
        the factor histories shards over it (NamedSharding state
        template), so the futures/option/spread pricing cores are SPMD-
        partitioned with means reduced over ICI; identical Threefry
        stream as unmeshed."""
        if antithetic and num_paths % 2:
            raise ValueError("antithetic needs an even num_paths")
        if mesh is not None and num_paths % mesh.devices.size:
            raise ValueError(
                f"num_paths {num_paths} must be divisible by the mesh "
                f"size {mesh.devices.size}")
        self.mesh = mesh
        self.path_axis = path_axis
        self.model = model
        self.td = time_discretization
        self.num_paths = int(num_paths)
        self.antithetic = bool(antithetic)
        times = time_discretization.as_array()
        if times[0] != 0.0:
            raise ValueError("simulation grid must start at 0")
        self._times = times
        dts = np.diff(times)
        k = model.kappa
        ek = np.exp(-k * dts)
        v_chi = model.s_chi ** 2 * (1.0 - ek * ek) / (2 * k)
        v_xi = model.s_xi ** 2 * dts
        c = model.rho * model.s_chi * model.s_xi * (1.0 - ek) / k
        l11 = np.sqrt(v_chi)
        l21 = c / np.maximum(l11, 1e-300)
        l22 = np.sqrt(np.maximum(v_xi - l21 * l21, 0.0))
        path_zero = jnp.zeros((self.num_paths,), dtype=FLOAT_DTYPE)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            path_zero = jax.device_put(
                path_zero, NamedSharding(mesh, PartitionSpec(path_axis)))
        self._chis, self._xis = _ss_scan(
            jax.random.PRNGKey(int(seed)), self.num_paths,
            self.antithetic, jnp.asarray(ek), jnp.asarray(l11),
            jnp.asarray(l21), jnp.asarray(l22), path_zero=path_zero)
        # exact deterministic means at the grid points
        e_t = np.exp(-k * times)
        self._chi_mean = (model.chi0 * e_t
                          - model.lam * (1.0 - e_t) / k)
        self._xi_mean = model.xi0 + model.mu_star * times

    def _index(self, time: float) -> int:
        ti = self.td.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return ti

    def spot(self, time: float) -> RandomVariableTPU:
        """S(t) = exp(chi + xi) with the exact means."""
        i = self._index(time)
        return RandomVariableTPU.of(
            self._times[i],
            jnp.exp(self._chis[i].astype(ACC_DTYPE) + self._chi_mean[i]
                    + self._xis[i].astype(ACC_DTYPE)
                    + self._xi_mean[i]).astype(FLOAT_DTYPE))

    def _fut_consts(self, i: int, maturities):
        t = self._times[i]
        mats = np.atleast_1d(np.asarray(maturities, dtype=np.float64))
        if np.any(mats < t):
            raise ValueError("maturity before observation time")
        m = self.model
        decay = np.exp(-m.kappa * (mats - t))
        # ln F(t,T) = decay chi(t) + xi(t) + A(T - t) evaluated with the
        # RISK-NEUTRAL A measured from t: the same _a but applied to the
        # time-t factors (A depends only on tau by stationarity of the
        # RN dynamics)
        a_tau = m._a(mats - t)
        return decay, a_tau

    def mc_futures_prices(self, time: float, maturities):
        """(prices[K], stderr[K]) of E[F(time, T_k)] — by the
        martingale property this must equal F(0, T_k); ONE fused
        program."""
        i = self._index(time)
        decay, a_tau = self._fut_consts(i, maturities)
        out = np.asarray(_ss_futures_core(
            self._chis[i], self._xis[i], jnp.asarray(decay),
            jnp.asarray(a_tau), jnp.float64(self._chi_mean[i]),
            jnp.float64(self._xi_mean[i])))
        kk = decay.size
        return out[:kk], out[kk:]

    def mc_option_on_future(self, expiry: float, maturity: float,
                            strikes, discount_factor: float = 1.0,
                            is_call: bool = True):
        """(prices[K], stderr[K]) of the option on F(expiry, maturity)
        for a strike vector; oracle: ``option_on_future``."""
        i = self._index(expiry)
        decay, a_tau = self._fut_consts(i, maturity)
        ks = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
        sign = 1.0 if is_call else -1.0
        out = np.asarray(_ss_option_core(
            self._chis[i], self._xis[i], jnp.float64(decay[0]),
            jnp.float64(a_tau[0]), jnp.float64(self._chi_mean[i]),
            jnp.float64(self._xi_mean[i]), jnp.asarray(ks),
            jnp.full(ks.shape, sign), jnp.float64(discount_factor)))
        kk = ks.size
        return out[:kk], out[kk:]

    def mc_calendar_spread(self, expiry: float, mat1: float, mat2: float,
                           strike: float = 0.0,
                           discount_factor: float = 1.0):
        """(price, stderr) of (F(t,T1) - F(t,T2) - K)^+; at K=0 the
        Margrabe closed form is the oracle."""
        i = self._index(expiry)
        decay, a_tau = self._fut_consts(i, [mat1, mat2])
        out = np.asarray(_ss_spread_core(
            self._chis[i], self._xis[i], jnp.float64(decay[0]),
            jnp.float64(decay[1]), jnp.float64(a_tau[0]),
            jnp.float64(a_tau[1]), jnp.float64(self._chi_mean[i]),
            jnp.float64(self._xi_mean[i]), jnp.float64(strike),
            jnp.float64(discount_factor)))
        return float(out[0]), float(out[1])
