"""Hull-White one-factor short-rate model: exact Gaussian simulation of
(x(t), integral of x) in one fused scan, analytic bond/caplet/swaption
(Jamshidian) pricers, and piecewise-volatility calibration.

Capability map (the reference repo's host library finmath-lib ships this
model family; the repo itself stops at Black-Scholes + LMM):

* ``net.finmath.montecarlo.interestrate.models.HullWhiteModel`` — short
  rate dr = (theta(t) - a r) dt + sigma(t) dW fitted to the initial
  discount curve, with piecewise-constant volatility and an EXACTLY
  simulated numeraire (finmath simulates the integrated short rate
  jointly with the rate; so does this module).
* ``net.finmath.singleswaprate`` / analytic swaption machinery — mapped
  to the closed-form zero-bond options and the Jamshidian decomposition
  here (the standard analytic oracle for Gaussian short-rate models).

Model decomposition (Brigo-Mercurio ch. 3 notation): r(t) = x(t) +
alpha(t) with ``dx = -a x dt + sigma(t) dW`` mean-zero OU and alpha
absorbing the curve fit. Everything Gaussian is carried by three
deterministic state functions, propagated EXACTLY per volatility
segment by the same recursion the simulation uses per grid step:

  phi(t) = Var x(t)
  C(t)   = Cov(x(t), Y(t)),  Y(t) = integral_0^t x(s) ds
  V(t)   = Var Y(t)

from which: alpha(t) = f(0,t) + C(t); the pathwise numeraire
N(t) = exp(Y(t) + A(t)) with A(t) = -ln P(0,t) + V(t)/2; and the
bond reconstitution P(t,T) = (P(0,T)/P(0,t)) * exp(-B x(t)
- B^2 phi(t)/2 - B C(t)), B = B(T-t) = (1 - e^{-a(T-t)})/a. The
constant-sigma specializations reduce to the textbook formulas; the
martingale identities E[1/N(t)] = P(0,t) and E[P(t,T)/N(t)] = P(0,T)
hold exactly in distribution (tested).

TPU-first design notes:

* The simulation is ONE jitted lax.scan over grid steps with the exact
  per-step Gaussian transition of the PAIR (x, Y): two normals per
  step, correlated by the closed-form step covariance (no Euler bias at
  any step size — steps exist only to place observation dates).
* All deterministic state (phi/C/V/A, per-step Cholesky factors) is
  precomputed on host in f64 and enters the graph as constants; paths
  are f32 with f64-accumulated reductions, per the framework contract.
* The analytic layer (bond options, Jamshidian swaptions, calibration)
  is host f64 numpy — microseconds per price, the oracle and the
  calibration target, exactly like the LMM's analytic engines.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariableTPU
from .analytic import _norm_cdf
from .curves import DiscountCurve
from .time_discretization import TimeDiscretization


def _b(a: float, tau):
    """B(tau) = (1 - e^{-a tau}) / a."""
    return (1.0 - np.exp(-a * np.asarray(tau, dtype=np.float64))) / a


def _step_cov(a: float, sigma: float, dt: float):
    """Exact conditional covariance of (x(t+dt), int_t^{t+dt} x ds)
    given x(t), for constant sigma over the step:

      Var eps = s^2 (1 - e^{-2a dt}) / (2a)
      Var eta = s^2/a^2 (dt - 2 B(dt) + (1-e^{-2a dt})/(2a))
      Cov     = s^2/a   (B(dt) - (1-e^{-2a dt})/(2a))
    """
    e2 = math.expm1(-2.0 * a * dt)  # e^{-2a dt} - 1
    g = -e2 / (2.0 * a)             # (1 - e^{-2a dt}) / (2a)
    bb = float(_b(a, dt))
    s2 = sigma * sigma
    vx = s2 * g
    vy = s2 / (a * a) * (dt - 2.0 * bb + g)
    cxy = s2 / a * (bb - g)
    return vx, vy, cxy


class HullWhiteModel:
    """Hull-White model: constant mean reversion ``a``, piecewise-constant
    volatility ``sigmas[i]`` on [vol_times[i], vol_times[i+1]) (the last
    value extends to infinity; pass a scalar for a flat vol), fitted to
    ``discount_curve`` by construction."""

    def __init__(self, discount_curve: DiscountCurve, mean_reversion: float,
                 volatility, vol_times: Optional[Sequence[float]] = None):
        if mean_reversion <= 1e-8:
            raise ValueError("mean_reversion must be positive (>= 1e-8); "
                             "the a -> 0 limit is not implemented")
        self.curve = discount_curve
        self.a = float(mean_reversion)
        sig = np.atleast_1d(np.asarray(volatility, dtype=np.float64))
        if np.any(sig <= 0):
            raise ValueError("volatility must be positive")
        if vol_times is None:
            if sig.size != 1:
                raise ValueError("vol_times required for piecewise vol")
            vol_times = [0.0]
        vt = np.asarray(vol_times, dtype=np.float64)
        if vt.size != sig.size or vt[0] != 0.0 or np.any(np.diff(vt) <= 0):
            raise ValueError("vol_times must start at 0, increase, and "
                             "align with volatility")
        self.vol_times = vt
        self.sigmas = sig

    # ------------------------------------------------------------------
    def sigma_at(self, t: float) -> float:
        """Volatility on the segment containing t (right-continuous)."""
        i = int(np.searchsorted(self.vol_times, t, side="right") - 1)
        return float(self.sigmas[max(i, 0)])

    def gaussian_state(self, t: float):
        """(phi, C, V) = (Var x(t), Cov(x,Y)(t), Var Y(t)) by exact
        propagation across the volatility segments up to ``t``."""
        a = self.a
        phi = c = v = 0.0
        s = 0.0
        for i in range(self.vol_times.size):
            seg_end = (self.vol_times[i + 1]
                       if i + 1 < self.vol_times.size else np.inf)
            dt = min(t, seg_end) - s
            if dt <= 0:
                break
            vx, vy, cxy = _step_cov(a, float(self.sigmas[i]), float(dt))
            ea = math.exp(-a * dt)
            bb = float(_b(a, dt))
            v = v + bb * bb * phi + 2.0 * bb * c + vy
            c = ea * (c + bb * phi) + cxy
            phi = phi * ea * ea + vx
            s += dt
        return phi, c, v

    def df(self, t) -> np.ndarray:
        return np.asarray(self.curve.get_discount_factor(t),
                          dtype=np.float64)

    # ------------------------------------------------------------------
    # analytic pricing (host f64) — the oracle layer
    # ------------------------------------------------------------------
    def bond_option(self, expiry: float, bond_maturity: float,
                    strike: float, is_call: bool = True) -> float:
        """Option on the zero bond P(expiry, bond_maturity): lognormal
        with total variance B(T_B - T_O)^2 phi(T_O) under the
        T_O-forward measure (Girsanov shifts only the drift) —
        Black-76 on the forward bond."""
        if not 0.0 < expiry < bond_maturity:
            raise ValueError("need 0 < expiry < bond_maturity")
        phi, _, _ = self.gaussian_state(expiry)
        sp = abs(float(_b(self.a, bond_maturity - expiry))) * math.sqrt(phi)
        f = float(self.df(bond_maturity) / self.df(expiry))
        df_o = float(self.df(expiry))
        if sp < 1e-14:
            intrinsic = (f - strike) if is_call else (strike - f)
            return df_o * max(intrinsic, 0.0)
        d1 = (math.log(f / strike) + 0.5 * sp * sp) / sp
        d2 = d1 - sp
        if is_call:
            return df_o * (f * _norm_cdf(d1) - strike * _norm_cdf(d2))
        return df_o * (strike * _norm_cdf(-d2) - f * _norm_cdf(-d1))

    def caplet(self, fixing: float, payment: float, strike: float) -> float:
        """Caplet on the simple forward L(fixing, payment), paid at
        ``payment``: the classic identity caplet = (1 + delta K) *
        ZBP(fixing, payment, 1/(1 + delta K))."""
        delta = payment - fixing
        k_bond = 1.0 / (1.0 + delta * strike)
        return (1.0 + delta * strike) * self.bond_option(
            fixing, payment, k_bond, is_call=False)

    def _bond_at_x(self, t: float, maturity, x):
        """Reconstitution P(t, T; x) for scalar t, vectorized over T/x."""
        phi, c, _ = self.gaussian_state(t)
        bb = _b(self.a, np.asarray(maturity) - t)
        return (self.df(maturity) / self.df(t)
                * np.exp(-bb * x - 0.5 * bb * bb * phi - bb * c))

    def swaption(self, expiry: float, payment_times: Sequence[float],
                 strike: float, payer: bool = True,
                 notional: float = 1.0) -> float:
        """European swaption by the Jamshidian decomposition: find x*
        such that the coupon bond prices at par, then the swaption
        decomposes EXACTLY into zero-bond options struck at the
        critical bond prices (valid because P(expiry, .; x) is monotone
        in the single Gaussian factor). Payment times are the fixed-leg
        dates after ``expiry``; accruals from consecutive spacing."""
        pt = np.asarray(payment_times, dtype=np.float64)
        if pt.ndim != 1 or pt.size < 1 or pt[0] <= expiry:
            raise ValueError("payment_times must follow the expiry")
        if np.any(np.diff(pt) <= 0):
            raise ValueError("payment_times must increase")
        deltas = np.diff(np.concatenate([[expiry], pt]))
        coupons = strike * deltas
        coupons[-1] += 1.0
        # Newton + bisection on g(x) = sum c_i P(T0, t_i; x) - 1,
        # strictly decreasing in x
        lo, hi = -5.0, 5.0
        phi, _, _ = self.gaussian_state(expiry)
        scale = math.sqrt(max(phi, 1e-30))
        lo, hi = lo * max(scale, 1e-2) * 50, hi * max(scale, 1e-2) * 50
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            g = float(np.sum(coupons * self._bond_at_x(expiry, pt, mid))) - 1.0
            if g > 0:
                lo = mid
            else:
                hi = mid
            if hi - lo < 1e-14 * max(1.0, abs(mid)):
                break
        x_star = 0.5 * (lo + hi)
        k_bonds = self._bond_at_x(expiry, pt, x_star)
        total = 0.0
        for ti, ci, ki in zip(pt, coupons, k_bonds):
            total += ci * self.bond_option(expiry, float(ti), float(ki),
                                           is_call=not payer)
        return notional * total

    # ------------------------------------------------------------------
    def forward_rate(self, t: float, eps: float = 1e-5) -> float:
        """Instantaneous forward f(0,t) by central difference of
        -ln P(0, .) (curve interpolation is log-linear, so this is the
        local zero-slope; used only for short-rate REPORTING)."""
        lo = max(t - eps, 0.0)
        return float((np.log(self.df(lo)) - np.log(self.df(t + eps)))
                     / (t + eps - lo))


# ---------------------------------------------------------------------------
# exact Monte-Carlo simulation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2))
def _hw_scan(key, num_paths: int, antithetic: bool,
             e_a, b_dt, lx, lyx, ly, path_zero=None):
    """Scan of the exact joint transition: per step,
    x' = x e^{-a dt} + lx Z1; Y' = Y + x B(dt) + lyx Z1 + ly Z2
    (lx/lyx/ly the per-step Cholesky of the (eps, eta) covariance).
    Returns histories [steps+1, paths] of x and Y.

    ``path_zero``: optional [num_paths] f32 zeros used as the state
    template — passing a mesh-sharded one (NamedSharding over the path
    axis) partitions the scan AND the histories over the device mesh via
    XLA SPMD propagation, on the IDENTICAL partitionable-Threefry stream
    (the credit-layer pattern, models/credit.py _wwr_scan)."""
    half = num_paths // 2 if antithetic else num_paths

    def step(carry, inp):
        x, y = carry
        k, ea, bd, sx, syx, sy = inp
        k1, k2 = jax.random.split(k)
        z1 = jax.random.normal(k1, (half,), dtype=jnp.float32)
        z2 = jax.random.normal(k2, (half,), dtype=jnp.float32)
        if antithetic:
            z1 = jnp.concatenate([z1, -z1])
            z2 = jnp.concatenate([z2, -z2])
        z1 = z1.astype(FLOAT_DTYPE)
        z2 = z2.astype(FLOAT_DTYPE)
        y = y + x * bd.astype(FLOAT_DTYPE) + syx.astype(FLOAT_DTYPE) * z1 \
            + sy.astype(FLOAT_DTYPE) * z2
        x = x * ea.astype(FLOAT_DTYPE) + sx.astype(FLOAT_DTYPE) * z1
        return (x, y), (x, y)

    steps = e_a.shape[0]
    keys = jax.random.split(key, steps)
    if path_zero is None:
        path_zero = jnp.zeros((num_paths,), dtype=FLOAT_DTYPE)
    x0 = path_zero
    y0 = path_zero
    _, (xs, ys) = jax.lax.scan(step, (x0, y0),
                               (keys, e_a, b_dt, lx, lyx, ly))
    return (jnp.concatenate([x0[None], xs], axis=0),
            jnp.concatenate([y0[None], ys], axis=0))


@jax.jit
def _mc_bond_core(y, a_int):
    return jnp.mean(jnp.exp(-y.astype(ACC_DTYPE) - a_int))


@jax.jit
def _mc_caplet_core(x, y, a_int, lead, bb, delta, strike):
    p_ts = lead * jnp.exp(-bb * x.astype(ACC_DTYPE))
    libor = (1.0 / p_ts - 1.0) / delta
    inv_n = jnp.exp(-y.astype(ACC_DTYPE) - a_int)
    return jnp.mean(delta * jnp.maximum(libor - strike, 0.0) * p_ts * inv_n)


@jax.jit
def _mc_swaption_core(x, y, a_int, leads, bbs, coupons, sign):
    # coupon bond = sum_i c_i lead_i exp(-B_i x): ONE [K, paths] fused
    # broadcast instead of K eager dispatches (each eager op through the
    # TPU tunnel costs a full RTT; measured 7.8 s -> ms for a 5-coupon
    # swaption)
    xa = x.astype(ACC_DTYPE)
    cb = jnp.sum((coupons * leads)[:, None]
                 * jnp.exp(-bbs[:, None] * xa[None, :]), axis=0)
    inv_n = jnp.exp(-y.astype(ACC_DTYPE) - a_int)
    return jnp.mean(jnp.maximum(sign * (1.0 - cb), 0.0) * inv_n)


class HullWhiteSimulation:
    """Exact Monte-Carlo simulation of the Hull-White model on a time
    grid: pathwise short rate, zero bonds (affine reconstitution) and
    the EXACT bank-account numeraire, as RandomVariables — the
    interest-rate sibling of ``MonteCarloBlackScholesModel``."""

    def __init__(self, model: HullWhiteModel,
                 time_discretization: TimeDiscretization, num_paths: int,
                 seed: int = 3141, antithetic: bool = False,
                 mesh=None, path_axis: str = "paths"):
        """``mesh``: optional ``jax.sharding.Mesh`` — the path axis of
        the state histories shards over it (NamedSharding state template,
        models/credit.py pattern), so every downstream consumer (bond/
        caplet/swaption cores, TARN sweep, Bermudan LS regression) is
        SPMD-partitioned by XLA with its means/normal-equations reduced
        over ICI. Identical Threefry stream as the unmeshed run."""
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
        self.seed = int(seed)
        self.antithetic = bool(antithetic)
        a = model.a
        times = time_discretization.as_array()
        if times[0] != 0.0:
            raise ValueError("simulation grid must start at 0")
        dts = np.diff(times)
        # volatility steps must not straddle a vol breakpoint mid-step;
        # require breakpoints on the grid (loud, like the LMM engine)
        for bt in model.vol_times[1:]:
            if bt < times[-1] and time_discretization.get_time_index(bt) < 0:
                raise ValueError(
                    f"volatility breakpoint {bt} not on the time grid")
        sig = np.array([model.sigma_at(t) for t in times[:-1]])
        cov = np.array([_step_cov(a, s, dt) for s, dt in zip(sig, dts)])
        vx, vy, cxy = cov[:, 0], cov[:, 1], cov[:, 2]
        lx = np.sqrt(vx)
        lyx = cxy / np.maximum(lx, 1e-300)
        ly = np.sqrt(np.maximum(vy - lyx * lyx, 0.0))
        path_zero = jnp.zeros((self.num_paths,), dtype=FLOAT_DTYPE)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            path_zero = jax.device_put(
                path_zero, NamedSharding(mesh, PartitionSpec(path_axis)))
        self._xs, self._ys = _hw_scan(
            jax.random.PRNGKey(self.seed), self.num_paths, self.antithetic,
            jnp.asarray(np.exp(-a * dts)), jnp.asarray(_b(a, dts)),
            jnp.asarray(lx), jnp.asarray(lyx), jnp.asarray(ly),
            path_zero=path_zero)
        # deterministic state at the grid points (host f64)
        st = np.array([model.gaussian_state(t) for t in times])
        self._phi, self._c, self._v = st[:, 0], st[:, 1], st[:, 2]
        self._lnp0 = np.log(model.df(times))
        self._a_int = -self._lnp0 + 0.5 * self._v       # A(t) = int alpha
        self._times = times

    # ------------------------------------------------------------------
    def _index(self, time: float) -> int:
        ti = self.td.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return ti

    def short_rate(self, time: float) -> RandomVariableTPU:
        """r(t) = x(t) + alpha(t), alpha(t) = f(0,t) + C(t)."""
        i = self._index(time)
        alpha = self.model.forward_rate(self._times[i]) + self._c[i]
        return RandomVariableTPU.of(
            self._times[i],
            self._xs[i] + jnp.asarray(alpha, dtype=FLOAT_DTYPE))

    def numeraire(self, time: float) -> RandomVariableTPU:
        """N(t) = exp(Y(t) + A(t)) — exact in distribution (the
        integrated rate is simulated jointly, not left-point summed)."""
        i = self._index(time)
        return RandomVariableTPU.of(
            self._times[i],
            jnp.exp(self._ys[i].astype(ACC_DTYPE)
                    + self._a_int[i]).astype(FLOAT_DTYPE))

    def bond(self, time: float, maturity: float) -> RandomVariableTPU:
        """P(t, T) by the affine reconstitution in x(t)."""
        i = self._index(time)
        t = self._times[i]
        if maturity < t:
            raise ValueError("maturity before observation time")
        bb = float(_b(self.model.a, maturity - t))
        lead = float(self.model.df(maturity) / self.model.df(t)
                     * math.exp(-0.5 * bb * bb * self._phi[i]
                                - bb * self._c[i]))
        return RandomVariableTPU.of(
            t, lead * jnp.exp(-bb * self._xs[i].astype(ACC_DTYPE))
            .astype(FLOAT_DTYPE))

    def get_number_of_paths(self) -> int:
        return self.num_paths

    # ------------------------------------------------------------------
    # fused MC pricers (one f64-accumulated reduction each)
    # ------------------------------------------------------------------
    def _bond_coeffs(self, i: int, maturities) -> tuple:
        """(lead, B) of P(t_i, T) = lead * exp(-B x) for each T."""
        t = self._times[i]
        mats = np.atleast_1d(np.asarray(maturities, dtype=np.float64))
        if np.any(mats < t):
            raise ValueError("maturity before observation time")
        bb = _b(self.model.a, mats - t)
        lead = (self.model.df(mats) / self.model.df(t)
                * np.exp(-0.5 * bb * bb * self._phi[i] - bb * self._c[i]))
        return lead, bb

    def mc_bond_price(self, maturity: float) -> float:
        """E[1/N(T)] — must reproduce the input curve (martingale)."""
        i = self._index(maturity)
        return float(_mc_bond_core(self._ys[i],
                                   jnp.float64(self._a_int[i])))

    def mc_caplet_price(self, fixing: float, payment: float,
                        strike: float) -> float:
        """delta * (L(T) - K)+ paid at ``payment``, discounted by the
        exact pathwise numeraire. One fused device program."""
        i = self._index(fixing)
        delta = payment - fixing
        lead, bb = self._bond_coeffs(i, payment)
        return float(_mc_caplet_core(
            self._xs[i], self._ys[i], jnp.float64(self._a_int[i]),
            jnp.float64(lead[0]), jnp.float64(bb[0]),
            jnp.float64(delta), jnp.float64(strike)))

    def mc_swaption_price(self, expiry: float,
                          payment_times: Sequence[float], strike: float,
                          payer: bool = True) -> float:
        """max(s * (1 - coupon bond at expiry), 0) / N(expiry).
        One fused device program for the whole coupon stack."""
        i = self._index(expiry)
        pt = np.asarray(payment_times, dtype=np.float64)
        deltas = np.diff(np.concatenate([[expiry], pt]))
        coupons = strike * deltas
        coupons[-1] += 1.0
        leads, bbs = self._bond_coeffs(i, pt)
        return float(_mc_swaption_core(
            self._xs[i], self._ys[i], jnp.float64(self._a_int[i]),
            jnp.asarray(leads), jnp.asarray(bbs), jnp.asarray(coupons),
            jnp.float64(1.0 if payer else -1.0)))


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HullWhiteCalibrationResult:
    model: HullWhiteModel
    rms_price_error: float
    iterations: int
    converged: bool


def calibrate_hull_white(discount_curve: DiscountCurve,
                         mean_reversion: float,
                         vol_times: Sequence[float],
                         swaptions: Sequence[dict],
                         target_prices: Sequence[float],
                         x0: Optional[Sequence[float]] = None,
                         max_iterations: int = 200,
                         accuracy: float = 1e-12) -> HullWhiteCalibrationResult:
    """Bootstrap-style global fit of the piecewise volatility to
    European swaption prices via Levenberg-Marquardt on the Jamshidian
    pricer (host f64 — each price is microseconds, the finmath
    HullWhiteModel calibration analog). ``swaptions`` entries:
    ``{"expiry": .., "payment_times": [..], "strike": .., "payer": ..}``.
    Volatilities are optimized in log (always positive)."""
    from .calibration import LevenbergMarquardt

    vol_times = np.asarray(vol_times, dtype=np.float64)
    targets = np.asarray(target_prices, dtype=np.float64)
    if targets.size != len(swaptions):
        raise ValueError("target_prices must align with swaptions")

    def model_of(y: np.ndarray) -> HullWhiteModel:
        return HullWhiteModel(discount_curve, mean_reversion,
                              np.exp(np.clip(y, -30, 5)), vol_times)

    def residuals(y: np.ndarray) -> np.ndarray:
        m = model_of(y)
        return np.array([
            m.swaption(s["expiry"], s["payment_times"], s["strike"],
                       s.get("payer", True)) for s in swaptions]) - targets

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

    start = np.log(np.full(vol_times.size, 0.01)
                   if x0 is None else np.asarray(x0, dtype=np.float64))
    lm = LevenbergMarquardt(residuals, jacobian,
                            max_iterations=max_iterations,
                            accuracy=accuracy,
                            lower_bound=-np.inf, upper_bound=np.inf)
    res = lm.run(start)
    m = model_of(res.parameters)
    rms = float(np.sqrt(np.mean(residuals(res.parameters) ** 2)))
    return HullWhiteCalibrationResult(model=m, rms_price_error=rms,
                                      iterations=res.iterations,
                                      converged=res.converged)
