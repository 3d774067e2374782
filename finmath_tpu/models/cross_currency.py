"""Cross-currency model: two Hull-White economies + lognormal FX,
simulated EXACTLY under the domestic risk-neutral measure, with the
closed-form stochastic-rates FX option as oracle.

Capability map. The reference repo is single-currency; finmath-lib (its
host library) ships multi-curve/multi-currency machinery
(``net.finmath.montecarlo.interestrate`` cross-currency usage and the
hybrid-assets package). This module is the two-economy Gaussian model
(Brigo-Mercurio ch. 14 notation): domestic and foreign short rates are
Hull-White factors, the FX spot is lognormal, all three Brownians
correlated:

  dx_d = -a_d x_d dt + sigma_d dW_d                    (domestic OU)
  dx_f = (-a_f x_f - rho_fx sigma_f sigma_x) dt + sigma_f dW_f
                                                       (foreign OU under
                                                        the DOMESTIC measure:
                                                        the quanto drift)
  dX/X = (r_d - r_f) dt + sigma_x dW_x                 (FX spot)

TPU-first design notes:

* The joint 5-state per-step transition (eps_d, eta_d, eps_f, eta_f,
  zeta) — both OU shocks, both integrated-OU shocks, and the FX
  log-increment's Brownian part — is GAUSSIAN with closed-form
  covariance (every entry an elementary integral of exponentials).
  The simulation is ONE lax.scan drawing 5 standard normals per step
  through the per-step Cholesky factor precomputed on host in f64:
  exact in distribution at ANY step size, like ``hull_white.py``'s
  single-economy scan. Steps exist only to place observation dates.
* The foreign measure change is absorbed DETERMINISTICALLY: the
  mean-zero OU is simulated and the quanto drift enters as exact
  host-f64 shifts m(t) = E^d[x_f(t)] and M(t) = int_0^t m, propagated
  per step by the same recursion the covariances use — no Euler bias,
  no pathwise drift arithmetic in f32.
* The FX log accumulates ONLY its Brownian part (zeta) pathwise; the
  full spot recomposes at observation dates from the simulated
  integrated rates: ln X(t) = ln X0 + (Y_d + A_d) - (Y_f + M + A_f)
  - 1/2 int sigma_x^2 + Z_x. Both integrated rates are exact, so
  covered interest parity E^d[X(t) P_f(t,T) / N_d(t)] = X0 P_f(0,T)
  holds EXACTLY in distribution — the acid test of the drift algebra.
* MC pricers are single fused programs with f64-accumulated means and
  packed outputs (one device->host transfer), per the framework's
  tunnel-RTT rule.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariableTPU
from .analytic import _norm_cdf
from .hull_white import HullWhiteModel, _b
from .time_discretization import TimeDiscretization


# ---------------------------------------------------------------------------
# closed-form step moments (host f64)
# ---------------------------------------------------------------------------

def _int_e(a: float, dt: float) -> float:
    """int_0^dt e^{-a u} du = B_a(dt)."""
    return float(_b(a, dt))


def _int_ee(a1: float, a2: float, dt: float) -> float:
    """int_0^dt e^{-(a1+a2) u} du."""
    return float(_b(a1 + a2, dt))


def _int_b(a: float, dt: float) -> float:
    """int_0^dt B_a(u) du = (dt - B_a(dt)) / a."""
    return (dt - float(_b(a, dt))) / a


def _int_eb(a1: float, a2: float, dt: float) -> float:
    """int_0^dt e^{-a1 u} B_{a2}(u) du = (B_{a1}(dt) - B_{a1+a2}(dt))/a2."""
    return (float(_b(a1, dt)) - float(_b(a1 + a2, dt))) / a2


def _int_bb(a1: float, a2: float, dt: float) -> float:
    """int_0^dt B_{a1}(u) B_{a2}(u) du."""
    return (dt - float(_b(a1, dt)) - float(_b(a2, dt))
            + float(_b(a1 + a2, dt))) / (a1 * a2)


def _step_cov5(a_d: float, a_f: float, s_d: float, s_f: float, s_x: float,
               rho_df: float, rho_dx: float, rho_fx: float,
               dt: float) -> np.ndarray:
    """Covariance of (eps_d, eta_d, eps_f, eta_f, zeta) over one step:
    eps_i = s_i int e^{-a_i(dt-s)} dW_i, eta_i = s_i int B_i(dt-s) dW_i,
    zeta = s_x int dW_x — every entry an elementary integral above."""
    c = np.zeros((5, 5))
    # within-economy blocks (same as hull_white._step_cov)
    for k, (a, s) in enumerate(((a_d, s_d), (a_f, s_f))):
        i = 2 * k
        c[i, i] = s * s * _int_ee(a, a, dt)
        c[i + 1, i + 1] = s * s * _int_bb(a, a, dt)
        c[i, i + 1] = c[i + 1, i] = s * s * _int_eb(a, a, dt)
    # domestic-foreign cross block
    sdf = rho_df * s_d * s_f
    c[0, 2] = c[2, 0] = sdf * _int_ee(a_d, a_f, dt)
    c[0, 3] = c[3, 0] = sdf * _int_eb(a_d, a_f, dt)
    c[1, 2] = c[2, 1] = sdf * _int_eb(a_f, a_d, dt)
    c[1, 3] = c[3, 1] = sdf * _int_bb(a_d, a_f, dt)
    # FX column
    c[4, 4] = s_x * s_x * dt
    c[0, 4] = c[4, 0] = rho_dx * s_d * s_x * _int_e(a_d, dt)
    c[1, 4] = c[4, 1] = rho_dx * s_d * s_x * _int_b(a_d, dt)
    c[2, 4] = c[4, 2] = rho_fx * s_f * s_x * _int_e(a_f, dt)
    c[3, 4] = c[4, 3] = rho_fx * s_f * s_x * _int_b(a_f, dt)
    return c


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class CrossCurrencyModel:
    """Two Hull-White economies + lognormal FX under the domestic
    risk-neutral measure. ``fx_vol`` may be piecewise-constant on
    ``fx_vol_times`` (same convention as Hull-White's volatility);
    correlations are the instantaneous Brownian correlations
    (d, f, x)."""

    def __init__(self, domestic: HullWhiteModel, foreign: HullWhiteModel,
                 fx_spot: float, fx_vol, rho_df: float, rho_dx: float,
                 rho_fx: float, fx_vol_times=None):
        if fx_spot <= 0:
            raise ValueError("fx_spot must be positive")
        corr = np.array([[1.0, rho_df, rho_dx],
                         [rho_df, 1.0, rho_fx],
                         [rho_dx, rho_fx, 1.0]])
        if np.min(np.linalg.eigvalsh(corr)) < -1e-12:
            raise ValueError("correlation matrix (d, f, x) is not PSD")
        sig = np.atleast_1d(np.asarray(fx_vol, dtype=np.float64))
        if np.any(sig <= 0):
            raise ValueError("fx_vol must be positive")
        if fx_vol_times is None:
            if sig.size != 1:
                raise ValueError("fx_vol_times required for piecewise vol")
            fx_vol_times = [0.0]
        vt = np.asarray(fx_vol_times, dtype=np.float64)
        if vt.size != sig.size or vt[0] != 0.0 or np.any(np.diff(vt) <= 0):
            raise ValueError("fx_vol_times must start at 0, increase, and "
                             "align with fx_vol")
        self.domestic = domestic
        self.foreign = foreign
        self.fx_spot = float(fx_spot)
        self.fx_vols = sig
        self.fx_vol_times = vt
        self.rho_df = float(rho_df)
        self.rho_dx = float(rho_dx)
        self.rho_fx = float(rho_fx)

    def fx_vol_at(self, t: float) -> float:
        i = int(np.searchsorted(self.fx_vol_times, t, side="right") - 1)
        return float(self.fx_vols[max(i, 0)])

    def _breakpoints(self) -> np.ndarray:
        return np.unique(np.concatenate([
            self.domestic.vol_times, self.foreign.vol_times,
            self.fx_vol_times]))

    # ------------------------------------------------------------------
    def fx_forward(self, t) -> np.ndarray:
        """F(0, t) = X0 P_f(0,t) / P_d(0,t)."""
        return (self.fx_spot * self.foreign.df(t) / self.domestic.df(t))

    def fx_forward_variance(self, expiry: float) -> float:
        """Integrated lognormal variance of F(t, T) at t = T:
        v^2 = int_0^T |sigma_x e_x + sigma_d B_d(T-s) e_d
        - sigma_f B_f(T-s) e_f|^2 ds — per-segment 32-node
        Gauss-Legendre over the union of vol breakpoints (integrand
        smooth per segment; ~1e-14 accurate, the analytic oracle)."""
        if expiry <= 0:
            raise ValueError("expiry must be positive")
        a_d, a_f = self.domestic.a, self.foreign.a
        nodes, weights = np.polynomial.legendre.leggauss(32)
        bps = self._breakpoints()
        seg = np.unique(np.concatenate([[0.0, expiry],
                                        bps[bps < expiry]]))
        total = 0.0
        for s0, s1 in zip(seg[:-1], seg[1:]):
            s = 0.5 * (s1 - s0) * nodes + 0.5 * (s0 + s1)
            w = 0.5 * (s1 - s0) * weights
            sd = np.array([self.domestic.sigma_at(u) for u in s])
            sf = np.array([self.foreign.sigma_at(u) for u in s])
            sx = np.array([self.fx_vol_at(u) for u in s])
            bd = _b(a_d, expiry - s)
            bf = _b(a_f, expiry - s)
            integrand = (sx * sx + sd * sd * bd * bd + sf * sf * bf * bf
                         + 2.0 * self.rho_dx * sd * sx * bd
                         - 2.0 * self.rho_fx * sf * sx * bf
                         - 2.0 * self.rho_df * sd * sf * bd * bf)
            total += float(np.sum(w * integrand))
        return total

    def fx_option(self, expiry: float, strike: float,
                  is_call: bool = True) -> float:
        """European FX option under BOTH stochastic rates: Black-76 on
        the lognormal FX forward with the hump-vol integrated variance
        (the closed form every MC run is tested against)."""
        f = float(self.fx_forward(expiry))
        v2 = self.fx_forward_variance(expiry)
        df = float(self.domestic.df(expiry))
        sp = math.sqrt(max(v2, 0.0))
        if sp < 1e-14:
            intrinsic = (f - strike) if is_call else (strike - f)
            return df * max(intrinsic, 0.0)
        d1 = (math.log(f / strike) + 0.5 * v2) / sp
        d2 = d1 - sp
        if is_call:
            return df * (f * _norm_cdf(d1) - strike * _norm_cdf(d2))
        return df * (strike * _norm_cdf(-d2) - f * _norm_cdf(-d1))


# ---------------------------------------------------------------------------
# exact joint simulation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2))
def _xccy_scan(key, num_paths: int, antithetic: bool, chol,
               path_zero=None):
    """Scan of the exact joint transition. ``chol`` is [steps, 5, 5+1]:
    the per-step lower Cholesky factor of the shock covariance with the
    e^{-a dt} decay pair appended in the last column's first rows
    (packed to keep the scan xs a single array). State
    (x_d, Y_d, x_f, Y_f, Z_x); returns the [steps+1, 5, paths] f32
    history.

    ``path_zero``: optional [num_paths] f32 zeros template; a
    mesh-sharded one (NamedSharding over the path axis) partitions the
    scan and every downstream pricing core over the device mesh via XLA
    SPMD propagation, on the identical Threefry stream (same convention
    as ``credit._wwr_scan``)."""
    half = num_paths // 2 if antithetic else num_paths

    def step(carry, inp):
        k, mat = inp
        low = mat[:, :5]
        ea_d, ea_f = mat[0, 5], mat[2, 5]
        bd_d, bd_f = mat[1, 5], mat[3, 5]
        z = jax.random.normal(k, (5, half), dtype=jnp.float32)
        if antithetic:
            z = jnp.concatenate([z, -z], axis=1)
        shocks = (low.astype(FLOAT_DTYPE)
                  @ z.astype(FLOAT_DTYPE))          # [5, paths]
        x_d, y_d, x_f, y_f, z_x = carry
        y_d = y_d + x_d * bd_d.astype(FLOAT_DTYPE) + shocks[1]
        x_d = x_d * ea_d.astype(FLOAT_DTYPE) + shocks[0]
        y_f = y_f + x_f * bd_f.astype(FLOAT_DTYPE) + shocks[3]
        x_f = x_f * ea_f.astype(FLOAT_DTYPE) + shocks[2]
        z_x = z_x + shocks[4]
        carry = (x_d, y_d, x_f, y_f, z_x)
        return carry, jnp.stack(carry)

    steps = chol.shape[0]
    keys = jax.random.split(key, steps)
    zero = (jnp.zeros((num_paths,), dtype=FLOAT_DTYPE)
            if path_zero is None else path_zero)
    carry0 = (zero, zero, zero, zero, zero)
    _, hist = jax.lax.scan(step, carry0, (keys, chol))
    return jnp.concatenate([jnp.stack(carry0)[None], hist], axis=0)


@jax.jit
def _xccy_diag_core(hist, lnx_det, a_int_d, lead_d, bb_d, lead_f, bb_f):
    """Packed martingale diagnostics at ONE observation index:
    [E[1/N_d], E[X/N_d], E[X P_f(t,T)/N_d], E[P_d(t,T)/N_d]] (f64)."""
    x_d, y_d, x_f, _, z_x = (hist[i].astype(ACC_DTYPE) for i in range(5))
    inv_n = jnp.exp(-y_d - a_int_d)
    lnx = lnx_det + (y_d + a_int_d) + z_x \
        - (hist[3].astype(ACC_DTYPE))
    x_spot = jnp.exp(lnx)
    p_f = lead_f * jnp.exp(-bb_f * (x_f))
    p_d = lead_d * jnp.exp(-bb_d * x_d)
    return jnp.stack([jnp.mean(inv_n), jnp.mean(x_spot * inv_n),
                      jnp.mean(x_spot * p_f * inv_n),
                      jnp.mean(p_d * inv_n)])


@jax.jit
def _xccy_fx_option_core(hist, lnx_det, a_int_d, strikes, signs):
    """FX option prices + standard errors at one expiry for a strike
    vector, plus E[X/N_d] (the FX-martingale diagnostic), packed
    [1 + 2K] (f64, one transfer)."""
    y_d, y_f, z_x = (hist[i].astype(ACC_DTYPE) for i in (1, 3, 4))
    inv_n = jnp.exp(-y_d - a_int_d)
    lnx = lnx_det + (y_d + a_int_d) + z_x - y_f
    x_spot = jnp.exp(lnx)
    fwd = jnp.mean(x_spot * inv_n)
    pay = jnp.maximum(signs[:, None] * (x_spot[None, :]
                                        - strikes[:, None]), 0.0) \
        * inv_n[None, :]
    prices = jnp.mean(pay, axis=1)
    n = pay.shape[1]
    stderr = jnp.sqrt(jnp.maximum(
        jnp.mean(pay * pay, axis=1) - prices * prices, 0.0) / n)
    return jnp.concatenate([fwd[None], prices, stderr])


@jax.jit
def _xccy_ccs_core(h_prev, h_pay, lnx_det_pay, a_int_d_pay, lead_d, bb_d,
                   lead_f, bb_f, m_prev):
    """Both float legs of a cross-currency swap in one program.
    h_prev/h_pay: [J, 5, paths] state at the fixing / payment dates.
    Coupon j pays (1/P(t_{j-1}, t_j) - 1) of its currency at t_j; the
    foreign one converts at X(t_j). Final notionals appended.
    Returns [domestic_leg, foreign_leg] (f64, domestic currency)."""
    y_pay = h_pay[:, 1].astype(ACC_DTYPE) + a_int_d_pay[:, None]
    inv_n = jnp.exp(-y_pay)                                  # [J, paths]
    x_d = h_prev[:, 0].astype(ACC_DTYPE)
    inv_pd = jnp.exp(bb_d[:, None] * x_d) / lead_d[:, None]
    dom = jnp.sum(jnp.mean((inv_pd - 1.0) * inv_n, axis=1))
    x_f = h_prev[:, 2].astype(ACC_DTYPE) + m_prev[:, None]
    inv_pf = jnp.exp(bb_f[:, None] * x_f) / lead_f[:, None]
    x_spot = jnp.exp(lnx_det_pay[:, None] + y_pay
                     + h_pay[:, 4].astype(ACC_DTYPE)
                     - h_pay[:, 3].astype(ACC_DTYPE))
    fgn = jnp.sum(jnp.mean(x_spot * (inv_pf - 1.0) * inv_n, axis=1))
    dom_leg = dom + jnp.mean(inv_n[-1])
    fgn_leg = fgn + jnp.mean(x_spot[-1] * inv_n[-1])
    return jnp.stack([dom_leg, fgn_leg])


class CrossCurrencySimulation:
    """Exact Monte-Carlo simulation of the cross-currency model on a
    time grid: pathwise FX spot, domestic/foreign bonds and the exact
    domestic bank-account numeraire as RandomVariables, plus fused MC
    pricers — the multi-currency sibling of ``HullWhiteSimulation``."""

    def __init__(self, model: CrossCurrencyModel,
                 time_discretization: TimeDiscretization, num_paths: int,
                 seed: int = 1618, antithetic: bool = False,
                 mesh=None, path_axis: str = "paths"):
        """``mesh``: optional ``jax.sharding.Mesh`` — shards the path
        axis of the joint simulation and every downstream pricing /
        exposure core (their means become XLA all-reduces over ICI) on
        the identical Threefry stream as the unmeshed simulation."""
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
        times = time_discretization.as_array()
        if times[0] != 0.0:
            raise ValueError("simulation grid must start at 0")
        for bt in model._breakpoints()[1:]:
            if bt < times[-1] and time_discretization.get_time_index(bt) < 0:
                raise ValueError(
                    f"volatility breakpoint {bt} not on the time grid")
        self._times = times
        dts = np.diff(times)
        a_d, a_f = model.domestic.a, model.foreign.a

        # per-step Cholesky factors + decay constants (host f64), and
        # the exact deterministic quanto shift recursion:
        #   m' = m e^{-a_f dt} - rho_fx s_f s_x B_f(dt)
        #   M' = M + m B_f(dt) - rho_fx s_f s_x (dt - B_f(dt)) / a_f
        packed = np.zeros((dts.size, 5, 6))
        m = 0.0
        m_hist = np.zeros(times.size)
        big_m = np.zeros(times.size)
        for i, (t, dt) in enumerate(zip(times[:-1], dts)):
            s_d = model.domestic.sigma_at(t)
            s_f = model.foreign.sigma_at(t)
            s_x = model.fx_vol_at(t)
            cov = _step_cov5(a_d, a_f, s_d, s_f, s_x, model.rho_df,
                             model.rho_dx, model.rho_fx, float(dt))
            # tiny ridge guards |rho| = 1 corners; exact otherwise
            low = np.linalg.cholesky(cov + 1e-30 * np.eye(5))
            packed[i, :, :5] = low
            packed[i, 0, 5] = math.exp(-a_d * dt)
            packed[i, 2, 5] = math.exp(-a_f * dt)
            packed[i, 1, 5] = _int_e(a_d, dt)
            packed[i, 3, 5] = _int_e(a_f, dt)
            drift = model.rho_fx * s_f * s_x
            big_m[i + 1] = (big_m[i] + m * _int_e(a_f, dt)
                            - drift * _int_b(a_f, dt))
            m = m * math.exp(-a_f * dt) - drift * _int_e(a_f, dt)
            m_hist[i + 1] = m
        self._m, self._big_m = m_hist, big_m
        path_zero = jnp.zeros((self.num_paths,), dtype=FLOAT_DTYPE)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            path_zero = jax.device_put(
                path_zero, NamedSharding(mesh, PartitionSpec(path_axis)))
        self._hist = _xccy_scan(jax.random.PRNGKey(self.seed),
                                self.num_paths, self.antithetic,
                                jnp.asarray(packed), path_zero=path_zero)

        st_d = np.array([model.domestic.gaussian_state(t) for t in times])
        st_f = np.array([model.foreign.gaussian_state(t) for t in times])
        self._phi_d, self._c_d, v_d = st_d[:, 0], st_d[:, 1], st_d[:, 2]
        self._phi_f, self._c_f, v_f = st_f[:, 0], st_f[:, 1], st_f[:, 2]
        self._a_int_d = -np.log(model.domestic.df(times)) + 0.5 * v_d
        self._a_int_f = -np.log(model.foreign.df(times)) + 0.5 * v_f
        # int_0^t sigma_x^2 (piecewise-exact)
        sx2 = np.array([model.fx_vol_at(t) ** 2 for t in times[:-1]])
        self._vx_int = np.concatenate([[0.0], np.cumsum(sx2 * dts)])
        # deterministic part of ln X(t): everything except the pathwise
        # (Y_d + A_d) - Y_f + Z_x (note A_f and M fold in here)
        self._lnx_det = (math.log(model.fx_spot) - self._a_int_f
                         - self._big_m - 0.5 * self._vx_int)

    # ------------------------------------------------------------------
    def _index(self, time: float) -> int:
        ti = self.td.get_time_index(time)
        if ti < 0:
            raise ValueError(f"time {time} not on the simulation grid")
        return ti

    def _lnx(self, i: int):
        h = self._hist[i]
        return (self._lnx_det[i]
                + (h[1].astype(ACC_DTYPE) + self._a_int_d[i])
                + h[4].astype(ACC_DTYPE) - h[3].astype(ACC_DTYPE))

    def fx(self, time: float) -> RandomVariableTPU:
        """Pathwise FX spot X(t)."""
        i = self._index(time)
        return RandomVariableTPU.of(
            self._times[i], jnp.exp(self._lnx(i)).astype(FLOAT_DTYPE))

    def numeraire(self, time: float) -> RandomVariableTPU:
        """Domestic bank account N_d(t) (exact in distribution)."""
        i = self._index(time)
        return RandomVariableTPU.of(
            self._times[i],
            jnp.exp(self._hist[i][1].astype(ACC_DTYPE)
                    + self._a_int_d[i]).astype(FLOAT_DTYPE))

    def _bond_coeffs(self, leg: str, i: int, maturity: float):
        model = self.model.domestic if leg == "d" else self.model.foreign
        phi = self._phi_d if leg == "d" else self._phi_f
        c = self._c_d if leg == "d" else self._c_f
        t = self._times[i]
        if maturity < t:
            raise ValueError("maturity before observation time")
        bb = float(_b(model.a, maturity - t))
        lead = float(model.df(maturity) / model.df(t)
                     * math.exp(-0.5 * bb * bb * phi[i] - bb * c[i]))
        return lead, bb

    def bond(self, time: float, maturity: float,
             foreign: bool = False) -> RandomVariableTPU:
        """P_d(t,T) or P_f(t,T) by affine reconstitution. The foreign
        state enters with its quanto mean shift m(t): the
        reconstitution is a state relation, measure-independent."""
        i = self._index(time)
        leg = "f" if foreign else "d"
        lead, bb = self._bond_coeffs(leg, i, maturity)
        x = self._hist[i][2 if foreign else 0].astype(ACC_DTYPE)
        if foreign:
            x = x + self._m[i]
        return RandomVariableTPU.of(
            self._times[i], (lead * jnp.exp(-bb * x)).astype(FLOAT_DTYPE))

    def get_number_of_paths(self) -> int:
        return self.num_paths

    # ------------------------------------------------------------------
    def martingale_diagnostics(self, time: float, maturity: float):
        """Packed exact-martingale checks at ``time`` (one transfer):
        dict with E[1/N_d] vs P_d(0,t), the FX forward E[X/N_d] vs
        X0 P_f(0,t), covered interest parity E[X P_f(t,T)/N_d] vs
        X0 P_f(0,T), and E[P_d(t,T)/N_d] vs P_d(0,T)."""
        i = self._index(time)
        lead_d, bb_d = self._bond_coeffs("d", i, maturity)
        lead_f, bb_f = self._bond_coeffs("f", i, maturity)
        # fold the foreign mean shift into the lead (exp(-bb (x+m)))
        lead_f_shift = lead_f * math.exp(-bb_f * self._m[i])
        out = np.asarray(_xccy_diag_core(
            self._hist[i], jnp.float64(self._lnx_det[i]),
            jnp.float64(self._a_int_d[i]), jnp.float64(lead_d),
            jnp.float64(bb_d), jnp.float64(lead_f_shift),
            jnp.float64(bb_f)))
        model = self.model
        return {
            "bond": (out[0], float(model.domestic.df(time))),
            "fx_forward": (out[1],
                           model.fx_spot * float(model.foreign.df(time))),
            "covered_parity": (out[2], model.fx_spot
                               * float(model.foreign.df(maturity))),
            "domestic_parity": (out[3],
                                float(model.domestic.df(maturity))),
        }

    def mc_fx_option_prices(self, expiry: float, strikes,
                            is_call: bool = True):
        """(forward, prices[K], stderr[K]) for a strike vector at one
        expiry — ONE fused program, one packed transfer. The forward is
        E[X/N_d] / P_d(0, T) (the T-forward-measure expectation of
        X(T)); oracle: ``CrossCurrencyModel.fx_option``."""
        i = self._index(expiry)
        ks = np.atleast_1d(np.asarray(strikes, dtype=np.float64))
        sign = 1.0 if is_call else -1.0
        out = np.asarray(_xccy_fx_option_core(
            self._hist[i], jnp.float64(self._lnx_det[i]),
            jnp.float64(self._a_int_d[i]), jnp.asarray(ks),
            jnp.full(ks.shape, sign)))
        k = ks.size
        fwd = float(out[0]) / float(self.model.domestic.df(expiry))
        return fwd, out[1:1 + k], out[1 + k:]

    def mc_ccs_legs(self, payment_times: Sequence[float]):
        """(domestic_leg, foreign_leg) of a float-float cross-currency
        swap per unit of each currency's notional, both expressed in
        DOMESTIC currency at t=0: floating coupons L(t_{j-1}, t_j)
        delta_j at each payment date plus the final notional, priced
        pathwise through the simulated states (reconstituted bonds at
        the fixing, FX conversion at the payment, exact numeraire
        discounting) in ONE fused program. Single-curve identities make
        both legs par: domestic_leg = 1, foreign_leg = X0 — the
        end-to-end test of the whole quanto-drift algebra."""
        pt = np.asarray(payment_times, dtype=np.float64)
        if pt.ndim != 1 or pt.size < 1 or pt[0] <= 0 \
                or np.any(np.diff(pt) <= 0):
            raise ValueError("payment_times must be positive, increasing")
        grid = np.concatenate([[0.0], pt])
        i_prev = np.array([self._index(t) for t in grid[:-1]])
        i_pay = np.array([self._index(t) for t in grid[1:]])
        J = pt.size
        lead_d = np.zeros(J)
        bb_d = np.zeros(J)
        lead_f = np.zeros(J)
        bb_f = np.zeros(J)
        for j in range(J):
            lead_d[j], bb_d[j] = self._bond_coeffs("d", i_prev[j],
                                                   grid[j + 1])
            lead_f[j], bb_f[j] = self._bond_coeffs("f", i_prev[j],
                                                   grid[j + 1])
        out = np.asarray(_xccy_ccs_core(
            self._hist[jnp.asarray(i_prev)],
            self._hist[jnp.asarray(i_pay)],
            jnp.asarray(self._lnx_det[i_pay]),
            jnp.asarray(self._a_int_d[i_pay]),
            jnp.asarray(lead_d), jnp.asarray(bb_d),
            jnp.asarray(lead_f), jnp.asarray(bb_f),
            jnp.asarray(self._m[i_prev])))
        return float(out[0]), float(out[1])

    def mc_ccs_value(self, payment_times: Sequence[float],
                     domestic_notional: float = 1.0) -> float:
        """Value of receiving the foreign float leg (notional
        domestic_notional / X0) against paying the domestic float leg
        (notional domestic_notional), final notionals exchanged — the
        textbook resettable basis swap at zero basis, worth zero in
        the model."""
        dom, fgn = self.mc_ccs_legs(payment_times)
        return domestic_notional * (fgn / self.model.fx_spot - dom)


# ---------------------------------------------------------------------------
# counterparty exposure on cross-currency books
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class CCSTrade:
    """Float-float cross-currency swap (constant notionals, final
    exchange): receive the foreign leg (+ optional ``foreign_basis``
    running spread) on notional domestic_notional / X0, pay the
    domestic leg on domestic_notional. ``receive_foreign=False`` flips
    the direction. Payment times must lie on the simulation grid."""
    payment_times: tuple
    domestic_notional: float = 1.0
    receive_foreign: bool = True
    foreign_basis: float = 0.0


@dataclass(frozen=True)
class FXForwardTrade:
    """Receive notional * (X(T) - strike) at maturity T (domestic)."""
    maturity: float
    strike: float
    notional: float = 1.0


@jax.jit
def _xccy_exposure_collect(values, inv_n, standalone_pos, qs):
    """Packed per-date statistics from netted values [O, paths]:
    rows = [ee, ene, forward_value, ee_standalone, pfe_q...] x O."""
    dpe = jnp.maximum(values, 0.0) * inv_n
    dne = jnp.minimum(values, 0.0) * inv_n
    ee = jnp.mean(dpe, axis=1)
    ene = jnp.mean(dne, axis=1)
    fwd = jnp.mean(values * inv_n, axis=1)
    ees = jnp.mean(standalone_pos * inv_n, axis=1)
    pfe = jnp.quantile(values, qs, axis=1)              # [Q, O]
    return jnp.concatenate([jnp.stack([ee, ene, fwd, ees]), pfe], axis=0)


class CrossCurrencyExposureEngine:
    """EE/ENE/PFE/CVA of a netting set of cross-currency swaps and FX
    forwards under the two-economy model — the FX-notional-exchange
    exposure profile that dominates real CCS books.

    Every trade value is EXACT pathwise (no regression): a floating
    leg plus final notional at any grid date t in (t_{j-1}, t_j] is
    P(t, t_j) / P(t_{j-1}, t_j) of its currency (the fixed next coupon
    plus par at the next reset), both bonds affine in the simulated
    factors with the foreign quanto mean shift; the FX conversion and
    the exact numeraire come from the same state. Exposure oracle: a
    zero-basis CCS observed AT a reset date is worth
    N_f X(t) - N_d exactly, so EE(t) = N_f * fx_option(t, N_d/N_f) —
    asserted by the tests against the hump-vol closed form.

    Observation dates: every simulation grid date in (0, last
    maturity]. One jitted collection, one packed transfer."""

    def __init__(self, simulation: CrossCurrencySimulation, trades,
                 quantiles=(0.95,)):
        if not trades:
            raise ValueError("need at least one trade")
        self.sim = simulation
        self.trades = list(trades)
        self.quantiles = tuple(float(q) for q in quantiles)
        sim = simulation
        times = sim._times
        last = 0.0
        for tr in self.trades:
            if isinstance(tr, CCSTrade):
                pt = np.asarray(tr.payment_times, dtype=np.float64)
                if pt.ndim != 1 or pt.size < 1 or pt[0] <= 0 \
                        or np.any(np.diff(pt) <= 0):
                    raise ValueError("payment_times must be positive, "
                                     "increasing")
                for t in pt:
                    if sim.td.get_time_index(t) < 0:
                        raise ValueError(f"payment time {t} not on the "
                                         "simulation grid")
                last = max(last, float(pt[-1]))
            elif isinstance(tr, FXForwardTrade):
                if sim.td.get_time_index(tr.maturity) < 0:
                    raise ValueError(f"maturity {tr.maturity} not on "
                                     "the simulation grid")
                last = max(last, float(tr.maturity))
            else:
                raise ValueError(f"unsupported trade type {type(tr)}")
        obs = np.array([i for i, t in enumerate(times)
                        if 0.0 < t <= last + 1e-12], dtype=np.int64)
        if obs.size == 0:
            raise ValueError("no observation dates before the last "
                             "maturity")
        self._obs = obs
        self._times_obs = times[obs]
        self._profile = self._compute()

    # ------------------------------------------------------------------
    def _leg_value(self, leg: str, i_obs: int, pt: np.ndarray,
                   basis: float):
        """Pathwise leg value (float coupons + final notional, unit
        notional, in the LEG currency) at grid index ``i_obs``; zero
        once the leg has matured."""
        sim = self.sim
        t = sim._times[i_obs]
        if t >= pt[-1] - 1e-12:
            return jnp.zeros((sim.num_paths,), dtype=ACC_DTYPE)
        j = int(np.searchsorted(pt, t + 1e-12))          # next payment
        t_next = float(pt[j])
        t_fix = float(pt[j - 1]) if j > 0 else 0.0
        i_fix = sim._index(t_fix)
        i_pay_grid = sim._index(t_next)
        lead_o, bb_o = sim._bond_coeffs(leg, i_obs, t_next)
        lead_f_, bb_f_ = sim._bond_coeffs(leg, i_fix, t_next)
        sel = 0 if leg == "d" else 2
        x_o = sim._hist[i_obs][sel].astype(ACC_DTYPE)
        x_f = sim._hist[i_fix][sel].astype(ACC_DTYPE)
        if leg == "f":
            x_o = x_o + sim._m[i_obs]
            x_f = x_f + sim._m[i_fix]
        p_obs = lead_o * jnp.exp(-bb_o * x_o)
        p_fix = lead_f_ * jnp.exp(-bb_f_ * x_f)
        value = p_obs / p_fix
        if basis != 0.0:
            # running spread on the remaining accrual periods
            deltas = np.diff(np.concatenate([[t_fix], pt[j:]]))
            ann = jnp.zeros((sim.num_paths,), dtype=ACC_DTYPE)
            for tk, dk in zip(pt[j:], deltas):
                lk, bk = sim._bond_coeffs(leg, i_obs, float(tk))
                ann = ann + dk * lk * jnp.exp(-bk * x_o)
            value = value + basis * ann
        return value

    def _compute(self):
        sim = self.sim
        x0 = sim.model.fx_spot
        rows_net = []
        rows_pos = []
        inv_n_rows = []
        for i in self._obs:
            i = int(i)
            lnx = sim._lnx(i)
            x_spot = jnp.exp(lnx)
            inv_n = jnp.exp(-(sim._hist[i][1].astype(ACC_DTYPE)
                              + sim._a_int_d[i]))
            net = jnp.zeros((sim.num_paths,), dtype=ACC_DTYPE)
            pos = jnp.zeros((sim.num_paths,), dtype=ACC_DTYPE)
            for tr in self.trades:
                if isinstance(tr, CCSTrade):
                    pt = np.asarray(tr.payment_times, dtype=np.float64)
                    dom = self._leg_value("d", i, pt, 0.0)
                    fgn = self._leg_value("f", i, pt, tr.foreign_basis)
                    v = tr.domestic_notional * (x_spot * fgn / x0 - dom)
                    if not tr.receive_foreign:
                        v = -v
                else:
                    t = sim._times[i]
                    if t >= tr.maturity - 1e-12:
                        v = jnp.zeros((sim.num_paths,), dtype=ACC_DTYPE)
                    else:
                        lead_f_, bb_f_ = sim._bond_coeffs(
                            "f", i, tr.maturity)
                        lead_d_, bb_d_ = sim._bond_coeffs(
                            "d", i, tr.maturity)
                        x_f = (sim._hist[i][2].astype(ACC_DTYPE)
                               + sim._m[i])
                        x_d = sim._hist[i][0].astype(ACC_DTYPE)
                        v = tr.notional * (
                            x_spot * lead_f_ * jnp.exp(-bb_f_ * x_f)
                            - tr.strike * lead_d_
                            * jnp.exp(-bb_d_ * x_d))
                net = net + v
                pos = pos + jnp.maximum(v, 0.0)
            rows_net.append(net)
            rows_pos.append(pos)
            inv_n_rows.append(inv_n)
        out = np.asarray(_xccy_exposure_collect(
            jnp.stack(rows_net), jnp.stack(inv_n_rows),
            jnp.stack(rows_pos), jnp.asarray(self.quantiles)))
        from .lmm.exposure import ExposureProfile
        pfe = {q: out[4 + k] for k, q in enumerate(self.quantiles)}
        return ExposureProfile(times=self._times_obs, ee=out[0],
                               ene=out[1], forward_value=out[2],
                               pfe=pfe, ee_standalone=out[3])

    def profile(self):
        """The netting set's ``ExposureProfile`` (same conventions as
        the LMM exposure engine: discounted EE/ENE/forward_value,
        undiscounted PFE quantiles)."""
        return self._profile

    def cva(self, hazard_rate: float = 0.02,
            recovery: float = 0.4) -> float:
        """Unilateral CVA off the profile (deterministic hazard — for
        rate-correlated intensities see ``models.credit``)."""
        from .lmm.exposure import cva_from_profile
        return cva_from_profile(self._profile, hazard_rate=hazard_rate,
                                recovery=recovery)
