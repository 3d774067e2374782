"""Market risk: VaR / expected shortfall on a derivatives book with
FULL revaluation per scenario on the device, Euler component
allocation, and the Kupiec backtest.

Capability map: the reference and finmath-lib stop at pricing/XVA;
a production framework pairs them with the market-risk layer — the
measure side of the same Monte-Carlo machinery. Three estimators share
one revaluation core:

* parametric Monte-Carlo scenarios from a factor covariance (log-normal
  shocks),
* historical simulation (a returns matrix applied to today's factors),
* delta-gamma-normal (no revaluation; the analytic control the full
  revaluation is tested against for small horizons).

TPU-first design: the book is revalued for ALL scenarios in ONE jitted
program — instruments are columns (strike/expiry/vol/notional vectors),
scenarios are rows, so the [scenarios, instruments] revaluation is one
broadcast through the vectorized Black-Scholes formula (`jnp_norm_cdf`)
with f64 accumulation, and the quantile/ES/allocation statistics are
computed on-device and packed into one transfer. 1M scenarios x 100
instruments is a single MXU-friendly elementwise block, not a loop."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE
from .analytic import jnp_norm_cdf


@dataclass(frozen=True)
class RiskReport:
    """One horizon's risk numbers (losses positive).
    ``component_es`` is the Euler/Acerbi-Tasche allocation
    -E[pnl_i | portfolio in the q-tail]: it sums EXACTLY to the
    expected shortfall (the coherent allocation identity, tested)."""
    var: float
    expected_shortfall: float
    quantile: float
    horizon: float
    mean_pnl: float
    component_es: np.ndarray
    stderr_var: float             # asymptotic quantile stderr


def _check_quantile(q: float):
    if not 0.5 < q < 1.0:
        raise ValueError("quantile must be in (0.5, 1) — e.g. 0.99")


def value_at_risk(pnl, quantile: float = 0.99) -> float:
    """VaR_q = -q-quantile of the P&L distribution (loss positive).
    Host helper for externally produced P&L samples."""
    _check_quantile(quantile)
    return float(-np.quantile(np.asarray(pnl), 1.0 - quantile))


def expected_shortfall(pnl, quantile: float = 0.99) -> float:
    """ES_q = -E[pnl | pnl <= VaR threshold]."""
    _check_quantile(quantile)
    pnl = np.asarray(pnl)
    thr = np.quantile(pnl, 1.0 - quantile)
    tail = pnl[pnl <= thr]
    return float(-np.mean(tail))


def kupiec_pvalue(num_breaches: int, num_days: int,
                  quantile: float = 0.99) -> float:
    """Kupiec POF likelihood-ratio test of VaR coverage: p-value of
    LR = -2 ln[(1-p)^{n-x} p^x / ((1-x/n)^{n-x} (x/n)^x)] ~ chi2(1).
    Small p-value = reject the model's coverage."""
    _check_quantile(quantile)
    p = 1.0 - quantile
    x, n = int(num_breaches), int(num_days)
    if not 0 <= x <= n or n <= 0:
        raise ValueError("need 0 <= breaches <= days")
    if x == 0:
        lr = -2.0 * (n * math.log(1 - p))
    elif x == n:
        lr = -2.0 * (n * math.log(p))
    else:
        f = x / n
        lr = -2.0 * ((n - x) * math.log((1 - p) / (1 - f))
                     + x * math.log(p / f))
    # chi2(1) survival function via the normal tail
    return float(2.0 * (1.0 - 0.5 * (1.0 + math.erf(
        math.sqrt(max(lr, 0.0) / 2.0)))))


# ---------------------------------------------------------------------------
# the option book + revaluation core
# ---------------------------------------------------------------------------

class OptionBook:
    """European option positions on a set of underlyings: arrays over
    instruments — underlying index, strike, expiry, implied vol,
    notional (signed: negative = short), is_call. Underlyings carry
    spot and (flat) rate; vols shock multiplicatively with a per-
    underlying vol-factor scenario."""

    def __init__(self, spots: Sequence[float], rate: float,
                 underlying_index, strikes, expiries, vols, notionals,
                 is_call=True):
        s = np.asarray(spots, dtype=np.float64)
        if s.ndim != 1 or np.any(s <= 0):
            raise ValueError("spots must be positive")
        u = np.asarray(underlying_index, dtype=np.int64)
        k = np.asarray(strikes, dtype=np.float64)
        t = np.asarray(expiries, dtype=np.float64)
        v = np.asarray(vols, dtype=np.float64)
        w = np.asarray(notionals, dtype=np.float64)
        c = np.broadcast_to(np.asarray(is_call), k.shape).copy()
        if not (u.shape == k.shape == t.shape == v.shape == w.shape):
            raise ValueError("instrument arrays must align")
        if np.any((u < 0) | (u >= s.size)):
            raise ValueError("underlying_index out of range")
        if np.any(k <= 0) or np.any(t <= 0) or np.any(v <= 0):
            raise ValueError("strikes, expiries, vols must be positive")
        self.spots = s
        self.rate = float(rate)
        self.idx = u
        self.strikes = k
        self.expiries = t
        self.vols = v
        self.notionals = w
        self.is_call = c.astype(np.float64)   # 1 call, 0 put

    @property
    def num_underlyings(self) -> int:
        return self.spots.size

    @property
    def num_instruments(self) -> int:
        return self.strikes.size


@jax.jit
def _book_values(spot_f, vol_f, spots, rate, idx, k, t, v, w, call):
    """Values [scenarios] of the book under multiplicative factor
    shocks: spot_f/vol_f [scenarios, underlyings] (1.0 = today).
    Expiries are NOT rolled down (instantaneous-shock convention)."""
    s = spots[idx][None, :] * spot_f[:, idx]              # [S, I]
    sig = v[None, :] * vol_f[:, idx]
    sq = sig * jnp.sqrt(t)[None, :]
    f = s * jnp.exp(rate * t)[None, :]
    d1 = (jnp.log(f / k[None, :]) + 0.5 * sq * sq) / sq
    d2 = d1 - sq
    df = jnp.exp(-rate * t)[None, :]
    callv = df * (f * jnp_norm_cdf(d1) - k[None, :] * jnp_norm_cdf(d2))
    putv = callv - df * (f - k[None, :])                  # parity
    vals = call[None, :] * callv + (1.0 - call[None, :]) * putv
    return (w[None, :] * vals).astype(ACC_DTYPE)


@jax.jit
def _risk_stats(pnl_by_inst, q):
    """Packed [4 + I] statistics from per-instrument P&L [S, I]:
    (VaR, ES, mean, stderr_var, component VaR by Euler allocation =
    -E[pnl_i | portfolio tail])."""
    pnl = jnp.sum(pnl_by_inst, axis=1)                    # [S]
    s = pnl.shape[0]
    srt = jnp.sort(pnl)
    j = jnp.clip((jnp.floor((1.0 - q) * s)).astype(jnp.int32), 0, s - 1)
    thr = srt[j]
    var = -thr
    in_tail = (pnl <= thr).astype(ACC_DTYPE)
    ntail = jnp.maximum(jnp.sum(in_tail), 1.0)
    es = -jnp.sum(pnl * in_tail) / ntail
    comp = -jnp.sum(pnl_by_inst * in_tail[:, None], axis=0) / ntail
    # asymptotic quantile stderr: sqrt(q(1-q)/S) / f(x_q); 1/f estimated
    # by the central difference dx/dp of the empirical quantile function
    band = jnp.maximum((jnp.floor(0.002 * s)).astype(jnp.int32), 1)
    inv_dens = (srt[jnp.minimum(j + band, s - 1)]
                - srt[jnp.maximum(j - band, 0)]) / (2.0 * band / s)
    se = jnp.sqrt(q * (1.0 - q) / s) * jnp.maximum(inv_dens, 0.0)
    return jnp.concatenate([jnp.stack([var, es, jnp.mean(pnl), se]),
                            comp])


class MarketRiskEngine:
    """VaR/ES by full revaluation of an ``OptionBook`` under factor
    scenarios — parametric MC (lognormal factor shocks from a
    covariance matrix) or historical (a returns matrix). Spot and vol
    factors per underlying: the factor vector is [spots..., vols...]."""

    def __init__(self, book: OptionBook, horizon: float = 1.0 / 252.0,
                 mesh=None, path_axis: str = "paths"):
        """``mesh``: optional ``jax.sharding.Mesh`` — the SCENARIO axis
        (this engine's Monte-Carlo path axis) shards over it: the factor
        shock matrices are device_put with a NamedSharding and the full-
        revaluation + tail-statistics cores are SPMD-partitioned by XLA
        (the sort/quantile gathers over ICI; the per-instrument
        revaluation, the bulk of the FLOPs, stays fully local)."""
        if horizon <= 0:
            raise ValueError("horizon must be positive")
        self.book = book
        self.horizon = float(horizon)
        self.mesh = mesh
        self.path_axis = path_axis
        b = book
        self._consts = (jnp.asarray(b.spots), jnp.float64(b.rate),
                        jnp.asarray(b.idx), jnp.asarray(b.strikes),
                        jnp.asarray(b.expiries), jnp.asarray(b.vols),
                        jnp.asarray(b.notionals), jnp.asarray(b.is_call))

    # ------------------------------------------------------------------
    def _report(self, spot_f, vol_f, quantile: float) -> RiskReport:
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if spot_f.shape[0] % self.mesh.devices.size:
                raise ValueError(
                    f"scenario count {spot_f.shape[0]} must be divisible "
                    f"by the mesh size {self.mesh.devices.size}")
            sh = NamedSharding(self.mesh,
                               PartitionSpec(self.path_axis, None))
            spot_f = jax.device_put(spot_f, sh)
            vol_f = jax.device_put(vol_f, sh)
        ones = jnp.ones((1, self.book.num_underlyings))
        base = _book_values(ones, ones, *self._consts)    # [1, I]
        scen = _book_values(spot_f, vol_f, *self._consts)
        out = np.asarray(_risk_stats(scen - base, jnp.float64(quantile)))
        return RiskReport(var=float(out[0]), expected_shortfall=float(
            out[1]), quantile=float(quantile), horizon=self.horizon,
            mean_pnl=float(out[2]), component_es=out[4:],
            stderr_var=float(out[3]))

    def parametric_mc(self, covariance, num_scenarios: int = 500_000,
                      quantile: float = 0.99, seed: int = 99,
                      vol_covariance=None,
                      antithetic: bool = True) -> RiskReport:
        """Lognormal spot shocks from the annualized log-return
        ``covariance`` (scaled by the horizon); optional independent
        lognormal vol-factor shocks from ``vol_covariance``."""
        _check_quantile(quantile)
        n = self.book.num_underlyings
        cov = np.atleast_2d(np.asarray(covariance, dtype=np.float64))
        if cov.shape != (n, n):
            raise ValueError("covariance must be [underlyings]^2")
        chol = np.linalg.cholesky(cov * self.horizon
                                  + 1e-18 * np.eye(n))
        half = num_scenarios // 2 if antithetic else num_scenarios
        k1, k2 = jax.random.split(jax.random.PRNGKey(int(seed)))
        z = jax.random.normal(k1, (half, n))
        if antithetic:
            z = jnp.concatenate([z, -z], axis=0)
        ln_f = z @ jnp.asarray(chol).T
        spot_f = jnp.exp(ln_f - 0.5 * jnp.asarray(np.diag(cov))
                         * self.horizon)
        if vol_covariance is not None:
            vcov = np.atleast_2d(np.asarray(vol_covariance,
                                            dtype=np.float64))
            vchol = np.linalg.cholesky(vcov * self.horizon
                                       + 1e-18 * np.eye(n))
            zv = jax.random.normal(k2, (half, n))
            if antithetic:
                zv = jnp.concatenate([zv, -zv], axis=0)
            vol_f = jnp.exp(zv @ jnp.asarray(vchol).T
                            - 0.5 * jnp.asarray(np.diag(vcov))
                            * self.horizon)
        else:
            vol_f = jnp.ones_like(spot_f)
        return self._report(spot_f, vol_f, quantile)

    def historical(self, spot_returns, vol_returns=None,
                   quantile: float = 0.99) -> RiskReport:
        """Historical simulation: ``spot_returns`` [days, underlyings]
        log-returns applied as factor shocks (each day = one
        scenario)."""
        _check_quantile(quantile)
        r = np.atleast_2d(np.asarray(spot_returns, dtype=np.float64))
        if r.shape[1] != self.book.num_underlyings:
            raise ValueError("returns must be [days, underlyings]")
        spot_f = jnp.exp(jnp.asarray(r))
        if vol_returns is not None:
            v = np.atleast_2d(np.asarray(vol_returns, dtype=np.float64))
            if v.shape != r.shape:
                raise ValueError("vol_returns must match spot_returns")
            vol_f = jnp.exp(jnp.asarray(v))
        else:
            vol_f = jnp.ones_like(spot_f)
        return self._report(spot_f, vol_f, quantile)

    # ------------------------------------------------------------------
    def delta_normal_var(self, covariance, quantile: float = 0.99,
                         eps: float = 1e-5) -> float:
        """Analytic delta-normal VaR (first-order control): deltas by
        central differences of the SAME revaluation core, then
        VaR = z_q sqrt(d' Sigma d) over the horizon."""
        _check_quantile(quantile)
        n = self.book.num_underlyings
        cov = np.atleast_2d(np.asarray(covariance, dtype=np.float64))
        ones = np.ones((1, n))
        deltas = np.zeros(n)
        vol_ones = jnp.asarray(ones)
        for i in range(n):
            up, dn = ones.copy(), ones.copy()
            up[0, i] += eps
            dn[0, i] -= eps
            vu = float(jnp.sum(_book_values(jnp.asarray(up), vol_ones,
                                            *self._consts)))
            vd = float(jnp.sum(_book_values(jnp.asarray(dn), vol_ones,
                                            *self._consts)))
            deltas[i] = (vu - vd) / (2 * eps)     # dV / d(log-factor)
        sigma = math.sqrt(float(deltas @ (cov * self.horizon) @ deltas))
        from ..native.host_rng import inverse_normal_cdf_as241
        z = float(inverse_normal_cdf_as241(np.array([quantile]))[0])
        return z * sigma
