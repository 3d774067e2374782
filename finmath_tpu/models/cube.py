"""Swaption volatility cube (SABR per cell) and CMS replication
pricing under a linear terminal-swap-rate (TSR) annuity mapping.

Capability map: finmath-lib's ``net.finmath.singleswaprate`` package —
``SABRVolatilityCube`` (a SABR smile per (expiry, tenor) cell,
calibrated from swaption quotes), ``AnnuityMapping``/
``BasicPiterbargAnnuityMapping`` (the change of numeraire from the
swap annuity to the payment-date zero bond), and
``CmsOptionReplicationProduct`` (CMS caplets/floorlets/swaplets priced
by static replication against the smile). The reference repo's
workloads stop at swaption calibration; CMS replication is the
standard next consumer of the calibrated cube.

Method (all host f64 — this is an oracle/quoting layer; prices are
scalars, the quadrature is microseconds):

* Each cube cell holds a SABR fit of one smile
  (``models/sabr.calibrate_sabr``); queries interpolate VOLS bilinearly
  in (expiry, tenor) after evaluating each neighboring cell at the
  requested strike (interpolating vols, not SABR parameters — the
  parameter map is not convex).
* Annuity mapping: the Hunt-Kennedy linear swap-rate model
  alpha(S) = a S + b with b = 1 / sum(delta_i) (normalization
  sum delta_i alpha_i(S) = 1) and a = (P(0,Tp)/A(0) - b) / S0
  (martingale consistency E^A[alpha(S_T)] = P(0,Tp)/A(0), exact for
  linear alpha since E^A[S_T] = S0).
* Replication: with c(K) = E^A[(S-K)+] the undiscounted smile call and
  the Carr-Madan identity E[((S-K)+)^2] = 2 int_K^inf c(x) dx,

      CMS caplet  = A0 ( b c(K) + a (2 int_K^inf c + K c(K)) )
      CMS floorlet= A0 ( b p(K) + a (K p(K) - 2 int_lb^K p) )
      CMS rate    = (a E[S^2] + b S0) / (a S0 + b),
      E[S^2]      = 2 int_lb^inf c(x) dx  (lb = -displacement)

  evaluated by Gauss-Legendre quadrature on the SABR smile. For a FLAT
  lognormal smile the convexity adjustment has the exact closed form
  a S0^2 (e^{sigma^2 T} - 1) / (a S0 + b) — the quadrature is tested
  against it, and caplet - floorlet = swaplet parity is exact by
  construction (tests/test_cube.py). An MC cross-check reprices the
  weighted payoff E^A[(S-K)+ alpha(S)] on SABR terminal paths.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .analytic import black_formula
from .curves import DiscountCurve, swap_annuity
from .sabr import (
    SABRParams,
    calibrate_sabr,
    sabr_lognormal_implied_volatility,
)

_GL_X, _GL_W = np.polynomial.legendre.leggauss(256)


@dataclass(frozen=True)
class SwaptionSmile:
    """One cube cell: the par swap rate (annuity-measure martingale),
    the option expiry and the SABR fit of the smile."""
    forward: float
    expiry: float
    params: SABRParams

    def volatility(self, strike: float) -> float:
        return sabr_lognormal_implied_volatility(
            self.params, self.forward, strike, self.expiry)

    def call(self, strike) -> np.ndarray:
        """Undiscounted E^A[(S - K)+], vectorized over strikes; the
        displaced-Black value on the fitted smile."""
        d = self.params.displacement
        ks = np.atleast_1d(np.asarray(strike, dtype=np.float64))
        out = np.empty_like(ks)
        for i, k in enumerate(ks):
            if k <= -d:
                # payoff is (S - k) a.s.: S >= -d > k
                out[i] = self.forward - k
                continue
            vol = self.volatility(float(k))
            out[i] = black_formula(self.forward + d, k + d, vol,
                                   self.expiry)
        return out if out.size > 1 else float(out[0])

    def put(self, strike) -> np.ndarray:
        """E^A[(K - S)+] by put-call parity on the martingale S."""
        ks = np.atleast_1d(np.asarray(strike, dtype=np.float64))
        calls = np.atleast_1d(np.asarray(self.call(ks)))
        out = calls - (self.forward - ks)
        return out if out.size > 1 else float(out[0])


class SwaptionCube:
    """SABR smile per (expiry, tenor) cell
    (finmath SABRVolatilityCube). Build with ``add_smile`` /
    ``calibrate_cell``; query vols at any (expiry, tenor, strike) by
    bilinear interpolation of the neighboring cells' smile vols."""

    def __init__(self):
        self._cells: Dict[Tuple[float, float], SwaptionSmile] = {}

    def add_smile(self, expiry: float, tenor: float,
                  smile: SwaptionSmile) -> None:
        self._cells[(float(expiry), float(tenor))] = smile

    def calibrate_cell(self, expiry: float, tenor: float, forward: float,
                       strikes, vols, beta: float = 0.5,
                       displacement: float = 0.0) -> SwaptionSmile:
        fit = calibrate_sabr(forward, expiry, strikes, vols,
                             quote_type="lognormal", beta=beta,
                             displacement=displacement)
        smile = SwaptionSmile(forward=float(forward),
                              expiry=float(expiry), params=fit.params)
        self.add_smile(expiry, tenor, smile)
        return smile

    def get_smile(self, expiry: float, tenor: float) -> SwaptionSmile:
        key = (float(expiry), float(tenor))
        if key not in self._cells:
            raise KeyError(f"no smile at expiry={expiry}, tenor={tenor}")
        return self._cells[key]

    def get_volatility(self, expiry: float, tenor: float,
                       strike: float) -> float:
        """Bilinear interpolation in (expiry, tenor) of the cell vols
        evaluated at the strike; exact on a stored cell."""
        if not self._cells:
            raise ValueError("empty cube")
        es = sorted({e for e, _ in self._cells})
        ts = sorted({t for _, t in self._cells})

        def bracket(grid, x):
            if x <= grid[0]:
                return [(grid[0], 1.0)]
            if x >= grid[-1]:
                return [(grid[-1], 1.0)]
            hi = next(i for i, g in enumerate(grid) if g >= x)
            lo = hi - 1
            w = (x - grid[lo]) / (grid[hi] - grid[lo])
            return [(grid[lo], 1.0 - w), (grid[hi], w)]

        out, wsum = 0.0, 0.0
        for e, we in bracket(es, float(expiry)):
            for t, wt in bracket(ts, float(tenor)):
                if (e, t) not in self._cells:
                    raise KeyError(
                        f"cube grid not rectangular: missing ({e}, {t})")
                out += we * wt * self._cells[(e, t)].volatility(strike)
                wsum += we * wt
        return out / wsum

    def expiries(self):
        return sorted({e for e, _ in self._cells})

    def tenors(self):
        return sorted({t for _, t in self._cells})


@dataclass(frozen=True)
class LinearTSRAnnuityMapping:
    """Hunt-Kennedy linear swap-rate model for P(T, Tp)/A(T) = a S + b
    (finmath's annuity-mapping role): b = 1/sum(delta_i) from the
    normalization over the annuity's own payment dates, a from
    E^A[alpha(S_T)] = P(0, Tp)/A(0)."""
    a: float
    b: float

    @classmethod
    def from_curve(cls, discount_curve: DiscountCurve, forward: float,
                   swap_payment_times: Sequence[float],
                   payment_time: float,
                   period_length: float = 0.5
                   ) -> "LinearTSRAnnuityMapping":
        times = [float(t) for t in swap_payment_times]
        a0 = swap_annuity(discount_curve, times,
                          [period_length] * len(times))
        p0p = float(discount_curve.get_discount_factor(payment_time))
        b = 1.0 / (period_length * len(times))
        a = (p0p / a0 - b) / float(forward)
        return cls(a=a, b=b)

    def __call__(self, s):
        return self.a * np.asarray(s, dtype=np.float64) + self.b


class CMSReplicationPricer:
    """Static replication of CMS payoffs against one smile under a
    linear TSR annuity mapping (finmath CmsOptionReplicationProduct).
    All expectations are under the annuity measure; values are
    converted with A(0) and quoted as paid at ``payment_time``."""

    def __init__(self, smile: SwaptionSmile,
                 mapping: LinearTSRAnnuityMapping, annuity0: float,
                 strike_stddevs: float = 8.0):
        self.smile = smile
        self.map = mapping
        self.a0 = float(annuity0)
        d = smile.params.displacement
        f = smile.forward
        atm_vol = smile.volatility(f)
        self.lb = -d
        # upper integration bound: +stddevs lognormal moves of F + d
        self.ub = (f + d) * math.exp(
            strike_stddevs * atm_vol * math.sqrt(smile.expiry)) - d

    def _int_call(self, lo: float, hi: float) -> float:
        """int_lo^hi c(x) dx by 256-pt Gauss-Legendre."""
        if hi <= lo:
            return 0.0
        x = 0.5 * (hi - lo) * (_GL_X + 1.0) + lo
        return 0.5 * (hi - lo) * float(
            (_GL_W * np.asarray(self.smile.call(x))).sum())

    def _int_put(self, lo: float, hi: float) -> float:
        if hi <= lo:
            return 0.0
        x = 0.5 * (hi - lo) * (_GL_X + 1.0) + lo
        return 0.5 * (hi - lo) * float(
            (_GL_W * np.asarray(self.smile.put(x))).sum())

    def second_moment(self) -> float:
        """E^A[S^2] = lb^2 + 2 lb (S0 - lb) + 2 int_lb^inf c(x) dx
        (exact for S >= lb; reduces to 2 int_0^inf c for lb = 0)."""
        lb = self.lb
        s0 = self.smile.forward
        return lb * lb + 2.0 * lb * (s0 - lb) \
            + 2.0 * self._int_call(lb, self.ub)

    def cms_rate(self) -> float:
        """Convexity-adjusted CMS rate E^{Tp}[S_T]
        = E^A[S alpha(S)] / E^A[alpha(S)]."""
        a, b = self.map.a, self.map.b
        s0 = self.smile.forward
        return (a * self.second_moment() + b * s0) / (a * s0 + b)

    def convexity_adjustment(self) -> float:
        return self.cms_rate() - self.smile.forward

    def caplet_value(self, strike: float) -> float:
        """Value at t=0 of the CMS caplet paying (S_T - K)+ at Tp:
        A0 E^A[(S-K)+ (a S + b)] with
        E[(S-K)+ S] = 2 int_K c + K c(K)."""
        a, b = self.map.a, self.map.b
        k = float(strike)
        ck = float(self.smile.call(k))
        return self.a0 * (b * ck
                          + a * (2.0 * self._int_call(k, self.ub)
                                 + k * ck))

    def floorlet_value(self, strike: float) -> float:
        """A0 E^A[(K-S)+ (a S + b)] with
        E[(K-S)+ S] = K p(K) - 2 int_lb^K p."""
        a, b = self.map.a, self.map.b
        k = float(strike)
        pk = float(self.smile.put(k))
        return self.a0 * (b * pk
                          + a * (k * pk - 2.0 * self._int_put(self.lb, k)))

    def swaplet_value(self, strike: float = 0.0) -> float:
        """A0 E^A[(S - K) (a S + b)] — the exact linear leg; caplet -
        floorlet must reproduce it (parity test)."""
        a, b = self.map.a, self.map.b
        s0 = self.smile.forward
        k = float(strike)
        return self.a0 * (a * self.second_moment() + b * s0
                          - k * (a * s0 + b))


def flat_lognormal_convexity_adjustment(forward: float, volatility: float,
                                        expiry: float,
                                        mapping: LinearTSRAnnuityMapping
                                        ) -> float:
    """EXACT convexity adjustment for a flat lognormal smile under the
    linear TSR mapping: E[S^2] = S0^2 e^{sigma^2 T} makes
    adj = a S0^2 (e^{sigma^2 T} - 1) / (a S0 + b) closed-form — the
    quadrature oracle (also Hagan 2003 eq. 2.19a's model instance)."""
    a, b = mapping.a, mapping.b
    var = forward * forward * (math.exp(volatility * volatility * expiry)
                               - 1.0)
    return a * var / (a * forward + b)
