"""Cap/floor analytics on curves and caplet-volatility stripping.

finmath-lib prices caps through a caplet volatility surface
(``net.finmath.marketdata.products.Cap`` +
``CapletVolatilities`` / ``CapletVolatilitiesParametricFourParameterPicewiseConstant``;
sources unavailable offline — semantics reconstructed from the public
API) and bootstraps that surface from quoted cap prices or flat
volatilities per maturity. This module is the TPU-framework equivalent:

* :func:`cap_value` — a cap as the sum of Black'76 / Bachelier caplets
  on the curves (host float64: these are microsecond surface-size
  programs with no path axis; per the measured tunnel-RTT rule in
  CLAUDE.md such math must stay off the device).
* :func:`implied_flat_cap_volatility` — invert ONE flat volatility from
  a cap price (the market's quoting convention).
* :func:`strip_caplet_volatilities` — sequential bootstrap of a
  piecewise-constant (in fixing time) forward-forward caplet volatility
  curve from flat-vol or price quotes at increasing maturities.
* :func:`strip_caplet_surface` — per-strike-column stripping of a full
  (maturity x strike) quote matrix.
* :class:`LIBORVolatilityModelFromCapletCurve` — feeds the stripped
  curve straight into the LMM covariance stack (covariance API of
  ``lmm/covariance.py``): under the LOGNORMAL state space,
  sigma_i(t) = sigma_caplet(T_i) reproduces every caplet price by
  construction, so MC cap prices on the valuation engine tie out
  against :func:`cap_value` — the end-to-end test in
  ``tests/test_caps.py``.

The stripping itself is a chain of scalar root-finds (one new flat
segment per quoted maturity); it runs in ~100 us per maturity on the
host, which is 300x faster than ONE device dispatch through the tunnel
— the TPU-first design here is knowing what NOT to put on the chip.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

from .analytic import black_formula, bachelier_formula
from .curves import DiscountCurve, ForwardCurve

__all__ = [
    "make_cap_schedule",
    "cap_value",
    "implied_flat_cap_volatility",
    "CapletVolatilityCurve",
    "strip_caplet_volatilities",
    "strip_caplet_surface",
    "LIBORVolatilityModelFromCapletCurve",
]


def make_cap_schedule(maturity: float, period: float,
                      first_fixing: Optional[float] = None) -> np.ndarray:
    """Fixing times of a standard cap: the first caplet fixes at
    ``first_fixing`` (default: one period — the spot-starting period is
    already fixed and excluded, market convention), the last pays at
    ``maturity``. Returns the fixing-time array; payments are
    ``fixings + period``."""
    if period <= 0.0:
        raise ValueError("need period > 0")
    start = period if first_fixing is None else float(first_fixing)
    n = int(round((maturity - start) / period))
    if n < 1 or abs(start + n * period - maturity) > 1e-9:
        raise ValueError(
            f"maturity {maturity} not reachable from first fixing {start} "
            f"in steps of {period}")
    return start + period * np.arange(n, dtype=np.float64)


def _caplet_values(discount_curve: DiscountCurve, forward_curve: ForwardCurve,
                   fixings: np.ndarray, period: float, strike: float,
                   vols: np.ndarray, convention: str,
                   displacement: float) -> np.ndarray:
    """Per-caplet undiscounted-formula * delta * df(payment) values."""
    fixings = np.asarray(fixings, dtype=np.float64)
    vols = np.broadcast_to(np.asarray(vols, dtype=np.float64), fixings.shape)
    dfs = discount_curve.get_discount_factor(fixings + period)
    fwds = np.asarray(forward_curve.get_forward(fixings), dtype=np.float64)
    out = np.empty_like(fixings)
    for j, (t, f, v, df) in enumerate(zip(fixings, fwds, vols, dfs)):
        unit = period * float(df)
        if convention == "lognormal":
            out[j] = black_formula(f + displacement, strike + displacement,
                                   float(v), float(t), payoff_unit=unit)
        elif convention == "normal":
            out[j] = bachelier_formula(f, strike, float(v), float(t),
                                       payoff_unit=unit)
        else:
            raise ValueError(f"unknown convention {convention!r}")
    return out


def cap_value(discount_curve: DiscountCurve, forward_curve: ForwardCurve,
              fixings: Sequence[float], period: float, strike: float,
              caplet_volatilities, convention: str = "lognormal",
              displacement: float = 0.0, is_cap: bool = True) -> float:
    """Value of a cap (or floor, via parity per caplet) as the sum of
    its caplets, each priced with its own volatility (scalar = flat).

    ``convention``: "lognormal" (Black'76, optionally displaced) or
    "normal" (Bachelier). Floorlet = caplet - delta*(F-K)*df (parity).
    """
    fixings = np.asarray(fixings, dtype=np.float64)
    caps = _caplet_values(discount_curve, forward_curve, fixings, period,
                          strike, caplet_volatilities, convention,
                          displacement)
    if is_cap:
        return float(np.sum(caps))
    fwds = np.asarray(forward_curve.get_forward(fixings), dtype=np.float64)
    dfs = discount_curve.get_discount_factor(fixings + period)
    intrinsic = period * (fwds - strike) * dfs
    return float(np.sum(caps - intrinsic))


def implied_flat_cap_volatility(price: float, discount_curve: DiscountCurve,
                                forward_curve: ForwardCurve,
                                fixings: Sequence[float], period: float,
                                strike: float,
                                convention: str = "lognormal",
                                displacement: float = 0.0,
                                tol: float = 1e-12) -> float:
    """The single volatility that reprices the cap — the market's flat
    quoting convention. Bisection (monotone in vol), ~50 iterations of
    microsecond host math."""

    def f(v):
        return cap_value(discount_curve, forward_curve, fixings, period,
                         strike, v, convention, displacement) - price

    lo, hi = 1e-9, 5.0 if convention == "lognormal" else 1.0
    flo, fhi = f(lo), f(hi)
    if flo > 0.0:
        raise ValueError(
            f"cap price {price} below intrinsic value {price - flo:.10g}")
    if fhi < 0.0:
        raise ValueError(f"cap price {price} above the vol={hi} value")
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) < 0.0:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol:
            break
    return 0.5 * (lo + hi)


class CapletVolatilityCurve:
    """Piecewise-constant forward-forward caplet volatility in fixing
    time: vol(t) = sigma_k for t in [M_{k-1}, M_k) with M_0 = 0 and
    constant extrapolation past the last stripped maturity (finmath's
    PIECEWISE_CONSTANT interpolation entity on the caplet surface).
    A fixing AT a cap maturity pays one period later, i.e. belongs to
    the LONGER cap — boundaries belong to the right segment."""

    def __init__(self, segment_ends: Sequence[float], volatilities: Sequence[float],
                 convention: str = "lognormal", displacement: float = 0.0,
                 strike: Optional[float] = None):
        ends = np.asarray(segment_ends, dtype=np.float64)
        vols = np.asarray(volatilities, dtype=np.float64)
        if ends.shape != vols.shape or ends.ndim != 1 or len(ends) == 0:
            raise ValueError("need matching 1-d segment_ends/volatilities")
        if np.any(np.diff(ends) <= 0.0):
            raise ValueError("segment ends must be strictly increasing")
        self.segment_ends = ends
        self.volatilities = vols
        self.convention = convention
        self.displacement = float(displacement)
        self.strike = strike

    def get_caplet_volatility(self, fixing_time) -> np.ndarray:
        """Vectorized piecewise-constant lookup; a fixing AT a cap
        maturity belongs to the next (longer) cap's segment, matching
        the payment-time cap membership used by the stripper."""
        t = np.asarray(fixing_time, dtype=np.float64)
        idx = np.minimum(np.searchsorted(self.segment_ends, t, side="right"),
                         len(self.segment_ends) - 1)
        return self.volatilities[idx]

    getCapletVolatility = get_caplet_volatility

    def __repr__(self):
        return (f"CapletVolatilityCurve({self.convention}, "
                f"segments={len(self.segment_ends)})")


def strip_caplet_volatilities(discount_curve: DiscountCurve,
                              forward_curve: ForwardCurve,
                              cap_maturities: Sequence[float],
                              quotes: Sequence[float],
                              strike: float, period: float,
                              convention: str = "lognormal",
                              quote_type: str = "flat_volatility",
                              displacement: float = 0.0,
                              first_fixing: Optional[float] = None,
                              ) -> CapletVolatilityCurve:
    """Bootstrap piecewise-constant caplet volatilities from co-terminal
    cap quotes at increasing maturities (all at one strike).

    Cap k contains every caplet of cap k-1 plus the fixings in
    (M_{k-1}, M_k]; its price minus the already-stripped front caplets
    leaves a 1-d monotone root-find for the new segment's volatility.
    ``quote_type``: "flat_volatility" (converted to prices first) or
    "price".
    """
    mats = np.asarray(cap_maturities, dtype=np.float64)
    q = np.asarray(quotes, dtype=np.float64)
    if mats.shape != q.shape or mats.ndim != 1 or len(mats) == 0:
        raise ValueError("need matching 1-d maturities/quotes")
    if np.any(np.diff(mats) <= 0.0):
        raise ValueError("cap maturities must be strictly increasing")
    if quote_type not in ("flat_volatility", "price"):
        raise ValueError(f"unknown quote_type {quote_type!r}")

    all_fixings = make_cap_schedule(float(mats[-1]), period, first_fixing)
    seg_vols = []
    prev_end = 0.0
    front_value = 0.0
    for k, (m, quote) in enumerate(zip(mats, q)):
        fixings_k = all_fixings[all_fixings + period <= m + 1e-9]
        if quote_type == "flat_volatility":
            target = cap_value(discount_curve, forward_curve, fixings_k,
                               period, strike, float(quote), convention,
                               displacement)
        else:
            target = float(quote)
        new = fixings_k[fixings_k > prev_end + 1e-9]
        if len(new) == 0:
            raise ValueError(
                f"cap maturity {m} adds no new caplet past {prev_end}")
        residual = target - front_value

        def seg_value(v):
            return cap_value(discount_curve, forward_curve, new, period,
                             strike, v, convention, displacement)

        lo, hi = 1e-9, 5.0 if convention == "lognormal" else 1.0
        if seg_value(lo) > residual + 1e-15:
            raise ValueError(
                f"cap quote at maturity {m} is below the value already "
                f"locked in by shorter maturities (residual {residual:.6g} "
                f"< intrinsic {seg_value(lo):.6g}) — quotes not "
                f"arbitrage-consistent")
        if seg_value(hi) < residual:
            raise ValueError(
                f"cap quote at maturity {m} needs segment vol > {hi}")
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if seg_value(mid) < residual:
                lo = mid
            else:
                hi = mid
            if hi - lo < 1e-13:
                break
        v_seg = 0.5 * (lo + hi)
        seg_vols.append(v_seg)
        front_value += seg_value(v_seg)
        prev_end = float(new[-1])
    return CapletVolatilityCurve(mats, seg_vols, convention, displacement,
                                 strike)


def strip_caplet_surface(discount_curve: DiscountCurve,
                         forward_curve: ForwardCurve,
                         cap_maturities: Sequence[float],
                         strikes: Sequence[float],
                         quote_matrix, period: float,
                         convention: str = "lognormal",
                         quote_type: str = "flat_volatility",
                         displacement: float = 0.0) -> list:
    """Strip a (maturity x strike) cap quote matrix column by column —
    one independent :func:`strip_caplet_volatilities` per strike, the
    per-strike-column bootstrap finmath's caplet surface performs.
    Returns one :class:`CapletVolatilityCurve` per strike."""
    quote_matrix = np.asarray(quote_matrix, dtype=np.float64)
    if quote_matrix.shape != (len(cap_maturities), len(strikes)):
        raise ValueError("quote_matrix must be [maturities, strikes]")
    return [
        strip_caplet_volatilities(discount_curve, forward_curve,
                                  cap_maturities, quote_matrix[:, j],
                                  float(K), period, convention, quote_type,
                                  displacement)
        for j, K in enumerate(strikes)
    ]


class LIBORVolatilityModelFromCapletCurve:
    """Non-calibrateable LMM volatility model pinned to a stripped
    caplet curve: sigma_i(t) = sigma_caplet(T_i) for every simulation
    time t < T_i. Under the LOGNORMAL state space the caplet on forward
    i depends on its own total variance sigma_i^2 T_i only, so the MC
    engine reproduces every stripped caplet price by construction —
    the market-data-to-model bridge finmath builds with
    ``LIBORVolatilityModelFromGivenMatrix`` over a bootstrapped surface.

    Covariance API: ``n_params = 0`` (fixed), ``vol_table(params)``
    ignores its argument and returns the constant [steps, libors] table
    (0 where the forward is already fixed, matching
    ``LIBORVolatilityModelPiecewiseConstant.vol_table``)."""

    def __init__(self, simulation_td, libor_td,
                 caplet_curve: CapletVolatilityCurve):
        import jax.numpy as jnp  # deferred: host-only users skip jax

        if caplet_curve.convention != "lognormal":
            raise ValueError(
                "LMM lognormal state space needs lognormal caplet vols; "
                "convert normal quotes first")
        self.simulation_td = simulation_td
        self.libor_td = libor_td
        self.caplet_curve = caplet_curve
        n_steps = simulation_td.get_number_of_time_steps()
        n_libor = libor_td.get_number_of_time_steps()
        table = np.zeros((n_steps, n_libor), dtype=np.float64)
        for m in range(n_steps):
            t = simulation_td.get_time(m)
            for i in range(n_libor):
                T_i = libor_td.get_time(i)
                if T_i - t > 0.0:
                    table[m, i] = caplet_curve.get_caplet_volatility(T_i)
        self.n_params = 0
        self.initial_parameters = np.zeros(0, dtype=np.float64)
        self._table = jnp.asarray(table)

    def vol_table(self, params):
        return self._table
