"""LIBOR Market Model on TPU: simulation + swaption valuation as one fused,
differentiable program.

Rebuild of finmath-lib's ``LIBORMarketModelFromCovarianceModel`` +
``EulerSchemeFromProcessModel`` + ``SwaptionSimple`` as driven by the
reference's calibration tests (/root/reference/.../LIBORMarketModelCalibration
ATMTest.java:270-466). Supports both finmath measures (SPOT rolling account /
TERMINAL zero bond), both state spaces (NORMAL / LOGNORMAL log-Euler), a
simulation grid refining the tenor grid, and float32/float64 path storage
(the f64 mode is the 1e-6 price-parity oracle).

TPU-first design notes (this is where the architecture deliberately departs
from the reference; see SURVEY.md §3.5 and §7):

* The reference values each of the ~156 calibration swaptions separately,
  each valuation re-running a full Euler sweep of tiny per-op CUDA kernels
  — tens of thousands of kernel launches per optimizer iteration. Here ONE
  jitted function simulates all paths once per parameter vector and values
  ALL products from the same path ensemble; the per-exercise annuity sums
  are batched into a single [products x libors] @ [libors x paths] matmul
  that runs on the MXU.
* The time loop ships in two shapes behind ``scan_mode``: "fused" (ONE
  ``lax.scan`` with a ``lax.cond``-gated collector at exercise steps —
  small jaxpr, ~4x faster XLA compiles, the default) and "segmented" (one
  scan per exercise segment, no per-step branch — ~25% faster warm, used
  by the calibration workloads that re-run the compiled programs hundreds
  of times). Either way XLA fuses each Euler step's drift/diffusion chain
  into a few VPU loops over the [libors, paths] block.
* The whole program — simulate, value, invert to implied vol, residuals —
  is differentiable; ``jax.jacfwd`` gives the calibration Jacobian in one
  batched forward pass instead of finmath's per-parameter finite
  differences (parameterStep 1e-4, ATM test :339).
* Storage is float32 on the path axis; reductions accumulate float64
  (the framework-wide precision contract).

Spot-measure drift, NORMAL state space (forwards evolved directly):
  dL_i = lambda_i . (sum_{j=m+1..i} delta_j lambda_j / (1+delta_j L_j)) dt
         + lambda_i . dW
with lambda_{i,f}(t, L) = localFactor(L_i) * sigma_i(t) * R_{i,f}; the inner
sum is a masked cumulative sum over the libor axis, vectorized over paths.
Numeraire: N(T_m) = prod_{j<m} (1 + delta_j L_j(T_j)) (spot rolling
account), with the deterministic adjustment E[1/N(T)] -> df(T) finmath
applies when a discount curve is supplied.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import numpy as np

from ...ops.random_variable import ACC_DTYPE, FLOAT_DTYPE
from ..curves import DiscountCurve, ForwardCurve, par_swap_rate
from ..time_discretization import TimeDiscretization


# ---------------------------------------------------------------------------
# differentiable implied-volatility inversion (f64 scalars/vectors)
# ---------------------------------------------------------------------------

_SQRT_2PI = math.sqrt(2.0 * math.pi)


def _ncdf(x):
    return 0.5 * (1.0 + jax.scipy.special.erf(x / np.sqrt(2.0)))


def _npdf(x):
    return jnp.exp(-0.5 * x * x) / _SQRT_2PI


def bachelier_implied_vol_jnp(value, forward, strike, maturity, annuity,
                              num_iter: int = 20):
    """Differentiable Bachelier (normal) implied volatility via Newton with
    an exact-ATM initial guess. Vectorized over products."""
    sqrt_t = jnp.sqrt(maturity)
    p = jnp.maximum(value / annuity, 1e-14)
    sigma0 = p * _SQRT_2PI / sqrt_t  # exact at the money

    def body(sigma, _):
        d = (forward - strike) / (sigma * sqrt_t)
        val = (forward - strike) * _ncdf(d) + sigma * sqrt_t * _npdf(d)
        vega = sqrt_t * _npdf(d)
        step = (val - p) / jnp.maximum(vega, 1e-14)
        return jnp.clip(sigma - step, 1e-12, 10.0), None

    sigma, _ = jax.lax.scan(body, sigma0, None, length=num_iter)
    return sigma


def black_implied_vol_jnp(value, forward, strike, maturity, annuity,
                          num_iter: int = 60):
    """Differentiable Black (lognormal) implied volatility.

    Deep in-the-money options have almost no vega, so we invert the TIME
    VALUE of the out-of-the-money twin (call-put parity: equal time value,
    same vega, far better conditioning) with Newton from the
    Manaster-Koehler seed sigma0 = sqrt(2|ln(F/K)|/T) (globally convergent
    for Black). The OTM value is computed from erfc tail probabilities —
    the 0.5*(1+erf) form loses all relative precision in the tails, which
    stalls Newton for deep-ITM quotes (observed on TPU: 3.4e-3 vol error;
    erfc reduces it to float roundoff). Quotes at/below intrinsic value
    return vol 0 like the host-side inverters."""
    sqrt_t = jnp.sqrt(maturity)
    p = value / annuity
    intrinsic = jnp.maximum(forward - strike, 0.0)
    raw_time_value = p - intrinsic
    time_value = jnp.maximum(raw_time_value, 1e-16)
    # OTM twin: if F >= K invert the put (value = time value), else the call
    is_itm = forward >= strike
    erfc = jax.scipy.special.erfc
    inv_sqrt2 = 1.0 / np.sqrt(2.0)

    sigma0 = jnp.maximum(
        jnp.sqrt(2.0 * jnp.abs(jnp.log(forward / strike)) / maturity), 1e-2
    )

    def otm_value(sigma):
        v = jnp.maximum(sigma, 1e-8) * sqrt_t
        d1 = jnp.log(forward / strike) / v + 0.5 * v
        d2 = d1 - v
        # tail-safe: call = F*N(d1) - K*N(d2) with N(d) = erfc(-d/sqrt2)/2,
        # put  = K*N(-d2) - F*N(-d1) with N(-d) = erfc(d/sqrt2)/2
        call = 0.5 * (forward * erfc(-d1 * inv_sqrt2)
                      - strike * erfc(-d2 * inv_sqrt2))
        put = 0.5 * (strike * erfc(d2 * inv_sqrt2)
                     - forward * erfc(d1 * inv_sqrt2))
        vega = forward * sqrt_t * _npdf(d1)
        return jnp.where(is_itm, put, call), vega

    def body(sigma, _):
        val, vega = otm_value(sigma)
        step = (val - time_value) / jnp.maximum(vega, 1e-16)
        # damped Newton: cap the multiplicative move to keep it stable
        step = jnp.clip(step, -0.5 * sigma, 0.5 * sigma)
        return jnp.clip(sigma - step, 1e-8, 10.0), None

    sigma, _ = jax.lax.scan(body, sigma0, None, length=num_iter)
    # quotes at/below intrinsic (within float roundoff of F - K) carry no
    # volatility information -> 0, matching the host-side inverters
    return jnp.where(raw_time_value <= 1e-12 * forward, 0.0, sigma)


# ---------------------------------------------------------------------------
# products
# ---------------------------------------------------------------------------

def bond_ratio_cumprod(L, deltas_col, e, j_iota):
    """Discount-bond curve at T_e from the live forwards:
    cp[j] = P(T_e, T_{j+1}) as the cumulative product of the bond ratios
    1/(1 + delta_j L_j) for j >= e (identity below e). ``e`` may be a
    Python int or a traced scalar. Shared by the valuation collector and
    the Bermudan Longstaff-Schwartz pricer so the core bond-curve
    arithmetic lives in exactly one place."""
    r = jnp.where(j_iota >= e, 1.0 / (1.0 + deltas_col * L), 1.0)
    return jnp.cumprod(r, axis=0)


def bond_ratio_cumprod_adjoint(L, deltas_col, e, j_iota):
    """``bond_ratio_cumprod`` for REVERSE-MODE consumers: identical
    values up to a few ULPs, built as ``exp(cumsum(log r))`` so the
    cotangent of row j reaches only input rows <= j.

    Why it exists (measured on the TPU backend, 2026-08-18):
    ``jnp.cumprod``'s VJP computes prefix/suffix RATIOS across the whole
    axis, and one wild-but-finite Monte-Carlo path (pole-floored accrual
    factor r ~ 1e6 in rows AFTER every priced bond) leaks O(1e5)
    cotangent garbage into buckets the value does not depend on:
    d sum(cp[11]) / d fwd0[72] measured 6.9e5 by reverse-mode cumprod,
    exactly 0 by forward-mode jvp AND by finite differences — and the
    cross-terms also polluted LIVE buckets by ~0.02%. Appears above
    ~50k paths (needs one wild path in the ensemble); CPU is clean; the
    log form is exactly 0 on the same ensemble (BENCHMARKS.md, CVA
    ladder section). Forward values only ever go through the plain or
    compensated scans — this variant is for gradient cores.

    Requires dead-masked inputs: every live accrual factor must be
    positive (guaranteed after the ``adjoint_dead_mask`` substitution,
    whose criterion includes ``1 + delta L <= 1e-6``)."""
    r = jnp.where(j_iota >= e, 1.0 / (1.0 + deltas_col * L), 1.0)
    return jnp.exp(jnp.cumsum(jnp.log(jnp.maximum(r, 1e-30)), axis=0))


def _two_prod_err(a, b, x):
    """Exact rounding error of ``x = a * b`` in the working precision
    (Dekker/Veltkamp splitting; needs round-to-nearest and no overflow —
    both hold for bond ratios near 1). Returns err with a*b == x + err
    exactly. ~10 VPU flops, no doubles."""
    # split point: mantissa bits ceil(p/2); f32 p=24 -> 2^12+1, f64 -> 2^27+1
    split = 4097.0 if a.dtype == jnp.float32 else 134217729.0
    ca = split * a
    a_hi = ca - (ca - a)
    a_lo = a - a_hi
    cb = split * b
    b_hi = cb - (cb - b)
    b_lo = b - b_hi
    return ((a_hi * b_hi - x) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo


def bond_ratio_cumprod_hi(L, deltas_col, e, j_iota, hi_dtype):
    """``bond_ratio_cumprod`` accurate to ``hi_dtype`` at ~f32 scan cost.

    The swaption payoff 1 - P_end - K*annuity needs P_end far below the
    ~n*ulp bias a straight f32 cumprod accumulates (the round-2 4.8e-6
    parity tail), but a full f64 cumprod is an O(n log n) associative
    scan in TPU-EMULATED doubles (measured ~150 ms at 80 x 409,600 — 3x
    the whole valuation; blocked f32/f64 mixing does NOT help because
    the f32 within-block multiplies and the f32-computed ratios carry
    the bias, not the cross-block combine). Instead run the whole scan
    in f32 but COMPENSATED: track the exact relative rounding error of
    (a) forming s = 1 + delta*L, (b) every scan multiply (Dekker
    two-product, exact under round-to-nearest), and (c) the final
    reciprocal, then apply one elementwise hi-dtype fixup
    cp_hi = (1/S)*(1 + rho - C). First-order compensation leaves
    O((n*ulp)^2) ~ 1e-11 relative — f64-grade at f32 speed (measured
    on-chip: strict max rel dev 1e-7 vs the f64 oracle, ATM 409,600-path
    valuation ~84 ms, unchanged from pure f32)."""
    if jnp.dtype(L.dtype) == jnp.dtype(hi_dtype):
        return bond_ratio_cumprod(L, deltas_col, e, j_iota)
    live = j_iota >= e
    t = deltas_col * L
    err_t = _two_prod_err(deltas_col, L, t)
    s = 1.0 + t
    err_s = (1.0 - s) + t               # fast two-sum, exact for |t| <= 1
    s = jnp.where(live, s, 1.0)
    c0 = jnp.where(live, (err_t + err_s) / s, 0.0)

    def comb(a, b):
        p1, c1 = a
        p2, c2 = b
        p = p1 * p2
        return p, c1 + c2 + _two_prod_err(p1, p2, p) / p

    S, C = jax.lax.associative_scan(comb, (s, c0), axis=0)
    # reciprocal with exact residual: 1/S_true ~ (1/S)(1 + rho - C)
    cp = 1.0 / S
    x = S * cp
    rho = (1.0 - x) - _two_prod_err(S, cp, x)
    return cp.astype(hi_dtype) * (1.0 + (rho - C).astype(hi_dtype))


def adjoint_dead_mask(L, N, deltas_col, spot):
    """Paths whose bond-ratio scan would NaN a reverse-mode adjoint.

    A path is adjoint-dead when its accrual factors hit the pole/negative
    territory OR any CONTIGUOUS block product of the bond-ratio scan
    would leave f32 range. Overflow does not require any single L near
    the +-1e3 clamp (80 factors of moderately-insane rates suffice), and
    the NET log-sum is not enough either: offsetting small factors can
    hide an overflowing prefix. Exact criterion on the running log-sum:
    every scan tree node is a contiguous block [i..j] with log-product =
    logcum[j] - logcum[i-1] <= max ascent, and the final reciprocal
    needs logcum[k] > -85 everywhere. Under the spot measure the account
    N crosses zero / goes negative on pole paths (an accrual factor
    1 + delta L < 0 flips its sign) possibly long before the event, with
    a perfectly sane event-time L — the reciprocal's -1/N^2 = inf
    partial then NaNs the adjoint even under a zero cotangent, so N is
    range-checked too. NaN-safe: ``~(x < t)`` is True for NaN bounds (a
    NaN L would make the comparison silently False the other way).
    Shared by the valuation delta ladders and the CVA exposure ladder."""
    sfac = 1.0 + deltas_col * L
    logs = jnp.log(jnp.maximum(jnp.abs(sfac), 1e-30))
    logcum = jnp.cumsum(logs, axis=0)
    runmin = jax.lax.cummin(jnp.minimum(logcum, 0.0), axis=0)
    ascent = jnp.max(logcum - runmin, axis=0)
    bad = jnp.any(~jnp.isfinite(L) | (jnp.abs(L) >= 999.0)
                  | (sfac <= 1e-6), axis=0)
    if spot:
        bad = bad | ~(N > 1e-12) | ~(N < 1e30)
    return (bad | ~(ascent < 85.0)
            | ~(jnp.min(logcum, axis=0) > -85.0))              # [paths]


@dataclass(frozen=True)
class SwaptionProduct:
    """A (payer) swaption on the model tenor grid, quoted in a value unit.

    Equivalent of finmath's SwaptionSimple(swaprate, swapTenor, ValueUnit)
    (ATM test :507-510). ``exercise_index``/``num_periods`` are indices on
    the LIBOR tenor grid.
    """

    exercise_index: int
    num_periods: int
    strike: float
    target: float                 # target in the chosen value unit
    weight: float = 1.0
    value_unit: str = "VOLATILITYNORMAL"  # | VOLATILITYLOGNORMAL | VALUE


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class LIBORMarketModelTPU:
    """Static model definition: tenor grid, initial forwards, curves,
    covariance model, measure/state-space conventions.

    ``measure``: "spot" (rolling spot account numeraire) or "terminal"
    (zero bond P(., T_n) numeraire) — finmath
    LIBORMarketModelFromCovarianceModel.Measure (property "measure").
    ``state_space``: "normal" (forwards evolved directly; local-vol
    covariance wrappers give displaced/blended dynamics) or "lognormal"
    (log-Euler with the standard -0.5 lambda^2 Ito correction) — finmath
    StateSpace (property "stateSpace", ATM test :311-314).
    ``simulation_td``: optional simulation grid FINER than the tenor grid
    (every tenor point must be a simulation point); defaults to the tenor
    grid itself, the reference workloads' configuration."""

    def __init__(self, libor_td: TimeDiscretization,
                 forward_curve: ForwardCurve,
                 discount_curve: DiscountCurve,
                 covariance_model,
                 measure: str = "spot",
                 state_space: str = "normal",
                 use_numeraire_adjustment: bool = True,
                 simulation_td: Optional[TimeDiscretization] = None):
        if measure not in ("spot", "terminal"):
            raise ValueError(f"unknown measure {measure!r}")
        if state_space not in ("normal", "lognormal"):
            raise ValueError(f"unknown state_space {state_space!r}")
        self.measure = measure
        self.state_space = state_space
        self.libor_td = libor_td
        self.simulation_td = simulation_td if simulation_td is not None else libor_td
        self.forward_curve = forward_curve
        self.discount_curve = discount_curve
        self.covariance = covariance_model
        self.use_numeraire_adjustment = use_numeraire_adjustment

        n = libor_td.get_number_of_time_steps()
        self.num_libors = n
        self.tenor_times = np.asarray([libor_td.get_time(i) for i in range(n + 1)])
        self.deltas = self.tenor_times[1:] - self.tenor_times[:-1]
        self.initial_forwards = forward_curve.get_forward(self.tenor_times[:-1])

        # simulation grid: must contain every tenor point
        s = self.simulation_td.get_number_of_time_steps()
        self.sim_times = np.asarray([self.simulation_td.get_time(i)
                                     for i in range(s + 1)])
        for t in self.tenor_times:
            if t <= self.sim_times[-1] and not np.any(
                    np.isclose(self.sim_times, t, atol=1e-9)):
                raise ValueError(
                    f"tenor point {t} is not on the simulation grid; the "
                    "simulation grid must refine the tenor grid")

    def get_number_of_libors(self) -> int:
        return self.num_libors


# ---------------------------------------------------------------------------
# valuation engine
# ---------------------------------------------------------------------------

class LMMValuationEngine:
    """Compiles (model, products, paths, factors, seed) into jitted
    ``values/implied_vols/residuals`` functions of the covariance
    parameter vector."""

    def __init__(self, model: LIBORMarketModelTPU,
                 products: Sequence[SwaptionProduct],
                 num_paths: int, num_factors: int, seed: int = 31415,
                 mesh=None, path_axis: str = "paths",
                 scheme: str = "euler", dtype=None,
                 scan_mode: str = "fused", antithetic: bool = False,
                 increments=None, collect_dtype=None):
        """``mesh``: optional jax.sharding.Mesh — Monte-Carlo paths are then
        data-parallel over its ``path_axis``: each device folds its own RNG
        key, simulates num_paths/n_devices paths locally, and every
        expectation becomes a local f64 sum + psum over ICI. The parameter
        vector stays replicated, so jacfwd Jacobians flow through the
        collective unchanged (the multi-chip story of SURVEY.md §2/§5 —
        the reference is single-device).

        ``increments``: optional injected Brownian increments — a
        ``[num_steps, num_rng_factors, num_paths]`` array (already scaled
        by sqrt(dt); ``num_rng_factors`` = num_factors, +1 when the
        covariance has stochastic volatility) or an object with an
        ``.increments`` attribute of that shape (e.g.
        ``BrownianMotionFinmathMersenne``). Replaces the engine's own
        Threefry stream, so the engine can price/calibrate on an EXTERNAL
        realization — finmath's factory-injection pattern where host
        Mersenne increments drive the device backend
        (LIBORMarketModelCalibrationATMTest.java:283,
        MonteCarloBlackScholesModelTest.java:78-91), used to settle
        fidelity questions on the reference's own path realization and to
        validate the Pallas kernels against the scan engine on identical
        normals. Composes with ``mesh`` (increments are sharded over the
        path axis) and with the f64 oracle mode (same stream, different
        arithmetic); mutually exclusive with ``antithetic``."""
        self.model = model
        self.num_paths = int(num_paths)
        self.num_factors = int(num_factors)
        cov_factors = getattr(model.covariance, "num_factors", None)
        if cov_factors is not None and int(cov_factors) != self.num_factors:
            # lam [n, F_cov, paths] against dW [F_engine, paths] would
            # silently BROADCAST when F_engine == 1, collapsing the factor
            # structure into sum_f lambda_f * dW_1 (measured: an ATM caplet
            # priced 19% low under a 2-factor correlation) — make the
            # mismatch loud instead
            raise ValueError(
                f"engine num_factors={self.num_factors} but the covariance "
                f"model has {cov_factors} factors; they must match (the "
                "factor reduction lives in the correlation model)")
        self.seed = int(seed)
        self.mesh = mesh
        self.path_axis = path_axis
        #: path-axis storage dtype — float32 (framework contract) by
        #: default; float64 gives the double-precision oracle mode used by
        #: the 1e-6 price-parity tests (north star, BASELINE.md)
        self.dtype = jnp.dtype(dtype) if dtype is not None else FLOAT_DTYPE
        #: dtype of the COLLECTION arithmetic (bond-ratio cumprod, annuity
        #: matmul, payoff assembly) — float64 by default: the swaption
        #: payoff 1 - P_end - K*annuity cancels O(1) terms down to O(1e-2),
        #: so f32 collection turns a few ULPs of absolute error into
        #: ~5e-6 RELATIVE on small-value products, the measured round-2
        #: violator of the 1e-6 parity contract (BENCH_r02 parity_1e6 max
        #: 4.8e-6). Simulation storage stays f32 (the framework contract);
        #: only the per-event collector runs in doubles — elementwise VPU
        #: work on [n, paths] once per exercise date, a small fraction of
        #: the Euler sweep. Pass float32 to opt out.
        cd = (jnp.dtype(collect_dtype)
              if collect_dtype is not None else jnp.dtype(ACC_DTYPE))
        # never below the simulation dtype (an f64 engine keeps f64)
        self.collect_dtype = cd if cd.itemsize >= jnp.dtype(self.dtype).itemsize \
            else jnp.dtype(self.dtype)
        #: the spot numeraire is carried in the collection dtype too: its
        #: 40-step f32 accrual product would otherwise contribute ~5e-7
        #: relative on every price — one [paths] vector, negligible cost
        #: "fused": ONE scan with a cond-gated collector — small jaxpr,
        #: ~4x faster XLA compiles, the default. "segmented": one scan per
        #: exercise segment with inline collects — larger jaxpr but no
        #: per-step branch, ~25% faster warm runtime; used by the
        #: hot calibration workloads.
        if scan_mode not in ("fused", "segmented"):
            raise ValueError(f"unknown scan_mode {scan_mode!r}")
        self.scan_mode = scan_mode
        if scheme not in ("euler", "predictor_corrector"):
            raise ValueError(f"unknown scheme {scheme}")
        self.scheme = scheme  # finmath EulerSchemeFromProcessModel schemes
        #: antithetic variates: paths/2 independent Brownian draws plus
        #: their mirror images — same step cost, half the RNG work, and
        #: the odd-moment component of the Monte-Carlo error cancels
        #: pathwise (variance reduction the reference does not have)
        self.antithetic = bool(antithetic)
        if self.antithetic and self.num_paths % 2:
            raise ValueError("antithetic sampling requires an even num_paths")
        if increments is not None and self.antithetic:
            raise ValueError(
                "antithetic and injected increments are mutually exclusive: "
                "the injected realization defines every path")
        self._inc_np = None
        if increments is not None:
            inc = getattr(increments, "increments", increments)
            self._inc_np = np.asarray(inc)
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            if self.num_paths % n_dev:
                raise ValueError(
                    f"num_paths {self.num_paths} not divisible by mesh size {n_dev}"
                )
            self._local_paths = self.num_paths // n_dev
        else:
            self._local_paths = self.num_paths
        if self.antithetic and self._local_paths % 2:
            raise ValueError(
                "antithetic sampling requires an even per-device path count")

        n = model.num_libors
        grid_end = model.libor_td.get_last_time()

        # keep only products whose payments stay on the tenor grid — the
        # reference's valuation loop silently skips out-of-grid products via
        # try/catch (ATM test :387-401); we filter them explicitly.
        kept: List[SwaptionProduct] = []
        self.skipped: List[SwaptionProduct] = []
        for p in products:
            if p.exercise_index + p.num_periods <= n and p.exercise_index >= 1:
                kept.append(p)
            else:
                self.skipped.append(p)
        if not kept:
            raise ValueError("no products fit on the tenor grid")
        self.products = sorted(kept, key=lambda p: (p.exercise_index, p.num_periods))

        # ---- static packing -------------------------------------------------
        deltas = model.deltas
        tenor = model.tenor_times
        dc = model.discount_curve
        fc = model.forward_curve

        self.exercise_indices = sorted({p.exercise_index for p in self.products})

        # per product static curve data: annuity at t=0, forward par rate
        self._ann0, self._fwd0, self._strike, self._target, self._weight, \
            self._texp, self._unit = [], [], [], [], [], [], []
        for p in self.products:
            e, m = p.exercise_index, p.num_periods
            pay = tenor[e + 1 : e + m + 1]
            dl = deltas[e : e + m]
            ann0 = float(np.sum(dl * dc.get_discount_factor(pay)))
            fwd0 = par_swap_rate(fc, dc, tenor[e : e + m + 1])
            self._ann0.append(ann0)
            self._fwd0.append(fwd0)
            self._strike.append(p.strike)
            self._target.append(p.target)
            self._weight.append(p.weight)
            self._texp.append(float(tenor[e]))
            self._unit.append(p.value_unit)
        units = set(self._unit)
        if len(units) > 1:
            raise ValueError(f"mixed value units not supported: {units}")
        self.value_unit = units.pop()

        # ---- simulation-grid statics (single fused scan over ALL steps) ----
        sim = model.sim_times
        S = len(sim) - 1
        self.num_steps = S
        P = len(self.products)
        # L_i evolves during [sim_s, sim_{s+1}) iff sim_s < T_i
        self._alive_np = (sim[:S, None] < tenor[None, :n] - 1e-9)   # [S, n]
        # spot-account accrual: a step STARTING at tenor point T_m accrues
        # period m at the just-fixed forward L_m (one-hot over libors)
        acc = np.zeros((S, n), dtype=np.float64)
        for s_idx in range(S):
            hit = np.where(np.isclose(tenor[:n], sim[s_idx], atol=1e-9))[0]
            if hit.size:
                acc[s_idx, hit[0]] = deltas[hit[0]]
        self._accrual_np = acc                                       # [S, n]
        # exercise events: tenor index collected at the sim step that
        # STARTS at T_e (collect happens before accrual/evolution)
        collect_at = np.full(S, -1, dtype=np.int64)
        collect_ev = np.full(S, -1, dtype=np.int64)
        for ev, e in enumerate(self.exercise_indices):
            s_idx = int(np.argmin(np.abs(sim - tenor[e])))
            if not np.isclose(sim[s_idx], tenor[e], atol=1e-9) or s_idx >= S:
                raise ValueError(
                    f"exercise time {tenor[e]} is not a simulation step start")
            collect_at[s_idx] = e
            collect_ev[s_idx] = ev
        self._collect_at_np = collect_at                             # [S]
        self._collect_ev_np = collect_ev                             # [S]
        # event -> sim step (ascending), for the segmented scan mode
        self._event_steps_np = np.asarray(
            [int(np.argmin(np.abs(sim - tenor[e])))
             for e in self.exercise_indices])
        # per-product gathers
        self._ex_tenor_idx = np.asarray([p.exercise_index for p in self.products])
        self._ex_step_idx = np.asarray(
            [int(np.argmin(np.abs(sim - tenor[p.exercise_index])))
             for p in self.products])
        # event-grouped product packing: the collector values only the
        # products of the CURRENT exercise event (padded to the largest
        # group) instead of all P products at every event — the per-event
        # [P_max, n] @ [n, paths] matmul and payoff arrays shrink ~P/P_max
        E = len(self.exercise_indices)
        groups = {ev: [k for k, p in enumerate(self.products)
                       if p.exercise_index == e]
                  for ev, e in enumerate(self.exercise_indices)}
        P_max = max(len(g) for g in groups.values())
        self._p_max = P_max
        ev_pay_mask = np.zeros((E, P_max, n), dtype=np.float64)
        ev_end_idx = np.zeros((E, P_max), dtype=np.int64)
        ev_strikes = np.zeros((E, P_max), dtype=np.float64)
        slot_of = np.zeros(P, dtype=np.int64)
        ev_of = np.zeros(P, dtype=np.int64)
        for ev, ks in groups.items():
            for k in ks:
                ev_of[k] = ev
            for slot, k in enumerate(ks):
                p = self.products[k]
                ev_pay_mask[ev, slot,
                            p.exercise_index : p.exercise_index + p.num_periods] = \
                    deltas[p.exercise_index : p.exercise_index + p.num_periods]
                ev_end_idx[ev, slot] = p.exercise_index + p.num_periods - 1
                ev_strikes[ev, slot] = p.strike
                slot_of[k] = slot
        self._ev_pay_mask_np = ev_pay_mask
        self._ev_end_idx_np = ev_end_idx
        self._ev_strikes_np = ev_strikes
        self._slot_of_np = slot_of
        self._ev_of_product_np = ev_of
        # terminal-measure numeraire at t=0: P(0, T_n) from the model's own
        # initial forwards (finmath computes getNumeraire(0) from the MC
        # model's initial state, i.e. the forward curve)
        self._p0_terminal = float(np.prod(
            1.0 / (1.0 + deltas * np.asarray(model.initial_forwards))))
        # discount factors at the exercise dates (numeraire adjustment)
        self._df_exercise = np.asarray(
            [float(dc.get_discount_factor(float(tenor[p.exercise_index])))
             for p in self.products])

        # stochastic volatility consumes one extra Brownian factor
        self._n_rng_factors = (self.num_factors + 1
                               if model.covariance.has_stoch_vol
                               else self.num_factors)
        if self._inc_np is not None:
            # steps after the last exercise event are never consumed (both
            # scan modes stop there), so an increments array covering at
            # least the consumed prefix is accepted — e.g. the full-size
            # same-normals kernel comparison simulates 10 of the model's
            # 40 grid steps
            # fused mode's scan includes the last event step (the collect
            # fires inside it), segmented mode stops right at the event
            if len(self._event_steps_np):
                s_need = int(self._event_steps_np[-1]) + (
                    1 if self.scan_mode == "fused" else 0)
            else:
                s_need = self.num_steps
            shape = self._inc_np.shape
            if (len(shape) != 3 or shape[1] != self._n_rng_factors
                    or shape[2] != self.num_paths
                    or shape[0] < s_need or shape[0] > self.num_steps):
                raise ValueError(
                    f"injected increments have shape {shape}, engine needs "
                    f"[steps in {s_need}..{self.num_steps}, rng_factors="
                    f"{self._n_rng_factors}, paths={self.num_paths}]")

        self._inc_dev = (jnp.asarray(self._inc_np)
                         if self._inc_np is not None else None)
        self._residual_fn = self._wrap_public(self._build_residual_fn())
        self._jac_fn = self._wrap_public(self._build_residual_fn(),
                                         transform=jax.jacfwd)
        self._values_fn = self._wrap_public(self._build_values_fn())
        self._implied_fn = self._wrap_public(self._build_implied_fn())

    # ------------------------------------------------------------------
    # AOT program persistence (round 4): serialize the lowered StableHLO
    # of the four public programs so a later process skips tracing +
    # lowering entirely (utils/aot.py; measured 32.6 s vs 140-475 s for
    # the 81,920-path stoch-vol set). Strictly best-effort: any
    # mismatch/failure falls back to the normal jit path.
    _AOT_PROGRAMS = (("residuals", "_residual_fn"),
                     ("jacobian", "_jac_fn"),
                     ("values", "_values_fn"),
                     ("implied", "_implied_fn"))

    def _aot_config(self):
        model = self.model
        cov = model.covariance
        # the covariance's INTERNAL configuration (decay constants, vol
        # grids, factor counts...) and the curve-derived engine constants
        # are baked into the lowered program; fingerprint them
        # numerically via the prepared tables at the initial parameters —
        # a class name alone would let two differently-configured
        # engines collide on one artifact (a silent wrong-price bug)
        p0 = jnp.asarray(np.asarray(cov.initial_parameters,
                                    dtype=np.float64))
        prep = cov.prepare(p0)
        cov_fp = (np.asarray(cov.initial_parameters).tobytes()
                  + np.asarray(cov.vol_table(prep)).tobytes()
                  + np.asarray(cov.factor_matrix(prep)).tobytes())
        const_fp = b"".join(
            np.asarray(getattr(self, a)).tobytes()
            for a in ("_df_exercise", "_fwd0", "_ann0", "_target")
            if getattr(self, a, None) is not None)
        parts = [self.num_paths, self.num_factors, self.num_steps,
                 self.scan_mode, str(self.dtype), str(self.collect_dtype),
                 bool(self.antithetic),
                 tuple(repr(p) for p in self.products),
                 type(cov).__name__, cov_fp, const_fp,
                 model.measure, model.state_space,
                 bool(model.use_numeraire_adjustment),
                 np.asarray(model.initial_forwards).tobytes(),
                 np.asarray(model.deltas).tobytes()]
        if self._inc_np is None:
            # the Threefry key is a program constant
            parts += [self.seed]
        else:
            # injected realizations are a traced argument: shape-keyed
            parts += [self._inc_np.shape, str(self._inc_np.dtype)]
        return tuple(parts)

    def _aot_examples(self):
        import jax as _jax

        n_params = int(self.model.covariance.n_params)
        p = _jax.ShapeDtypeStruct((n_params,), jnp.float64)
        if self._inc_np is None:
            return (p,)
        return (p, _jax.ShapeDtypeStruct(self._inc_np.shape,
                                         self._inc_np.dtype))

    def export_programs(self, directory=None):
        """Serialize the lowered public programs (single-device engines
        only); returns the number written."""
        from ...utils import aot

        if self.mesh is not None:
            return 0
        directory = directory or aot.default_cache_dir()
        cfg = self._aot_config()
        examples = self._aot_examples()
        n = 0
        for name, attr in self._AOT_PROGRAMS:
            fn = getattr(self, attr)
            jitted = getattr(fn, "_jitted", fn)
            if aot.save_program(directory, name, cfg + (name,), jitted,
                                *examples) is not None:
                n += 1
        return n

    def export_program(self, name: str, directory=None) -> bool:
        """Serialize ONE public program (``residuals``/``jacobian``/
        ``values``/``implied``) — for consumers like the parity leg that
        use a single program per engine and should not pay the tracing/
        lowering of the other three."""
        from ...utils import aot

        if self.mesh is not None:
            return False
        attr = dict(self._AOT_PROGRAMS).get(name)
        if attr is None:
            raise ValueError(f"unknown program {name!r}")
        directory = directory or aot.default_cache_dir()
        fn = getattr(self, attr)
        jitted = getattr(fn, "_jitted", fn)
        return aot.save_program(
            directory, name, self._aot_config() + (name,), jitted,
            *self._aot_examples()) is not None

    def load_program_by_name(self, name: str, directory=None) -> bool:
        from ...utils import aot

        if self.mesh is not None:
            return False
        attr = dict(self._AOT_PROGRAMS).get(name)
        if attr is None:
            raise ValueError(f"unknown program {name!r}")
        directory = directory or aot.default_cache_dir()
        call = aot.load_program(directory, name,
                                self._aot_config() + (name,))
        if call is None:
            return False
        if self._inc_np is None:
            setattr(self, attr, call)
        else:
            setattr(self, attr,
                    (lambda c: lambda params: c(params, self._inc_dev))(call))
        return True

    def load_programs(self, directory=None) -> bool:
        """Replace the public programs with previously exported ones
        (all-or-nothing); True when every program loaded."""
        from ...utils import aot

        if self.mesh is not None:
            return False
        directory = directory or aot.default_cache_dir()
        cfg = self._aot_config()
        calls = {}
        for name, attr in self._AOT_PROGRAMS:
            call = aot.load_program(directory, name, cfg + (name,))
            if call is None:
                return False
            calls[attr] = call
        for attr, call in calls.items():
            if self._inc_np is None:
                setattr(self, attr, call)
            else:
                setattr(self, attr,
                        (lambda c: lambda params: c(params, self._inc_dev))(call))
        return True

    # ------------------------------------------------------------------
    def set_increments(self, inc):
        """Swap the injected Brownian realization WITHOUT recompiling.

        The jitted public programs take the increments as a traced
        ARGUMENT (see ``_wrap_public``), so a same-shape swap reuses the
        already-compiled program — the multi-realization calibration row
        (bench.py) and any QMC re-scrambling loop depend on this being
        free. Only valid on an engine built with ``increments=``."""
        if self._inc_np is None:
            raise ValueError(
                "engine was built without injected increments; build with "
                "increments= to use realization swapping")
        inc = np.asarray(inc)
        if inc.shape != self._inc_np.shape:
            raise ValueError(
                f"replacement increments shape {inc.shape} != engine's "
                f"{self._inc_np.shape}")
        if inc.dtype != self._inc_np.dtype:
            raise ValueError(
                f"replacement increments dtype {inc.dtype} != engine's "
                f"{self._inc_np.dtype}")
        self._inc_np = inc
        self._inc_dev = jnp.asarray(inc)

    # ------------------------------------------------------------------
    def _wrap_public(self, core, transform=None):
        """Turn a ``core(params, inc) -> per-product-vector`` closure into
        a jitted public ``fn(params)``:

        * no injection: ``inc`` is closed over as None (the sim uses its
          own Threefry stream), optionally shard_mapped over the mesh;
        * injection: the increments are a traced ARGUMENT of the jitted
          program (round 4; previously a closed-over device constant) —
          one compiled program serves EVERY same-shape realization
          (finmath Mersenne, each Sobol scrambling, ...), the persistent
          compile-cache key stops depending on the increment values, and
          ``set_increments`` swaps realizations for free. Under a mesh
          the in_spec partitions the increments' path axis.

        ``transform`` (e.g. jacfwd, whose default argnums=0 touches only
        the parameter argument) is applied before jit so Jacobians
        differentiate w.r.t. params, never the increments."""
        mesh = self.mesh
        if self._inc_np is None:
            if mesh is None:
                fn = lambda params: core(params, None)  # noqa: E731
            else:
                fn = jax.shard_map(
                    lambda params: core(params, None),
                    mesh=mesh, in_specs=P(), out_specs=P())
            if transform is not None:
                fn = transform(fn)
            return jax.jit(fn)
        if mesh is None:
            base = core
        else:
            base = jax.shard_map(
                core, mesh=mesh,
                in_specs=(P(), P(None, None, self.path_axis)),
                out_specs=P())
        if transform is not None:
            base = transform(base)
        jfn = jax.jit(base)

        def wrapper(params):
            return jfn(params, self._inc_dev)

        wrapper._jitted = jfn     # introspection: cache-size assertions
        return wrapper

    # ------------------------------------------------------------------
    def _build_sim(self, params, inc=None, fwd0=None, grad_safe=False):
        """Build the per-step simulation body: returns ``(sim_step,
        carry0)`` where ``sim_step((L, N, V), s) -> (L, N, V)`` performs
        spot-account accrual + the Euler/log-Euler update for simulation
        step ``s`` (shared by the fused and segmented scan modes).

        ``inc``: optional injected Brownian increments, local shape
        ``[S, n_rng_factors, paths]``, already scaled by sqrt(dt) — used
        verbatim in place of the Threefry draws.

        ``fwd0``: optional traced ``[n]`` initial forwards replacing the
        model's (host-constant) curve forwards — the differentiation
        point of the AAD delta ladder (``forward_deltas``). The blended
        local-volatility anchor ``L0`` moves with it, so the gradient is
        the TOTAL pathwise sensitivity of the simulated dynamics.

        ``grad_safe``: floor the measure drift's accrual denominator
        |1 + delta L| away from its pole. Explosive stochastic-vol paths
        can cross L = -1/delta, where the unguarded drift produces
        inf - inf = NaN forwards (the clamp turns them into finite
        garbage the COLLECTION masks, so prices are unaffected) — but a
        NaN anywhere in a path's PRIMAL trajectory turns the backward
        scan's 0-cotangent x NaN-partial products into NaN, and the
        broadcast initial forwards sum those across paths into the
        ladder. The floor is exact identity unless a rate is within
        0.02 bp of -200%, i.e. only on paths the valuation already
        discards; used by the AAD delta core only, never by values()."""
        model = self.model
        n = model.num_libors
        cov = model.covariance
        paths = self._local_paths
        F = self.num_factors
        S = self.num_steps
        dtype = self.dtype
        spot = model.measure == "spot"
        lognormal = model.state_space == "lognormal"

        prep = cov.prepare(params)
        vol_table = cov.vol_table(prep).astype(dtype)         # [S, n]
        if vol_table.shape[0] != S:
            raise ValueError(
                f"covariance vol table has {vol_table.shape[0]} steps, the "
                f"simulation grid has {S}: build the covariance model on "
                "the model's simulation time discretization")
        R = cov.factor_matrix(prep).astype(dtype)             # [n, F]
        stoch_vol = cov.stoch_vol_params(prep) if cov.has_stoch_vol else None
        deltas = jnp.asarray(model.deltas, dtype=dtype)       # [n]
        sim = model.sim_times
        dts = jnp.asarray(sim[1:] - sim[:-1], dtype=dtype)    # [S]
        sqrt_dts = jnp.sqrt(dts)
        if fwd0 is None:
            L0 = jnp.asarray(model.initial_forwards, dtype=dtype)
        else:
            L0 = fwd0.astype(dtype)
        L0_b = jnp.broadcast_to(L0[:, None], (n, paths))
        alive_table = jnp.asarray(self._alive_np)             # [S, n] bool
        accrual_table = jnp.asarray(self._accrual_np, dtype=dtype)  # [S, n]

        base_key = jax.random.PRNGKey(self.seed)
        if self.mesh is not None:
            # distinct counter-based stream per device: no RNG broadcast
            base_key = jax.random.fold_in(
                base_key, jax.lax.axis_index(self.path_axis)
            )

        # stochastic volatility consumes one extra Brownian factor
        # (ref. wires it via BrownianMotionView on factors {0, extra},
        # benchmark test :267-269)
        n_rng_factors = F + 1 if stoch_vol is not None else F
        if stoch_vol is not None:
            nu = stoch_vol[0].astype(dtype) if hasattr(stoch_vol[0], "astype") \
                else jnp.asarray(stoch_vol[0], dtype=dtype)
            rho = stoch_vol[1].astype(dtype) if hasattr(stoch_vol[1], "astype") \
                else jnp.asarray(stoch_vol[1], dtype=dtype)

        def loadings(s, L, V, alive):
            """Factor loadings lambda [n, F, paths] at sim step s."""
            lam_t = vol_table[s][:, None] * cov.local_factor(prep, L, L0_b)
            if stoch_vol is not None:
                exponent = getattr(cov, "scaling_exponent", 0.5)
                # V carries in the collect dtype (f64 by default); ONE
                # downcast here instead of 40 accumulated f32 roundings
                Vc = V.astype(dtype)
                if exponent == 1.0:
                    scale = Vc         # finmath: lambda(t) multiplies directly
                elif exponent == 0.5:
                    scale = jnp.sqrt(Vc)
                else:
                    scale = Vc ** exponent
                lam_t = lam_t * scale[None, :]
            lam = lam_t[:, None, :] * R[:, :, None]
            return jnp.where(alive[:, None, :], lam, 0.0)

        def drift_of(s, L, lam):
            """Measure drift (finmath LIBORMarketModelFromCovarianceModel.
            getDrift): spot = prefix sum over alive j <= i; terminal =
            negative exclusive suffix sum over j > i. LOGNORMAL gets the
            L_j numerator factor and the -0.5 |lambda_i|^2 Ito term."""
            denom = 1.0 + deltas[:, None] * L
            if grad_safe:
                # pole floor (see docstring): keeps every drift primal
                # finite so the adjoint sweep stays NaN-free
                denom = jnp.where(jnp.abs(denom) < 1e-4,
                                  jnp.where(denom < 0, -1e-4, 1e-4), denom)
            mt = deltas[:, None] / denom                          # [n, paths]
            if lognormal:
                mt = mt * L
            c = mt[:, None, :] * lam                              # [n, F, paths]
            if spot:
                acc = jnp.cumsum(c, axis=0)                       # incl. own
            else:
                suffix = jnp.cumsum(c[::-1], axis=0)[::-1]        # incl. own
                acc = -(suffix - c)                               # excl. own
            mu = jnp.sum(lam * acc, axis=1)                       # [n, paths]
            if lognormal:
                mu = mu - 0.5 * jnp.sum(lam * lam, axis=1)
            return mu

        def evolve(L, mu, diffusion, dt, alive):
            if lognormal:
                arg = mu * dt + diffusion
                if grad_safe:
                    # 0 * exp(inf) = NaN on an underflowed-to-zero path;
                    # the clip is identity wherever exp is representable
                    arg = jnp.clip(arg, -88.0, 88.0)
                L_new = jnp.where(alive, L * jnp.exp(arg), L)
            else:
                L_new = jnp.where(alive, L + mu * dt + diffusion, L)
            # float32 overflow guard: under heavy-tailed stochastic vol a
            # ~5-sigma path can push |L| past f32 range within a few steps
            # (lam ~ vol * L * sqrt(V)), turning the WHOLE Monte-Carlo mean
            # into NaN via inf - inf. The reference runs in double and gets
            # huge-but-finite values on such paths; rates beyond +-1000
            # (100,000%) carry no price information either way, so clamp —
            # exactly identity for every sane path, and the clip gradient
            # is zero only on the insane ones.
            return jnp.clip(L_new, -1e3, 1e3)

        predictor_corrector = self.scheme == "predictor_corrector"

        def sim_step(carry, s):
            L, N, V = carry
            alive = alive_table[s][:, None]                       # [n, 1]
            # spot account accrues when the step starts a tenor period
            if spot:
                N = N * (1.0 + accrual_table[s] @ L)
            lam = loadings(s, L, V, alive)
            mu = drift_of(s, L, lam)
            # normals are drawn in float32 REGARDLESS of the engine dtype
            # and upcast: the float64 oracle mode then consumes the exact
            # same Brownian stream as the float32 production engine, so an
            # f32-vs-f64 price comparison isolates arithmetic error from
            # Monte-Carlo noise (the 1e-6 north-star parity contract).
            # An injected realization (finmath Mersenne, Sobol, ...) is
            # consumed verbatim instead — already scaled by sqrt(dt).
            if inc is not None:
                dw_all = inc[s].astype(dtype)
            elif self.antithetic:
                # antithetic pairs: [z, -z] along the path axis (each
                # device mirrors its own local block under a mesh)
                z = jax.random.normal(
                    jax.random.fold_in(base_key, s),
                    (n_rng_factors, paths // 2), dtype=jnp.float32,
                )
                z = jnp.concatenate([z, -z], axis=1)
                dw_all = z.astype(dtype) * sqrt_dts[s]
            else:
                z = jax.random.normal(
                    jax.random.fold_in(base_key, s), (n_rng_factors, paths),
                    dtype=jnp.float32,
                )
                dw_all = z.astype(dtype) * sqrt_dts[s]
            dw = dw_all[:F]
            # explicit HIGHEST precision: TPU f32 contractions otherwise
            # run as reduced-precision bf16 passes (~1e-4 relative), which
            # breaks the 1e-6 parity contract (set here as well as via the
            # global default so embedders who skip global config keep it)
            diffusion = jnp.einsum("nfp,fp->np", lam, dw,
                                   precision=jax.lax.Precision.HIGHEST)
            if predictor_corrector:
                # finmath's PREDICTOR_CORRECTOR scheme: average the drift at
                # the current state and at the Euler-predicted state
                L_pred = evolve(L, mu, diffusion, dts[s], alive)
                mu_pred = drift_of(s, L_pred, loadings(s, L_pred, V, alive))
                mu = 0.5 * (mu + mu_pred)
            L_new = evolve(L, mu, diffusion, dts[s], alive)
            if stoch_vol is not None:
                # exact lognormal step for the scaling process, carried in
                # the collect dtype (f64 default — a [paths] vector whose
                # 40-step multiplicative f32 accumulation was the round-2
                # parity tail at the calibrated basin):
                # dW_V = rho dW_0 + sqrt(1-rho^2) dW_extra
                # floor inside the sqrt: at |rho| > 1 (optimizer excursions)
                # sqrt(max(1-rho^2, 0)) has a 0 * inf = NaN gradient that
                # poisons the whole Jacobian; the tiny floor keeps it exact
                # for |rho| < 1 to f32 precision and finite everywhere
                vdt = self.collect_dtype
                dw_v = (rho.astype(vdt) * dw[0].astype(vdt)
                        + jnp.sqrt(jnp.maximum(
                            1.0 - rho.astype(vdt) * rho.astype(vdt), 1e-12))
                        * dw_all[F].astype(vdt))
                nu_v = nu.astype(vdt)
                if getattr(cov, "martingale_correction", True):
                    V = V * jnp.exp(nu_v * dw_v
                                    - 0.5 * nu_v * nu_v * dts[s].astype(vdt))
                else:
                    V = V * jnp.exp(nu_v * dw_v)
                # same f32 overflow guard as the forwards: cap the scaling
                # process (sqrt(1e6) = 1000x vol on a single path is far
                # beyond any price-relevant regime)
                V = jnp.minimum(V, 1e6)
            return (L_new, N, V)

        L = L0_b
        N = jnp.ones((paths,), dtype=self.collect_dtype)
        V = jnp.ones((paths,), dtype=self.collect_dtype)
        if self.mesh is not None:
            # initial carries are replicated constants but evolve
            # device-varying inside shard_map; mark them varying
            L = jax.lax.pcast(L, (self.path_axis,), to="varying")
            N = jax.lax.pcast(N, (self.path_axis,), to="varying")
            V = jax.lax.pcast(V, (self.path_axis,), to="varying")
        return sim_step, (L, N, V)

    # ------------------------------------------------------------------
    def _simulate_collect(self, params, collect, inc=None, fwd0=None,
                          remat=False, grad_safe=False):
        """Run the simulation and apply ``collect(e, ev, L, N)`` (e =
        exercise tenor index, ev = event ordinal; fixed output shape
        across events) at every exercise step, BEFORE that step's accrual
        and evolution.

        ``remat``: wrap the step body in ``jax.checkpoint`` so reverse-
        mode AD stores only the [L, N, V] carries per step and recomputes
        the step internals (loadings, drifts, diffusion) in the backward
        pass — the standard FLOPs-for-HBM trade that keeps the AAD delta
        ladder's memory at O(steps x paths) instead of O(steps x n x F x
        paths).

        Fused mode (default): ONE ``lax.scan`` over every step with a
        ``lax.cond``-gated collector — the jaxpr contains one scan + one
        cond regardless of the number of exercise dates (the round-1
        per-segment unrolling compiled ~4x slower). Returns the
        step-stacked pytree (leading axis = simulation step; rows at
        non-exercise steps are zero); gather with ``self._ex_step_idx``.

        Segmented mode: one scan per exercise segment with the collector
        inlined between segments — a larger jaxpr but no per-step branch,
        ~25% faster warm; returns the EVENT-stacked pytree (leading axis =
        event ordinal); gather with event ordinals."""
        if self.scan_mode == "segmented":
            return self._simulate_collect_segmented(params, collect, inc,
                                                    fwd0, remat, grad_safe)
        n = self.model.num_libors
        paths = self._local_paths
        dtype = self.dtype
        S = self.num_steps
        collect_at = jnp.asarray(self._collect_at_np)         # [S] int
        collect_ev = jnp.asarray(self._collect_ev_np)         # [S] int
        sim_step, carry0 = self._build_sim(params, inc, fwd0, grad_safe)
        if remat:
            sim_step = jax.checkpoint(sim_step)

        def collect_op(operand):
            return collect(*operand)

        # static output structure of the collector -> zero branch
        out_spec = jax.eval_shape(
            collect_op,
            (jnp.zeros((), dtype=jnp.int64),
             jnp.zeros((), dtype=jnp.int64),
             jax.ShapeDtypeStruct((n, paths), dtype),
             jax.ShapeDtypeStruct((paths,), self.collect_dtype)),
        )
        zero_y = jax.tree.map(
            lambda sd: jnp.zeros(sd.shape, dtype=sd.dtype), out_spec)
        if self.mesh is not None:
            # both lax.cond branches must carry the same varying-axes type
            # under shard_map: the collect branch is device-varying (it
            # consumes local paths), so the zero branch must be marked too
            zero_y = jax.tree.map(
                lambda z: jax.lax.pcast(z, (self.path_axis,), to="varying"),
                zero_y)

        def step(carry, s):
            L, N, V = carry
            y = jax.lax.cond(
                collect_at[s] >= 0,
                collect_op, lambda _: zero_y,
                (collect_at[s], collect_ev[s], L, N),
            )
            return sim_step(carry, s), y

        # nothing after the last exercise event is ever collected — stop
        # there (collect happens at the step START, so the last event's
        # step itself must run); on the 40Y ATM grid with 30Y-max expiries
        # this skips a quarter of the Euler work
        s_stop = int(self._event_steps_np[-1]) + 1 if len(
            self._event_steps_np) else S
        _, ys = jax.lax.scan(step, carry0, jnp.arange(s_stop))
        return ys

    def _simulate_collect_segmented(self, params, collect, inc=None,
                                    fwd0=None, remat=False, grad_safe=False):
        """Segmented variant: python-level loop over exercise events, one
        ``lax.scan`` per segment, collect inlined. Event-stacked output."""
        sim_step, carry = self._build_sim(params, inc, fwd0, grad_safe)
        if remat:
            sim_step = jax.checkpoint(sim_step)

        def scan_body(c, s):
            return sim_step(c, s), None

        ys = []
        prev = 0
        for ev, s_e in enumerate(self._event_steps_np):
            s_e = int(s_e)
            if s_e > prev:
                carry, _ = jax.lax.scan(scan_body, carry,
                                        jnp.arange(prev, s_e))
                prev = s_e
            L, N, V = carry
            e = int(self.exercise_indices[ev])
            ys.append(collect(jnp.asarray(e), jnp.asarray(ev), L, N))
        return jax.tree.map(lambda *a: jnp.stack(a), *ys)

    # ------------------------------------------------------------------
    def _collect_consts(self):
        """Device constants shared by the per-event payoff collectors."""
        cdtype = self.collect_dtype
        n = self.model.num_libors
        return dict(
            deltas=jnp.asarray(self.model.deltas, dtype=cdtype),
            ev_pay_mask=jnp.asarray(self._ev_pay_mask_np, dtype=self.dtype),
            ev_end_idx=jnp.asarray(self._ev_end_idx_np),
            ev_strikes=jnp.asarray(self._ev_strikes_np, dtype=cdtype),
            j_iota=jnp.arange(n)[:, None],
        )

    def _event_contrib(self, e, ev, L, N, consts, grad_safe=False):
        """Per-path discounted payoff contributions for event ``ev``'s
        products: ``([P_max, paths] payoff/numeraire, [paths] 1/numeraire)``,
        finite-masked. The mean of the first over paths (times the
        numeraire adjustment) is the product value.

        ``grad_safe``: additionally zero out (with the double-``where``
        pattern) paths whose f32 bond-ratio scan would overflow or hit a
        non-positive accrual factor. The forward pass drops their
        contributions at the finite mask anyway, but an inf/NaN PRIMAL
        inside the scan turns the whole adjoint into NaN (0 * inf in the
        cotangent chain) — the AAD ladder cuts the chain BEFORE the scan.
        Identity for every path in the price-relevant regime."""
        n = self.model.num_libors
        cdtype = self.collect_dtype
        spot = self.model.measure == "spot"
        dead = None
        if grad_safe:
            deltas_col = consts["deltas"][:, None].astype(L.dtype)
            dead = adjoint_dead_mask(L, N, deltas_col, spot)   # [paths]
            L = jnp.where(dead[None, :], 0.01, L)
            # log-form scan for the adjoint: risk ladders do not need
            # the 1e-6 price-parity compensation, and jnp.cumprod's VJP
            # leaks cross-bucket garbage on wild paths (see
            # bond_ratio_cumprod_adjoint)
            cp = bond_ratio_cumprod_adjoint(L, deltas_col, e,
                                            consts["j_iota"]).astype(cdtype)
        else:
            cp = bond_ratio_cumprod_hi(
                L, consts["deltas"][:, None].astype(L.dtype),
                e, consts["j_iota"], cdtype)
        if spot:
            # divide AFTER the upcast (N carries in collect_dtype)
            Nv = N.astype(ACC_DTYPE)
            if dead is not None:
                # double-where: make the PRIMAL safe before the
                # reciprocal so d(inv_n)/dN is exactly 0 on dead paths
                Nv = jnp.where(dead, 1.0, Nv)
            inv_n = 1.0 / Nv                                      # [paths]
        else:
            inv_n = 1.0 / cp[n - 1].astype(ACC_DTYPE)             # 1/P(T_e,T_n)
        ann = jnp.matmul(consts["ev_pay_mask"][ev], cp.astype(self.dtype),
                         precision=jax.lax.Precision.HIGHEST)     # [P_max, paths]
        p_end = cp[consts["ev_end_idx"][ev]]                      # [P_max, paths]
        payoff = jnp.maximum(
            1.0 - p_end - consts["ev_strikes"][ev][:, None] * ann.astype(cdtype),
            0.0)
        # a pathwise contribution can exceed float range when the
        # simulation left the price-relevant regime (optimizer
        # excursions to huge vols; the f64 reference returns equally
        # meaningless magnitudes there) — drop it instead of letting
        # one inf/NaN path poison the whole expectation
        contrib = payoff.astype(ACC_DTYPE) * inv_n[None, :]
        if dead is not None:
            contrib = jnp.where(dead[None, :], 0.0, contrib)
            inv_n = jnp.where(dead, 0.0, inv_n)
        return jnp.where(jnp.isfinite(contrib), contrib, 0.0), inv_n

    def _build_pathwise_core(self):
        model = self.model

        def core(params, inc):
            consts = self._collect_consts()

            def collect(e, ev, L, N):
                return self._event_contrib(e, ev, L, N, consts)

            params = params.astype(self.dtype)
            contrib_steps, inv_steps = self._simulate_collect(
                params, collect, inc)
            if self.scan_mode == "segmented":
                idx = jnp.asarray(self._ev_of_product_np)
            else:
                idx = jnp.asarray(self._ex_step_idx)
            slots = jnp.asarray(self._slot_of_np)
            contrib = contrib_steps[idx, slots]                   # [P, paths]
            inv_safe = jnp.where(jnp.isfinite(inv_steps[idx]),
                                 inv_steps[idx], 0.0)
            mean_inv = jnp.mean(inv_safe, axis=-1)                # [P]
            if model.measure != "spot":
                contrib = contrib * self._p0_terminal
                mean_inv = mean_inv * self._p0_terminal
            if model.use_numeraire_adjustment:
                df_ex = jnp.asarray(self._df_exercise)
                adj = jnp.where(mean_inv > 0.0, df_ex / mean_inv, 0.0)
                contrib = contrib * adj[:, None]
            return contrib

        return core

    def _ensure_pathwise(self):
        if getattr(self, "_pathwise_fn", None) is None:
            # ONE jitted program (round 5): the previous eager form
            # dispatched every op separately — dozens of tiny programs,
            # each paying a >1 s remote compile + ~30 ms RTT through the
            # tunnel, the dominant cost of the parity bench leg
            self._pathwise_fn = self._wrap_public(
                self._build_pathwise_core())
        return self._pathwise_fn

    def pathwise_values(self, params, inc=None):
        """Per-path value contributions ``[P, local_paths]`` (diagnostic).

        Row means over ALL paths equal ``values(params)`` (numeraire
        adjustment included): the decomposition behind the f32-vs-f64
        parity analysis at the calibrated stochastic-vol basin
        (BENCHMARKS.md) — chaotic tail paths are identified by the
        per-path |f32 − f64| contribution gap. ONE jitted program (built
        lazily; see ``export_pathwise_program`` for its AOT artifact).
        Materializes ``[events, P_max, paths]`` (fused mode:
        ``[steps, ...]``), so use at diagnostic path counts; not meshed.

        ``inc``: optional explicit realization override, same shape as
        the engine's injected increments (injected engines only)."""
        if self.mesh is not None:
            raise ValueError("pathwise_values is a single-device diagnostic")
        fn = self._ensure_pathwise()
        params = jnp.asarray(params, dtype=jnp.float64)
        if inc is not None:
            if self._inc_np is None:
                raise ValueError(
                    "explicit realization override needs an engine built "
                    "with increments=")
            jfn = getattr(fn, "_jitted", fn)
            return jfn(params, jnp.asarray(inc))
        return fn(params)

    def export_pathwise_program(self, directory=None) -> bool:
        """Serialize the lowered pathwise-decomposition program (the
        parity bench's hot diagnostic) — separate from
        ``export_programs`` so ordinary calibration engines never pay
        its tracing/lowering."""
        from ...utils import aot

        if self.mesh is not None:
            return False
        directory = directory or aot.default_cache_dir()
        fn = self._ensure_pathwise()
        jitted = getattr(fn, "_jitted", fn)
        return aot.save_program(
            directory, "pathwise", self._aot_config() + ("pathwise",),
            jitted, *self._aot_examples()) is not None

    def load_pathwise_program(self, directory=None) -> bool:
        from ...utils import aot

        if self.mesh is not None:
            return False
        directory = directory or aot.default_cache_dir()
        call = aot.load_program(directory, "pathwise",
                                self._aot_config() + ("pathwise",))
        if call is None:
            return False
        if self._inc_np is None:
            self._pathwise_fn = call
        else:
            wrapper = lambda params: call(params, self._inc_dev)  # noqa: E731
            wrapper._jitted = call
            self._pathwise_fn = wrapper
        return True

    # ------------------------------------------------------------------
    def _simulate_and_value(self, params, inc=None, fwd0=None, remat=False,
                            grad_safe=False):
        """Simulate once and value the CURRENT EVENT's products at each
        exercise step (padded to the largest per-event group): the
        collector computes a [P_max, n] @ [n, paths] annuity matmul on the
        MXU and emits local f64 path sums; after the scan each product
        gathers its own (exercise step, slot) and a single psum (when
        sharded) finishes the expectations.
        Returns (values [P], mean_inv_numeraire [P])."""
        model = self.model
        n = model.num_libors
        # collection-precision policy (round-3 parity work, measured on
        # chip): the payoff is 1 - P_end - K*annuity, a cancellation of
        # O(1) terms down to O(1e-2), and P_end enters with weight 1 while
        # the annuity is damped by K ~ 3e-2. So the bond-ratio curve is
        # computed by the COMPENSATED f32 scan (f64-grade P_end and
        # numeraire at f32 cost, see bond_ratio_cumprod_hi), the payoff
        # assembles in collect_dtype, and only the ANNUITY matmul runs in
        # the simulation dtype on the MXU — its f32 error lands 30x
        # damped, and an f64 matmul would be emulated off the MXU
        # (measured: full-f64 collection cost ~3x on every residual
        # evaluation, ATM wall 1.45 s -> 4.6 s; this split keeps the f32
        # wall at strict 1e-6 parity).
        P = len(self.products)
        consts = self._collect_consts()

        def collect(e, ev, L, N):
            """Local (unnormalized) f64 path sums of payoff/numeraire and
            of 1/numeraire for event ``ev``'s products (exercise index e)."""
            contrib, inv_n = self._event_contrib(e, ev, L, N, consts,
                                                 grad_safe=grad_safe)
            raw = jnp.sum(contrib, axis=-1)
            inv_safe = jnp.where(jnp.isfinite(inv_n), inv_n, 0.0)
            return raw, jnp.sum(inv_safe)

        spot = model.measure == "spot"
        raw_steps, inv_steps = self._simulate_collect(params, collect, inc,
                                                      fwd0, remat, grad_safe)
        # gather each product's own event (by sim step in fused mode, by
        # event ordinal in segmented mode) and slot, then reduce once
        if self.scan_mode == "segmented":
            idx = jnp.asarray(self._ev_of_product_np)
        else:
            idx = jnp.asarray(self._ex_step_idx)
        slots = jnp.asarray(self._slot_of_np)
        raw = raw_steps[idx, slots]                               # [P]
        inv_sum = inv_steps[idx]                                  # [P]
        if self.mesh is not None:
            raw = jax.lax.psum(raw, self.path_axis)
            inv_sum = jax.lax.psum(inv_sum, self.path_axis)
        values = raw / self.num_paths
        mean_inv = inv_sum / self.num_paths
        if not spot:
            values = values * self._p0_terminal
            mean_inv = mean_inv * self._p0_terminal
        return values, mean_inv

    def exercise_step_of(self, e: int) -> int:
        """Simulation step index whose start time is tenor point T_e."""
        s_idx = int(np.argmin(np.abs(self.model.sim_times
                                     - self.model.tenor_times[e])))
        return s_idx

    # ------------------------------------------------------------------
    def _build_values_fn(self):
        model = self.model
        df_ex = jnp.asarray(self._df_exercise)

        def values(params, inc=None):
            raw, mean_inv = self._simulate_and_value(params, inc)
            if model.use_numeraire_adjustment:
                # deterministic numeraire control: E[N(0)/N(T_e)] -> df(T_e).
                # mean_inv collapses to exactly 0 only when EVERY path's
                # numeraire left float range (absurd parameter regimes);
                # raw is 0 there too, so the value is 0 — guard the 0 * inf
                return raw * jnp.where(mean_inv > 0.0, df_ex / mean_inv, 0.0)
            return raw

        return values

    def _quotes_from_values(self, v):
        """Value-unit dispatch shared by residuals() and implied_vols():
        Monte-Carlo price -> model quote. Traceable (jnp)."""
        unit = self.value_unit
        if unit == "VALUE":
            return v
        fwd0 = jnp.asarray(self._fwd0)
        ann0 = jnp.asarray(self._ann0)
        strike = jnp.asarray(self._strike)
        texp = jnp.asarray(self._texp)
        if unit == "VOLATILITYNORMAL":
            return bachelier_implied_vol_jnp(v, fwd0, strike, texp, ann0)
        if unit == "VOLATILITYLOGNORMAL":
            return black_implied_vol_jnp(v, fwd0, strike, texp, ann0)
        raise ValueError(f"unknown value unit {unit}")

    def _build_implied_fn(self):
        values_fn = self._build_values_fn()

        def implied(params, inc=None):
            return self._quotes_from_values(values_fn(params, inc))

        return implied

    def _build_residual_fn(self):
        values_fn = self._build_values_fn()
        target = jnp.asarray(self._target)
        weight = jnp.asarray(self._weight)

        def residuals(params, inc=None):
            model_quote = self._quotes_from_values(values_fn(params, inc))
            return weight * (model_quote - target)

        return residuals

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def values(self, params) -> np.ndarray:
        """Monte-Carlo swaption values (in price units) per product."""
        return np.asarray(self._values_fn(jnp.asarray(params, dtype=jnp.float64)))

    def implied_vols(self, params) -> np.ndarray:
        """Model quotes in the product value unit, computed directly from
        the Monte-Carlo values (NOT by un-scaling the weighted residuals:
        a product legitimately de-weighted with weight=0 would turn that
        into 0/0). ONE jitted program: the eager form ran the Newton
        quote inversion op-by-op — each op a ~30 ms dispatch RTT through
        the TPU tunnel, and its sub-programs compiled inside the
        multistart's timed gate (part of a measured 13 s hole between
        the stage windows of the 81,920-path bench row)."""
        return np.asarray(self._implied_fn(
            jnp.asarray(params, dtype=jnp.float64)))

    def residuals(self, params) -> np.ndarray:
        return np.asarray(self._residual_fn(jnp.asarray(params, dtype=jnp.float64)))

    def jacobian(self, params) -> np.ndarray:
        return np.asarray(self._jac_fn(jnp.asarray(params, dtype=jnp.float64)))

    # ------------------------------------------------------------------
    # AAD risk ladders: reverse-mode sensitivities of the Monte-Carlo
    # values w.r.t. the initial forward curve, differentiated through the
    # FULL Euler simulation (measure drift, blended local-vol anchor,
    # stochastic-vol scaling, payoff, numeraire) in ONE backward pass on
    # device. The reference's AAD route is finmath-lib's host-side tape
    # (RandomVariableDifferentiableAAD) over eagerly dispatched device
    # ops; here the whole pathwise adjoint is a single fused XLA program
    # with jax.checkpoint bounding memory to O(steps x paths) carries.
    # Held fixed (documented, standard pathwise-MC delta): the product
    # definitions (strikes, schedules) and the deterministic-numeraire
    # control's discount factors; the terminal-measure P(0, T_n) IS
    # differentiated.
    def _build_forward_delta_core(self):
        model = self.model
        df_ex = jnp.asarray(self._df_exercise)

        def core(params, fwd0, weights, inc):
            raw, mean_inv = self._simulate_and_value(params, inc, fwd0=fwd0,
                                                     remat=True,
                                                     grad_safe=True)
            if model.measure != "spot":
                # _simulate_and_value applied the HOST-constant P(0, T_n);
                # swap it for the fwd0-differentiable one
                deltas = jnp.asarray(model.deltas)
                p0 = jnp.prod(1.0 / (1.0 + deltas * fwd0))
                scale = p0 / self._p0_terminal
                raw, mean_inv = raw * scale, mean_inv * scale
            if model.use_numeraire_adjustment:
                raw = raw * jnp.where(mean_inv > 0.0, df_ex / mean_inv, 0.0)
            return jnp.sum(weights * raw)

        return core

    def _wrap_delta(self, core):
        """Wrap ``core(params, fwd0, weights, inc)`` like ``_wrap_public``
        does for params-only functions (mesh + injected increments
        combinations). Returns ``f(params, fwd0, weights, inc)`` — the
        increments stay a traced argument (pass ``self._inc_dev``, or
        None for an engine drawing its own stream) so realization swaps
        never retrace."""
        mesh = self.mesh
        if mesh is None:
            # inc defaults to the engine's own stored stream so direct
            # 3-arg diagnostic calls keep working
            return lambda p, f0, w, inc=None: core(  # noqa: E731
                p, f0, w, self._inc_dev if inc is None else inc)
        if self._inc_np is None:
            smapped = jax.shard_map(
                lambda p, f0, w: core(p, f0, w, None),
                mesh=mesh, in_specs=(P(), P(), P()), out_specs=P())
            return lambda p, f0, w, inc=None: smapped(p, f0, w)  # noqa: E731
        return jax.shard_map(
            core, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, None, self.path_axis)),
            out_specs=P())

    def forward_deltas(self, params, weights=None):
        """Bucketed delta ladder of the (weighted) product portfolio:
        returns ``(portfolio_value, dV/dL0 [num_libors])`` from one
        forward + one backward pass. ``weights`` defaults to an equal-
        weight portfolio of all products."""
        if getattr(self, "_forward_delta_fn", None) is None:
            self._forward_delta_fn = jax.jit(
                jax.value_and_grad(self._wrap_delta(
                    self._build_forward_delta_core()), argnums=1))
        w = (np.ones(len(self.products))
             if weights is None else np.asarray(weights, dtype=np.float64))
        v, g = self._forward_delta_fn(
            jnp.asarray(params, dtype=jnp.float64),
            jnp.asarray(self.model.initial_forwards, dtype=jnp.float64),
            jnp.asarray(w), self._inc_dev)
        return float(v), np.asarray(g)

    def forward_delta_matrix(self, params) -> np.ndarray:
        """Per-product delta ladder ``[P, num_libors]`` — vmapped one-hot
        portfolio gradients, i.e. P backward passes in one device
        program. Linear in P in both FLOPs and live memory; use
        ``forward_deltas`` (one pass) for portfolio-level risk at
        production path counts."""
        if getattr(self, "_forward_delta_matrix_fn", None) is None:
            f = self._wrap_delta(self._build_forward_delta_core())
            self._forward_delta_matrix_fn = jax.jit(
                jax.vmap(jax.grad(f, argnums=1),
                         in_axes=(None, None, 0, None)))
        eye = jnp.eye(len(self.products), dtype=jnp.float64)
        return np.asarray(self._forward_delta_matrix_fn(
            jnp.asarray(params, dtype=jnp.float64),
            jnp.asarray(self.model.initial_forwards, dtype=jnp.float64),
            eye, self._inc_dev))

    # ------------------------------------------------------------------
    # batched (multi-start) evaluation: ONE device program evaluates the
    # residual vector / Jacobian for K parameter vectors at once (vmap
    # over the leading axis). Used by BatchedLevenbergMarquardt to run a
    # whole multistart sweep in lockstep — K-fold fewer dispatches and
    # K-fold larger programs for the TPU to chew on. Built lazily: most
    # engines never pay the extra compile.
    def _ensure_batched(self):
        if getattr(self, "_residual_batched_fn", None) is None:
            base = self._build_residual_fn()
            self._residual_batched_fn = self._wrap_public(
                jax.vmap(base, in_axes=(0, None)))
            self._jac_batched_fn = self._wrap_public(
                jax.vmap(jax.jacfwd(base), in_axes=(0, None)))

    def residuals_batched(self, params_batch) -> np.ndarray:
        """Residuals for a [K, n_params] batch -> [K, n_products]."""
        self._ensure_batched()
        return np.asarray(self._residual_batched_fn(
            jnp.asarray(params_batch, dtype=jnp.float64)))

    def jacobian_batched(self, params_batch) -> np.ndarray:
        """Jacobians for a [K, n_params] batch -> [K, n_products, n_params]."""
        self._ensure_batched()
        return np.asarray(self._jac_batched_fn(
            jnp.asarray(params_batch, dtype=jnp.float64)))

    @property
    def targets(self) -> np.ndarray:
        return np.asarray(self._target)
