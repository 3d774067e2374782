"""LIBOR Market Model on TPU: simulation + swaption valuation as one fused,
differentiable program.

Rebuild of finmath-lib's ``LIBORMarketModelFromCovarianceModel`` +
``EulerSchemeFromProcessModel`` + ``SwaptionSimple`` as driven by the
reference's calibration tests (/root/reference/.../LIBORMarketModelCalibration
ATMTest.java:270-466 — spot measure, NORMAL state space, numeraire from the
rolling spot account, swaptions quoted as implied normal volatilities).

TPU-first design notes (this is where the architecture deliberately departs
from the reference; see SURVEY.md §3.5 and §7):

* The reference values each of the ~156 calibration swaptions separately,
  each valuation re-running a full Euler sweep of tiny per-op CUDA kernels
  — tens of thousands of kernel launches per optimizer iteration. Here ONE
  jitted function simulates all paths once per parameter vector and values
  ALL products from the same path ensemble; the per-exercise annuity sums
  are batched into a single [products x libors] @ [libors x paths] matmul
  that runs on the MXU.
* The time loop is a ``lax.scan`` per exercise segment (exercise dates are
  static), so XLA fuses each Euler step's drift/diffusion chain into a few
  VPU loops over the [libors, paths] block.
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
    covariance model, measure/state-space conventions."""

    def __init__(self, libor_td: TimeDiscretization,
                 forward_curve: ForwardCurve,
                 discount_curve: DiscountCurve,
                 covariance_model,
                 measure: str = "spot",
                 state_space: str = "normal",
                 use_numeraire_adjustment: bool = True):
        if measure != "spot":
            raise NotImplementedError("only the spot measure is implemented")
        if state_space not in ("normal",):
            raise NotImplementedError(
                "state_space='normal' (with local-vol covariance wrappers "
                "for displaced/blended dynamics) is implemented"
            )
        self.libor_td = libor_td
        self.forward_curve = forward_curve
        self.discount_curve = discount_curve
        self.covariance = covariance_model
        self.use_numeraire_adjustment = use_numeraire_adjustment
        # The engine evolves the forwards on the tenor grid itself
        # (simulation grid == tenor grid), which is exactly the reference
        # workloads' configuration (ATM test :277-278, benchmark :251-259).
        # A finer simulation grid would need sub-period numeraire
        # interpolation — not implemented yet.

        n = libor_td.get_number_of_time_steps()
        self.num_libors = n
        self.tenor_times = np.asarray([libor_td.get_time(i) for i in range(n + 1)])
        self.deltas = self.tenor_times[1:] - self.tenor_times[:-1]
        self.initial_forwards = forward_curve.get_forward(self.tenor_times[:-1])

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
                 scheme: str = "euler"):
        """``mesh``: optional jax.sharding.Mesh — Monte-Carlo paths are then
        data-parallel over its ``path_axis``: each device folds its own RNG
        key, simulates num_paths/n_devices paths locally, and every
        expectation becomes a local f64 sum + psum over ICI. The parameter
        vector stays replicated, so jacfwd Jacobians flow through the
        collective unchanged (the multi-chip story of SURVEY.md §2/§5 —
        the reference is single-device)."""
        self.model = model
        self.num_paths = int(num_paths)
        self.num_factors = int(num_factors)
        self.seed = int(seed)
        self.mesh = mesh
        self.path_axis = path_axis
        if scheme not in ("euler", "predictor_corrector"):
            raise ValueError(f"unknown scheme {scheme}")
        self.scheme = scheme  # finmath EulerSchemeFromProcessModel schemes
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            if self.num_paths % n_dev:
                raise ValueError(
                    f"num_paths {self.num_paths} not divisible by mesh size {n_dev}"
                )
            self._local_paths = self.num_paths // n_dev
        else:
            self._local_paths = self.num_paths

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
        self._by_exercise = {
            e: [p for p in self.products if p.exercise_index == e]
            for e in self.exercise_indices
        }

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

        self._residual_fn = jax.jit(self._shard(self._build_residual_fn()))
        self._jac_fn = jax.jit(jax.jacfwd(self._shard(self._build_residual_fn())))
        self._values_fn = jax.jit(self._shard(self._build_values_fn()))

    # ------------------------------------------------------------------
    def _shard(self, fn):
        """Wrap a params -> per-product-vector function in shard_map over
        the path axis (identity when no mesh was given)."""
        if self.mesh is None:
            return fn
        from jax.sharding import PartitionSpec as P

        return jax.shard_map(
            fn, mesh=self.mesh, in_specs=P(), out_specs=P()
        )

    def _pmean(self, x: jax.Array) -> jax.Array:
        """Mean over the (possibly device-sharded) path axis, f64 accumulate."""
        s = jnp.sum(x.astype(ACC_DTYPE), axis=-1)
        if self.mesh is not None:
            s = jax.lax.psum(s, self.path_axis)
        return s / self.num_paths

    # ------------------------------------------------------------------
    def _simulate_segments(self, params, collect):
        """Core scan: evolve (L, N) segment by segment; ``collect(e, L, N)``
        is called at each exercise time with the current state and returns
        a pytree to stash. Returns the list of collected pytrees."""
        model = self.model
        n = model.num_libors
        cov = model.covariance
        paths = self._local_paths
        F = self.num_factors

        prep = cov.prepare(params)
        vol_table = cov.vol_table(prep).astype(FLOAT_DTYPE)   # [steps, n]
        R = cov.factor_matrix(prep).astype(FLOAT_DTYPE)       # [n, F]
        stoch_vol = cov.stoch_vol_params(prep) if cov.has_stoch_vol else None
        deltas = jnp.asarray(model.deltas, dtype=FLOAT_DTYPE)        # [n]
        dts = jnp.asarray(
            model.libor_td.get_step_sizes(), dtype=FLOAT_DTYPE
        )  # simulation grid == tenor grid
        sqrt_dts = jnp.sqrt(dts)
        L0 = jnp.asarray(model.initial_forwards, dtype=FLOAT_DTYPE)
        L0_b = jnp.broadcast_to(L0[:, None], (n, paths))
        idx = jnp.arange(n)[:, None]                                  # [n, 1]

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
            nu = stoch_vol[0].astype(FLOAT_DTYPE) if hasattr(stoch_vol[0], "astype") \
                else jnp.asarray(stoch_vol[0], dtype=FLOAT_DTYPE)
            rho = stoch_vol[1].astype(FLOAT_DTYPE) if hasattr(stoch_vol[1], "astype") \
                else jnp.asarray(stoch_vol[1], dtype=FLOAT_DTYPE)

        def loadings(m, L, V):
            """Factor loadings lambda [n, F, paths] at step m, state (L, V)."""
            lam_t = vol_table[m][:, None] * cov.local_factor(prep, L, L0_b)
            if stoch_vol is not None:
                exponent = getattr(cov, "scaling_exponent", 0.5)
                scale = jnp.sqrt(V) if exponent == 0.5 else V ** exponent
                lam_t = lam_t * scale[None, :]
            lam = lam_t[:, None, :] * R[:, :, None]
            alive = (idx >= m + 1)
            return jnp.where(alive[:, None, :], lam, 0.0)

        def drift_of(m, L, lam):
            """Spot-measure drift: masked prefix sum over the libor axis."""
            c = (deltas[:, None, None] * lam) / (
                1.0 + (deltas[:, None] * L)[:, None, :]
            )                                                          # [n, F, paths]
            prefix = jnp.cumsum(c, axis=0)
            return jnp.sum(lam * prefix, axis=1)                       # [n, paths]

        predictor_corrector = self.scheme == "predictor_corrector"

        def step(carry, m):
            L, N, V = carry
            alive = (idx >= m + 1)                                    # [n, 1]
            # numeraire accrues at the just-fixed forward L_m over [T_m, T_{m+1}]
            N = N * (1.0 + deltas[m] * L[m])
            lam = loadings(m, L, V)
            mu = drift_of(m, L, lam)
            dw_all = jax.random.normal(
                jax.random.fold_in(base_key, m), (n_rng_factors, paths),
                dtype=FLOAT_DTYPE,
            ) * sqrt_dts[m]
            dw = dw_all[:F]
            diffusion = jnp.einsum("nfp,fp->np", lam, dw)
            if predictor_corrector:
                # finmath's PREDICTOR_CORRECTOR scheme: average the drift at
                # the current state and at the Euler-predicted state
                L_pred = jnp.where(alive, L + mu * dts[m] + diffusion, L)
                mu_pred = drift_of(m, L_pred, loadings(m, L_pred, V))
                mu = 0.5 * (mu + mu_pred)
            L_new = jnp.where(alive, L + mu * dts[m] + diffusion, L)
            if stoch_vol is not None:
                # exact lognormal step for the variance process:
                # dW_V = rho dW_1 + sqrt(1-rho^2) dW_extra
                dw_v = rho * dw[0] + jnp.sqrt(
                    jnp.maximum(1.0 - rho * rho, 0.0)
                ) * dw_all[F]
                if getattr(cov, "martingale_correction", True):
                    V = V * jnp.exp(nu * dw_v - 0.5 * nu * nu * dts[m])
                else:
                    V = V * jnp.exp(nu * dw_v)
            return (L_new, N, V), None

        L = L0_b
        N = jnp.ones((paths,), dtype=FLOAT_DTYPE)
        V = jnp.ones((paths,), dtype=FLOAT_DTYPE)
        if self.mesh is not None:
            # initial carries are replicated constants but evolve
            # device-varying inside shard_map; mark them varying
            L = jax.lax.pcast(L, (self.path_axis,), to="varying")
            N = jax.lax.pcast(N, (self.path_axis,), to="varying")
            V = jax.lax.pcast(V, (self.path_axis,), to="varying")
        collected = []
        prev = 0
        for e in self.exercise_indices:
            if e > prev:
                (L, N, V), _ = jax.lax.scan(step, (L, N, V), jnp.arange(prev, e))
                prev = e
            collected.append(collect(e, L, N))
        return collected

    # ------------------------------------------------------------------
    def _build_values_fn(self):
        model = self.model
        deltas_np = model.deltas
        dc = model.discount_curve

        def values(params):
            def collect(e, L, N):
                prods = self._by_exercise[e]
                n = model.num_libors
                delta = jnp.asarray(deltas_np, dtype=FLOAT_DTYPE)
                # bond ratios at T_e: P(T_e, T_{j+1})/P(T_e, T_j)
                j = jnp.arange(n)[:, None]
                r = jnp.where(j >= e, 1.0 / (1.0 + delta[:, None] * L), 1.0)
                cp = jnp.cumprod(r, axis=0)            # cp[j] = P(T_e, T_{j+1})
                inv_n = (1.0 / N).astype(ACC_DTYPE)
                mean_inv_n = self._pmean(inv_n)
                # batched annuities: [P_e, n] @ [n, paths] on the MXU
                mask = np.zeros((len(prods), n), dtype=np.float32)
                ends = []
                for k, p in enumerate(prods):
                    mask[k, p.exercise_index : p.exercise_index + p.num_periods] = \
                        deltas_np[p.exercise_index : p.exercise_index + p.num_periods]
                    ends.append(p.exercise_index + p.num_periods - 1)
                ann = jnp.asarray(mask) @ cp           # [P_e, paths]
                p_end = cp[jnp.asarray(ends)]          # [P_e, paths]
                strikes = jnp.asarray([p.strike for p in prods],
                                      dtype=FLOAT_DTYPE)[:, None]
                payoff = jnp.maximum(1.0 - p_end - strikes * ann, 0.0)
                disc_payoff = payoff.astype(ACC_DTYPE) * inv_n[None, :]
                raw = self._pmean(disc_payoff)         # E[payoff / N]
                return raw, mean_inv_n

            collected = self._simulate_segments(params, collect)

            vals = []
            for (raw, mean_inv_n), e in zip(collected, self.exercise_indices):
                t_e = float(model.tenor_times[e])
                df = float(dc.get_discount_factor(t_e))
                if model.use_numeraire_adjustment:
                    adj = df / mean_inv_n
                else:
                    adj = 1.0
                vals.append(raw * adj)
            return jnp.concatenate(vals)

        return values

    def _build_residual_fn(self):
        values_fn = self._build_values_fn()
        fwd0 = jnp.asarray(self._fwd0)
        ann0 = jnp.asarray(self._ann0)
        strike = jnp.asarray(self._strike)
        texp = jnp.asarray(self._texp)
        target = jnp.asarray(self._target)
        weight = jnp.asarray(self._weight)
        unit = self.value_unit

        def residuals(params):
            v = values_fn(params)
            if unit == "VOLATILITYNORMAL":
                model_quote = bachelier_implied_vol_jnp(v, fwd0, strike, texp, ann0)
            elif unit == "VOLATILITYLOGNORMAL":
                model_quote = black_implied_vol_jnp(v, fwd0, strike, texp, ann0)
            elif unit == "VALUE":
                model_quote = v
            else:
                raise ValueError(f"unknown value unit {unit}")
            return weight * (model_quote - target)

        return residuals

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def values(self, params) -> np.ndarray:
        """Monte-Carlo swaption values (in price units) per product."""
        return np.asarray(self._values_fn(jnp.asarray(params, dtype=jnp.float64)))

    def implied_vols(self, params) -> np.ndarray:
        r = self.residuals(params)
        return r / np.asarray(self._weight) + np.asarray(self._target)

    def residuals(self, params) -> np.ndarray:
        return np.asarray(self._residual_fn(jnp.asarray(params, dtype=jnp.float64)))

    def jacobian(self, params) -> np.ndarray:
        return np.asarray(self._jac_fn(jnp.asarray(params, dtype=jnp.float64)))

    @property
    def targets(self) -> np.ndarray:
        return np.asarray(self._target)
