"""Analytic swaption-volatility approximation from the LMM covariance.

Equivalent of finmath's ``SwaptionGeneralizedAnalyticApproximation``
(StateSpace.NORMAL, ValueUnit.VOLATILITY) — the ANALYTIC calibration-product
variant of the reference's ATM test (createCalibrationItem,
LIBORMarketModelCalibrationATMTest.java:507-515) and the "benchmark" leg of
its valuation comparison (:383-401).

Frozen-weights approximation: the swap rate S = (1 - P_end)/A is linearized
in the forwards at t=0, w_i = dS/dL_i|_{t=0}, so its normal volatility is

    sigma_N^2 T_e = int_0^{T_e} | sum_i w_i lambda_i(t) |^2 dt

with lambda the (local-vol-frozen) factor loadings. Everything after the
static weight computation is a tiny differentiable jnp program of the
covariance parameters — calibrating against it needs NO Monte Carlo at all,
which is why the reference offers it as the fast calibration mode.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .model import LIBORMarketModelTPU, SwaptionProduct


def _swap_rate_from_forwards(forwards: np.ndarray, deltas: np.ndarray,
                             e: int, m: int) -> float:
    """S = (1 - P_end) / annuity on the sub-tenor [e, e+m] (single curve)."""
    df = 1.0
    annuity = 0.0
    for k in range(e, e + m):
        df = df / (1.0 + deltas[k] * forwards[k])
        annuity += deltas[k] * df
    return (1.0 - df) / annuity


def swap_rate_weights(forwards: np.ndarray, deltas: np.ndarray,
                      e: int, m: int, eps: float = 1e-7) -> np.ndarray:
    """dS/dL_i at t=0 by central differences (host float64, build time)."""
    n = len(forwards)
    w = np.zeros(n)
    for i in range(e, e + m):
        fp = forwards.copy()
        fm = forwards.copy()
        fp[i] += eps
        fm[i] -= eps
        w[i] = (_swap_rate_from_forwards(fp, deltas, e, m)
                - _swap_rate_from_forwards(fm, deltas, e, m)) / (2 * eps)
    return w


class LMMAnalyticSwaptionEngine:
    """Same residuals/jacobian API as LMMValuationEngine, but quotes come
    from the integrated-covariance approximation instead of Monte Carlo."""

    def __init__(self, model: LIBORMarketModelTPU,
                 products: Sequence[SwaptionProduct]):
        self.model = model
        n = model.num_libors
        kept = [p for p in products
                if p.exercise_index + p.num_periods <= n and p.exercise_index >= 1]
        if not kept:
            raise ValueError("no products fit on the tenor grid")
        self.products = sorted(kept, key=lambda p: (p.exercise_index, p.num_periods))
        unit = {p.value_unit for p in self.products}
        if len(unit) != 1 or unit.pop() not in ("VOLATILITYNORMAL",
                                                "VOLATILITYLOGNORMAL"):
            raise NotImplementedError(
                "analytic approximation supports VOLATILITYNORMAL and "
                "VOLATILITYLOGNORMAL quotes")
        #: lognormal quotes via the Rebonato-style frozen-coefficient map
        #: sigma_LN ~= sigma_N / S0: the swap rate's ABSOLUTE volatility
        #: from the integrated covariance, divided by today's par rate.
        #: Stochastic-volatility scaling is frozen at its E[scale^2] = 1
        #: martingale expectation (exact for the sqrt-scaling convention),
        #: so the approximation depends on the 5 term-structure parameters
        #: + blend only — precisely the warm-start fit needs.
        self.value_unit = list({p.value_unit for p in self.products})[0]
        if (model.simulation_td.get_number_of_time_steps()
                != model.libor_td.get_number_of_time_steps()):
            # the integration mask below indexes cov.vol_table (one row per
            # SIMULATION step) with tenor-grid step sizes and exercise
            # indices — on a refined simulation grid the shapes (and the
            # dt weights) would silently disagree
            raise NotImplementedError(
                "analytic approximation requires simulation grid == tenor "
                "grid; use the Monte-Carlo engine for refined grids")

        deltas = model.deltas
        L0 = model.initial_forwards
        dts = model.libor_td.get_step_sizes()
        P = len(self.products)

        # static: weight matrix [P, n], per-step integration mask [P, steps]
        W = np.zeros((P, n))
        texp = np.zeros(P)
        s0 = np.ones(P)
        steps_mask = np.zeros((P, len(dts)))
        for k, p in enumerate(self.products):
            W[k] = swap_rate_weights(L0, deltas, p.exercise_index, p.num_periods)
            texp[k] = model.tenor_times[p.exercise_index]
            s0[k] = _swap_rate_from_forwards(np.asarray(L0), deltas,
                                             p.exercise_index, p.num_periods)
            steps_mask[k, : p.exercise_index] = dts[: p.exercise_index]
        # host numpy on purpose: jnp.asarray would COMMIT these to the
        # default (TPU) device and drag the cpu-jitted programs back
        # there; as numpy they trace as host constants
        self._s0 = np.asarray(s0)

        self._W = np.asarray(W)
        self._texp = np.asarray(texp)
        self._steps_dt = np.asarray(steps_mask)     # [P, steps] (dt or 0)
        self._targets = np.asarray([p.target for p in self.products])
        self._weights = np.asarray([p.weight for p in self.products])
        self._L0 = np.asarray(L0)

        # pinned to the HOST backend: these are microsecond surface-size
        # programs (no path axis). On the default (TPU) backend every
        # optimizer evaluation pays the tunnel's ~40 ms dispatch RTT —
        # measured 9.3 s of the 81,920-path multistart's stage 1 for
        # ~220 analytic nfev/njev; on CPU the whole stage-1 analytic
        # pre-fit is milliseconds.
        def _cpu_jit(fn):
            try:
                jax.devices("cpu")
                return jax.jit(fn, backend="cpu")
            except RuntimeError:                      # no cpu backend
                return jax.jit(fn)

        self._quotes_fn = _cpu_jit(self._build_quotes_fn())
        self._residual_fn = _cpu_jit(self._build_residual_fn())
        self._jac_fn = _cpu_jit(jax.jacfwd(self._build_residual_fn()))

    def _build_quotes_fn(self):
        cov = self.model.covariance
        L0_col = self._L0[:, None].astype(jnp.float32)

        def quotes(params):
            prep = cov.prepare(params)
            vol = cov.vol_table(prep)                       # [steps, n]
            R = cov.factor_matrix(prep)                     # [n, F]
            # freeze local vol at the initial forwards
            local0 = cov.local_factor(prep, L0_col, L0_col)[:, 0]  # [n]
            lam = (vol * local0[None, :].astype(vol.dtype))[:, :, None] * R[None]
            # per product: x[p, s, f] = sum_i W[p,i] lam[s,i,f]
            x = jnp.einsum("pi,sif->psf", self._W.astype(lam.dtype), lam)
            inst_var = jnp.sum(x * x, axis=2)               # [P, steps]
            total_var = jnp.sum(inst_var * self._steps_dt.astype(lam.dtype), axis=1)
            sigma_n = jnp.sqrt(jnp.maximum(total_var, 1e-20) / self._texp)
            if self.value_unit == "VOLATILITYLOGNORMAL":
                return sigma_n / self._s0
            return sigma_n

        return quotes

    def _build_residual_fn(self):
        quotes = self._build_quotes_fn()
        targets = jnp.asarray(self._targets)
        weights = jnp.asarray(self._weights)

        def residuals(params):
            return weights * (quotes(params) - targets)

        return residuals

    # ------------------------------------------------------------------
    def residuals(self, params) -> np.ndarray:
        # host numpy input on purpose: jnp.asarray would commit the
        # params to the DEFAULT (TPU) device and every cpu-jitted call
        # would pay a device->host transfer RTT to fetch them back
        return np.asarray(self._residual_fn(
            np.asarray(params, dtype=np.float64)))

    def jacobian(self, params) -> np.ndarray:
        return np.asarray(self._jac_fn(
            np.asarray(params, dtype=np.float64)))

    def implied_vols(self, params) -> np.ndarray:
        """Model quotes computed directly (NOT by un-scaling the weighted
        residuals, which is 0/0 for a legitimately de-weighted product)."""
        return np.asarray(self._quotes_fn(
            np.asarray(params, dtype=np.float64)))

    @property
    def targets(self) -> np.ndarray:
        return self._targets
