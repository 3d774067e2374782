"""Bermudan swaption via Longstaff-Schwartz on the TPU LMM, with
duality-based accuracy bounds.

One of the driver baseline configurations (BASELINE.md: "Longstaff-Schwartz
Bermudan swaption via on-device conditional-expectation regression"). The
reference *cannot* run this on GPU — its device class returns null from
``choose`` and has no conditional-expectation estimator
(RandomVariableCuda.java:1631-1635; SURVEY.md §7 "hard parts") — so this is
a capability the rebuild adds, implemented the TPU way: the backward
induction is a fixed chain of regression solves (normal equations on the
MXU) and ``jnp.where`` selections over the path axis, all inside one jitted
program reusing the LMM engine's fused simulation.

Measures: SPOT (rolling account numeraire, cashflows discounted by 1/N)
and TERMINAL (zero bond P(., T_n): cashflows discounted by 1/P(T_e, T_n)
from the live bond curve, price rebased by P(0, T_n)) — the same
numeraire conventions as the engine's European collector
(model.py _simulate_and_value).

Accuracy story (the LS point estimate is bounded from BOTH sides):

* lower bound — fit the regression policy on one path set, apply it to
  an INDEPENDENT one: any fixed exercise policy is sub-optimal, so the
  out-of-sample estimator is biased LOW (no foresight);
* upper bound — Haugh-Kogan duality: for ANY adapted martingale M,
  V_0 <= E[max_e (h_e - M_e)] with h_e the discounted exercise payoff;
  M is built from the SAME regression's value surrogates
  (M_e = M_{e-1} + Vhat_e - Chat_{e-1}), evaluated on the independent
  path set. The gap upper - lower brackets the true price up to the
  regression martingale's approximation error — the Andersen-Broadie
  program without its nested simulation.
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp
import numpy as np

from ...ops.conditional_expectation import (regression_fit,
                                            regression_predict)
from ...ops.random_variable import ACC_DTYPE, FLOAT_DTYPE
from .model import (LIBORMarketModelTPU, LMMValuationEngine, SwaptionProduct,
                    bond_ratio_cumprod)


@dataclass(frozen=True)
class BermudanSwaption:
    """Right to enter, at any exercise date T_e (e in exercise_indices),
    the payer swap running from T_e to T_maturity at the given strike."""

    exercise_indices: tuple       # tenor indices, ascending
    maturity_index: int           # tenor index of the final payment
    strike: float

    def __post_init__(self):
        if any(e >= self.maturity_index for e in self.exercise_indices):
            raise ValueError("every exercise must precede maturity")


class BermudanSwaptionPricer:
    """Compiles (model, product, paths, factors, seed) into a jitted pricer
    over the covariance parameter vector."""

    def __init__(self, model: LIBORMarketModelTPU, product: BermudanSwaption,
                 num_paths: int, num_factors: int, seed: int = 31415,
                 basis_degree: int = 2):
        self.model = model
        self.product = product
        self.num_paths = int(num_paths)
        self.num_factors = int(num_factors)
        self.seed = int(seed)
        self.basis_degree = int(basis_degree)

        # reuse the engine's simulation by posing the exercise dates as
        # "exercise indices" of a dummy product list. scan_mode MUST be
        # "fused": the backward induction below gathers the step-stacked
        # collect output by simulation-step index (exercise_step_of);
        # segmented mode returns event-stacked arrays instead.
        dummy = [SwaptionProduct(e, product.maturity_index - e, product.strike, 0.0)
                 for e in product.exercise_indices]
        self._engine = LMMValuationEngine(
            model, dummy, num_paths, num_factors, seed, scan_mode="fused"
        )
        self._price_fn = jax.jit(self._build_price_fn(self._engine))
        self._bounds_engine = None
        self._bounds_fn = None

    # ------------------------------------------------------------------
    def _collect_exercise_data(self, engine, params):
        """Simulate once; per exercise date return the DISCOUNTED payer
        swap value (in numeraire units, not floored), the exercise payoff
        h = max(swap, 0) (discounted), and the regression features."""
        model = self.model
        product = self.product
        deltas_np = model.deltas
        n = model.num_libors
        K = product.strike
        degree = self.basis_degree
        spot = model.measure == "spot"

        def collect(e, ev, L, N):
            delta = jnp.asarray(deltas_np, dtype=FLOAT_DTYPE)
            j = jnp.arange(n)[:, None]
            cp = bond_ratio_cumprod(L, delta[:, None], e, j)
            m_end = product.maturity_index - 1
            p_end = cp[m_end]
            # annuity deltas for periods [e, maturity): e is traced
            # (the engine's fused scan passes the exercise index as a
            # scalar), so the mask is built with iota comparisons
            jj = jnp.arange(n)
            mask = jnp.where(
                (jj >= e) & (jj < product.maturity_index),
                delta, jnp.zeros_like(delta),
            )
            # HIGHEST matmul precision explicitly, not only via the
            # global default, so embedders that opt out of the
            # import-time config keep the f32 parity contract
            ann = jnp.matmul(mask, cp,
                             precision=jax.lax.Precision.HIGHEST)
            swap_value = 1.0 - p_end - K * ann    # payer swap at T_e
            # numeraire at T_e: spot rolling account, or the zero bond
            # P(T_e, T_n) read off the live bond curve (terminal measure)
            p_n = cp[n - 1]
            return swap_value, ann, p_end, N, p_n

        ys = engine._simulate_collect(params, collect)
        collected = [
            jax.tree.map(
                lambda a, s=engine.exercise_step_of(e): a[s], ys)
            for e in engine.exercise_indices
        ]

        data = []
        for (swap_value, ann, p_end, N, p_n) in collected:
            inv_n = 1.0 / N if spot else 1.0 / p_n
            z = swap_value * inv_n                # discounted swap value
            # a wild f32 path (accrual factor near the -1/delta pole or
            # past the +-1e3 clamp) turns the bond-curve arithmetic into
            # inf - inf: drop that path's exercise value and features —
            # the same convention as the valuation collector's finite
            # mask (one NaN path would otherwise poison the LS
            # regression, the policy value AND the Haugh-Kogan dual —
            # observed as a NaN upper bound at 8,192 paths)
            finite = (jnp.isfinite(z) & jnp.isfinite(swap_value)
                      & jnp.isfinite(ann) & jnp.isfinite(p_end)
                      # a finite-but-astronomical bond curve (near-pole
                      # accrual ratio ~1e30) is equally degenerate: its
                      # cubed regression feature overflows f32 and the
                      # huge |z| would dominate policy and dual alike;
                      # unit-notional swap values beyond +-1e4 carry no
                      # price information
                      & (jnp.abs(z) < 1e4) & (jnp.abs(swap_value) < 1e4)
                      & (jnp.abs(ann) < 1e4) & (jnp.abs(p_end) < 1e4))
            z = jnp.where(finite, z, 0.0)
            swap_value = jnp.where(finite, swap_value, 0.0)
            h = jnp.maximum(z, 0.0)               # discounted payoff
            # basis {1, annuity, swap, swap^2, ...}: p_end is EXCLUDED
            # because swap = 1 - p_end - K*ann makes {1, ann, p_end,
            # swap} exactly collinear — the gram matrix was singular by
            # construction (cond ~1e16; the TPU's emulated-f64 Cholesky
            # NaNs where CPU f64 limped through), and p_end adds nothing
            # to the prediction span that {1, ann, swap} does not
            feats = [jnp.where(finite, 1.0, 0.0),
                     jnp.where(finite, ann, 0.0)]
            p = swap_value
            for _ in range(degree):
                feats.append(p)
                p = p * swap_value
            data.append((z, h, jnp.stack(feats)))
        return data

    def _scale(self):
        return 1.0 if self.model.measure == "spot" \
            else self._engine._p0_terminal

    # ------------------------------------------------------------------
    def _build_price_fn(self, engine):
        def price(params):
            data = self._collect_exercise_data(engine, params)
            value = None
            betas = []
            for (z, h, feats) in reversed(data):
                if value is None:
                    value = h
                else:
                    beta = regression_fit(feats, value)
                    betas.append(beta)
                    continuation = regression_predict(feats, beta)
                    # exercise only when in the money AND better than the
                    # estimated continuation: without the ITM restriction
                    # a regression artifact can lock in a NEGATIVE
                    # exercise value a rational holder would decline,
                    # biasing the price low (deep-OTM Bermudans could even
                    # price negative)
                    value = jnp.where(
                        (z > 0.0) & (z > continuation), z, value)
            price0 = jnp.mean(value.astype(ACC_DTYPE)) * self._scale()
            # betas were appended in backward order; return forward order
            return price0, tuple(reversed(betas))

        return price

    def _build_bounds_fn(self, engine):
        """Lower/upper bounds on an INDEPENDENT path set given the
        regression coefficients fitted by the pricing pass."""
        def bounds(params, betas):
            data = self._collect_exercise_data(engine, params)
            E = len(data)
            # continuation estimates at every non-final date (forward
            # order); final date has none (continuation = 0)
            conts = [regression_predict(data[e][2], betas[e])
                     for e in range(E - 1)]

            # ---- lower bound: apply the (frozen) policy forward --------
            # exercise at the first date where z > 0 and z > continuation
            value = data[E - 1][1]                # payoff if never before
            for e in reversed(range(E - 1)):
                z = data[e][0]
                value = jnp.where((z > 0.0) & (z > conts[e]), z, value)
            lower = jnp.mean(value.astype(ACC_DTYPE))

            # ---- upper bound: Haugh-Kogan dual -------------------------
            # value surrogates Vhat_e = max(h_e, Chat_e) (0 continuation
            # at the last date); martingale increments Vhat_e - Chat_{e-1}
            vhat = [jnp.maximum(data[e][1], conts[e]) for e in range(E - 1)]
            vhat.append(data[E - 1][1])
            m = jnp.zeros_like(vhat[0])
            gap = data[0][1] - m                  # e = 0 term: h_0
            for e in range(1, E):
                m = m + vhat[e] - conts[e - 1]
                gap = jnp.maximum(gap, data[e][1] - m)
            upper = jnp.mean(jnp.maximum(gap, 0.0).astype(ACC_DTYPE))
            return lower * self._scale(), upper * self._scale()

        return bounds

    # ------------------------------------------------------------------
    def get_value(self, params) -> float:
        v, _ = self._price_fn(jnp.asarray(params, dtype=jnp.float64))
        return float(v)

    def get_value_bounds(self, params) -> tuple:
        """(lower, upper) bracketing estimators on an independent path
        set (engine seed + 1): out-of-sample policy value (biased low) and
        the regression-martingale dual (biased high). The true price —
        and the in-sample ``get_value`` up to foresight bias — lies in
        between, up to Monte-Carlo noise."""
        if len(self.product.exercise_indices) < 2:
            v = self.get_value(params)
            return v, v
        if self._bounds_fn is None:
            self._bounds_engine = LMMValuationEngine(
                self.model, list(self._engine.products), self.num_paths,
                self.num_factors, self.seed + 1, scan_mode="fused")
            self._bounds_fn = jax.jit(
                self._build_bounds_fn(self._bounds_engine))
        p = jnp.asarray(params, dtype=jnp.float64)
        _, betas = self._price_fn(p)
        lo, hi = self._bounds_fn(p, betas)
        return float(lo), float(hi)

    getValue = get_value
