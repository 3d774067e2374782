"""Bermudan swaption via Longstaff-Schwartz on the TPU LMM.

One of the driver baseline configurations (BASELINE.md: "Longstaff-Schwartz
Bermudan swaption via on-device conditional-expectation regression"). The
reference *cannot* run this on GPU — its device class returns null from
``choose`` and has no conditional-expectation estimator
(RandomVariableCuda.java:1631-1635; SURVEY.md §7 "hard parts") — so this is
a capability the rebuild adds, implemented the TPU way: the backward
induction is a fixed chain of regression solves (normal equations on the
MXU) and ``jnp.where`` selections over the path axis, all inside one jitted
program reusing the LMM engine's segmented simulation.
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp
import numpy as np

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
        if model.measure != "spot":
            # the backward induction below discounts every cashflow by the
            # rolling spot account N(t); under the terminal measure N stays
            # 1.0 in the simulation and the price would silently come out
            # undiscounted (missing both the 1/P(T_e,T_n) rebase and the
            # P(0,T_n) factor)
            raise NotImplementedError(
                "BermudanSwaptionPricer supports measure='spot' only; "
                f"model uses measure={model.measure!r}")
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
        self._price_fn = jax.jit(self._build_price_fn())

    def _build_price_fn(self):
        model = self.model
        product = self.product
        deltas_np = model.deltas
        n = model.num_libors
        K = product.strike
        degree = self.basis_degree

        def price(params):
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
                return swap_value, ann, p_end, N

            ys = self._engine._simulate_collect(params, collect)
            collected = [
                jax.tree.map(
                    lambda a, s=self._engine.exercise_step_of(e): a[s], ys)
                for e in self._engine.exercise_indices
            ]

            # backward induction in numeraire-discounted units
            exercised = None
            for (swap_value, ann, p_end, N) in reversed(collected):
                inv_n = 1.0 / N
                immediate = swap_value * inv_n        # exercise value / numeraire
                if exercised is None:
                    value = jnp.maximum(immediate, 0.0)
                else:
                    value_next = value
                    # regression basis: polynomials of the swap value plus
                    # annuity and terminal bond (state proxies at T_e);
                    # fitted by the shared least-squares estimator
                    from ...ops.conditional_expectation import (
                        regression_fit_predict,
                    )

                    feats = [jnp.ones_like(swap_value), ann, p_end]
                    p = swap_value
                    for _ in range(degree):
                        feats.append(p)
                        p = p * swap_value
                    continuation = regression_fit_predict(
                        jnp.stack(feats), value_next
                    )
                    # exercise only when in the money AND better than the
                    # estimated continuation: without the ITM restriction
                    # a regression artifact can lock in a NEGATIVE
                    # exercise value a rational holder would decline,
                    # biasing the price low (deep-OTM Bermudans could even
                    # price negative)
                    value = jnp.where(
                        (immediate > 0.0) & (immediate > continuation),
                        immediate, value_next)
                exercised = True
            return jnp.mean(value.astype(ACC_DTYPE))

        return price

    def get_value(self, params) -> float:
        return float(self._price_fn(jnp.asarray(params, dtype=jnp.float64)))

    getValue = get_value
