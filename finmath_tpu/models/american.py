"""American/Bermudan options on equity models by Longstaff-Schwartz,
as ONE fused jitted program over the path history.

Capability map: finmath-lib ships ``net.finmath.montecarlo
.assetderivativevaluation.products.BermudanOption`` (lower-bound
Longstaff-Schwartz with a regression conditional-expectation estimator)
on top of ``MonteCarloAssetModel``; the reference's device class left
the required ``choose``/conditional-expectation hooks broken
(RandomVariableCuda.java:1631-1635 returns null — SURVEY §7 known
gaps). This module is the working TPU form, generic over every equity
family in the framework: it consumes the ``[dates, paths]`` asset
matrix of any simulation facade (``MonteCarloBlackScholesModel``,
``MonteCarloMertonModel``, ...) or a raw array.

Method (lower-bound LS, the finmath estimator):

* backward induction over exercise dates; at each date regress the
  DISCOUNTED continuation value on a monomial basis of the asset,
  restricted to in-the-money paths (Longstaff-Schwartz 2001 — the ITM
  restriction is handled branchlessly with a zero-weight mask so the
  program stays one static graph);
* exercise where intrinsic > regressed continuation (the regression is
  used only in the DECISION, the realized cashflow is carried — the
  standard low-bias form);
* optional out-of-sample split (``foresight_bias="split"``): fit the
  exercise policy on one half of the paths, value it on the other,
  removing the in-sample foresight bias of plain LS.

TPU-first notes: the whole backward induction is a ``lax.scan`` over
dates (reversed), each step a masked weighted regression (normal
equations solved by the framework's unrolled f64 Cholesky — no
LuDecomposition kernel on TPU) plus a ``jnp.where`` exercise update.
One device dispatch, one scalar readback."""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conditional_expectation import _cholesky_solve_small
from ..ops.random_variable import ACC_DTYPE, FLOAT_DTYPE


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _ls_kernel(asset, dfs, strike, is_call: bool, degree: int,
               split: bool, exercise_weight_floor: float = 0.0):
    """asset: [E, paths] asset values at the exercise dates (ascending);
    dfs: [E] discount factors N(0)/N(t_i) (deterministic numeraire) or
    pathwise [E, paths]; returns [2]: (value, stderr)."""
    e_n, paths = asset.shape
    sign = 1.0 if is_call else -1.0
    intrinsic = jnp.maximum(sign * (asset - strike), 0.0)   # [E, paths]
    disc = intrinsic.astype(ACC_DTYPE) * dfs.astype(ACC_DTYPE)

    if split:
        fit_mask = (jnp.arange(paths) % 2 == 0)
    else:
        fit_mask = jnp.ones((paths,), dtype=bool)

    # cashflow: discounted-to-0 value of the policy's future exercise
    cash = disc[e_n - 1]

    def step(cash, i):
        # i runs over exercise dates E-2 .. 0 (no regression at the
        # last). Path-wide work is f32 (the regression DECISION needs
        # nowhere near f64; emulated f64 over [B, paths] triples the
        # HBM traffic — measured 1.2 s -> 0.07 s at 1M x 50); the gram
        # solve, the rhs reduction and the cashflow carry stay f64.
        s = asset[i].astype(jnp.float32)
        ex = disc[i]
        itm = intrinsic[i] > 0.0
        w = (itm & fit_mask).astype(jnp.float32)
        nw = jnp.maximum(jnp.sum(w.astype(ACC_DTYPE)), 1.0)
        mu = jnp.sum((s * w).astype(ACC_DTYPE)) / nw
        sd = jnp.sqrt(jnp.maximum(
            jnp.sum(((s - mu.astype(jnp.float32)) ** 2 * w
                     ).astype(ACC_DTYPE)) / nw, 1e-12))
        xn = (s - mu.astype(jnp.float32)) / sd.astype(jnp.float32)
        basis = jnp.stack([xn ** k for k in range(degree + 1)])  # [B,P]
        bw = basis * w[None, :]
        gram = jnp.matmul(bw, basis.T,
                          precision=jax.lax.Precision.HIGHEST
                          ).astype(ACC_DTYPE)
        # ridge floor keeps the masked gram invertible when few paths
        # are in the money
        gram = gram + 1e-10 * jnp.eye(degree + 1, dtype=ACC_DTYPE)
        rhs = jnp.sum(bw.astype(ACC_DTYPE) * cash[None, :], axis=1)
        beta = _cholesky_solve_small(gram, rhs)
        cont = beta.astype(jnp.float32) @ basis               # [paths]
        exercise = itm & (ex > cont.astype(ACC_DTYPE))
        return jnp.where(exercise, ex, cash), None

    idx = jnp.arange(e_n - 2, -1, -1)
    cash, _ = jax.lax.scan(step, cash, idx)
    if split:
        value_mask = (~fit_mask).astype(ACC_DTYPE)
    else:
        value_mask = jnp.ones((paths,), dtype=ACC_DTYPE)
    n = jnp.sum(value_mask)
    mean = jnp.sum(cash * value_mask) / n
    var = jnp.sum((cash - mean) ** 2 * value_mask) / n
    return jnp.stack([mean, jnp.sqrt(var / n)])


class BermudanOption:
    """Bermudan (or dense-grid American) call/put on a simulated asset,
    priced by Longstaff-Schwartz. ``exercise_times`` must lie on the
    simulation grid. Works with any facade exposing
    ``get_asset_value(t)`` / ``get_numeraire(t)`` (deterministic
    numeraire models: Black-Scholes, Merton, ...)."""

    def __init__(self, exercise_times: Sequence[float], strike: float,
                 is_call: bool = False, basis_degree: int = 3,
                 foresight_bias: str = "split"):
        self.exercise_times = [float(t) for t in exercise_times]
        if len(self.exercise_times) < 1 or \
                sorted(self.exercise_times) != self.exercise_times:
            raise ValueError("exercise_times must be ascending, nonempty")
        if basis_degree < 1:
            raise ValueError("basis_degree must be >= 1")
        if foresight_bias not in ("split", "insample"):
            raise ValueError("foresight_bias must be 'split' or 'insample'")
        self.strike = float(strike)
        self.is_call = bool(is_call)
        self.basis_degree = int(basis_degree)
        self.foresight_bias = foresight_bias

    def get_value_and_error(self, model) -> tuple:
        """(value, MC standard error) — one fused device program."""
        if hasattr(model, "get_asset_values"):
            # one gather instead of E eager slices (E dispatch RTTs
            # through the TPU tunnel; measured 2.06 s -> ms at 50 dates)
            assets = model.get_asset_values(self.exercise_times)
        else:
            assets = jnp.stack([model.get_asset_value(t).values
                                for t in self.exercise_times])
        n0 = model.get_numeraire(0.0)
        dfs = []
        for t in self.exercise_times:
            nt = model.get_numeraire(t)
            if not (nt.is_deterministic() and n0.is_deterministic()):
                raise NotImplementedError(
                    "BermudanOption needs a deterministic numeraire "
                    "(equity models); use the LMM BermudanSwaptionPricer "
                    "for stochastic-rates exercise")
            dfs.append(float(n0.get_average() / nt.get_average()))
        out = np.asarray(_ls_kernel(
            assets, jnp.asarray(np.asarray(dfs))[:, None],
            jnp.asarray(self.strike, dtype=FLOAT_DTYPE), self.is_call,
            self.basis_degree, self.foresight_bias == "split"))
        return float(out[0]), float(out[1])

    def get_value(self, model) -> float:
        return self.get_value_and_error(model)[0]

    getValue = get_value


def crr_american_price(s0: float, r: float, sigma: float, maturity: float,
                       strike: float, is_call: bool = False,
                       num_steps: int = 2000,
                       dividend_yield: float = 0.0) -> float:
    """Cox-Ross-Rubinstein binomial American price (host numpy) — the
    independent oracle for the LS pricer under Black-Scholes dynamics."""
    dt = maturity / num_steps
    u = np.exp(sigma * np.sqrt(dt))
    d = 1.0 / u
    disc = np.exp(-r * dt)
    p = (np.exp((r - dividend_yield) * dt) - d) / (u - d)
    if not 0.0 < p < 1.0:
        raise ValueError("CRR tree unstable: decrease dt")
    j = np.arange(num_steps + 1)
    st = s0 * u ** (num_steps - j) * d ** j
    sign = 1.0 if is_call else -1.0
    v = np.maximum(sign * (st - strike), 0.0)
    for n in range(num_steps - 1, -1, -1):
        st = st[: n + 1] * d
        v = disc * (p * v[: n + 1] + (1.0 - p) * v[1: n + 2])
        v = np.maximum(v, sign * (st - strike))
    return float(v[0])
