"""Hybrid asset-LMM: equity assets under stochastic LIBOR-market-model
rates — finmath-lib's ``net.finmath.montecarlo.hybridassets``
(``HybridAssetLIBORMarketModelFromModels``; sources unavailable offline,
semantics reconstructed from the public API: an asset simulation whose
drift is pinned to the interest-rate model's numeraire so that
discounted assets are martingales under the rate model's measure).

TPU-first construction, three ideas:

1. **The rate sweep is reused, not reimplemented.** The class wraps the
   valuation engine's jitted Euler step (``LMMValuationEngine._build_sim``)
   and extends the scan carry with the equity state — every LMM feature
   (measures, state spaces, covariance wrappers, stochastic volatility,
   predictor-corrector, injected increments) composes for free.
2. **Correlation by key reconstruction, not by communication.** The
   engine draws its factor normals from counter-based Threefry keys
   ``fold_in(PRNGKey(seed), step)``. The equity leg re-draws the SAME
   keys to obtain the factor normals for its correlated innovation —
   a pure recomputation that XLA common-subexpression-eliminates into
   zero extra work. No plumbing through the engine, no extra HBM.
3. **Exact discrete martingale + log-space f64 carry.** The asset is
   evolved as S(t) = N(t) * exp(q-adjusted exponential martingale):
   ``logS += log(N_new/N_old) + sigma dW - (sigma^2/2 + q) dt``, so
   E[S(T)/N(T)] = S0 e^{-qT} holds exactly by construction under ANY
   correlation with the rate factors. The accumulation runs in the
   collect dtype (f64): a ~40-step multiplicative f32 accrual on TPU
   acquires a systematic transcendental bias (the measured 63-sigma
   hedge-simulation effect, BENCHMARKS.md) that log-space f64 avoids.

Asset i's Brownian:  dW_i = rho_i . dW_factors
                            + sqrt(1 - |rho_i|^2) * (C_eq dZ)_i
with ``rho_i`` the [F] rate-factor correlation row and C_eq the Cholesky
factor of the IDIOSYNCRATIC asset-asset correlation (assets also
co-move through the shared rate factors).

FX and quanto composition (finmath-lib's cross-currency use of the
hybrid stack, deterministic foreign rates):

* An **FX rate** is a domestic tradable paying the foreign money-market
  rate as a dividend: pass the foreign discount curve as the asset's
  ``dividend_yields`` entry. The discrete martingale then telescopes to
  E[FX(T)/N(T)] = FX0 * df_foreign(T) exactly — covered interest parity
  by construction — and FX options price under stochastic domestic
  rates (Garman-Kohlhagen in the deterministic limit).
* A **quanto underlying** (foreign asset converted at a fixed rate) is
  NOT a domestic tradable: pass its foreign funding curve as the
  asset's ``growth_curves`` entry (replacing the numeraire growth with
  the deterministic foreign accrual) and name its FX asset via
  ``quanto_fx_indices`` — the classical quanto drift correction
  ``-corr(S, FX) sigma_S sigma_FX dt`` is applied with the TOTAL
  Brownian correlation (rate-factor part + idiosyncratic part).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .model import LIBORMarketModelTPU, LMMValuationEngine, SwaptionProduct

__all__ = [
    "EquityForwardTrade",
    "EquityOptionTrade",
    "HybridAssetLMM",
    "HybridAutocallableNote",
    "HybridExposureEngine",
]


class HybridAssetLMM:
    """K equity assets jointly simulated with a LIBOR market model.

    ``rate_correlations``: [K] (correlation of each asset to rate factor
    0) or [K, F]; rows must have |rho| <= 1. ``equity_correlation``:
    [K, K] correlation of the idiosyncratic parts (default identity).
    ``observation_indices``: tenor indices where assets are observed
    (default: every index in [1, n-1]).

    ``dividend_yields``: per-asset continuous yield — a scalar, or a
    DiscountCurve-like object (``get_discount_factor``) whose forward
    rates are paid out (an FX rate's foreign curve). ``growth_curves``:
    per-asset ``None`` (domestic tradable: grows at the numeraire rate)
    or a curve (quanto underlying: grows deterministically at that
    curve's forward rates instead). ``quanto_fx_indices``: per-asset
    ``None`` or the index of the converting FX asset — applies the
    quanto drift correction; requires a growth curve on the asset and
    a domestic-tradable FX asset.

    ``simulate(params)`` -> ``(assets [E, K, paths], numeraires
    [E, paths])`` in the collect dtype (f64), one jitted program.
    """

    def __init__(self, model: LIBORMarketModelTPU,
                 equity_initial_values: Sequence[float],
                 equity_volatilities: Sequence[float],
                 rate_correlations=None,
                 equity_correlation=None,
                 dividend_yields=None,
                 growth_curves=None,
                 quanto_fx_indices=None,
                 observation_indices: Optional[Sequence[int]] = None,
                 num_paths: int = 50_000, num_factors: int = 1,
                 seed: int = 31415, antithetic: bool = False,
                 increments=None, mesh=None, path_axis: str = "paths"):
        if mesh is not None and increments is not None:
            raise NotImplementedError(
                "meshed hybrid with injected increments is not wired "
                "(the closure capture would replicate the full-path "
                "array per device); use the engine's own stream")
        s0 = np.asarray(equity_initial_values, dtype=np.float64)
        sig = np.asarray(equity_volatilities, dtype=np.float64)
        if s0.ndim != 1 or sig.shape != s0.shape:
            raise ValueError("need matching 1-d initial values/volatilities")
        if np.any(s0 <= 0.0) or np.any(sig < 0.0):
            raise ValueError("need positive spots and nonnegative vols")
        K = len(s0)
        F = int(num_factors)
        if rate_correlations is None:
            rho = np.zeros((K, F), dtype=np.float64)
        else:
            rho = np.asarray(rate_correlations, dtype=np.float64)
            if rho.ndim == 1:
                if rho.shape != (K,):
                    raise ValueError("1-d rate_correlations must be [K]")
                rho = np.concatenate(
                    [rho[:, None], np.zeros((K, F - 1))], axis=1)
            if rho.shape != (K, F):
                raise ValueError(f"rate_correlations must be [K]={K} or "
                                 f"[K, F]=[{K}, {F}]")
        rho_sq = np.sum(rho * rho, axis=1)
        if np.any(rho_sq > 1.0 + 1e-12):
            raise ValueError("each asset's |rate correlation| must be <= 1")
        if equity_correlation is None:
            chol = np.eye(K)
        else:
            ceq = np.asarray(equity_correlation, dtype=np.float64)
            if ceq.shape != (K, K):
                raise ValueError("equity_correlation must be [K, K]")
            try:
                chol = np.linalg.cholesky(ceq)
            except np.linalg.LinAlgError:
                raise ValueError("equity_correlation is not positive "
                                 "definite") from None
        if dividend_yields is None:
            dividend_yields = [0.0] * K
        if len(dividend_yields) != K:
            raise ValueError("dividend_yields must have one entry per asset")
        if growth_curves is None:
            growth_curves = [None] * K
        if len(growth_curves) != K:
            raise ValueError("growth_curves must have one entry per asset")
        if quanto_fx_indices is None:
            quanto_fx_indices = [None] * K
        if len(quanto_fx_indices) != K:
            raise ValueError("quanto_fx_indices must have one entry per "
                             "asset")
        for i, fx in enumerate(quanto_fx_indices):
            if fx is None:
                continue
            if not (0 <= int(fx) < K) or int(fx) == i:
                raise ValueError(f"asset {i}: quanto FX index {fx} invalid")
            if growth_curves[i] is None:
                raise ValueError(
                    f"asset {i}: a quanto underlying needs a growth curve "
                    "(it is not a domestic tradable)")
            if growth_curves[int(fx)] is not None:
                raise ValueError(
                    f"asset {i}: its FX asset {fx} must be a domestic "
                    "tradable (growth curve None)")

        n = model.num_libors
        if observation_indices is None:
            observation_indices = range(1, n)
        obs = sorted({int(e) for e in observation_indices})
        if not obs or obs[0] < 1 or obs[-1] > n - 1:
            raise ValueError(f"observation indices must lie in [1, {n - 1}]")
        self.observation_indices = obs
        self.model = model
        self.num_assets = K

        # event scaffolding (the exposure-profile trick): placeholder
        # single-period products make the engine stop at exactly the
        # observation dates; their payoffs are never evaluated.
        products = [SwaptionProduct(e, 1, 0.0, 0.0, value_unit="VALUE")
                    for e in obs]
        self.engine = LMMValuationEngine(
            model, products, num_paths, num_factors, seed=seed,
            scan_mode="segmented", antithetic=antithetic,
            increments=increments, mesh=mesh, path_axis=path_axis)
        eng = self.engine
        self.mesh = mesh
        self.path_axis = path_axis
        self._s0 = s0
        self._sig = sig
        self._rho = rho
        self._c_idio = np.sqrt(np.maximum(1.0 - rho_sq, 0.0))
        self._chol = chol

        mesh = self.mesh
        path_axis = self.path_axis
        vdt = eng.collect_dtype
        paths = eng._local_paths
        sim = model.sim_times
        dts = np.asarray(sim[1:] - sim[:-1], dtype=np.float64)
        sqrt_dts = np.sqrt(dts)
        S = len(dts)

        def step_integral(curve, scalar_ok=True):
            """[S] per-step integral of the curve's forward rate —
            log df(t_s) - log df(t_{s+1}) — or scalar * dt."""
            if curve is None:
                return np.zeros(S)
            if np.isscalar(curve) or isinstance(curve, (int, float)):
                return float(curve) * dts
            df = np.asarray(curve.get_discount_factor(sim), dtype=np.float64)
            return np.log(df[:-1]) - np.log(df[1:])

        dq_table = np.stack([step_integral(q) for q in dividend_yields])
        carry_table = np.stack([step_integral(g) for g in growth_curves])
        num_mask = np.asarray([1.0 if g is None else 0.0
                               for g in growth_curves])
        # total Brownian correlation between assets: shared rate factors
        # plus the idiosyncratic block
        corr_total = (rho @ rho.T
                      + np.outer(self._c_idio, self._c_idio) * (chol @ chol.T))
        quanto_corr = np.zeros(K)
        for i, fx in enumerate(quanto_fx_indices):
            if fx is not None:
                fx = int(fx)
                quanto_corr[i] = -corr_total[i, fx] * sig[i] * sig[fx]
        # deterministic per-step log-drift: growth-curve accrual, minus
        # dividends, minus the Ito term, plus the quanto correction
        det_table = (carry_table - dq_table
                     + (quanto_corr - 0.5 * sig * sig)[:, None] * dts[None, :])
        self._dq_table = dq_table
        self._num_mask = num_mask
        base_key = jax.random.PRNGKey(eng.seed)
        # distinct key path from every engine stream: one extra fold
        eq_base = jax.random.fold_in(base_key, 987654321)
        nf = eng._n_rng_factors
        inc_np = eng._inc_np
        rho_j = jnp.asarray(rho, dtype=vdt)                    # [K, F]
        c_j = jnp.asarray(self._c_idio, dtype=vdt)             # [K]
        chol_j = jnp.asarray(chol, dtype=vdt)                  # [K, K]
        sig_j = jnp.asarray(sig, dtype=vdt)                    # [K]
        det_j = jnp.asarray(det_table, dtype=vdt)              # [K, S]
        mask_j = jnp.asarray(num_mask, dtype=vdt)              # [K]
        sqrt_dts_j = jnp.asarray(sqrt_dts, dtype=vdt)
        logs0 = jnp.log(jnp.asarray(s0, dtype=vdt))

        def factor_normals(s, bk):
            """The engine's unit factor normals at step s — identical
            keys, so XLA CSEs this against the rate sweep's own draw."""
            if inc_np is not None:
                return (jnp.asarray(inc_np)[s, :F].astype(vdt)
                        / sqrt_dts_j[s])
            if eng.antithetic:
                z = jax.random.normal(jax.random.fold_in(bk, s),
                                      (nf, paths // 2), dtype=jnp.float32)
                z = jnp.concatenate([z, -z], axis=1)
            else:
                z = jax.random.normal(jax.random.fold_in(bk, s),
                                      (nf, paths), dtype=jnp.float32)
            return z[:F].astype(vdt)

        def equity_normals(s, ek):
            if eng.antithetic:
                z = jax.random.normal(jax.random.fold_in(ek, s),
                                      (K, paths // 2), dtype=jnp.float32)
                z = jnp.concatenate([z, -z], axis=1)
            else:
                z = jax.random.normal(jax.random.fold_in(ek, s),
                                      (K, paths), dtype=jnp.float32)
            return z.astype(vdt)

        deltas_j = jnp.asarray(model.deltas, dtype=vdt)        # [n]

        def build(params, bond_maturities=()):
            sim_step, carry0 = eng._build_sim(
                params, jnp.asarray(inc_np) if inc_np is not None else None)
            bk, ek = base_key, eq_base
            if mesh is not None:
                # per-device streams matching the engine's own fold, so
                # the re-drawn factor normals stay IDENTICAL to the rate
                # sweep's (CSE); the idiosyncratic stream is
                # device-distinct through the same fold
                idx = jax.lax.axis_index(path_axis)
                bk = jax.random.fold_in(bk, idx)
                ek = jax.random.fold_in(ek, idx)

            def hyb_step(carry, s):
                rate_carry, logS = carry
                _, N_old, _ = rate_carry
                rate_carry = sim_step(rate_carry, s)
                _, N_new, _ = rate_carry
                z_f = factor_normals(s, bk)                    # [F, paths]
                z_e = equity_normals(s, ek)                    # [K, paths]
                dw_unit = (rho_j @ z_f
                           + c_j[:, None] * (chol_j @ z_e))    # [K, paths]
                logS = (logS
                        + mask_j[:, None] * jnp.log(N_new / N_old)[None, :]
                        + det_j[:, s][:, None]
                        + sig_j[:, None] * dw_unit * sqrt_dts_j[s])
                return (rate_carry, logS), None

            logS = jnp.broadcast_to(logs0[:, None], (K, paths)).astype(vdt)
            if mesh is not None:
                # replicated constant evolving device-varying (same
                # convention as the engine's carries)
                logS = jax.lax.pcast(logS, (path_axis,), to="varying")
            carry = (carry0, logS)
            assets, numeraires, bonds = [], [], []
            prev = 0
            for ev, s_e in enumerate(eng._event_steps_np):
                s_e = int(s_e)
                if s_e > prev:
                    carry, _ = jax.lax.scan(hyb_step, carry,
                                            jnp.arange(prev, s_e))
                    prev = s_e
                (L, N, V), logS_now = carry
                assets.append(jnp.exp(logS_now))
                numeraires.append(N)
                if bond_maturities:
                    e = obs[ev]
                    row = []
                    for m in bond_maturities:
                        if m <= e:
                            row.append(jnp.ones((paths,), dtype=vdt))
                        else:
                            # P(T_e, T_m) from the live forwards — static
                            # slice, the event index is a python int
                            acc = 1.0 + (deltas_j[e:m, None]
                                         * L[e:m].astype(vdt))
                            row.append(jnp.prod(1.0 / acc, axis=0))
                    bonds.append(jnp.stack(row))
            out = (jnp.stack(assets), jnp.stack(numeraires))
            if bond_maturities:
                return out + (jnp.stack(bonds),)
            return out

        self._build = build  # un-jitted, composable inside larger programs

        def sim_callable(bond_maturities=()):
            """The (possibly shard_mapped) simulation callable — used
            directly by the exposure/autocallable cores so their whole
            program composes with the mesh."""
            bm = tuple(bond_maturities)
            f = lambda p: build(p, bm)  # noqa: E731
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                outs = [P(None, None, path_axis), P(None, path_axis)]
                if bm:
                    outs.append(P(None, None, path_axis))
                f = jax.shard_map(f, mesh=mesh, in_specs=(P(),),
                                  out_specs=tuple(outs))
            return f

        self._sim_callable = sim_callable
        self._simulate = jax.jit(
            lambda params, bond_maturities=():
                sim_callable(bond_maturities)(params),
            static_argnames=("bond_maturities",))

    # ------------------------------------------------------------------
    def simulate(self, params):
        """(assets [E, K, paths], numeraires [E, paths]); observation e
        sees the state at tenor time T_{obs[e]}, before that date's
        accrual (the engine's collection convention)."""
        return self._simulate(jnp.asarray(params))

    def simulate_with_bonds(self, params, bond_maturity_indices):
        """Like :meth:`simulate` plus ``bonds [E, M, paths]`` — the model
        zero bonds P(T_obs, T_m) for each requested tenor index m,
        computed from the live forwards at every observation (1.0 once
        matured). The exposure engine's close-out leg."""
        return self._simulate(jnp.asarray(params),
                              bond_maturities=tuple(
                                  int(m) for m in bond_maturity_indices))

    def dividend_discount_between(self, e_from: int, e_to: int) -> np.ndarray:
        """[K] exp(-integral of dividends) over [T_{e_from}, T_{e_to}]
        (both tenor indices; the step sums match the collection
        convention)."""
        s0 = int(np.searchsorted(
            np.asarray([float(t) for t in self.model.sim_times]),
            self.model.tenor_times[e_from]))
        s1 = int(np.searchsorted(
            np.asarray([float(t) for t in self.model.sim_times]),
            self.model.tenor_times[e_to]))
        return np.exp(-np.sum(self._dq_table[:, s0:s1], axis=1))

    def _discount_adjustments(self, numeraires):
        """finmath's deterministic numeraire adjustment E[1/N] -> df per
        observation date (identity when the model disables it)."""
        obs_times = np.asarray(
            [self.model.tenor_times[e] for e in self.observation_indices])
        dfs = np.asarray(
            self.model.discount_curve.get_discount_factor(obs_times))
        inv_n = jnp.mean(1.0 / numeraires, axis=1)             # [E]
        if self.model.use_numeraire_adjustment:
            return jnp.asarray(dfs) / inv_n
        return jnp.ones_like(inv_n)

    def european_option_value(self, params, expiry_index: int, strike: float,
                              asset_index: int = 0, is_call: bool = True):
        """(value, standard error) of a European equity option under
        stochastic rates: N(0) E[(S - K)^+ / N(T)], with the model's
        numeraire adjustment. One jitted program per signature."""
        ev = self.observation_indices.index(int(expiry_index))
        assets, numeraires = self.simulate(params)
        adj = self._discount_adjustments(numeraires)
        s_t = assets[ev, asset_index]
        if is_call:
            pay = jnp.maximum(s_t - strike, 0.0)
        else:
            pay = jnp.maximum(strike - s_t, 0.0)
        disc = pay / numeraires[ev] * adj[ev]
        m = jnp.mean(disc)
        se = jnp.std(disc) / np.sqrt(disc.shape[0])
        return float(m), float(se)

    def _dividend_discount(self, ev: int) -> np.ndarray:
        """[K] exp(-cumulative dividend) at observation ordinal ``ev``
        (collection happens before the event step, so the cumulative sum
        runs over the steps strictly before it)."""
        s_e = int(self.engine._event_steps_np[ev])
        return np.exp(-np.sum(self._dq_table[:, :s_e], axis=1))

    def forward_value(self, params, expiry_index: int, asset_index: int = 0):
        """Raw E[S(T)/N(T)] — the exact-martingale diagnostic for a
        domestic tradable: equals S0 * df_dividend(T) by construction
        (= FX0 * df_foreign(T), covered interest parity, when the asset
        is an FX rate). No numeraire adjustment."""
        ev = self.observation_indices.index(int(expiry_index))
        assets, numeraires = self.simulate(params)
        disc = assets[ev, asset_index] / numeraires[ev]
        m = jnp.mean(disc)
        se = jnp.std(disc) / np.sqrt(disc.shape[0])
        return float(m), float(se)

    def martingale_errors(self, params) -> np.ndarray:
        """[E, K] relative deviations of E[S/N] from the exact target
        S0 * df_dividend(T). Quanto (growth-curve) assets are excluded
        (NaN columns): they are not domestic tradables, so S/N is not a
        martingale for them by design."""
        assets, numeraires = self.simulate(params)
        disc = np.asarray(
            jnp.mean(assets / numeraires[:, None, :], axis=2))  # [E, K]
        out = np.full_like(disc, np.nan)
        for ev in range(disc.shape[0]):
            target = self._s0 * self._dividend_discount(ev)
            row = disc[ev] / target - 1.0
            out[ev] = np.where(self._num_mask > 0, row, np.nan)
        return out


# ---------------------------------------------------------------------------
# exposure / XVA on the hybrid: equity and FX portfolios under stochastic
# rates (the equity-hybrid analog of lmm/exposure.py's swap engines)
# ---------------------------------------------------------------------------

class EquityForwardTrade:
    """Forward on hybrid asset ``asset_index``: pays
    ``notional * (S(T_m) - strike)`` at tenor index ``maturity_index``.
    Close-out at an earlier observation T_e is EXACT in the simulated
    state — ``notional * (S_e * df_div(T_e, T_m) - strike * P(T_e, T_m))``
    with the model bond P from the live forwards — no regression, no
    frozen curve. An FX forward is this trade on an FX asset."""

    def __init__(self, asset_index: int, maturity_index: int, strike: float,
                 notional: float = 1.0):
        self.asset_index = int(asset_index)
        self.maturity_index = int(maturity_index)
        self.strike = float(strike)
        self.notional = float(notional)


class EquityOptionTrade:
    """European option on a hybrid asset. Close-out values before expiry
    are Longstaff-Schwartz conditional expectations of the discounted
    payoff regressed on (S_e, P(T_e, T_m)) monomials up to
    ``basis_degree`` — with a constant in the basis the regression
    preserves the mean exactly, so the profile's ``forward_value``
    martingale diagnostic stays valid (same convention as the swaption
    exposure engine)."""

    def __init__(self, asset_index: int, maturity_index: int, strike: float,
                 is_call: bool = True, notional: float = 1.0,
                 basis_degree: int = 2):
        if basis_degree < 1:
            raise ValueError("basis_degree must be >= 1")
        self.asset_index = int(asset_index)
        self.maturity_index = int(maturity_index)
        self.strike = float(strike)
        self.is_call = is_call
        self.notional = float(notional)
        self.basis_degree = int(basis_degree)


class HybridExposureEngine:
    """Netted EE/ENE/PFE profile of an equity/FX portfolio under
    stochastic rates — the capability finmath's ExposureEstimator has
    for rates products, extended to the hybrid: XVA on equity and FX
    derivatives with WRONG-WAY RISK through the equity-rate correlation
    (a deterministic-rate exposure model cannot see it).

    Conventions follow ``lmm/exposure.py``: ``ee``/``ene`` discounted
    to today with the model's numeraire adjustment, ``pfe`` quantiles
    of the UNDISCOUNTED time-t netted value, ``forward_value`` the
    martingale diagnostic E[V(t)/N(t)] (flat for forward-only sets)."""

    def __init__(self, hybrid: HybridAssetLMM, trades,
                 quantiles=(0.95,)):
        trades = list(trades)
        if not trades:
            raise ValueError("need at least one trade")
        obs = hybrid.observation_indices
        for tr in trades:
            if not isinstance(tr, (EquityForwardTrade, EquityOptionTrade)):
                raise TypeError(f"unsupported trade {type(tr).__name__}")
            if tr.maturity_index not in obs:
                raise ValueError(
                    f"trade maturity index {tr.maturity_index} must be an "
                    "observation date of the hybrid")
            if not (0 <= tr.asset_index < hybrid.num_assets):
                raise ValueError(f"asset index {tr.asset_index} out of range")
            if hybrid._num_mask[tr.asset_index] == 0.0:
                raise ValueError(
                    "exposure trades must reference domestic tradables "
                    f"(asset {tr.asset_index} is a quanto underlying)")
        self.hybrid = hybrid
        self.trades = trades
        self.quantiles = tuple(float(q) for q in quantiles)
        self._maturities = tuple(sorted({tr.maturity_index
                                         for tr in trades}))
        self._profile_core = jax.jit(self._build_profile_core())

    def _build_profile_core(self):
        """ONE device program: simulate, assemble every trade's
        pathwise close-out, net, reduce to [4 + Q, E] — the exposure
        engine transfer contract (a [E, paths] pull through the tunnel
        measured 2.8 s warm; this packs it into one E-length read,
        ~50x less). Regressions run on-device through the f64-safe
        normal-equation solver (jnp.linalg.lstsq has no f64 TPU path)."""
        from ...ops.conditional_expectation import regression_fit

        h = self.hybrid
        obs = h.observation_indices
        m_col = {m: j for j, m in enumerate(self._maturities)}
        qs = jnp.asarray(self.quantiles)

        sim = h._sim_callable(self._maturities)

        def core(params):
            assets, numeraires, bonds = sim(params)
            E, _, paths = assets.shape
            netted = jnp.zeros((E, paths), dtype=assets.dtype)
            for tr in self.trades:
                m_ev = obs.index(tr.maturity_index)
                if isinstance(tr, EquityForwardTrade):
                    for ev, e in enumerate(obs):
                        if e > tr.maturity_index:
                            continue  # settled
                        s_e = assets[ev, tr.asset_index]
                        p_e = bonds[ev, m_col[tr.maturity_index]]
                        dq = float(h.dividend_discount_between(
                            e, tr.maturity_index)[tr.asset_index])
                        netted = netted.at[ev].add(
                            tr.notional * (s_e * dq - tr.strike * p_e))
                else:
                    s_m = assets[m_ev, tr.asset_index]
                    if tr.is_call:
                        pay = jnp.maximum(s_m - tr.strike, 0.0)
                    else:
                        pay = jnp.maximum(tr.strike - s_m, 0.0)
                    y = pay / numeraires[m_ev]   # discounted payoff
                    netted = netted.at[m_ev].add(tr.notional * pay)
                    for ev, e in enumerate(obs):
                        if e >= tr.maturity_index:
                            continue
                        s_e = assets[ev, tr.asset_index] / tr.strike
                        p_e = bonds[ev, m_col[tr.maturity_index]]
                        cols = [jnp.ones_like(s_e)]
                        for d in range(1, tr.basis_degree + 1):
                            cols.append(s_e ** d)
                        cols.append(p_e)
                        cols.append(s_e * p_e)
                        X = jnp.stack(cols)              # [B, paths]
                        beta = regression_fit(X, y)
                        cond = beta @ X.astype(beta.dtype)
                        netted = netted.at[ev].add(
                            tr.notional * cond * numeraires[ev])
                    del y
            disc = netted / numeraires
            stats = jnp.stack([
                jnp.mean(jnp.maximum(disc, 0.0), axis=1),
                jnp.mean(jnp.minimum(disc, 0.0), axis=1),
                jnp.mean(disc, axis=1),
                jnp.mean(1.0 / numeraires, axis=1),
            ])                                            # [4, E]
            pfe = jnp.quantile(netted, qs, axis=1)        # [Q, E]
            return jnp.concatenate([stats, pfe])          # ONE transfer

        return core

    def profile(self, params):
        from .exposure import ExposureProfile

        h = self.hybrid
        obs = h.observation_indices
        packed = np.asarray(self._profile_core(jnp.asarray(params)))
        ee_raw, ene_raw, fv_raw, inv_n = packed[:4]
        times = np.asarray([h.model.tenor_times[e] for e in obs])
        if h.model.use_numeraire_adjustment:
            dfs = np.asarray(
                h.model.discount_curve.get_discount_factor(times))
            adj = dfs / inv_n
        else:
            adj = np.ones_like(inv_n)
        pfe = {q: packed[4 + j] for j, q in enumerate(self.quantiles)}
        return ExposureProfile(times=times, ee=adj * ee_raw,
                               ene=adj * ene_raw,
                               forward_value=adj * fv_raw, pfe=pfe)


class HybridAutocallableNote:
    """Autocallable certificate on a hybrid asset, discounted PATHWISE
    by the stochastic numeraire — the equity-linked-note valuation a
    deterministic-rate facade cannot do: coupon/redemption cash flows
    arrive exactly when rates are correlated-high or -low, so the note
    carries rate-vol and equity-rate-correlation risk that only shows
    up under the joint simulation. Payoff conventions are identical to
    ``models.structured_products.AutocallableNote`` (same express
    closed form as the deterministic-limit oracle), with dates given as
    tenor indices on the hybrid's observation grid and the model's
    deterministic numeraire adjustment applied per payment date."""

    def __init__(self, hybrid: HybridAssetLMM,
                 observation_indices: Sequence[int],
                 autocall_levels: Sequence[float],
                 coupons: Sequence[float],
                 protection_level: float,
                 coupon_levels: Optional[Sequence[float]] = None,
                 reference_level: Optional[float] = None,
                 memory: bool = False, notional: float = 1.0,
                 asset_index: int = 0):
        evs = [int(e) for e in observation_indices]
        if sorted(evs) != evs or len(evs) < 2:
            raise ValueError("need >= 2 ascending observation indices")
        missing = [e for e in evs if e not in hybrid.observation_indices]
        if missing:
            raise ValueError(
                f"indices {missing} are not hybrid observation dates")
        m = len(evs)
        ac = [float(x) for x in autocall_levels]
        cp = [float(x) for x in coupons]
        cl = ([float(x) for x in coupon_levels]
              if coupon_levels is not None else list(ac))
        if not (len(ac) == len(cp) == len(cl) == m):
            raise ValueError("schedule arrays must match the dates")
        if not (0 <= int(asset_index) < hybrid.num_assets):
            raise ValueError("asset index out of range")
        if hybrid._num_mask[int(asset_index)] == 0.0:
            raise ValueError("the underlying must be a domestic tradable")
        self.hybrid = hybrid
        ref = (float(reference_level) if reference_level is not None
               else float(hybrid._s0[int(asset_index)]))
        times = np.asarray([hybrid.model.tenor_times[e] for e in evs])
        dfs = np.asarray(
            hybrid.model.discount_curve.get_discount_factor(times))
        row_of = {e: i for i, e in enumerate(hybrid.observation_indices)}
        rows = [row_of[e] for e in evs]
        use_adj = hybrid.model.use_numeraire_adjustment
        ai = int(asset_index)
        prot = float(protection_level)
        notl = float(notional)
        mem_flag = bool(memory)

        sim = hybrid._sim_callable(())

        def core(params):
            assets, numeraires = sim(params)
            paths = assets.shape[2]
            alive = jnp.ones((paths,), dtype=assets.dtype)
            mem = jnp.zeros((paths,), dtype=assets.dtype)
            acc = jnp.zeros((paths,), dtype=assets.dtype)
            for i, r in enumerate(rows):
                s_i = assets[r, ai]
                n_i = numeraires[r]
                adj = (dfs[i] / jnp.mean(1.0 / n_i)) if use_adj else 1.0
                coup_hit = (s_i >= cl[i]).astype(assets.dtype)
                pay_c = alive * coup_hit * (cp[i] + mem)
                if mem_flag:
                    mem = jnp.where(coup_hit > 0.0, 0.0, mem + cp[i])
                if i < len(rows) - 1:
                    call_hit = (s_i >= ac[i]).astype(assets.dtype)
                    pay = pay_c + alive * call_hit
                    alive = alive * (1.0 - call_hit)
                else:
                    principal = jnp.where(s_i >= prot, 1.0, s_i / ref)
                    pay = pay_c + alive * principal
                acc = acc + adj * pay / n_i
            acc = acc * notl
            return jnp.stack([jnp.mean(acc),
                              jnp.std(acc) / np.sqrt(acc.shape[0])])

        self._core = jax.jit(core)

    def get_value_and_error(self, params) -> tuple:
        out = np.asarray(self._core(jnp.asarray(params)))
        return float(out[0]), float(out[1])

    def get_value(self, params) -> float:
        return self.get_value_and_error(params)[0]

    getValue = get_value
