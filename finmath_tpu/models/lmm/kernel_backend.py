"""Pallas-kernel-backed residual/Jacobian engine for the stoch-vol
benchmark calibration (round-5 VERDICT item 1).

The reference's design principle is that the calibration hot loop runs on
the fastest device implementation — every op of its LM residual sweep hits
the .cu kernels (/root/reference/README.md:24-28,
RandomVariableCuda.java:539-557). The repo measured its own Pallas LMM
kernels 1.7-3x faster than the lax.scan engine on identical workloads
(BENCH_DETAIL lmm_pricer_kernels_409600, same-normals agreement 1.16e-6)
but ran every calibration leg on the scan engine. This module closes that
gap for the published stoch-vol benchmark family
(LIBORMarketModelCalibrationTest.java:269-275):

* ``residuals(x)``    — ONE ``pallas_call`` simulates all paths with the
  whole forward-curve state VMEM-resident and collects every calibration
  swaption in the same sweep (ops/lmm_stochvol_kernel.py
  ``_sv_kernel_products``); the f64 reduction, Black implied-vol
  inversion and target weighting run in the same jitted program.
* ``jacobian(x)``     — central finite differences over a BATCHED
  parameter-set axis: the kernel grid is (2*n_params+1, path_tiles), all
  parameter sets share one normal realization (common random numbers), so
  the entire Jacobian is ONE device program / ONE dispatch. The reference
  calibrates with finite differences too (finmath LevenbergMarquardt,
  parameterStep 1e-4) — here the 17 evaluations are a single kernel
  launch instead of 17 serial sweeps.
* realizations are a traced argument: the engine holds K device-resident
  normal sets (e.g. independent Owen scramblings of the Sobol estimator)
  and every public entry point takes ``k=`` — one compiled program serves
  all realizations AND all concurrent threads (no ``set_increments``
  mutation, so independent polishes can run in parallel).

Scope guards in ``__init__`` pin the kernel's hard-coded dynamics to the
engine's configuration (spot measure, NORMAL state space, blended local
vol, sqrt-scaling lognormal stoch-vol with martingale correction, sim
grid == tenor grid, uniform dt, injected increments).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.lmm_kernel import lmm_atm_swaptions_batch
from ...ops.lmm_stochvol_kernel import _LANES, lmm_stochvol_swaptions_batch
from .model import (LMMValuationEngine, bachelier_implied_vol_jnp,
                    black_implied_vol_jnp)


class StochVolKernelCalibration:
    """Kernel-path residual/Jacobian functions of the covariance parameter
    vector, matching ``LMMValuationEngine.residuals/jacobian`` semantics
    (same products, targets, weights, implied-vol inversion) to the
    kernel-vs-engine agreement measured in tests/bench (~1e-5 value-level
    on identical normals; the engine's f64 collection is the parity
    oracle, this is the speed path)."""

    def __init__(self, engine: LMMValuationEngine,
                 realizations: Sequence[np.ndarray],
                 fd_abs: float = 5e-4, fd_rel: float = 0.0):
        model = engine.model
        cov = model.covariance
        if model.measure != "spot" or model.state_space != "normal":
            raise ValueError("kernel backend: spot/NORMAL only")
        if model.use_numeraire_adjustment:
            raise ValueError("kernel backend: no numeraire adjustment")
        if not cov.has_stoch_vol:
            raise ValueError("kernel backend: stoch-vol covariance required")
        if getattr(cov, "scaling_exponent", 0.5) != 0.5 \
                or not getattr(cov, "martingale_correction", True):
            raise ValueError(
                "kernel backend implements sqrt-scaling with martingale "
                "correction (the framework default convention)")
        if engine.mesh is not None:
            raise ValueError("kernel backend is single-device")
        if engine.value_unit != "VOLATILITYLOGNORMAL":
            raise ValueError("kernel backend: VOLATILITYLOGNORMAL products")
        sim = model.sim_times
        n = model.num_libors
        if len(sim) - 1 != n:
            raise ValueError("kernel backend: simulation grid == tenor grid")
        dts = np.diff(sim)
        if not np.allclose(dts, dts[0], atol=1e-12):
            raise ValueError("kernel backend: uniform time step required")

        self.engine = engine
        self.num_paths = engine.num_paths
        self._dt = float(dts[0])
        self._n = n
        self._F = engine.num_factors
        self._n_params = int(cov.n_params)
        self.fd_abs = float(fd_abs)
        self.fd_rel = float(fd_rel)

        # product packing: (exercise sim step == tenor index here, periods,
        # strike), engine product order — residual rows line up 1:1
        self._products = tuple(
            (int(p.exercise_index), int(p.num_periods), float(p.strike))
            for p in engine.products)
        self._num_steps = max(e for e, _, _ in self._products)
        self._P = len(self._products)

        self._fwd0 = jnp.asarray(engine._fwd0)
        self._ann0 = jnp.asarray(engine._ann0)
        self._strike = jnp.asarray(engine._strike)
        self._texp = jnp.asarray(engine._texp)
        self._target = jnp.asarray(engine._target)
        self._weight = jnp.asarray(engine._weight)
        self._l0 = np.asarray(model.initial_forwards, dtype=np.float32)
        self._deltas = np.asarray(model.deltas, dtype=np.float32)

        rng_factors = self._F + 1
        self._z: List[jax.Array] = []
        for inc in realizations:
            self._z.append(self._pack_realization(inc, rng_factors))
        if not self._z:
            raise ValueError("at least one realization is required")

        self._res_core = jax.jit(self._build_residuals_core())
        self._jac_core = jax.jit(self._build_jac_core())
        self._lock = threading.Lock()

    # ------------------------------------------------------------------
    def _pack_realization(self, inc, rng_factors: int) -> jax.Array:
        """[steps>=num_steps, F+1, paths] sqrt(dt)-scaled increments (the
        engine's injected format) -> [tiles, rows, 128] f32 STANDARD
        normals in kernel consumption order (step-major, factors then the
        V driver)."""
        inc = np.asarray(getattr(inc, "increments", inc))
        S, nf, paths = inc.shape
        if nf != rng_factors or paths != self.num_paths \
                or S < self._num_steps:
            raise ValueError(
                f"realization shape {inc.shape} incompatible with "
                f"[>={self._num_steps}, {rng_factors}, {self.num_paths}]")
        z = (inc[:self._num_steps] / np.sqrt(self._dt)).astype(np.float32)
        rows = self._num_steps * rng_factors
        z = z.reshape(rows, paths)
        tiles = -(-paths // _LANES)
        pad = tiles * _LANES - paths
        if pad:
            z = np.concatenate([z, np.zeros((rows, pad), np.float32)], axis=1)
        z = np.ascontiguousarray(
            z.reshape(rows, tiles, _LANES).transpose(1, 0, 2))
        return jnp.asarray(z)

    @property
    def num_realizations(self) -> int:
        return len(self._z)

    def add_realization(self, inc) -> int:
        """Register another realization; returns its ``k`` index."""
        self._z.append(self._pack_realization(inc, self._F + 1))
        return len(self._z) - 1

    # ------------------------------------------------------------------
    def _build_pack(self):
        """params [n_params] f64 -> (volT [F*n, S] f32, scal [8] f32)."""
        cov = self.engine.model.covariance
        dt = self._dt
        F, n, S = self._F, self._n, self._num_steps

        def pack(params):
            prep = cov.prepare(params)
            vt = cov.vol_table(prep)[:S]                      # [S, n]
            R = cov.factor_matrix(prep)                       # [n, F]
            volT = (vt.T[None, :, :] * R.T[:, :, None]).reshape(F * n, S)
            # blend via the covariance's own local-factor map evaluated at
            # (L=1, L0=0) -> (1-b): generic across wrapper nesting, no
            # reliance on parameter layout
            one = jnp.ones((1, 1), dtype=params.dtype)
            b = 1.0 - cov.local_factor(prep, one, jnp.zeros_like(one))[0, 0]
            nu, rho = cov.stoch_vol_params(prep)
            somega = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 1e-12))
            scal = jnp.stack([
                jnp.asarray(dt, params.dtype),
                jnp.asarray(np.sqrt(dt), params.dtype),
                b, nu, rho, somega,
                jnp.zeros((), params.dtype), jnp.zeros((), params.dtype)])
            return volT.astype(jnp.float32), scal.astype(jnp.float32)

        return pack

    def _build_residuals_core(self):
        pack = self._build_pack()
        P, paths = self._P, self.num_paths
        n, F = self._n, self._F
        products = self._products
        l0, deltas = self._l0, self._deltas
        fwd0, ann0 = self._fwd0, self._ann0
        strike, texp = self._strike, self._texp
        target, weight = self._target, self._weight

        def residuals_core(params_b, z_tiles):
            """[B, n_params] f64, [tiles, rows, 128] f32 -> [B, P] f64."""
            volT_b, scal_b = jax.vmap(pack)(params_b)
            out = lmm_stochvol_swaptions_batch(
                z_tiles, volT_b, scal_b, l0, deltas,
                num_libors=n, num_factors=F, products=products)
            B, tiles, p_pad, lanes = out.shape
            o = out.transpose(0, 2, 1, 3).reshape(B, p_pad, tiles * lanes)
            o = o[:, :P, :paths]
            # engine semantics: non-finite pathwise contributions dropped
            v = jnp.where(jnp.isfinite(o), o, 0.0).astype(jnp.float64)
            v = jnp.sum(v, axis=-1) / paths                   # [B, P]
            iv = jax.vmap(lambda vb: black_implied_vol_jnp(
                vb, fwd0, strike, texp, ann0))(v)
            return weight * (iv - target)

        return residuals_core

    def _build_jac_core(self):
        res_core = self._build_residuals_core()
        n_params = self._n_params
        fd_abs, fd_rel = self.fd_abs, self.fd_rel

        def jac_core(params, z_tiles):
            """Central-difference Jacobian under common random numbers:
            ONE batched kernel call over 2*n_params+1 parameter sets.
            Returns (residuals at params [P], J [P, n_params])."""
            h = fd_abs + fd_rel * jnp.abs(params)             # [n_params]
            eye = jnp.eye(n_params, dtype=params.dtype)
            X = jnp.concatenate([
                params[None, :],
                params[None, :] + eye * h[:, None],
                params[None, :] - eye * h[:, None]], axis=0)
            r = res_core(X, z_tiles)                          # [2n+1, P]
            J = (r[1:1 + n_params] - r[1 + n_params:]) / (2.0 * h[:, None])
            return r[0], J.T

        return jac_core

    # ------------------------------------------------------------------
    # public API (numpy in/out, realization index k; thread-safe — the
    # jitted programs are pure and z is an argument, not engine state)
    # ------------------------------------------------------------------
    def _params(self, x) -> jax.Array:
        x = jnp.asarray(x, dtype=jnp.float64)
        if x.shape != (self._n_params,):
            raise ValueError(f"params shape {x.shape} != ({self._n_params},)")
        return x

    def residuals(self, x, k: int = 0) -> np.ndarray:
        r = self._res_core(self._params(x)[None, :], self._z[k])
        return np.asarray(r)[0]

    def residuals_batch(self, X, k: int = 0) -> np.ndarray:
        """[M, n_params] -> [M, P]; each batch size M compiles its own
        program — keep M stable across calls."""
        X = jnp.asarray(X, dtype=jnp.float64)
        return np.asarray(self._res_core(X, self._z[k]))

    def jacobian(self, x, k: int = 0) -> np.ndarray:
        _, J = self._jac_core(self._params(x), self._z[k])
        return np.asarray(J)

    def residuals_and_jacobian(self, x, k: int = 0):
        r0, J = self._jac_core(self._params(x), self._z[k])
        return np.asarray(r0), np.asarray(J)

    def implied_vols(self, x, k: int = 0) -> np.ndarray:
        """Model quotes (lognormal implied vols), from the residual row
        (all benchmark weights are 1; guarded for generality)."""
        w = np.asarray(self._weight)
        r = self.residuals(x, k)
        return np.asarray(self._target) + np.where(w != 0.0, r / np.where(
            w != 0.0, w, 1.0), 0.0)

    def deviations(self, x, k: int = 0) -> np.ndarray:
        return self.implied_vols(x, k) - np.asarray(self._target)

    # ------------------------------------------------------------------
    # AOT persistence: INTENTIONALLY disabled for the kernel backend.
    # jax.export round trips of Pallas-containing programs crash the
    # remote TPU compile service on reload (Mosaic layout check
    # `llvm::has_single_bit(bitwidth_) && bitwidth_ <= 32` inside the
    # chipless TpuAotCompiler — SIGABRT, observed twice on the driver
    # path, 2026-08-21). Engine-only (pure XLA) programs round-trip
    # fine and keep their AOT artifacts; the kernel programs have small
    # jaxprs (seconds of lowering, vs the engines' 80-90 s) and their
    # jit-path compiles are served by the persistent XLA cache, so the
    # loss is minor. Both methods keep their signatures so callers can
    # treat every backend uniformly.
    # ------------------------------------------------------------------
    def export_programs(self, directory=None) -> int:
        """No-op (returns 0): see the class-level AOT note — exported
        Pallas programs crash the TPU compiler when reloaded."""
        return 0

    def load_programs(self, directory=None) -> bool:
        """No-op (returns False): the jit path + persistent XLA cache is
        the supported warm path for kernel programs."""
        return False


class ATMKernelCalibration:
    """Kernel-path residuals for the ATM surface calibration
    (build_atm_calibration): the NORMAL-state-space multi-factor LMM
    without stochastic volatility, ~156 swaptions + per-event numeraire-
    adjustment rows collected in ONE VMEM-resident Pallas sweep
    (ops/lmm_kernel.py ``lmm_atm_swaptions_batch``).

    The normal realization REPLICATES the engine's own Threefry stream
    (``jax.random.normal(fold_in(PRNGKey(seed), s), ...)`` — the stream
    is a pure function of (seed, step), not engine state), so kernel and
    engine price the IDENTICAL paths and residuals agree to the f32-
    collection envelope. The headline calibration keeps its reduced-path
    engine jacfwd Jacobian (inexact-J LM, atm_calibration.py) and swaps
    only the full-path residuals onto this backend; a CRN central-FD
    Jacobian is available via ``residuals_and_jacobian`` (one batched
    launch over 2*n_params+1 parameter sets) where wanted."""

    def __init__(self, engine: LMMValuationEngine,
                 fd_abs: float = 5e-4, fd_rel: float = 0.0):
        model = engine.model
        cov = model.covariance
        if model.measure != "spot" or model.state_space != "normal":
            raise ValueError("ATM kernel backend: spot/NORMAL only")
        if cov.has_stoch_vol:
            raise ValueError("ATM kernel backend: no stochastic volatility")
        if engine.mesh is not None or engine.antithetic:
            raise ValueError("ATM kernel backend: single-device, plain MC")
        if engine.value_unit != "VOLATILITYNORMAL":
            raise ValueError("ATM kernel backend: VOLATILITYNORMAL products")
        sim = model.sim_times
        n = model.num_libors
        if len(sim) - 1 != n:
            raise ValueError("ATM kernel backend: sim grid == tenor grid")
        dts = np.diff(sim)
        if not np.allclose(dts, dts[0], atol=1e-12):
            raise ValueError("ATM kernel backend: uniform time step")

        self.engine = engine
        self.num_paths = engine.num_paths
        self._dt = float(dts[0])
        self._n = n
        self._F = engine.num_factors
        self._n_params = int(cov.n_params)
        self.fd_abs = float(fd_abs)
        self.fd_rel = float(fd_rel)

        self._products = tuple(
            (int(p.exercise_index), int(p.num_periods), float(p.strike))
            for p in engine.products)
        self._num_steps = max(e for e, _, _ in self._products)
        self._P = len(self._products)
        self._events = tuple(int(e) for e in engine.exercise_indices)
        ev_index = {e: j for j, e in enumerate(self._events)}
        self._ev_of_product = jnp.asarray(
            [ev_index[e] for e, _, _ in self._products])

        # local-volatility form: either none or displaced (L + d) — the
        # two ATM variants. Verify the functional form at the initial
        # parameters; the displacement value itself is read per-pset in
        # pack() (it may be calibrateable in principle).
        self._displaced = bool(getattr(cov, "has_local_vol", False))
        if self._displaced:
            p0 = jnp.asarray(np.asarray(cov.initial_parameters, np.float64))
            prep = cov.prepare(p0)
            z11 = jnp.full((1, 1), 0.0)
            d0 = float(cov.local_factor(prep, z11, z11)[0, 0])
            d1 = float(cov.local_factor(prep, z11 + 1.0, z11)[0, 0])
            dl0 = float(cov.local_factor(prep, z11, z11 + 1.0)[0, 0])
            if abs((d1 - d0) - 1.0) > 1e-9 or abs(dl0 - d0) > 1e-9:
                raise ValueError(
                    "ATM kernel backend supports local factor (L + d) "
                    "(displaced) or none; this covariance is neither")

        self._fwd0 = jnp.asarray(engine._fwd0)
        self._ann0 = jnp.asarray(engine._ann0)
        self._strike = jnp.asarray(engine._strike)
        self._texp = jnp.asarray(engine._texp)
        self._target = jnp.asarray(engine._target)
        self._weight = jnp.asarray(engine._weight)
        self._df_exercise = jnp.asarray(engine._df_exercise)
        self._use_adjustment = bool(model.use_numeraire_adjustment)
        self._l0 = np.asarray(model.initial_forwards, dtype=np.float32)
        self._deltas = np.asarray(model.deltas, dtype=np.float32)

        self._z = self._make_z()
        self._res_core = jax.jit(self._build_residuals_core())
        self._jac_core = jax.jit(self._build_jac_core())

    # ------------------------------------------------------------------
    def _make_z(self) -> jax.Array:
        """[tiles, S*F, 128] f32 standard normals in kernel order —
        either the engine's injected realization or an exact REPLICA of
        its per-step Threefry draws (model.py sim_step)."""
        S, F, paths = self._num_steps, self._F, self.num_paths
        if self.engine._inc_np is not None:
            z = (np.asarray(self.engine._inc_np[:S])
                 / np.sqrt(self._dt)).astype(np.float32)
            z = z.reshape(S * F, paths)
        else:
            seed = self.engine.seed

            def gen():
                key = jax.random.PRNGKey(seed)
                return jnp.stack([
                    jax.random.normal(jax.random.fold_in(key, s),
                                      (F, paths), dtype=jnp.float32)
                    for s in range(S)]).reshape(S * F, paths)

            z = np.asarray(jax.jit(gen)())
        tiles = -(-paths // _LANES)
        pad = tiles * _LANES - paths
        if pad:
            z = np.concatenate(
                [z, np.zeros((S * F, pad), np.float32)], axis=1)
        return jnp.asarray(np.ascontiguousarray(
            z.reshape(S * F, tiles, _LANES).transpose(1, 0, 2)))

    # ------------------------------------------------------------------
    def _build_pack(self):
        cov = self.engine.model.covariance
        dt = self._dt
        F, n, S = self._F, self._n, self._num_steps
        displaced = self._displaced

        def pack(params):
            prep = cov.prepare(params)
            vt = cov.vol_table(prep)[:S]                      # [S, n]
            R = cov.factor_matrix(prep)                       # [n, F]
            volT = (vt.T[None, :, :] * R.T[:, :, None]).reshape(F * n, S)
            if displaced:
                z11 = jnp.zeros((1, 1), dtype=params.dtype)
                d = cov.local_factor(prep, z11, z11)[0, 0]
            else:
                d = jnp.zeros((), dtype=params.dtype)
            zero = jnp.zeros((), dtype=params.dtype)
            scal = jnp.stack([
                jnp.asarray(dt, params.dtype),
                jnp.asarray(np.sqrt(dt), params.dtype),
                d, zero, zero, zero, zero, zero])
            return volT.astype(jnp.float32), scal.astype(jnp.float32)

        return pack

    def _build_values_core(self):
        pack = self._build_pack()
        P, paths = self._P, self.num_paths
        n, F = self._n, self._F
        products, events = self._products, self._events
        displaced = self._displaced
        l0, deltas = self._l0, self._deltas
        df_ex = self._df_exercise
        ev_of = self._ev_of_product
        use_adj = self._use_adjustment

        def values_core(params_b, z_tiles):
            volT_b, scal_b = jax.vmap(pack)(params_b)
            out = lmm_atm_swaptions_batch(
                z_tiles, volT_b, scal_b, l0, deltas,
                num_libors=n, num_factors=F, products=products,
                events=events, displaced=displaced, num_paths=paths)
            sums = out[:, :P + len(events)].astype(jnp.float64)
            sums = jnp.sum(sums, axis=-1)                     # [B, P+E]
            raw = sums[:, :P] / paths
            if not use_adj:
                return raw
            mean_inv = sums[:, P:] / paths                    # [B, E]
            inv_p = mean_inv[:, ev_of]                        # [B, P]
            return raw * jnp.where(inv_p > 0.0, df_ex / inv_p, 0.0)

        return values_core

    def _build_residuals_core(self):
        values_core = self._build_values_core()
        fwd0, ann0 = self._fwd0, self._ann0
        strike, texp = self._strike, self._texp
        target, weight = self._target, self._weight

        def residuals_core(params_b, z_tiles):
            v = values_core(params_b, z_tiles)
            iv = jax.vmap(lambda vb: bachelier_implied_vol_jnp(
                vb, fwd0, strike, texp, ann0))(v)
            return weight * (iv - target)

        return residuals_core

    def _build_jac_core(self):
        res_core = self._build_residuals_core()
        n_params = self._n_params
        fd_abs, fd_rel = self.fd_abs, self.fd_rel

        def jac_core(params, z_tiles):
            h = fd_abs + fd_rel * jnp.abs(params)
            eye = jnp.eye(n_params, dtype=params.dtype)
            X = jnp.concatenate([
                params[None, :],
                params[None, :] + eye * h[:, None],
                params[None, :] - eye * h[:, None]], axis=0)
            r = res_core(X, z_tiles)
            J = (r[1:1 + n_params] - r[1 + n_params:]) / (2.0 * h[:, None])
            return r[0], J.T

        return jac_core

    # ------------------------------------------------------------------
    def _params(self, x) -> jax.Array:
        x = jnp.asarray(x, dtype=jnp.float64)
        if x.shape != (self._n_params,):
            raise ValueError(f"params shape {x.shape} != ({self._n_params},)")
        return x

    def residuals(self, x) -> np.ndarray:
        return np.asarray(self._res_core(self._params(x)[None, :],
                                         self._z))[0]

    def jacobian(self, x) -> np.ndarray:
        _, J = self._jac_core(self._params(x), self._z)
        return np.asarray(J)

    def residuals_and_jacobian(self, x):
        r0, J = self._jac_core(self._params(x), self._z)
        return np.asarray(r0), np.asarray(J)

    def implied_vols(self, x) -> np.ndarray:
        w = np.asarray(self._weight)
        r = self.residuals(x)
        return np.asarray(self._target) + np.where(
            w != 0.0, r / np.where(w != 0.0, w, 1.0), 0.0)

    # ------------------------------------------------------------------
    # AOT intentionally disabled — same Mosaic-reload crash as
    # StochVolKernelCalibration (see its AOT note); signatures kept.
    # ------------------------------------------------------------------
    def export_programs(self, directory=None) -> int:
        """No-op (returns 0): exported Pallas programs crash the TPU
        compiler when reloaded; the persistent XLA cache is the warm
        path."""
        return 0

    def load_programs(self, directory=None) -> bool:
        """No-op (returns False): see ``export_programs``."""
        return False
