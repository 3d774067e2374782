"""LIBOR covariance models: piecewise-constant volatility, exponential-decay
correlation with factor reduction, and local-volatility wrappers.

TPU-first equivalents of the finmath-lib covariance stack the reference
calibrates (/root/reference/.../LIBORMarketModelCalibrationATMTest.java:
287-294: LIBORVolatilityModelPiecewiseConstant x
LIBORCorrelationModelExponentialDecay combined by
LIBORCovarianceModelFromVolatilityAndCorrelation, optionally wrapped in
DisplacedLocalVolatilityModel; the benchmark test adds blended local vol +
stochastic vol, LIBORMarketModelCalibrationTest.java:246-276).

Design: everything static (grids, bucket maps, factor matrices) is
precomputed as NumPy at construction; the only runtime input is the
calibration parameter vector theta, and ``vol_table(theta)`` /
``factor_loadings_table(theta)`` are pure jnp gathers usable inside jit and
differentiable by jacfwd — the whole covariance structure compiles into the
simulation scan.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..time_discretization import TimeDiscretization


def _bucket_index(grid: np.ndarray, t: float) -> int:
    """Index of the greatest grid point <= t (finmath
    getTimeIndexNearestLessOrEqual semantics)."""
    return int(np.clip(np.searchsorted(grid, t + 1e-12) - 1, 0, len(grid) - 1))


class LIBORVolatilityModelPiecewiseConstant:
    """sigma_i(t) piecewise constant in (simulation-time bucket,
    time-to-maturity bucket) — ref. LIBORVolatilityModelPiecewiseConstant
    with grids {0,1,2,5,10,20,30,40} x {0,1,2,5,10,20,30,40} and initial
    volatility 0.50/100 (ATM test :287).

    Only (time, ttm) buckets actually reachable on the simulation/tenor
    grids get a parameter; ``n_params`` is the calibration dimension.
    """

    def __init__(self, simulation_td: TimeDiscretization,
                 libor_td: TimeDiscretization,
                 time_grid: np.ndarray, maturity_grid: np.ndarray,
                 initial_volatility: float = 0.005,
                 is_calibrateable: bool = True):
        self.simulation_td = simulation_td
        self.libor_td = libor_td
        self.time_grid = np.asarray(time_grid, dtype=np.float64)
        self.maturity_grid = np.asarray(maturity_grid, dtype=np.float64)
        self.is_calibrateable = is_calibrateable

        n_steps = simulation_td.get_number_of_time_steps()
        n_libor = libor_td.get_number_of_time_steps()

        # map each (simulation step m, libor index i) to a parameter bucket
        bucket_of = {}
        bucket_matrix = np.zeros((n_steps, n_libor), dtype=np.int32)
        alive = np.zeros((n_steps, n_libor), dtype=bool)
        for m in range(n_steps):
            t = simulation_td.get_time(m)
            for i in range(n_libor):
                T_i = libor_td.get_time(i)
                ttm = T_i - t
                if ttm <= 0:
                    continue  # forward already fixed; masked
                tb = _bucket_index(self.time_grid, t)
                mb = _bucket_index(self.maturity_grid, ttm)
                key = (tb, mb)
                if key not in bucket_of:
                    bucket_of[key] = len(bucket_of)
                bucket_matrix[m, i] = bucket_of[key]
                alive[m, i] = True

        self.n_params = len(bucket_of)
        self._bucket_matrix = jnp.asarray(bucket_matrix)
        self._alive = jnp.asarray(alive)
        self.initial_parameters = np.full(self.n_params, float(initial_volatility))

    def vol_table(self, params: jax.Array) -> jax.Array:
        """[n_steps, n_libor] volatility table for parameter vector
        ``params`` (0 where the forward is already fixed)."""
        table = params[self._bucket_matrix]
        return jnp.where(self._alive, table, 0.0)


class LIBORCorrelationModelExponentialDecay:
    """rho_ij = exp(-a |T_i - T_j|), reduced to ``num_factors`` factors by
    eigendecomposition with row renormalization — ref.
    LIBORCorrelationModelExponentialDecay(td, liborTd, factors, 0.05, false)
    (ATM test :288). ``a`` is fixed (isCalibrateable=false there)."""

    def __init__(self, libor_td: TimeDiscretization, num_factors: int,
                 decay: float = 0.05):
        self.libor_td = libor_td
        self.num_factors = int(num_factors)
        self.decay = float(decay)

        times = np.asarray([libor_td.get_time(i)
                            for i in range(libor_td.get_number_of_time_steps())])
        corr = np.exp(-self.decay * np.abs(times[:, None] - times[None, :]))
        # factor reduction: top-F eigenpairs, rows renormalized to unit norm
        w, v = np.linalg.eigh(corr)
        idx = np.argsort(w)[::-1][: self.num_factors]
        F = v[:, idx] * np.sqrt(np.maximum(w[idx], 0.0))[None, :]
        norms = np.linalg.norm(F, axis=1, keepdims=True)
        F = F / np.where(norms > 0, norms, 1.0)
        self._factors = jnp.asarray(F.astype(np.float64))  # [n_libor, F]

    @property
    def factor_matrix(self) -> jax.Array:
        return self._factors


class LIBORCovarianceModelFromVolatilityAndCorrelation:
    """lambda_{i,f}(t) = sigma_i(t) * R_{i,f} — ref.
    LIBORCovarianceModelFromVolatilityAndCorrelation (ATM test :291)."""

    def __init__(self, volatility_model: LIBORVolatilityModelPiecewiseConstant,
                 correlation_model: LIBORCorrelationModelExponentialDecay):
        self.volatility_model = volatility_model
        self.correlation_model = correlation_model
        self.n_params = volatility_model.n_params
        self.initial_parameters = volatility_model.initial_parameters
        self.num_factors = correlation_model.num_factors

    def loading_tables(self, params: jax.Array):
        """Returns (vol_table [steps, libor], factor_matrix [libor, F]).
        The engine combines them as vol[m,i] * R[i,f] (and applies any
        local-volatility multiplier per step)."""
        return (self.volatility_model.vol_table(params),
                self.correlation_model.factor_matrix)

    # local-volatility hooks (overridden by wrappers); the engine calls
    # local_factor(L, L0) each step and multiplies the loadings by it.
    has_local_vol = False

    def local_factor(self, L: jax.Array, L0: jax.Array) -> jax.Array:
        return jnp.ones_like(L)


class DisplacedLocalVolatilityModel(LIBORCovarianceModelFromVolatilityAndCorrelation):
    """Displaced diffusion: loadings scaled by (L_i + d) — ref.
    DisplacedLocalVolatilityModel(cov, 1/0.25, isCalibrateable=false)
    (ATM test :294). With NORMAL state space this makes the model
    near-lognormal in (L + d)."""

    has_local_vol = True

    def __init__(self, base: LIBORCovarianceModelFromVolatilityAndCorrelation,
                 displacement: float, is_calibrateable: bool = False):
        self.base = base
        self.displacement = float(displacement)
        self.volatility_model = base.volatility_model
        self.correlation_model = base.correlation_model
        self.n_params = base.n_params
        self.initial_parameters = base.initial_parameters
        self.num_factors = base.num_factors

    def local_factor(self, L: jax.Array, L0: jax.Array) -> jax.Array:
        return L + self.displacement


class BlendedLocalVolatilityModel(LIBORCovarianceModelFromVolatilityAndCorrelation):
    """Blended (lognormal/normal mix) local volatility: loadings scaled by
    ((1-b) L_i + b L_i(0)) — finmath BlendedLocalVolatilityModel semantics
    used by the benchmark test's 5-param model
    (LIBORMarketModelCalibrationTest.java:246-276)."""

    has_local_vol = True

    def __init__(self, base: LIBORCovarianceModelFromVolatilityAndCorrelation,
                 blend: float, is_calibrateable: bool = False):
        self.base = base
        self.blend = float(blend)
        self.volatility_model = base.volatility_model
        self.correlation_model = base.correlation_model
        self.n_params = base.n_params
        self.initial_parameters = base.initial_parameters
        self.num_factors = base.num_factors

    def local_factor(self, L: jax.Array, L0: jax.Array) -> jax.Array:
        return (1.0 - self.blend) * L + self.blend * L0
