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


def factor_reduce(corr: jax.Array, num_factors: int) -> jax.Array:
    """Differentiable factor reduction: top-F eigenpairs of a correlation
    matrix, rows renormalized to unit norm. Returns [n, F].

    Columns are ordered by DESCENDING eigenvalue, like finmath's
    LinearAlgebra.factorReduction: factor 0 is the dominant (level) factor.
    The order is load-bearing — LIBORCovarianceModelStochasticVolatility
    correlates its variance driver with factor 0 of the rate process, so a
    permuted factor matrix silently rewires the vol-rate correlation to a
    minor oscillatory factor and destroys the model's smile skew."""
    w, v = jnp.linalg.eigh(corr)                     # ascending
    w_top = w[-num_factors:][::-1]
    v_top = v[:, -num_factors:][:, ::-1]
    F = v_top * jnp.sqrt(jnp.maximum(w_top, 0.0))[None, :]
    norms = jnp.linalg.norm(F, axis=1, keepdims=True)
    return F / jnp.where(norms > 0, norms, 1.0)


class LIBORCovarianceModelFromVolatilityAndCorrelation:
    """lambda_{i,f}(t) = sigma_i(t) * R_{i,f} — ref.
    LIBORCovarianceModelFromVolatilityAndCorrelation (ATM test :291).

    Covariance API consumed by the valuation engine:

    * ``prepare(params)``               -> opaque pytree ``prep`` (built once
                                           per parameter vector, inside jit)
    * ``vol_table(prep)``               -> [steps, libors] scalar vols
    * ``factor_matrix(prep)``           -> [libors, F]
    * ``local_factor(prep, L, L0)``     -> [libors, paths] multiplier
    * ``stoch_vol_params(prep)``        -> (nu, rho) or None
    """

    has_local_vol = False
    has_stoch_vol = False

    def __init__(self, volatility_model: LIBORVolatilityModelPiecewiseConstant,
                 correlation_model: LIBORCorrelationModelExponentialDecay):
        self.volatility_model = volatility_model
        self.correlation_model = correlation_model
        self.n_params = volatility_model.n_params
        self.initial_parameters = volatility_model.initial_parameters
        self.num_factors = correlation_model.num_factors

    # -- covariance API ---------------------------------------------------
    def prepare(self, params: jax.Array):
        return params

    def vol_table(self, prep) -> jax.Array:
        return self.volatility_model.vol_table(prep)

    def factor_matrix(self, prep) -> jax.Array:
        return self.correlation_model.factor_matrix

    def local_factor(self, prep, L: jax.Array, L0: jax.Array) -> jax.Array:
        return jnp.ones_like(L)

    def stoch_vol_params(self, prep):
        return None

    # backwards-compatible helper
    def loading_tables(self, params: jax.Array):
        prep = self.prepare(params)
        return self.vol_table(prep), self.factor_matrix(prep)


class _CovarianceWrapper(LIBORCovarianceModelFromVolatilityAndCorrelation):
    """Base for wrappers that delegate the covariance API to a wrapped
    model, possibly appending their own calibration parameters."""

    def __init__(self, base, extra_params: np.ndarray):
        self.base = base
        self.num_factors = base.num_factors
        self._n_extra = len(extra_params)
        self.n_params = base.n_params + self._n_extra
        self.initial_parameters = np.concatenate(
            [base.initial_parameters, np.asarray(extra_params, dtype=np.float64)]
        )

    def _split(self, params):
        if self._n_extra == 0:
            return params, jnp.asarray([], dtype=jnp.float64)
        return params[: -self._n_extra], params[-self._n_extra:]

    def prepare(self, params):
        base_params, extra = self._split(params)
        return (self.base.prepare(base_params), extra)

    def vol_table(self, prep):
        return self.base.vol_table(prep[0])

    def factor_matrix(self, prep):
        return self.base.factor_matrix(prep[0])

    def local_factor(self, prep, L, L0):
        return self.base.local_factor(prep[0], L, L0)

    def stoch_vol_params(self, prep):
        return self.base.stoch_vol_params(prep[0])

    @property
    def has_local_vol(self):
        return self.base.has_local_vol

    @property
    def has_stoch_vol(self):
        return self.base.has_stoch_vol

    def __getattr__(self, name):
        # stoch-vol simulation settings live on the (possibly nested)
        # stochastic-vol model; delegate inward so the engine reads them
        # from the outermost wrapper regardless of nesting order.
        # __getattr__ only fires when normal lookup fails, so a model
        # that defines these as instance attributes is unaffected.
        if name in ("scaling_exponent", "martingale_correction"):
            base = self.__dict__.get("base")
            if base is not None:
                return getattr(base, name)
        raise AttributeError(name)


class DisplacedLocalVolatilityModel(_CovarianceWrapper):
    """Displaced diffusion: loadings scaled by (L_i + d) — ref.
    DisplacedLocalVolatilityModel(cov, 1/0.25, isCalibrateable=false)
    (ATM test :294). With NORMAL state space this makes the model
    near-lognormal in (L + d)."""

    has_local_vol = True

    def __init__(self, base, displacement: float, is_calibrateable: bool = False):
        extra = [displacement] if is_calibrateable else []
        super().__init__(base, np.asarray(extra))
        self._fixed_displacement = None if is_calibrateable else float(displacement)

    def local_factor(self, prep, L, L0):
        base_prep, extra = prep
        d = self._fixed_displacement if self._fixed_displacement is not None \
            else extra[0].astype(L.dtype)
        return (L + d) * self.base.local_factor(base_prep, L, L0)


class BlendedLocalVolatilityModel(_CovarianceWrapper):
    """Blended (lognormal/normal mix) local volatility: loadings scaled by
    (b L_i(0) + (1-b) L_i(t)) — finmath BlendedLocalVolatilityModel used by
    the benchmark test (LIBORMarketModelCalibrationTest.java:271-273,
    b=0.2, calibrateable)."""

    has_local_vol = True

    def __init__(self, base, blend: float, is_calibrateable: bool = True):
        extra = [blend] if is_calibrateable else []
        super().__init__(base, np.asarray(extra))
        self._fixed_blend = None if is_calibrateable else float(blend)

    def local_factor(self, prep, L, L0):
        base_prep, extra = prep
        b = self._fixed_blend if self._fixed_blend is not None \
            else extra[0].astype(L.dtype)
        return ((1.0 - b) * L + b * L0) * self.base.local_factor(base_prep, L, L0)


class LIBORCovarianceModelExponentialForm5Param(
    LIBORCovarianceModelFromVolatilityAndCorrelation
):
    """5-parameter covariance: sigma_i(t) = (a + b ttm) exp(-c ttm) + d,
    correlation rho_ij = exp(-e |T_i - T_j|) factor-reduced — ref.
    LIBORCovarianceModelExponentialForm5Param(td, liborTd, 5 factors,
    {0.20, 0.05, 0.10, 0.05, 0.10}) (benchmark test :269). All five
    parameters are calibrateable; the factor reduction (eigh) happens
    inside the differentiable graph."""

    has_local_vol = False
    has_stoch_vol = False

    def __init__(self, simulation_td: TimeDiscretization,
                 libor_td: TimeDiscretization, num_factors: int,
                 parameters=(0.20, 0.05, 0.10, 0.05, 0.10)):
        self.simulation_td = simulation_td
        self.libor_td = libor_td
        self.num_factors = int(num_factors)
        self.n_params = 5
        self.initial_parameters = np.asarray(parameters, dtype=np.float64)

        n_steps = simulation_td.get_number_of_time_steps()
        n_libor = libor_td.get_number_of_time_steps()
        t = np.asarray([simulation_td.get_time(m) for m in range(n_steps)])
        T = np.asarray([libor_td.get_time(i) for i in range(n_libor)])
        ttm = T[None, :] - t[:, None]                     # [steps, libors]
        self._ttm = jnp.asarray(np.maximum(ttm, 0.0))
        self._alive = jnp.asarray(ttm > 0)
        self._tenor_dist = jnp.asarray(np.abs(T[:, None] - T[None, :]))

    def prepare(self, params):
        a, b, c, d, e = params[0], params[1], params[2], params[3], params[4]
        # sigma_i(t) = (a + b ttm) exp(-c ttm) + d, floored at 0 like
        # finmath's LIBORVolatilityModelFourParameterExponentialForm
        vol = (a + b * self._ttm) * jnp.exp(-c * self._ttm) + d
        vol = jnp.maximum(vol, 0.0)
        vol = jnp.where(self._alive, vol, 0.0)
        # finmath's LIBORCorrelationModelExponentialDecay clamps a negative
        # decay to 0 (a = max(a, 0)); that clamp has zero gradient for
        # e < 0, which permanently strands the calibration once a step
        # wanders negative (observed: correlation collapses to rank-1 and
        # the ATM term structure can no longer fit). We mirror instead —
        # identical model for e >= 0 (where the optimum lives), gradient
        # flows everywhere.
        corr = jnp.exp(-jnp.abs(e) * self._tenor_dist)
        R = factor_reduce(corr, self.num_factors)
        return (vol, R)

    def vol_table(self, prep):
        return prep[0]

    def factor_matrix(self, prep):
        return prep[1]

    def local_factor(self, prep, L, L0):
        return jnp.ones_like(L)

    def stoch_vol_params(self, prep):
        return None


class LIBORCovarianceModelStochasticVolatility(_CovarianceWrapper):
    """Stochastic volatility scaling — ref.
    LIBORCovarianceModelStochasticVolatility(cov, brownianMotionView2,
    nu=0.15, rho=0.20, calibrateable) (benchmark test :275).

    Dynamics: a scalar scaling process V(t) with d V = nu V dW_V, V(0)=1,
    where dW_V = rho dW_0 + sqrt(1-rho^2) dW_extra — the driver is
    correlated with the FIRST (dominant/level) rate factor and otherwise
    independent (the reference wires this via a BrownianMotionView on
    factors {0, extra}, benchmark test :267-269). V is simulated with the
    exact lognormal (log-Euler) step V *= exp(nu dW_V - nu^2 dt / 2),
    consuming one additional Brownian factor; factor loadings at step t are
    multiplied by V(t)**scaling_exponent.

    On the exponent: with sqrt scaling (0.5) the SQUARED loadings scale by
    the martingale V, so E[scale^2] = 1 at every horizon; with direct
    scaling (1.0), E[scale^2] = exp(nu^2 t) grows with simulation time,
    which fights the steeply decreasing ATM vol term structure of the
    reference's benchmark quote set. Empirically (benchmarks/
    stochvol_multistart.py, 81,920 paths): exponent 0.5 calibrates to
    RMS 0.46% vs 0.98% for exponent 1.0 against the quotes the reference
    fits at 0.198% (README.md:240-257) — so 0.5 reproduces the reference
    model family's behavior and is the default."""

    has_stoch_vol = True

    def __init__(self, base, nu: float = 0.15, rho: float = 0.20,
                 is_calibrateable: bool = True,
                 scaling_exponent: float = 0.5,
                 martingale_correction: bool = True):
        extra = [nu, rho] if is_calibrateable else []
        super().__init__(base, np.asarray(extra))
        self._fixed = None if is_calibrateable else (float(nu), float(rho))
        #: loadings are scaled by V(t)**scaling_exponent; 0.5 (default)
        #: reproduces the reference model family's fit — see the class
        #: docstring for the measured 0.46% vs 0.98% RMS comparison
        self.scaling_exponent = float(scaling_exponent)
        #: if False, lambda = exp(nu W) without the -nu^2 t/2 drift
        self.martingale_correction = martingale_correction

    def stoch_vol_params(self, prep):
        base_prep, extra = prep
        if self._fixed is not None:
            return self._fixed
        return (extra[0], extra[1])
