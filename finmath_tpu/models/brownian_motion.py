"""Brownian motion with on-device, counter-based normal increment generation.

TPU-first redesign of the reference's cuRAND-backed Brownian backends
(/root/reference/.../alternative/BrownianMotionCudaWithRandomVariableCuda.java:49-260):
the reference allocates one device buffer per (timeStep, factor) and fills it
with ``curandGenerateNormal(mean=0, stddev=sqrt(dt))`` (ref. :168-178,
XORWOW seeded at :159-162). Here the generator is JAX's counter-based
Threefry: the key is derived from the seed and folded per time step, so any
single increment — or the whole [steps, factors, paths] block inside a
jitted simulation — can be generated independently, deterministically and
in parallel, with no sequential state to carry. Identity is
(timeDiscretization, numberOfFactors, numberOfPaths, seed), matching the
reference's equals/hashCode contract (ref. :40-42, :221-245).

The statistical contract (increment mean 0, variance dt — tested by the
reference's BrownianMotionTest.java:116-121) is what we preserve; bitwise
RNG compatibility with XORWOW is intentionally not a goal (SURVEY.md §7.4).

The functional core ``normal_increments`` is what jitted models use directly
(raw [steps, factors, paths] arrays); the class API wraps it for eager use.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import FLOAT_DTYPE, RandomVariableTPU
from ..ops.random_variable_float import RandomVariableFloat
from .time_discretization import TimeDiscretization


@partial(jax.jit, static_argnums=(1, 2, 3))
def normal_increments(key: jax.Array, num_steps: int, num_factors: int,
                      num_paths: int, sqrt_dts: jax.Array) -> jax.Array:
    """Generate all Brownian increments: [steps, factors, paths] float32,
    increment (i, j) ~ N(0, dt_i).

    One fused kernel on device: Threefry bits -> normals -> scale by
    sqrt(dt). Nothing crosses the host boundary.
    """
    z = jax.random.normal(key, (num_steps, num_factors, num_paths), dtype=FLOAT_DTYPE)
    return z * sqrt_dts[:, None, None].astype(FLOAT_DTYPE)


def key_for_seed(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


class BrownianMotion:
    """Lazily generated, cached Brownian increments on device.

    Doubles as a RandomVariable factory via ``get_random_variable_for_constant``
    like the reference (BrownianMotionCudaWithRandomVariableCuda.java:200-202).
    """

    def __init__(self, time_discretization: TimeDiscretization,
                 num_factors: int, num_paths: int, seed: int,
                 factory=None):
        self._td = time_discretization
        self._num_factors = int(num_factors)
        self._num_paths = int(num_paths)
        self._seed = int(seed)
        self._factory = factory
        self._increments: Optional[jax.Array] = None  # [steps, factors, paths]

    # ------------------------------------------------------------------
    def _lazy_init(self):
        if self._increments is None:
            sqrt_dts = jnp.sqrt(jnp.asarray(self._td.get_step_sizes()))
            self._increments = normal_increments(
                key_for_seed(self._seed),
                self._td.get_number_of_time_steps(),
                self._num_factors,
                self._num_paths,
                sqrt_dts,
            )
        return self._increments

    @property
    def increments(self) -> jax.Array:
        """Raw [steps, factors, paths] device array for jitted consumers."""
        return self._lazy_init()

    def get_brownian_increment(self, time_index: int, factor: int = 0):
        inc = self._lazy_init()
        time = self._td.get_time(time_index + 1)
        if self._factory is not None:
            # route through the injected factory so e.g. the AAD factory
            # puts increments on the tape (consistent with the host leg)
            return self._factory.create_random_variable(time, inc[time_index, factor])
        return RandomVariableTPU.of(time, inc[time_index, factor])

    def get_increment(self, time_index: int) -> list:
        return [
            self.get_brownian_increment(time_index, f)
            for f in range(self._num_factors)
        ]

    def get_brownian_motion(self, time_index: int, factor: int = 0) -> RandomVariableTPU:
        """W(t_i) = sum of increments up to i (cumulative)."""
        inc = self._lazy_init()
        w = jnp.sum(inc[: time_index, factor], axis=0) if time_index > 0 else jnp.zeros(
            self._num_paths, dtype=FLOAT_DTYPE
        )
        return RandomVariableTPU.of(self._td.get_time(time_index), w)

    # ------------------------------------------------------------------
    def get_time_discretization(self) -> TimeDiscretization:
        return self._td

    def get_number_of_factors(self) -> int:
        return self._num_factors

    def get_number_of_paths(self) -> int:
        return self._num_paths

    def get_seed(self) -> int:
        return self._seed

    def get_random_variable_for_constant(self, value: float) -> RandomVariableTPU:
        if self._factory is not None:
            return self._factory.create_random_variable(0.0, value)
        return RandomVariableTPU(0.0, value)

    def get_clone_with_modified_seed(self, seed: int) -> "BrownianMotion":
        return BrownianMotion(self._td, self._num_factors, self._num_paths, seed,
                              self._factory)

    def get_clone_with_modified_time_discretization(
        self, td: TimeDiscretization
    ) -> "BrownianMotion":
        return BrownianMotion(td, self._num_factors, self._num_paths, self._seed,
                              self._factory)

    # ------------------------------------------------------------------
    def __eq__(self, other):
        return (
            isinstance(other, BrownianMotion)
            and self._td == other._td
            and self._num_factors == other._num_factors
            and self._num_paths == other._num_paths
            and self._seed == other._seed
        )

    def __hash__(self):
        return hash((self._td, self._num_factors, self._num_paths, self._seed))

    def __repr__(self):
        return (
            f"BrownianMotion(steps={self._td.get_number_of_time_steps()}, "
            f"factors={self._num_factors}, paths={self._num_paths}, seed={self._seed})"
        )

    # finmath-style aliases
    getBrownianIncrement = get_brownian_increment
    getTimeDiscretization = get_time_discretization
    getNumberOfFactors = get_number_of_factors
    getNumberOfPaths = get_number_of_paths
    getRandomVariableForConstant = get_random_variable_for_constant
    getCloneWithModifiedSeed = get_clone_with_modified_seed


def finmath_mersenne_increments(dts: np.ndarray, num_factors: int,
                                num_paths: int, seed: int,
                                dtype=np.float32) -> np.ndarray:
    """Bit-exact reconstruction of finmath-lib's
    ``BrownianMotionFromMersenneRandomNumbers`` increment realization:
    ``[steps, factors, paths]`` Brownian increments, increment
    ``(t, f, p) = AS241_icdf(u) * sqrt(dt_t)`` where the uniforms ``u``
    come from ONE sequential commons-math3 MersenneTwister stream consumed
    in finmath's loop order — path OUTER, then time, then factor
    (finmath-lib BrownianMotionFromMersenneRandomNumbers
    .doGenerateBrownianMotion(); the reference injects this Brownian with
    the device factory at LIBORMarketModelCalibrationTest.java:267 and
    LIBORMarketModelCalibrationATMTest.java:283, so CPU and GPU legs price
    the SAME realization). Because paths are independent subsequences of
    the stream, the first k paths of an n-path realization equal the
    k-path realization exactly.

    Generation is in float64 like finmath's; ``dtype=float32`` (default)
    reproduces what the device factory stores, ``float64`` the host leg.
    """
    from ..native.host_rng import HostRandomGenerator

    dts = np.asarray(dts, dtype=np.float64)
    steps = len(dts)
    gen = HostRandomGenerator(seed, "finmath_mersenne")
    # one sequential stream, path-major: normals[p, t, f]
    z = gen.normals_f64(num_paths * steps * num_factors).reshape(
        num_paths, steps, num_factors)
    z *= np.sqrt(dts)[None, :, None]
    return np.ascontiguousarray(z.transpose(1, 2, 0)).astype(dtype)


class BrownianMotionFinmathMersenne:
    """BrownianMotion over the bit-exact finmath MersenneTwister
    realization (see ``finmath_mersenne_increments``). Drop-in for the
    engine's ``increments=`` injection and for eager factory use —
    the TPU analog of the reference's primary configuration
    (host-Mersenne increments + device factory, ATM test :283)."""

    def __init__(self, time_discretization: TimeDiscretization,
                 num_factors: int, num_paths: int, seed: int,
                 factory=None, dtype=np.float32):
        self._td = time_discretization
        self._num_factors = int(num_factors)
        self._num_paths = int(num_paths)
        self._seed = int(seed)
        self._factory = factory
        self._dtype = dtype
        self._increments: Optional[np.ndarray] = None

    def _lazy_init(self) -> np.ndarray:
        if self._increments is None:
            steps = self._td.get_number_of_time_steps()
            dts = np.asarray([self._td.get_time_step(m) for m in range(steps)])
            self._increments = finmath_mersenne_increments(
                dts, self._num_factors, self._num_paths, self._seed,
                self._dtype)
        return self._increments

    @property
    def increments(self) -> np.ndarray:
        return self._lazy_init()

    def get_brownian_increment(self, time_index: int, factor: int = 0):
        inc = self._lazy_init()
        time = self._td.get_time(time_index + 1)
        if self._factory is not None:
            return self._factory.create_random_variable(time, inc[time_index, factor])
        # constructor, not .of: the host array must be uploaded, .of is
        # the trusted already-on-device wrap
        return RandomVariableTPU(time, inc[time_index, factor])

    def get_time_discretization(self) -> TimeDiscretization:
        return self._td

    def get_number_of_factors(self) -> int:
        return self._num_factors

    def get_number_of_paths(self) -> int:
        return self._num_paths

    def get_seed(self) -> int:
        return self._seed

    def get_random_variable_for_constant(self, value: float):
        if self._factory is not None:
            return self._factory.create_random_variable(0.0, value)
        return RandomVariableTPU(0.0, value)

    def get_clone_with_modified_seed(self, seed: int) -> "BrownianMotionFinmathMersenne":
        return BrownianMotionFinmathMersenne(
            self._td, self._num_factors, self._num_paths, seed,
            self._factory, self._dtype)

    getBrownianIncrement = get_brownian_increment
    getTimeDiscretization = get_time_discretization
    getNumberOfFactors = get_number_of_factors
    getNumberOfPaths = get_number_of_paths
    getRandomVariableForConstant = get_random_variable_for_constant
    getCloneWithModifiedSeed = get_clone_with_modified_seed


class BrownianMotionHostRandom:
    """All-host Brownian motion: sequential native RNG (MT19937 or the
    java.util.Random LCG) + inverse-CDF normals, wrapped in the CPU float
    oracle type. This is the CPU baseline leg of every reference benchmark
    (BrownianMotionJavaRandom.java:40 and finmath's
    BrownianMotionFromMersenneRandomNumbers; README.md:200-201, :212-213).
    """

    def __init__(self, time_discretization: TimeDiscretization,
                 num_factors: int, num_paths: int, seed: int,
                 algorithm: str = "mersenne", factory=None):
        """``factory``: optional RandomVariable factory the increments are
        wrapped through — the reference's primary GPU configuration is
        exactly host-Mersenne increments pushed through
        RandomVariableCudaFactory (BrownianMotionFromMersenneRandomNumbers
        + factory, ATM test :283); pass RandomVariableTPUFactory for the
        same host-RNG-to-device bridge here."""
        self._td = time_discretization
        self._num_factors = int(num_factors)
        self._num_paths = int(num_paths)
        self._seed = int(seed)
        self._algorithm = algorithm
        self._factory = factory
        self._increments: Optional[np.ndarray] = None

    def _lazy_init(self) -> np.ndarray:
        if self._increments is None:
            from ..native.host_rng import HostRandomGenerator

            gen = HostRandomGenerator(self._seed, self._algorithm)
            steps = self._td.get_number_of_time_steps()
            out = np.empty((steps, self._num_factors, self._num_paths),
                           dtype=np.float32)
            for m in range(steps):
                stddev = float(np.sqrt(self._td.get_time_step(m)))
                for f in range(self._num_factors):
                    out[m, f] = gen.normals(self._num_paths, stddev)
            self._increments = out
        return self._increments

    @property
    def increments(self) -> np.ndarray:
        return self._lazy_init()

    def get_brownian_increment(self, time_index: int, factor: int = 0):
        inc = self._lazy_init()
        time = self._td.get_time(time_index + 1)
        if self._factory is not None:
            return self._factory.create_random_variable(time, inc[time_index, factor])
        return RandomVariableFloat.of(time, inc[time_index, factor])

    def get_time_discretization(self) -> TimeDiscretization:
        return self._td

    def get_number_of_factors(self) -> int:
        return self._num_factors

    def get_number_of_paths(self) -> int:
        return self._num_paths

    def get_seed(self) -> int:
        return self._seed

    def get_random_variable_for_constant(self, value: float):
        if self._factory is not None:
            return self._factory.create_random_variable(0.0, value)
        return RandomVariableFloat(0.0, value)

    def get_clone_with_modified_seed(self, seed: int) -> "BrownianMotionHostRandom":
        return BrownianMotionHostRandom(
            self._td, self._num_factors, self._num_paths, seed,
            self._algorithm, self._factory,
        )

    getBrownianIncrement = get_brownian_increment
    getTimeDiscretization = get_time_discretization
    getNumberOfFactors = get_number_of_factors
    getNumberOfPaths = get_number_of_paths
    getRandomVariableForConstant = get_random_variable_for_constant
    getCloneWithModifiedSeed = get_clone_with_modified_seed


class BrownianMotionTPUWithHostRandomVariable:
    """Hybrid leg: normals generated on the TPU, results pulled to host and
    wrapped in the CPU float type — "RNG on GPU, simulation on CPU"
    (BrownianMotionCudaWithHostRandomVariable.java:54, README.md:221).
    Unlike the reference, the constructor seed is honored (the reference
    hardcodes 1234, :171 — a known bug we do not replicate)."""

    def __init__(self, time_discretization: TimeDiscretization,
                 num_factors: int, num_paths: int, seed: int):
        self._device = BrownianMotion(time_discretization, num_factors,
                                      num_paths, seed)
        self._host: Optional[np.ndarray] = None

    def _lazy_init(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self._device.increments)
        return self._host

    def get_brownian_increment(self, time_index: int, factor: int = 0) -> RandomVariableFloat:
        inc = self._lazy_init()
        td = self._device.get_time_discretization()
        return RandomVariableFloat.of(td.get_time(time_index + 1),
                                      inc[time_index, factor])

    def get_time_discretization(self) -> TimeDiscretization:
        return self._device.get_time_discretization()

    def get_number_of_factors(self) -> int:
        return self._device.get_number_of_factors()

    def get_number_of_paths(self) -> int:
        return self._device.get_number_of_paths()

    def get_seed(self) -> int:
        return self._device.get_seed()

    def get_random_variable_for_constant(self, value: float) -> RandomVariableFloat:
        return RandomVariableFloat(0.0, value)

    getBrownianIncrement = get_brownian_increment
    getTimeDiscretization = get_time_discretization
    getNumberOfFactors = get_number_of_factors
    getNumberOfPaths = get_number_of_paths


class BrownianMotionView:
    """A view selecting a subset of another BrownianMotion's factors.

    Equivalent of finmath-lib's BrownianMotionView used by the benchmark
    test to split factors between the LIBOR covariance and the stochastic
    volatility driver (ref. LIBORMarketModelCalibrationTest.java:268-269).
    """

    def __init__(self, brownian: BrownianMotion, factor_indices: Sequence[int]):
        self._parent = brownian
        self._factors = tuple(int(i) for i in factor_indices)

    @property
    def increments(self) -> jax.Array:
        return self._parent.increments[:, jnp.asarray(self._factors), :]

    def get_brownian_increment(self, time_index: int, factor: int = 0):
        return self._parent.get_brownian_increment(time_index, self._factors[factor])

    def get_time_discretization(self) -> TimeDiscretization:
        return self._parent.get_time_discretization()

    def get_number_of_factors(self) -> int:
        return len(self._factors)

    def get_number_of_paths(self) -> int:
        return self._parent.get_number_of_paths()

    def get_seed(self) -> int:
        return self._parent.get_seed()

    def get_random_variable_for_constant(self, value: float):
        return self._parent.get_random_variable_for_constant(value)

    def get_clone_with_modified_seed(self, seed: int) -> "BrownianMotionView":
        return BrownianMotionView(
            self._parent.get_clone_with_modified_seed(seed), self._factors
        )

    getBrownianIncrement = get_brownian_increment
    getTimeDiscretization = get_time_discretization
    getNumberOfFactors = get_number_of_factors
    getNumberOfPaths = get_number_of_paths
