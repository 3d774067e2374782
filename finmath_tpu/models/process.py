"""Monte-Carlo process discretization: the Euler scheme as one fused scan.

TPU-first equivalent of finmath-lib's ``EulerSchemeFromProcessModel`` (used
by the reference's tests, e.g. MonteCarloBlackScholesModelTest.java:132).
The reference executes the Euler loop op-by-op — each time step issues a
handful of tiny CUDA kernels through the RandomVariable API (SURVEY.md
§3.4). Here the whole path evolution is a single ``jax.lax.scan`` inside
``jit``: XLA fuses each step's elementwise chain into one loop body over
the [paths] axis, and the increments come from the counter-based generator
without ever leaving the device.

A ProcessModel supplies, in state space (e.g. log-coordinates):

* ``initial_state()``                       -> [components, paths]
* ``drift(time_index, state)``              -> [components, paths]
* ``factor_loadings(time_index, state)``    -> [components, factors, paths]
* ``apply_state_space_transform(c, x)``     -> values (e.g. exp)
* ``numeraire(time)``                       -> RandomVariable

Components/factors/paths are static; time_index is traced inside the scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.random_variable import FLOAT_DTYPE, RandomVariableTPU
from .brownian_motion import BrownianMotion
from .time_discretization import TimeDiscretization


class ProcessModel:
    """Abstract base for models evolved by the Euler scheme."""

    def get_number_of_components(self) -> int:
        raise NotImplementedError

    def get_number_of_factors(self) -> int:
        raise NotImplementedError

    def initial_state(self, num_paths: int) -> jax.Array:
        raise NotImplementedError

    def drift(self, time_index, state: jax.Array) -> jax.Array:
        raise NotImplementedError

    def factor_loadings(self, time_index, state: jax.Array) -> jax.Array:
        raise NotImplementedError

    def apply_state_space_transform(self, component: int, x: jax.Array) -> jax.Array:
        return x

    def numeraire(self, time: float) -> RandomVariableTPU:
        raise NotImplementedError


def euler_scan(model: ProcessModel, initial_state: jax.Array,
               increments: jax.Array, dts: jax.Array) -> jax.Array:
    """Evolve state X_{i+1} = X_i + mu(i, X_i) dt_i + sum_f lambda_f(i, X_i) dW_{i,f}.

    Returns the full state history [steps+1, components, paths].
    """

    def step(state, inputs):
        i, dw, dt = inputs
        mu = model.drift(i, state)
        lam = model.factor_loadings(i, state)  # [C, F, P]
        # HIGHEST explicitly (not only via the import-time global default)
        # so embedders that opt out of global config keep the f32 parity
        # contract on the MXU contraction
        diffusion = jnp.einsum("cfp,fp->cp", lam, dw,
                               precision=jax.lax.Precision.HIGHEST)
        new_state = state + mu * dt.astype(FLOAT_DTYPE) + diffusion
        return new_state, new_state

    steps = increments.shape[0]
    idx = jnp.arange(steps)
    _, states = jax.lax.scan(step, initial_state, (idx, increments, dts))
    return jnp.concatenate([initial_state[None], states], axis=0)


_euler_scan_jit = jax.jit(euler_scan, static_argnums=0)


class EulerScheme:
    """Euler discretization of a ProcessModel driven by a BrownianMotion.

    The full path history is computed once (lazily) under jit and cached on
    device, mirroring finmath's process cache. Use the functional
    ``euler_scan`` directly for custom memory/recompute trade-offs.
    """

    def __init__(self, model: ProcessModel, brownian: BrownianMotion,
                 mesh=None):
        self._model = model
        self._brownian = brownian
        self._mesh = mesh
        self._states: Optional[jax.Array] = None

    @property
    def time_discretization(self) -> TimeDiscretization:
        return self._brownian.get_time_discretization()

    def _lazy_states(self) -> jax.Array:
        if self._states is None:
            td = self.time_discretization
            num_paths = self._brownian.get_number_of_paths()
            init = self._model.initial_state(num_paths)
            dts = jnp.asarray(td.get_step_sizes())
            inc = self._brownian.increments
            if self._mesh is not None:
                # shard the PATH axis over the mesh: XLA's SPMD
                # propagation then partitions the scan AND every
                # downstream jitted product kernel (payoff reductions
                # become automatic all-reduces over ICI) — no explicit
                # shard_map needed for the embarrassingly-parallel
                # equity workloads (the LMM engine's drift coupling is
                # the case that does use shard_map, parallel/mesh.py)
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                ax = self._mesh.axis_names[0]
                if num_paths % self._mesh.devices.size:
                    raise ValueError(
                        f"num_paths {num_paths} must be divisible by "
                        f"the mesh size {self._mesh.devices.size}")
                inc = jax.device_put(
                    inc, NamedSharding(self._mesh, P(None, None, ax)))
                init = jax.device_put(
                    init, NamedSharding(self._mesh, P(None, ax)))
            self._states = _euler_scan_jit(
                self._model, init, inc, dts
            )
        return self._states

    def get_process_value(self, time_index: int, component: int = 0) -> RandomVariableTPU:
        states = self._lazy_states()
        vals = self._model.apply_state_space_transform(
            component, states[time_index, component]
        )
        return RandomVariableTPU.of(
            self.time_discretization.get_time(time_index), vals
        )

    def get_numeraire(self, time: float) -> RandomVariableTPU:
        return self._model.numeraire(time)

    def get_number_of_paths(self) -> int:
        return self._brownian.get_number_of_paths()

    def get_brownian_motion(self) -> BrownianMotion:
        return self._brownian

    # finmath-style aliases
    getProcessValue = get_process_value
    getNumeraire = get_numeraire
    getNumberOfPaths = get_number_of_paths
    getTimeDiscretization = property(lambda self: self.time_discretization)
