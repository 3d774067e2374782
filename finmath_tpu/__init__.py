"""finmath_tpu — a TPU-native Monte-Carlo vector framework.

A brand-new implementation of the capabilities of finmath-lib-cuda-extensions
(reference: https://github.com/finmath/finmath-lib-cuda-extensions) designed
for TPU hardware with JAX / XLA / Pallas / pjit:

* ``ops``      — the vector engine: an immutable ``RandomVariable`` type (f32
  path realizations + filtration time + type priority) whose arithmetic,
  financial and statistical operations execute on TPU, plus a bit-compatible
  CPU (NumPy) float oracle used for parity testing, and Pallas kernels for
  the reductions / fused chains XLA does not already fuse.
* ``models``   — the minimal TPU-idiomatic model stack the reference's
  benchmark workloads need: time discretization, Brownian motion (on-device
  counter-based RNG), Euler scheme, Black-Scholes, LIBOR Market Model with
  covariance models, swaption products, curves + bootstrap, and a
  Levenberg-Marquardt calibrator with batched residual evaluation.
* ``parallel`` — path-axis sharding over a ``jax.sharding.Mesh`` (data
  parallel over Monte-Carlo paths, with ``psum`` reductions over ICI).
* ``utils``    — config, logging, serialization helpers.

Precision policy (mirrors the reference's contract): storage is float32,
reductions accumulate in float64 (the reference uses Kahan-compensated double
accumulation, see /root/reference .../RandomVariableCudaKernel.cu:287-349).
We therefore enable JAX x64 support globally and are explicit about float32
everywhere path data lives.
"""

import jax

# f32 storage / f64 accumulation policy — see module docstring.
jax.config.update("jax_enable_x64", True)

from .utils.config import enable_compilation_cache, select_device

# TPU compiles of the calibration programs take minutes cold; the
# persistent cache makes every later process start hot. Disable with
# FINMATH_TPU_CACHE_DIR=''.
enable_compilation_cache()
select_device()

__version__ = "0.1.0"

from .ops.random_variable import RandomVariable, RandomVariableTPU, RandomVariableTPUFactory
from .ops.random_variable_float import RandomVariableFloat, RandomVariableFloatFactory

__all__ = [
    "RandomVariable",
    "RandomVariableTPU",
    "RandomVariableTPUFactory",
    "RandomVariableFloat",
    "RandomVariableFloatFactory",
]
