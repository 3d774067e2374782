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

import os

import jax

# Importing this package configures global JAX process state (deliberately,
# like the reference's static device init, RandomVariableCuda.java:119-264):
#   * jax_enable_x64=True — REQUIRED: the f32-storage/f64-accumulation
#     precision contract needs 64-bit accumulators. This changes dtype
#     semantics for all JAX code in the host program.
#   * persistent compilation cache dir + default device selection.
# Embedding applications that must not have their JAX config touched can
# set FINMATH_TPU_SKIP_GLOBAL_CONFIG=1 before import and are then
# responsible for enabling x64 themselves (reductions silently lose the
# f64 contract otherwise).
if os.environ.get("FINMATH_TPU_SKIP_GLOBAL_CONFIG", "").lower() not in (
        "1", "true", "yes"):
    jax.config.update("jax_enable_x64", True)
    # the MXU analog of the reference's `nvcc -fmad false`: TPU f32
    # matmuls default to reduced-precision bf16 passes (~1e-4 relative),
    # which breaks the 1e-6 f32<->f64 price-parity contract through the
    # annuity matmuls and diffusion einsums; "highest" keeps them f32-exact
    jax.config.update("jax_default_matmul_precision", "highest")

    from .utils.config import enable_compilation_cache, select_device

    # TPU compiles of the calibration programs take minutes cold; the
    # persistent cache makes every later process start hot. Disable with
    # FINMATH_TPU_CACHE_DIR=''.
    enable_compilation_cache()
    select_device()

__version__ = "0.3.0"

from .ops.lazy import (RandomVariableTPULazy, RandomVariableTPULazyFactory,
                       averages, flush)
from .ops.random_variable import RandomVariable, RandomVariableTPU, RandomVariableTPUFactory
from .ops.random_variable_float import RandomVariableFloat, RandomVariableFloatFactory

__all__ = [
    "RandomVariable",
    "RandomVariableTPU",
    "RandomVariableTPUFactory",
    "RandomVariableTPULazy",
    "RandomVariableTPULazyFactory",
    "RandomVariableFloat",
    "RandomVariableFloatFactory",
    "averages",
    "flush",
]
