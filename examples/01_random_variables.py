"""Eager RandomVariable vector API — the reference's core surface.

Run: python examples/01_random_variables.py    (from the repo root,
or anywhere after `pip install -e .`)

Mirrors the finmath workflow: immutable float32 path vectors with a
filtration time, arithmetic dispatched to the device, f64-accumulated
reductions, and a bit-compatible CPU float oracle for parity checks
(ref. RandomVariableCuda / RandomVariableFromFloatArray).
"""

import os
import sys

# allow running straight from a source checkout (inserts the repo root;
# harmless when the package is pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from finmath_tpu.ops.random_variable import RandomVariableTPU
from finmath_tpu.ops.random_variable_float import RandomVariableFloat


def main():
    paths = np.random.default_rng(0).uniform(0.5, 2.0, 100_000)
    x = RandomVariableTPU(0.0, paths.astype(np.float32))

    # chained eager ops (each dispatches fused device arithmetic)
    y = x.mult(1.01).add(0.02).exp().log().discount(x, 0.5)
    y = y.add_product(x, x).cap(3.0).floor(0.1).sqrt()

    print(f"average            {y.get_average():.8f}  (f64-accumulated)")
    print(f"standard error     {y.get_standard_error():.2e}")
    print(f"5%/95% quantiles   {y.get_quantile(0.05):.5f} / {y.get_quantile(0.95):.5f}")

    # CPU float oracle: the IDENTICAL chain, lane-parallel Kahan
    # reductions — the parity contract of the reference
    # (RandomVariableCuda.java:67-68); tests/ sweep every op at 1e-7
    x_cpu = RandomVariableFloat(0.0, paths.astype(np.float32))
    y_cpu = x_cpu.mult(1.01).add(0.02).exp().log().discount(x_cpu, 0.5)
    y_cpu = y_cpu.add_product(x_cpu, x_cpu).cap(3.0).floor(0.1).sqrt()
    print(f"oracle average     {y_cpu.get_average():.8f}")
    assert abs(y_cpu.get_average() - y.get_average()) < 1e-5

    # deterministic fast path: scalars never touch the device
    d = RandomVariableTPU(0.0, 5.0)
    assert d.is_deterministic() and d.mult(2.0).double_value() == 10.0

    # type-priority promotion: CPU (1) op TPU (20) -> TPU result
    mixed = y_cpu.sub(x)
    assert isinstance(mixed, RandomVariableTPU)
    print("mixed-priority op promotes to the device type: OK")

    # camelCase aliases work (finmath naming)
    assert y.getAverage() == y.get_average()


if __name__ == "__main__":
    main()
