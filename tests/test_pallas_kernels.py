"""Pallas kernel tests.

The fused BS path kernel targets real TPU hardware (Mosaic + hardware
PRNG). On the CPU test backend the pltpu interpreter executes the kernel
but its PRNG emulation does not honor per-program seeding, so statistical
assertions are meaningless there — we check only that the kernel traces,
runs and produces finite output of the right shape. The statistical /
pricing validation runs on the TPU (bench.py reports the kernel's price
next to the analytic value; a hardware-gated test covers it when a TPU is
visible).
"""

import numpy as np
import pytest

import jax


def _on_tpu() -> bool:
    return jax.devices()[0].platform not in ("cpu",)


def _interpret_kernel(seed, num_paths, num_steps, *args):
    """Run bs_paths_kernel under the TPU interpreter (CPU-safe)."""
    from jax.experimental.pallas import tpu as pltpu

    import finmath_tpu.ops.kernels as K

    K.bs_paths_kernel.clear_cache()
    try:
        with pltpu.force_tpu_interpret_mode():
            return K.mc_european_call_price_pallas(
                seed, num_paths, num_steps, *args
            )
    finally:
        K.bs_paths_kernel.clear_cache()


class TestBSPathsKernelInterpret:
    def test_kernel_traces_and_runs(self):
        price = _interpret_kernel(7, 16_384, 4, 1.0, 0.05, 0.30, 1.0, 1.05)
        assert np.isfinite(price)
        assert price >= 0.0

    def test_deterministic(self):
        p1 = _interpret_kernel(3, 8_192, 4, 1.0, 0.05, 0.30, 1.0, 1.05)
        p2 = _interpret_kernel(3, 8_192, 4, 1.0, 0.05, 0.30, 1.0, 1.05)
        assert p1 == p2


class TestAsianKernelInterpret:
    def test_kernel_traces_and_runs(self):
        from jax.experimental.pallas import tpu as pltpu

        import finmath_tpu.ops.kernels as K

        K.asian_paths_kernel.clear_cache()
        try:
            with pltpu.force_tpu_interpret_mode():
                price = K.mc_asian_call_price_pallas(
                    7, 16_384, 4, 1.0, 0.05, 0.30, 1.0, 1.0
                )
        finally:
            K.asian_paths_kernel.clear_cache()
        assert np.isfinite(price) and price >= 0.0


@pytest.mark.skipif(not _on_tpu(), reason="needs real TPU hardware PRNG")
class TestBSPathsKernelHardware:
    def test_price_close_to_analytic(self):
        from finmath_tpu.models.analytic import black_scholes_option_value
        from finmath_tpu.ops.kernels import mc_european_call_price_pallas

        price = mc_european_call_price_pallas(7, 1_000_000, 100,
                                              1.0, 0.05, 0.30, 1.0, 1.05)
        analytic = black_scholes_option_value(1.0, 0.05, 0.30, 1.0, 1.05)
        assert price == pytest.approx(analytic, abs=2e-3)

    def test_seed_changes_result(self):
        from finmath_tpu.ops.kernels import mc_european_call_price_pallas

        p1 = mc_european_call_price_pallas(3, 100_000, 10, 1.0, 0.05, 0.30, 1.0, 1.05)
        p2 = mc_european_call_price_pallas(4, 100_000, 10, 1.0, 0.05, 0.30, 1.0, 1.05)
        assert p1 != p2
