"""Memory-pressure ramp, host-RNG legs, logging, memory introspection.

Maps the reference's BrownianMotionMemoryTest (/root/reference/.../
BrownianMotionMemoryTest.java:54-74 — ramp the path count, print free
memory, assert statistics stay sound: the pool must recycle) and the
auxiliary subsystems of SURVEY.md §5. Under XLA the "pool" is the runtime's
reference-counted allocator; the ramp asserts we can allocate/release
a growing sequence of ensembles without exhausting memory.
"""

import logging
import math

import numpy as np
import pytest

from finmath_tpu.models import (
    BrownianMotion,
    BrownianMotionHostRandom,
    BrownianMotionTPUWithHostRandomVariable,
    TimeDiscretization,
)
from finmath_tpu.native.host_rng import HostRandomGenerator, native_available
from finmath_tpu.utils.logging_config import configure_logging
from finmath_tpu.utils.memory import get_device_memory_info, live_device_arrays


class TestMemoryRamp:
    def test_path_ramp(self):
        """Ramp 20k -> 200k paths over 10 iterations (scaled-down
        BrownianMotionMemoryTest ramp, 100k -> 1.1M over 101)."""
        td = TimeDiscretization(initial=0.0, num_steps=10, step=0.1)
        for i in range(10):
            n_paths = 20_000 * (i + 1)
            bm = BrownianMotion(td, 1, n_paths, seed=3141 + i)
            inc = bm.get_brownian_increment(0, 0)
            dt = td.get_time_step(0)
            assert abs(inc.get_average()) < 4.0 * math.sqrt(dt / n_paths)
            assert abs(inc.get_variance() - dt) < 4.0 * math.sqrt(2 * dt * dt / n_paths) + 1e-5
            del bm, inc  # release: XLA refcounting frees the ensemble

    def test_memory_info_shape(self):
        info = get_device_memory_info()
        # CPU virtual devices report no stats; fields are Optional
        assert hasattr(info, "free_fraction")
        assert live_device_arrays() >= 0


class TestHostRandomGenerators:
    @pytest.mark.parametrize("algorithm", ["mersenne", "java"])
    def test_statistics(self, algorithm):
        gen = HostRandomGenerator(1234, algorithm)
        z = gen.normals(200_000, stddev=2.0)
        assert abs(float(np.mean(z))) < 4 * 2.0 / math.sqrt(200_000)
        assert float(np.var(z)) == pytest.approx(4.0, rel=0.05)
        u = gen.uniforms(100_000)
        assert 0.0 <= u.min() and u.max() <= 1.0
        assert float(np.mean(u)) == pytest.approx(0.5, abs=0.01)

    def test_determinism(self):
        a = HostRandomGenerator(7, "mersenne").normals(1000)
        b = HostRandomGenerator(7, "mersenne").normals(1000)
        np.testing.assert_array_equal(a, b)

    def test_java_lcg_bit_exact(self):
        """The 'java' algorithm reproduces java.util.Random exactly — the
        RNG behind the reference's BrownianMotionJavaRandom
        (BrownianMotionJavaRandom.java:132-180). Expected values are
        java.util.Random(42).nextDouble() outputs."""
        u = HostRandomGenerator(42, "java").uniforms(3)
        np.testing.assert_allclose(
            u, [0.7275636800328681, 0.6832234717598454, 0.30871945533265976],
            rtol=1e-7,  # f32 storage of the f64 draw
        )

    def test_native_compiles_when_toolchain_present(self):
        # this image ships g++; the native path must actually build
        assert native_available()

    def test_mersenne_is_canonical_mt19937(self):
        """'mersenne' is the canonical 32-bit MT19937: the C++11 standard
        pins the 10000th output of a seed-5489 engine to 4123659995, and
        the NumPy fallback implements the identical generator — its
        uniform stream is BIT-IDENTICAL to the native one (so a machine
        without a toolchain gets the same numbers, not a different
        generator under the same name)."""
        from finmath_tpu.native.host_rng import _MT19937Res53

        w = _MT19937Res53(5489)._words(10000)
        assert int(w[9999]) == 4123659995

        if native_available():
            native = HostRandomGenerator(12345, "mersenne").uniforms(50_000)
            fallback = _MT19937Res53(12345).random(50_000).astype(np.float32)
            np.testing.assert_array_equal(native, fallback)

    def test_inverse_cdf_accuracy(self):
        from finmath_tpu.native.host_rng import inverse_normal_cdf

        from scipy.stats import norm  # scipy ships with jax

        for p in (0.001, 0.1, 0.5, 0.9, 0.999):
            assert inverse_normal_cdf(p) == pytest.approx(norm.ppf(p), abs=1e-9)


class TestBrownianLegs:
    def test_host_leg_statistics(self):
        td = TimeDiscretization(initial=0.0, num_steps=4, step=0.25)
        bm = BrownianMotionHostRandom(td, 1, 50_000, seed=31415)
        inc = bm.get_brownian_increment(0, 0)
        assert inc.get_variance() == pytest.approx(0.25, rel=0.05)
        from finmath_tpu.ops.random_variable_float import RandomVariableFloat

        assert isinstance(inc, RandomVariableFloat)

    def test_hybrid_leg_matches_device_values(self):
        td = TimeDiscretization(initial=0.0, num_steps=4, step=0.25)
        hybrid = BrownianMotionTPUWithHostRandomVariable(td, 2, 5000, seed=7)
        device = BrownianMotion(td, 2, 5000, seed=7)
        np.testing.assert_array_equal(
            np.asarray(hybrid.get_brownian_increment(1, 1).get_realizations()),
            np.asarray(device.get_brownian_increment(1, 1).get_realizations()),
        )
        # seed is honored (the reference hardcodes 1234 here — a bug)
        assert hybrid.get_seed() == 7


class TestLogging:
    def test_configure_console(self, capsys):
        logger = configure_logging(console_level=logging.DEBUG)
        try:
            assert logger.propagate is False  # no double emission via root
            logger.debug("pool trace message")
            captured = capsys.readouterr()
            assert "pool trace message" in captured.err
        finally:
            # restore the shared logger so later tests' caplog (which
            # captures via root propagation) still sees records
            logger.handlers.clear()
            logger.propagate = True
