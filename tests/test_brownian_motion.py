"""Statistical tests for the on-device Brownian motion.

Models the reference's BrownianMotionTest (/root/reference/src/test/java/net/
finmath/cuda/montecarlo/BrownianMotionTest.java:116-121): increment mean
within 3 sigma/sqrt(N) of 0 and variance within tolerance of dt. We use far
fewer repetitions than the reference's 100 x 1M-path perf loop — the perf
side lives in bench.py.
"""

import math

import numpy as np
import pytest

from finmath_tpu.models import BrownianMotion, BrownianMotionView, TimeDiscretization


@pytest.fixture(scope="module")
def td():
    return TimeDiscretization(initial=0.0, num_steps=10, step=0.1)


class TestBrownianMotionStatistics:
    def test_increment_moments(self, td):
        n_paths = 100_000
        bm = BrownianMotion(td, num_factors=2, num_paths=n_paths, seed=1234)
        for step in range(td.get_number_of_time_steps()):
            dt = td.get_time_step(step)
            for factor in range(2):
                inc = bm.get_brownian_increment(step, factor)
                mean = inc.get_average()
                var = inc.get_variance()
                # 3-sigma bounds (ref. BrownianMotionTest.java:116-121)
                assert abs(mean) < 3.0 * math.sqrt(dt / n_paths)
                assert abs(var - dt) < 3.0 * math.sqrt(2.0 * dt * dt / n_paths) + 1e-6

    def test_factors_independent(self, td):
        n_paths = 200_000
        bm = BrownianMotion(td, num_factors=2, num_paths=n_paths, seed=42)
        a = np.asarray(bm.get_brownian_increment(0, 0).get_realizations(), dtype=np.float64)
        b = np.asarray(bm.get_brownian_increment(0, 1).get_realizations(), dtype=np.float64)
        corr = np.corrcoef(a, b)[0, 1]
        assert abs(corr) < 3.0 / math.sqrt(n_paths) + 1e-3

    def test_seed_determinism_and_identity(self, td):
        bm1 = BrownianMotion(td, 1, 1000, seed=7)
        bm2 = BrownianMotion(td, 1, 1000, seed=7)
        bm3 = bm1.get_clone_with_modified_seed(8)
        assert bm1 == bm2
        assert bm1 != bm3
        np.testing.assert_array_equal(
            np.asarray(bm1.get_brownian_increment(3, 0).get_realizations()),
            np.asarray(bm2.get_brownian_increment(3, 0).get_realizations()),
        )
        assert not np.array_equal(
            np.asarray(bm1.get_brownian_increment(3, 0).get_realizations()),
            np.asarray(bm3.get_brownian_increment(3, 0).get_realizations()),
        )

    def test_filtration_time_of_increment(self, td):
        bm = BrownianMotion(td, 1, 100, seed=1)
        inc = bm.get_brownian_increment(0, 0)
        assert inc.get_filtration_time() == pytest.approx(td.get_time(1))

    def test_brownian_motion_path_variance(self, td):
        n_paths = 100_000
        bm = BrownianMotion(td, 1, n_paths, seed=99)
        w_end = bm.get_brownian_motion(td.get_number_of_time_steps())
        t_end = td.get_last_time()
        assert abs(w_end.get_average()) < 3.0 * math.sqrt(t_end / n_paths)
        assert w_end.get_variance() == pytest.approx(t_end, rel=0.02)

    def test_view_selects_factors(self, td):
        bm = BrownianMotion(td, 3, 1000, seed=5)
        view = BrownianMotionView(bm, [2])
        assert view.get_number_of_factors() == 1
        np.testing.assert_array_equal(
            np.asarray(view.get_brownian_increment(0, 0).get_realizations()),
            np.asarray(bm.get_brownian_increment(0, 2).get_realizations()),
        )
