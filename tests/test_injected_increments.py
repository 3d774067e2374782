"""Tests for the finmath-Mersenne stream reconstruction and the engine's
injected-increments mode (VERDICT round-2 item 1).

The reference drives its device backend with host Mersenne increments
through the factory (LIBORMarketModelCalibrationATMTest.java:283,
MonteCarloBlackScholesModelTest.java:78-91) so CPU and GPU legs price the
SAME realization; these tests pin down our bit-exact reconstruction of
that stream (commons-math3 MT19937 + 26|26-bit doubles + AS241 ICDF +
path-outer consumption order) and the engine plumbing that consumes it.
"""

import numpy as np
import pytest

import finmath_tpu.native.host_rng as hr
from finmath_tpu.models.brownian_motion import (
    BrownianMotionFinmathMersenne, finmath_mersenne_increments)
from finmath_tpu.models.lmm.benchmark_calibration import (
    build_benchmark_calibration)
from finmath_tpu.models.time_discretization import TimeDiscretization


class TestCM3MersenneStream:
    def test_init_by_array_is_canonical(self):
        """numpy RandomState seeded with a key array runs the canonical
        init_by_array — checked against the published mt19937ar.out test
        vector (key {0x123, 0x234, 0x345, 0x456})."""
        key = np.array([0x123, 0x234, 0x345, 0x456], dtype=np.uint32)
        w = np.random.RandomState(key).randint(0, 2 ** 32, 3, dtype=np.uint32)
        assert list(w) == [1067595299, 955945823, 477289528]

    def test_native_and_numpy_bit_identical(self):
        """The C++ commons-math3 generator and the numpy fallback must
        produce BIT-identical uniforms and normals (when native exists)."""
        if not hr.native_available():
            pytest.skip("no native toolchain")
        for seed in (314151, 31415, (123 << 32) | 456, 0):
            cm3 = hr._CM3MersenneTwister(seed)
            u = cm3.random(50_000)
            g = hr.HostRandomGenerator(seed, "finmath_mersenne")
            assert np.array_equal(g.uniforms_f64(50_000), u)
            z = hr.HostRandomGenerator(seed, "finmath_mersenne").normals_f64(50_000)
            z_np = hr.inverse_normal_cdf_as241(np.maximum(u, 2.0 ** -54))
            assert np.array_equal(z, z_np)

    def test_nextdouble_construction(self):
        """commons-math3 nextDouble = (next(26) << 26 | next(26)) * 2^-52,
        consuming two fresh words' top 26 bits."""
        cm3 = hr._CM3MersenneTwister(42)
        w = cm3._rs.randint(0, 2 ** 32, 4, dtype=np.uint32)
        cm3b = hr._CM3MersenneTwister(42)
        u = cm3b.random(2)
        for k in range(2):
            hi = int(w[2 * k]) >> 6
            lo = int(w[2 * k + 1]) >> 6
            assert u[k] == ((hi << 26) | lo) * 2.0 ** -52

    def test_as241_matches_native_scalar(self):
        """Vectorized AS241 must agree bit-for-bit with the native scalar
        implementation (the -ffp-contract=off build)."""
        if not hr.native_available():
            pytest.skip("no native toolchain")
        rng = np.random.default_rng(7)
        p = np.concatenate([
            rng.uniform(1e-12, 1.0 - 1e-12, 2000),
            rng.uniform(0.074, 0.076, 200),     # central/tail boundary
            rng.uniform(1e-300, 1e-12, 200),    # deep tail (r > 5 branch)
        ])
        vec = hr.inverse_normal_cdf_as241(p)
        for i in range(0, len(p), 37):
            assert vec[i] == hr.inverse_normal_cdf(p[i])

    def test_as241_statistics(self):
        cm3 = hr._CM3MersenneTwister(314151)
        z = hr.inverse_normal_cdf_as241(np.maximum(cm3.random(400_000),
                                                   2.0 ** -54))
        assert abs(z.mean()) < 5e-3
        assert abs(z.var() - 1.0) < 5e-3
        assert abs((z ** 4).mean() - 3.0) < 5e-2


class TestFinmathIncrements:
    def test_path_prefix_property(self):
        """finmath generates path-outer, so the first k paths of an n-path
        realization equal the k-path realization exactly."""
        dts = np.full(5, 0.25)
        a = finmath_mersenne_increments(dts, 3, 32, 314151)
        b = finmath_mersenne_increments(dts, 3, 128, 314151)
        assert np.array_equal(a, b[:, :, :32])

    def test_consumption_order(self):
        """Draw k for path p is (p, t, f) with t*factors + f = k mod
        (steps*factors): the first draws fill path 0's (t0,f0), (t0,f1)..."""
        dts = np.asarray([0.5, 0.25])
        inc = finmath_mersenne_increments(dts, 2, 4, 99, dtype=np.float64)
        u = hr._CM3MersenneTwister(99).random(4 * 2 * 2)
        z = hr.inverse_normal_cdf_as241(np.maximum(u, 2.0 ** -54))
        # path 0: (t0,f0), (t0,f1), (t1,f0), (t1,f1); then path 1...
        expect = z.reshape(4, 2, 2) * np.sqrt(dts)[None, :, None]
        assert np.array_equal(inc, expect.transpose(1, 2, 0))

    def test_brownian_class(self):
        td = TimeDiscretization(initial=0.0, num_steps=4, step=0.5)
        bm = BrownianMotionFinmathMersenne(td, 2, 64, 314151)
        inc = bm.increments
        assert inc.shape == (4, 2, 64)
        rv = bm.get_brownian_increment(1, 0)
        assert rv.get_filtration_time() == 1.0
        assert np.array_equal(np.asarray(rv.get_realizations()), inc[1, 0])


class TestEngineInjection:
    @pytest.fixture(scope="class")
    def setups(self):
        inj = build_benchmark_calibration(num_paths=512,
                                          brownian="finmath_mersenne")
        own = build_benchmark_calibration(num_paths=512)
        return inj, own

    def test_injected_stream_changes_values(self, setups):
        inj, own = setups
        x0 = inj.covariance.initial_parameters
        vi, vo = inj.engine.values(x0), own.engine.values(x0)
        assert np.all(np.isfinite(vi)) and np.all(np.isfinite(vo))
        assert not np.allclose(vi, vo, rtol=1e-8)
        # same model, same quotes: Monte-Carlo agreement at MC noise level
        # (512 paths — deep-OTM smile quotes are noisy, hence the loose band)
        assert np.allclose(vi, vo, rtol=1.5, atol=2e-4)

    def test_f64_oracle_same_stream(self, setups):
        """The f64 engine consumes the identical injected stream, so
        f32 vs f64 deviation is pure arithmetic error, no MC noise."""
        inj, _ = setups
        x0 = inj.covariance.initial_parameters
        s64 = build_benchmark_calibration(num_paths=512, dtype=np.float64,
                                          brownian="finmath_mersenne")
        v32 = inj.engine.values(x0)
        v64 = s64.engine.values(x0)
        assert np.max(np.abs(v32 - v64) / np.abs(v64)) < 5e-5

    def test_jacobian_and_residuals_finite(self, setups):
        inj, _ = setups
        x0 = inj.covariance.initial_parameters
        assert np.all(np.isfinite(inj.engine.residuals(x0)))
        assert np.all(np.isfinite(inj.engine.jacobian(x0)))

    def test_batched_matches_single(self, setups):
        inj, _ = setups
        x0 = np.asarray(inj.covariance.initial_parameters)
        rb = inj.engine.residuals_batched(np.stack([x0, 1.05 * x0]))
        assert np.allclose(rb[0], inj.engine.residuals(x0), atol=1e-12)

    def test_antithetic_conflict_raises(self):
        with pytest.raises(ValueError, match="antithetic"):
            build_benchmark_calibration(num_paths=512, antithetic=True,
                                        brownian="finmath_mersenne")

    def test_bad_shape_raises(self):
        from finmath_tpu.models.lmm.model import LMMValuationEngine

        s = build_benchmark_calibration(num_paths=512)
        with pytest.raises(ValueError, match="injected increments"):
            LMMValuationEngine(s.model, s.products, 512, 5,
                               increments=np.zeros((40, 5, 512), np.float32))

    def test_mesh_composition(self, setups):
        import jax
        from jax.sharding import Mesh

        inj, _ = setups
        x0 = inj.covariance.initial_parameters
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("paths",))
        sm = build_benchmark_calibration(num_paths=512, mesh=mesh,
                                         brownian="finmath_mersenne")
        vm = sm.engine.values(x0)
        v1 = inj.engine.values(x0)
        # identical realization, sharded vs local: only the f64 reduction
        # split differs
        assert np.max(np.abs(vm - v1) / np.abs(v1)) < 1e-7
        assert np.all(np.isfinite(sm.engine.jacobian(x0)))

    def test_sweep_engine_slices_prefix(self, setups):
        inj, _ = setups
        inj2 = build_benchmark_calibration(num_paths=32_768 // 16,
                                           brownian="finmath_mersenne")
        # force a genuine reduction by using a setup with > 8192 paths
        big = build_benchmark_calibration(num_paths=33_000 - 33_000 % 8,
                                          brownian="finmath_mersenne")
        sw = big.sweep_engine()
        assert sw.num_paths < big.engine.num_paths
        assert np.array_equal(sw._inc_np,
                              big.engine._inc_np[:, :, :sw.num_paths])
        del inj2


class TestRealizationSwap:
    """Round-4: injected increments are a traced ARGUMENT of the jitted
    programs — swapping the realization (set_increments) must reuse the
    compiled program (no retrace) and change the prices."""

    def test_swap_changes_values_without_retrace(self):
        import jax
        import numpy as np

        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration)
        from finmath_tpu.models.qmc import sobol_brownian_increments

        s = build_benchmark_calibration(num_paths=512, brownian="sobol",
                                        seed=0)
        p0 = np.asarray(s.covariance.initial_parameters)
        v0 = np.asarray(s.engine.values(p0))
        jitted = s.engine._values_fn._jitted
        size0 = jitted._cache_size()
        inc1 = sobol_brownian_increments(
            np.full(40, 0.5), s.engine._n_rng_factors, 512, seed=1)
        s.set_increments(np.asarray(inc1))
        v1 = np.asarray(s.engine.values(p0))
        assert jitted._cache_size() == size0, "realization swap retraced"
        assert not np.allclose(v0, v1), "swap did not change the draw"
        # pathwise_values decomposes the injected stream, not Threefry
        pw = np.asarray(s.engine.pathwise_values(p0), dtype=np.float64)
        np.testing.assert_allclose(pw.mean(axis=1), v1, rtol=5e-5)

    def test_swap_validates_shape_and_unbuilt_engine(self):
        import numpy as np
        import pytest

        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration)

        s = build_benchmark_calibration(num_paths=512, brownian="sobol",
                                        seed=0)
        with pytest.raises(ValueError, match="shape"):
            s.engine.set_increments(
                np.zeros((40, s.engine._n_rng_factors, 256),
                         dtype=np.float32))
        s2 = build_benchmark_calibration(num_paths=512)
        with pytest.raises(ValueError, match="without injected"):
            s2.engine.set_increments(
                np.zeros((40, 6, 512), dtype=np.float32))
