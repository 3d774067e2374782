"""Multi-device path-axis sharding tests (8 virtual CPU devices, see
conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.parallel import make_path_mesh, mc_price_sharded, sharded_mean

S0, R, SIGMA, T, K = 1.0, 0.05, 0.30, 1.0, 1.05


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_path_mesh(8)


class TestShardedReductions:
    def test_sharded_mean_matches_numpy(self, mesh):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(80_000).astype(np.float32)
        mean = sharded_mean(mesh)
        got = mean(jnp.asarray(x))
        assert got == pytest.approx(float(np.mean(x.astype(np.float64))), rel=1e-12)


class TestShardedMonteCarlo:
    def test_price_close_to_analytic(self, mesh):
        price = float(mc_price_sharded(mesh, 3141, 160_000, 50, S0, R, SIGMA, T, K))
        analytic = black_scholes_option_value(S0, R, SIGMA, T, K)
        assert price == pytest.approx(analytic, abs=0.01)

    def test_deterministic(self, mesh):
        p1 = float(mc_price_sharded(mesh, 7, 16_000, 10, S0, R, SIGMA, T, K))
        p2 = float(mc_price_sharded(mesh, 7, 16_000, 10, S0, R, SIGMA, T, K))
        assert p1 == p2

    def test_indivisible_paths_rejected(self, mesh):
        with pytest.raises(ValueError):
            mc_price_sharded(mesh, 7, 1001, 10, S0, R, SIGMA, T, K)

    def test_gradient_through_collective(self, mesh):
        """Vega via jax.grad through shard_map + psum (the calibration
        pattern: gradients must flow through the collective)."""
        def price_of_vol(sigma):
            return mc_price_sharded(mesh, 3141, 80_000, 25, S0, R, sigma, T, K)

        vega = float(jax.grad(price_of_vol)(jnp.float64(SIGMA)))
        # central finite difference for comparison
        eps = 1e-3
        fd = (float(price_of_vol(jnp.float64(SIGMA + eps)))
              - float(price_of_vol(jnp.float64(SIGMA - eps)))) / (2 * eps)
        assert vega == pytest.approx(fd, rel=5e-2)
        # and in the right analytic ballpark (BS vega ~ 0.37 here)
        assert 0.2 < vega < 0.6


class TestShardedLMM:
    """Path-sharded LMM valuation: psum expectations, per-device RNG
    streams, gradients through the collective."""

    @pytest.fixture(scope="class")
    def engines(self, mesh):
        from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
        from finmath_tpu.models.lmm.model import LMMValuationEngine

        setup = build_atm_calibration(num_paths=1600, num_factors=1)
        sharded = LMMValuationEngine(
            setup.model, setup.products, 1600, 1, seed=31415, mesh=mesh
        )
        return setup, sharded

    def test_sharded_matches_unsharded_within_mc_noise(self, engines):
        setup, sharded = engines
        p0 = setup.covariance.initial_parameters
        r_sh = sharded.residuals(p0)
        r_un = setup.engine.residuals(p0)
        # different RNG streams -> agreement only to MC error
        # (~vol-units noise at 1600 paths is a few 1e-4)
        assert np.max(np.abs(r_sh - r_un)) < 2e-3
        assert np.array_equal(r_sh, sharded.residuals(p0))  # deterministic

    def test_batched_residuals_under_mesh(self, engines):
        """vmapped multistart evaluation composes with the shard_map
        path sharding (each start still psums over the mesh)."""
        setup, sharded = engines
        p0 = np.asarray(setup.covariance.initial_parameters)
        X = np.stack([p0, p0 * 1.05])
        R = sharded.residuals_batched(X)
        np.testing.assert_allclose(R[0], sharded.residuals(p0),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(R[1], sharded.residuals(p0 * 1.05),
                                   rtol=1e-6, atol=1e-9)

    def test_indivisible_paths_rejected(self, mesh):
        from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
        from finmath_tpu.models.lmm.model import LMMValuationEngine

        setup = build_atm_calibration(num_paths=1600, num_factors=1)
        with pytest.raises(ValueError):
            LMMValuationEngine(setup.model, setup.products, 1601, 1, mesh=mesh)

    def test_gradient_through_collective(self, engines):
        import jax
        import jax.numpy as jnp

        setup, sharded = engines
        p0 = jnp.asarray(setup.covariance.initial_parameters)
        residual_fn = sharded._residual_fn  # public jitted sharded program

        @jax.jit
        def loss(params):
            r = residual_fn(params)
            return jnp.sum(r * r)

        g = jax.grad(loss)(p0)
        assert np.all(np.isfinite(np.asarray(g)))
        # gradient descent step must reduce the loss
        assert float(loss(p0 - 0.05 * g)) < float(loss(p0))


class TestShardedStochVolBenchmark:
    """The benchmark model (blended local vol + stochastic vol, extra
    Brownian factor, lognormal quotes) under path sharding: covers the
    V-scaling carry, the cond-gated collector and the per-device RNG
    folding inside shard_map."""

    def test_sharded_benchmark_residuals(self, mesh):
        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration,
        )

        unsharded = build_benchmark_calibration(num_paths=4096, seed=314151)
        sharded = build_benchmark_calibration(num_paths=4096, seed=314151,
                                              mesh=mesh)
        p0 = unsharded.covariance.initial_parameters
        r_sh = sharded.engine.residuals(p0)
        r_un = unsharded.engine.residuals(p0)
        assert np.all(np.isfinite(r_sh))
        # different per-device streams -> MC-noise agreement only
        # (lognormal vol units at 4096 paths: a couple of percent). The
        # deep-ITM smile quote has almost no time value at this path count
        # — its implied vol collapses to 0 on unlucky draws — so it is
        # excluded from the noise bound.
        keep = np.asarray([p.target < 0.5 for p in sharded.engine.products])
        assert np.max(np.abs(r_sh - r_un)[keep]) < 0.05
        # jacobian flows through psum + cond + V carry
        J = sharded.engine.jacobian(p0)
        assert J.shape == (len(sharded.engine.products), 8)
        assert np.all(np.isfinite(J))


class TestMeshedExposure:
    """XVA under the mesh: exposure profiles + CVA delta ladders shard
    the path axis (psum expectations, all_gather quantiles). With the
    SAME injected increments (sharded over paths) the meshed and
    single-device profiles must agree exactly up to f64 reduction
    order."""

    @pytest.fixture(scope="class")
    def setups(self, mesh):
        from finmath_tpu.models.lmm.atm_calibration import (
            build_atm_calibration)
        from finmath_tpu.models.lmm.exposure import SwapExposureEngine
        from finmath_tpu.models.qmc import sobol_brownian_increments

        paths = 4096
        setup = build_atm_calibration(num_paths=paths, num_factors=1)
        sim = setup.model.sim_times
        inc = sobol_brownian_increments(sim[1:] - sim[:-1], 1, paths,
                                        seed=11)
        kw = dict(first_index=2, last_index=8, strike=0.005,
                  num_paths=paths, num_factors=1, increments=inc)
        meshed = SwapExposureEngine(setup.model, mesh=mesh, **kw)
        single = SwapExposureEngine(setup.model, **kw)
        return setup, meshed, single

    def test_profile_matches_single_device(self, setups):
        setup, meshed, single = setups
        p0 = setup.covariance.initial_parameters
        pm = meshed.profile(p0)
        ps = single.profile(p0)
        assert np.allclose(pm.ee, ps.ee, atol=1e-12)
        assert np.allclose(pm.ene, ps.ene, atol=1e-12)
        assert np.allclose(pm.forward_value, ps.forward_value, atol=1e-12)
        # quantiles see the SAME gathered ensemble (order-insensitive)
        assert np.allclose(pm.pfe[0.99], ps.pfe[0.99], atol=1e-12)

    def test_cva_deltas_match_single_device(self, setups):
        setup, meshed, single = setups
        p0 = setup.covariance.initial_parameters
        cm, gm = meshed.cva_forward_deltas(p0, hazard_rate=0.01)
        cs, gs = single.cva_forward_deltas(p0, hazard_rate=0.01)
        assert cm == pytest.approx(cs, rel=1e-10)
        # f64 reduction order differs (local sums + pmean vs one global
        # sum), amplified through the adjoint on near-zero entries
        assert np.allclose(gm, gs, rtol=1e-6, atol=1e-10)

    def test_option_netting_set_matches_single_device(self, mesh):
        """Swaption + Bermudan close-out regressions under the mesh:
        the normal-equation moments psum over ICI, so with the SAME
        injected increments every device fits the identical global
        policy — the meshed profile must equal the single-device one up
        to f64 reduction order."""
        from finmath_tpu.models.lmm.atm_calibration import (
            build_atm_calibration)
        from finmath_tpu.models.lmm.exposure import (
            BermudanSwaptionTrade, NettingSetExposureEngine, SwaptionTrade)
        from finmath_tpu.models.qmc import sobol_brownian_increments

        paths = 4096
        setup = build_atm_calibration(num_paths=paths, num_factors=1)
        sim = setup.model.sim_times
        inc = sobol_brownian_increments(sim[1:] - sim[:-1], 1, paths,
                                        seed=23)
        trades = [SwaptionTrade(4, 4, 0.01),
                  BermudanSwaptionTrade((4, 6), 10, 0.01),
                  ]
        kw = dict(num_paths=paths, num_factors=1, increments=inc)
        p0 = setup.covariance.initial_parameters
        pm = NettingSetExposureEngine(setup.model, trades, mesh=mesh,
                                      **kw).profile(p0)
        ps = NettingSetExposureEngine(setup.model, trades,
                                      **kw).profile(p0)
        assert np.allclose(pm.ee, ps.ee, atol=1e-8)
        assert np.allclose(pm.ene, ps.ene, atol=1e-8)
        assert np.allclose(pm.forward_value, ps.forward_value, atol=1e-8)
        assert np.allclose(pm.pfe[0.99], ps.pfe[0.99], atol=1e-7)

    def test_im_profile_matches_single_device(self, setups):
        """Dynamic IM under the mesh: psum'd moment regressions."""
        setup, meshed, single = setups
        p0 = setup.covariance.initial_parameters
        im_m = meshed.im_profile(p0)
        im_s = single.im_profile(p0)
        assert np.allclose(im_m.expected_im, im_s.expected_im, atol=1e-9)
        assert np.allclose(im_m.expected_im_tmoney,
                           im_s.expected_im_tmoney, atol=1e-9)
