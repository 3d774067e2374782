"""Multi-chip sharding of the round-3 model families (round-3 VERDICT
weak #4): wrong-way-risk CVA, cross-currency, and portfolio credit take
``mesh=`` and shard the Monte-Carlo path axis via XLA SPMD propagation
from a NamedSharding'd state template — on the IDENTICAL Threefry
stream, so meshed results must equal unsharded ones up to reduction
order / 1-ULP fusion differences (measured: sharded scans differ from
unsharded by at most 1 ULP of the f32 state; statistics inherit ~1e-6
relative). The latent-matrix copula path is bitwise the same draw.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from finmath_tpu.models.credit import (CIRPPIntensityModel, SurvivalCurve,
                                       WrongWayRiskCVAEngine,
                                       par_swap_rate)
from finmath_tpu.models.cross_currency import (CrossCurrencyModel,
                                               CrossCurrencySimulation)
from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import HullWhiteModel
from finmath_tpu.models.portfolio_credit import (GaussianCopulaPortfolio,
                                                 GaussianCopulaSimulation)
from finmath_tpu.models.time_discretization import TimeDiscretization

T_GRID = np.arange(0.0, 21.0)
DC = DiscountCurve(T_GRID, np.exp(-0.03 * T_GRID))


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices())
    if devs.size < 2:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return Mesh(devs, ("paths",))


class TestWWRMesh:
    PAY = np.arange(1, 11) * 0.5

    def _engine(self, mesh, paths=8_000):
        hw = HullWhiteModel(DC, mean_reversion=0.1, volatility=0.01)
        curve = SurvivalCurve([0.0], [0.015])
        intensity = CIRPPIntensityModel(curve, kappa=0.5, theta=0.02,
                                        sigma=0.10, y0=0.02)
        k = par_swap_rate(DC, self.PAY)
        return WrongWayRiskCVAEngine(
            hw, intensity, self.PAY, k, num_paths=paths,
            correlation=0.6, recovery=0.4, seed=99, antithetic=True,
            substeps=2, mesh=mesh)

    def test_meshed_matches_unsharded(self, mesh):
        plain = self._engine(None).compute()
        shard = self._engine(mesh).compute()
        assert abs(shard.cva - plain.cva) < 1e-5 * plain.cva
        assert abs(shard.cva_independent - plain.cva_independent) \
            < 1e-5 * plain.cva_independent
        np.testing.assert_allclose(shard.contributions,
                                   plain.contributions,
                                   rtol=1e-4, atol=1e-10)
        np.testing.assert_allclose(shard.expected_survival,
                                   plain.expected_survival, rtol=1e-6)

    def test_meshed_invariants(self, mesh):
        res = self._engine(mesh).compute()
        assert res.cva > 0 and res.wwr_ratio > 1.0
        assert np.all(res.contributions > -1e-12)
        assert np.isclose(np.sum(res.contributions), res.cva)
        assert abs(res.contributions[-1]) < 1e-15

    def test_indivisible_paths_rejected(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            self._engine(mesh, paths=8_002)


class TestXccyMesh:
    def _sim(self, mesh, paths=16_000):
        dc_f = DiscountCurve(T_GRID, np.exp(-0.01 * T_GRID))
        m = CrossCurrencyModel(HullWhiteModel(DC, 0.1, 0.01),
                               HullWhiteModel(dc_f, 0.05, 0.008),
                               fx_spot=1.25, fx_vol=0.10, rho_df=0.3,
                               rho_dx=-0.2, rho_fx=0.25)
        td = TimeDiscretization(initial=0.0, num_steps=16, step=0.5)
        return m, CrossCurrencySimulation(m, td, num_paths=paths, seed=5,
                                          antithetic=True, mesh=mesh)

    def test_meshed_matches_unsharded(self, mesh):
        m, plain = self._sim(None)
        _, shard = self._sim(mesh)
        strikes = [1.0, 1.25, 1.5]
        fa, pa, _ = plain.mc_fx_option_prices(5.0, strikes)
        fb, pb, _ = shard.mc_fx_option_prices(5.0, strikes)
        assert abs(fb - fa) < 1e-5 * fa
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                                   rtol=1e-4)
        da, ga = plain.mc_ccs_legs(np.arange(1, 9) * 1.0)
        db, gb = shard.mc_ccs_legs(np.arange(1, 9) * 1.0)
        assert abs(db - da) < 1e-5 and abs(gb - ga) < 1e-5

    def test_meshed_martingales(self, mesh):
        m, shard = self._sim(mesh)
        d = shard.martingale_diagnostics(5.0, 8.0)
        for key, (mc, an) in d.items():
            assert abs(mc / an - 1.0) < 5e-3, (key, mc, an)


class TestCopulaMesh:
    def _setup(self, mesh):
        rng = np.random.default_rng(1)
        hazards = rng.uniform(0.005, 0.06, 50)
        betas = rng.uniform(0.3, 0.7, 50)
        pf = GaussianCopulaPortfolio(
            [SurvivalCurve([0.0], [h]) for h in hazards], betas=betas,
            recoveries=0.4, notionals=np.full(50, 1 / 50))
        return pf, GaussianCopulaSimulation(pf, num_paths=40_000, seed=3,
                                            antithetic=True, mesh=mesh)

    def test_meshed_is_same_draw(self, mesh):
        # the latent matrix is device_put, not redrawn: meshed statistics
        # agree to reduction order with the unsharded ones
        _, plain = self._setup(None)
        _, shard = self._setup(mesh)
        times = [1.0, 3.0, 5.0]
        a = plain.tranche_statistics(times, 0.03, 0.07, ks=(1, 5))
        b = shard.tranche_statistics(times, 0.03, 0.07, ks=(1, 5))
        np.testing.assert_allclose(b["etl"], a["etl"], rtol=1e-12)
        np.testing.assert_allclose(b["kth_prob"], a["kth_prob"],
                                   rtol=1e-12)

    def test_meshed_matches_exact_recursion(self, mesh):
        pf, shard = self._setup(mesh)
        st = shard.tranche_statistics([5.0], 0.03, 0.07)
        ex = pf.expected_tranche_loss(5.0, 0.03, 0.07)
        assert abs(st["etl"][0] - ex) < 4 * st["etl_stderr"][0] + 1e-6
