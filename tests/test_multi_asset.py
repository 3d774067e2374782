"""Multi-asset model + rainbow product tests
(finmath_tpu/models/multi_asset.py): MC kernels vs the Margrabe /
Stulz / geometric-basket / Kirk closed forms, the bivariate normal CDF
vs exact limits, and same-stream no-arbitrage identities."""

import math

import numpy as np
import pytest

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.models.equity_products import DigitalOption
from finmath_tpu.models.multi_asset import (
    BasketOption,
    ExchangeOption,
    MonteCarloMultiAssetBlackScholesModel,
    MultiAssetBlackScholesModel,
    RainbowOption,
    SpreadOption,
    bivariate_normal_cdf,
    geometric_basket_option_value,
    kirk_spread_approximation,
    margrabe_exchange_value,
    stulz_rainbow_value,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

S0 = [100.0, 95.0]
R, T = 0.04, 1.5
VOLS = [0.25, 0.35]
RHO = 0.4
CORR = [[1.0, RHO], [RHO, 1.0]]
N_PATHS = 200_000


@pytest.fixture(scope="module")
def sim():
    td = TimeDiscretization(initial=0.0, num_steps=30, step=T / 30)
    return MonteCarloMultiAssetBlackScholesModel(
        td, N_PATHS, MultiAssetBlackScholesModel(S0, R, VOLS, CORR),
        seed=11)


class TestBivariateNormalCdf:
    def test_independent_factorizes(self):
        from finmath_tpu.models.analytic import _norm_cdf
        for a, b in ((0.3, -0.5), (1.0, 1.0), (-2.0, 0.7)):
            assert abs(bivariate_normal_cdf(a, b, 0.0)
                       - _norm_cdf(a) * _norm_cdf(b)) < 1e-14

    def test_comonotone_limit(self):
        from finmath_tpu.models.analytic import _norm_cdf
        assert abs(bivariate_normal_cdf(0.5, 1.0, 1.0)
                   - _norm_cdf(0.5)) < 1e-14
        assert abs(bivariate_normal_cdf(0.5, 1.0, -1.0)
                   - max(0.0, _norm_cdf(0.5) + _norm_cdf(1.0) - 1.0)) \
            < 1e-14

    def test_symmetry_and_reflection(self):
        # M(a,b,rho) = M(b,a,rho); M(a,b,rho) = Phi(a) - M(a,-b,-rho)
        from finmath_tpu.models.analytic import _norm_cdf
        for rho in (-0.8, -0.2, 0.6, 0.95):
            for a, b in ((0.4, -0.9), (1.3, 0.2)):
                assert abs(bivariate_normal_cdf(a, b, rho)
                           - bivariate_normal_cdf(b, a, rho)) < 1e-13
                assert abs(bivariate_normal_cdf(a, b, rho)
                           - (_norm_cdf(a)
                              - bivariate_normal_cdf(a, -b, -rho))) \
                    < 1e-13

    def test_mc_agreement(self):
        rng = np.random.default_rng(1)
        rho = -0.6
        chol = np.linalg.cholesky([[1, rho], [rho, 1]])
        z = chol @ rng.standard_normal((2, 500_000))
        mc = ((z[0] <= 0.7) & (z[1] <= -0.2)).mean()
        an = bivariate_normal_cdf(0.7, -0.2, rho)
        assert abs(mc - an) < 4 * math.sqrt(an * (1 - an) / 500_000)

    def test_validation(self):
        with pytest.raises(ValueError):
            bivariate_normal_cdf(0.0, 0.0, 1.5)


class TestModelValidation:
    def test_shape_mismatch(self):
        with pytest.raises(ValueError):
            MultiAssetBlackScholesModel([100.0], R, VOLS, CORR)

    def test_asymmetric_correlation(self):
        with pytest.raises(ValueError):
            MultiAssetBlackScholesModel(
                S0, R, VOLS, [[1.0, 0.4], [0.2, 1.0]])

    def test_bad_diagonal(self):
        with pytest.raises(ValueError):
            MultiAssetBlackScholesModel(
                S0, R, VOLS, [[1.0, 0.4], [0.4, 0.9]])

    def test_non_psd_correlation(self):
        with pytest.raises(np.linalg.LinAlgError):
            MultiAssetBlackScholesModel(
                [100.0, 95.0, 90.0], R, [0.2, 0.3, 0.25],
                [[1.0, 0.9, -0.9], [0.9, 1.0, 0.9], [-0.9, 0.9, 1.0]])


class TestExchangeAndSpread:
    def test_exchange_matches_margrabe(self, sim):
        v, e = ExchangeOption(T).get_value_and_error(sim)
        an = margrabe_exchange_value(S0[0], S0[1], VOLS[0], VOLS[1],
                                     RHO, T)
        assert abs(v - an) < 4 * e

    def test_spread_zero_strike_is_exchange_same_stream(self, sim):
        vs, _ = SpreadOption(T, 0.0).get_value_and_error(sim)
        vx, _ = ExchangeOption(T).get_value_and_error(sim)
        assert abs(vs - vx) < 1e-9 * max(vx, 1.0)

    def test_spread_matches_kirk(self, sim):
        v, e = SpreadOption(T, 10.0).get_value_and_error(sim)
        an = kirk_spread_approximation(S0[0], S0[1], R, VOLS[0], VOLS[1],
                                       RHO, T, 10.0)
        # Kirk is an approximation: allow MC noise + ~0.5% model error
        assert abs(v - an) < 4 * e + 0.005 * an

    def test_kirk_zero_strike_is_margrabe(self):
        assert abs(kirk_spread_approximation(
            S0[0], S0[1], R, VOLS[0], VOLS[1], RHO, T, 0.0)
            - margrabe_exchange_value(S0[0], S0[1], VOLS[0], VOLS[1],
                                      RHO, T)) < 1e-12

    def test_margrabe_identical_assets_is_zero(self):
        assert margrabe_exchange_value(100.0, 100.0, 0.3, 0.3, 1.0,
                                       T) == 0.0


class TestRainbow:
    @pytest.mark.parametrize("kind,k", [
        ("call-on-min", 100.0), ("call-on-max", 100.0),
        ("put-on-min", 100.0), ("put-on-max", 100.0),
        ("call-on-min", 80.0), ("call-on-max", 120.0)])
    def test_matches_stulz(self, sim, kind, k):
        v, e = RainbowOption(T, k, kind).get_value_and_error(sim)
        an = stulz_rainbow_value(S0[0], S0[1], R, VOLS[0], VOLS[1], RHO,
                                 T, k, kind)
        assert abs(v - an) < 4 * e

    def test_min_max_partition_same_stream(self, sim):
        # min + max = S1 + S2 pathwise: zero-strike calls partition the
        # pair exactly on the same realization
        vmin, _ = RainbowOption(T, 0.0, "call-on-min") \
            .get_value_and_error(sim)
        vmax, _ = RainbowOption(T, 0.0, "call-on-max") \
            .get_value_and_error(sim)
        df = math.exp(-R * T)
        a1 = float(sim.get_asset_value(T, 0).get_average())
        a2 = float(sim.get_asset_value(T, 1).get_average())
        assert abs(vmin + vmax - df * (a1 + a2)) < 2e-5 * (a1 + a2)

    def test_put_parity_same_stream(self, sim):
        # (K - min)+ = (min - K)+ - min + K pathwise
        k = 100.0
        p, _ = RainbowOption(T, k, "put-on-min").get_value_and_error(sim)
        c, _ = RainbowOption(T, k, "call-on-min").get_value_and_error(sim)
        c0, _ = RainbowOption(T, 0.0, "call-on-min") \
            .get_value_and_error(sim)
        expect = c - c0 + k * math.exp(-R * T)
        assert abs(p - expect) < 1e-6 * expect

    def test_stulz_zero_strike_parity(self):
        cm = stulz_rainbow_value(S0[0], S0[1], R, VOLS[0], VOLS[1], RHO,
                                 T, 0.0, "call-on-min")
        cx = stulz_rainbow_value(S0[0], S0[1], R, VOLS[0], VOLS[1], RHO,
                                 T, 0.0, "call-on-max")
        assert abs(cm + cx - sum(S0)) < 1e-10

    def test_max_call_dominates_single_asset_calls(self, sim):
        v, _ = RainbowOption(T, 100.0, "call-on-max") \
            .get_value_and_error(sim)
        assert v >= black_scholes_option_value(S0[0], R, VOLS[0], T,
                                               100.0) - 0.05

    def test_validation(self):
        with pytest.raises(ValueError):
            RainbowOption(T, 100.0, "call-on-median")
        with pytest.raises(ValueError):
            stulz_rainbow_value(*S0, R, *VOLS, RHO, T, 100.0, "nope")


class TestBasket:
    W = [0.6, 0.4]

    def test_geometric_matches_closed_form(self, sim):
        v, e = BasketOption(T, self.W, 100.0, average="geometric") \
            .get_value_and_error(sim)
        an = geometric_basket_option_value(S0, R, VOLS, CORR, self.W, T,
                                           100.0)
        assert abs(v - an) < 4 * e

    def test_geometric_put_matches_closed_form(self, sim):
        v, e = BasketOption(T, self.W, 100.0, is_call=False,
                            average="geometric").get_value_and_error(sim)
        an = geometric_basket_option_value(S0, R, VOLS, CORR, self.W, T,
                                           100.0, is_call=False)
        assert abs(v - an) < 4 * e

    def test_arithmetic_dominates_geometric_same_stream(self, sim):
        va, _ = BasketOption(T, self.W, 100.0).get_value_and_error(sim)
        vg, _ = BasketOption(T, self.W, 100.0, average="geometric") \
            .get_value_and_error(sim)
        assert va >= vg       # AM-GM pathwise

    def test_control_variate_agrees_and_shrinks_error(self, sim):
        va, ea = BasketOption(T, self.W, 100.0).get_value_and_error(sim)
        vc, ec = BasketOption(T, self.W, 100.0,
                              control_variate="geometric") \
            .get_value_and_error(sim)
        assert abs(va - vc) < 4 * ea
        assert ec < ea / 3

    def test_single_asset_degenerates_to_black_scholes(self):
        # weight 1 on asset 0: geometric == arithmetic == BS
        an = geometric_basket_option_value(
            S0, R, VOLS, CORR, [1.0, 0.0 + 1e-300], T, 100.0)
        bs = black_scholes_option_value(S0[0], R, VOLS[0], T, 100.0)
        assert abs(an - bs) < 1e-9

    def test_validation(self, sim):
        with pytest.raises(ValueError):
            BasketOption(T, [0.5, -0.5], 100.0)
        with pytest.raises(ValueError):
            BasketOption(T, self.W, 100.0, average="harmonic")
        with pytest.raises(ValueError):
            BasketOption(T, [1.0], 100.0).get_value(sim)


class TestFacadeComposition:
    def test_single_asset_products_price_component_zero(self, sim):
        # the equity product layer runs unchanged on the multi-asset
        # facade (asset 0)
        v, e = DigitalOption(T, 100.0).get_value_and_error(sim)
        from finmath_tpu.models.analytic import digital_option_value
        an = digital_option_value(S0[0], R, VOLS[0], T, 100.0)
        assert abs(v - an) < 4 * e + 1e-4

    def test_off_grid_time_raises(self, sim):
        with pytest.raises(ValueError):
            sim.get_all_asset_values(T + 0.1234)

    def test_deterministic_numeraire(self, sim):
        n = sim.get_numeraire(T)
        assert n.is_deterministic()
        assert abs(float(n.get_average()) - math.exp(R * T)) < 1e-12
