"""Portfolio credit tests: the exact copula recursion against closed
forms (binomial at beta=0, bivariate-normal 2-name oracle, comonotone
limit, Vasicek LHP as N grows), loss-conservation identities, tranche
and kth-to-default leg pricing, and the MC engine against the exact
distribution."""

import math

import numpy as np
import pytest

from finmath_tpu.models.credit import SurvivalCurve
from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.multi_asset import bivariate_normal_cdf
from finmath_tpu.models.portfolio_credit import (
    GaussianCopulaPortfolio, GaussianCopulaSimulation,
    lhp_expected_tranche_loss)

T_GRID = np.arange(0.0, 31.0)
DC = DiscountCurve(T_GRID, np.exp(-0.03 * T_GRID))
CURVE = SurvivalCurve([0.0], [0.02])
PD5 = float(1.0 - CURVE.get_survival_probability(5.0))


def homogeneous(n, beta=0.5, recovery=0.4):
    return GaussianCopulaPortfolio([CURVE] * n, betas=beta,
                                   recoveries=recovery, notionals=1.0 / n)


class TestExactRecursion:
    def test_independence_limit_is_binomial(self):
        pf = homogeneous(50, beta=0.0)
        pmf = pf.default_count_distribution(5.0)
        binom = np.array([math.comb(50, k) * PD5 ** k
                          * (1 - PD5) ** (50 - k) for k in range(51)])
        assert np.max(np.abs(pmf - binom)) < 1e-14

    def test_expected_loss_is_beta_invariant(self):
        # E[L] = sum l_i PD_i regardless of the copula
        for beta in (0.0, 0.3, 0.8):
            pf = homogeneous(40, beta=beta)
            grid, pmf = pf.loss_distribution(5.0)
            assert abs(np.sum(pmf) - 1.0) < 1e-12
            assert abs(float(np.sum(grid * pmf))
                       - 0.6 * PD5) < 1e-12

    def test_comonotone_limit(self):
        # beta -> 1: all names default together: P(0 defaults) = 1-PD,
        # P(all) = PD. Near the comonotone pole the conditional PD is a
        # STEP in z, and Gauss-Hermite places the step between nodes:
        # ~4e-3 mass error at 96 nodes is the documented quadrature
        # floor there (the recursion itself is exact; |beta| <= ~0.95
        # integrands are smooth and converge to machine precision)
        pf = homogeneous(20, beta=0.99999)
        pmf = pf.default_count_distribution(5.0)
        assert abs(pmf[0] - (1 - PD5)) < 5e-3
        assert abs(pmf[-1] - PD5) < 5e-3
        assert np.sum(pmf[1:-1]) < 5e-3

    def test_two_name_bivariate_oracle(self):
        pf = GaussianCopulaPortfolio([CURVE] * 2, betas=[0.6, 0.3],
                                     recoveries=0.4)
        c = pf.default_thresholds(5.0)
        both = bivariate_normal_cdf(float(c[0]), float(c[1]), 0.6 * 0.3)
        assert abs(pf.kth_to_default_probability(5.0, 1)
                   - (2 * PD5 - both)) < 1e-12
        assert abs(pf.kth_to_default_probability(5.0, 2) - both) < 1e-12

    def test_heterogeneous_pool_unit_guard(self):
        # notionals 1 and 2 share unit 1 after LGD scaling only if the
        # losses align; 1*(0.6) and 1.7*(0.6) do not
        curves = [CURVE] * 2
        pf = GaussianCopulaPortfolio(curves, betas=0.4, recoveries=0.4,
                                     notionals=[1.0, 1.7])
        with pytest.raises(ValueError, match="integer multiples"):
            pf.loss_distribution(5.0)
        # an explicit aligned unit works: losses 0.6 and 1.02 share 0.06
        grid, pmf = pf.loss_distribution(5.0, unit=0.06)
        assert abs(np.sum(pmf) - 1.0) < 1e-12
        assert abs(float(np.sum(grid * pmf)) - (0.6 + 1.02) * PD5) < 1e-12

    def test_lhp_limit(self):
        # the exact recursion converges to the Vasicek closed form
        lhp = lhp_expected_tranche_loss(PD5, 0.5, 0.03, 0.07, 0.4)
        errs = []
        for n in (50, 800):
            etl = homogeneous(n).expected_tranche_loss(5.0, 0.03, 0.07)
            errs.append(abs(etl - lhp))
        assert errs[1] < errs[0]
        assert errs[1] < 5e-5

    def test_validation(self):
        with pytest.raises(ValueError):
            GaussianCopulaPortfolio([CURVE], betas=1.0)
        with pytest.raises(ValueError):
            GaussianCopulaPortfolio([CURVE], betas=0.5, recoveries=1.0)
        with pytest.raises(ValueError):
            GaussianCopulaPortfolio([CURVE], betas=0.5, notionals=0.0)
        pf = homogeneous(5)
        with pytest.raises(ValueError):
            pf.expected_tranche_loss(5.0, 0.07, 0.03)
        with pytest.raises(ValueError):
            pf.kth_to_default_probability(5.0, 6)
        with pytest.raises(ValueError):
            lhp_expected_tranche_loss(PD5, 1.2, 0.0, 0.03)


class TestLegPricing:
    def test_tranche_spread_ordering(self):
        # equity tranche carries (much) more spread than senior
        pf = homogeneous(100)
        eq = pf.tranche_par_spread(DC, 0.00, 0.03, 5.0)
        mez = pf.tranche_par_spread(DC, 0.03, 0.07, 5.0)
        sen = pf.tranche_par_spread(DC, 0.07, 0.15, 5.0)
        assert eq > mez > sen > 0

    def test_correlation_moves_risk_up_the_capital_structure(self):
        # higher beta: equity ETL down (defaults cluster: more
        # scenarios with zero loss), senior ETL up (tail fattens)
        lo = homogeneous(100, beta=0.2)
        hi = homogeneous(100, beta=0.7)
        assert hi.expected_tranche_loss(5.0, 0.0, 0.03) \
            < lo.expected_tranche_loss(5.0, 0.0, 0.03)
        assert hi.expected_tranche_loss(5.0, 0.07, 0.30) \
            > lo.expected_tranche_loss(5.0, 0.07, 0.30)

    def test_whole_capital_structure_reprices_the_index(self):
        # protection legs over contiguous tranches spanning [0, total
        # loss] sum to the index protection leg (ETL is additive)
        pf = homogeneous(50)
        cuts = [0.0, 0.03, 0.07, 0.15, 0.6]
        prot = sum(pf.tranche_legs(DC, a, d, 5.0)[0]
                   for a, d in zip(cuts[:-1], cuts[1:]))
        prot_index = pf.tranche_legs(DC, 0.0, 0.6, 5.0)[0]
        assert abs(prot - prot_index) < 1e-12

    def test_kth_to_default_ordering_and_legs(self):
        pf = GaussianCopulaPortfolio([CURVE] * 5, betas=0.4,
                                     recoveries=0.4)
        spreads = []
        for k in (1, 2, 3):
            p, a = pf.kth_to_default_legs(DC, k, 5.0)
            assert p > 0 and a > 0
            spreads.append(p / a)
        # first-to-default is the riskiest
        assert spreads[0] > spreads[1] > spreads[2]
        # FtD spread exceeds any single-name spread, is below the sum
        from finmath_tpu.models.credit import cds_par_spread
        single = cds_par_spread(DC, CURVE, 5.0, recovery=0.4)
        assert spreads[0] > single
        assert spreads[0] < 5 * single


class TestMonteCarlo:
    @pytest.fixture(scope="class")
    def setup(self):
        pf = homogeneous(50)
        sim = GaussianCopulaSimulation(pf, num_paths=100_000, seed=3,
                                       antithetic=True)
        return pf, sim

    def test_etl_matches_exact(self, setup):
        pf, sim = setup
        times = [1.0, 3.0, 5.0]
        st = sim.tranche_statistics(times, 0.03, 0.07, ks=(1, 5))
        for i, t in enumerate(times):
            ex = pf.expected_tranche_loss(t, 0.03, 0.07)
            assert abs(st["etl"][i] - ex) < 4 * st["etl_stderr"][i] \
                + 1e-6, (t, st["etl"][i], ex)

    def test_kth_prob_matches_exact(self, setup):
        pf, sim = setup
        st = sim.tranche_statistics([5.0], 0.0, 0.03, ks=(1, 5, 10))
        for j, k in enumerate((1, 5, 10)):
            ex = pf.kth_to_default_probability(5.0, k)
            se = math.sqrt(ex * (1 - ex) / 100_000)
            assert abs(st["kth_prob"][0, j] - ex) < 5 * se + 1e-4

    def test_pathwise_monotone_in_time(self, setup):
        # one latent draw shared across horizons: ETL and P(>=k) are
        # monotone in t by construction, not just in expectation
        _, sim = setup
        st = sim.tranche_statistics(np.arange(1.0, 8.0), 0.0, 0.10,
                                    ks=(3,))
        assert np.all(np.diff(st["etl"]) > -1e-15)
        assert np.all(np.diff(st["kth_prob"][:, 0]) > -1e-15)

    def test_validation(self, setup):
        pf, _ = setup
        with pytest.raises(ValueError):
            GaussianCopulaSimulation(pf, num_paths=101, antithetic=True)
        _, sim = setup
        with pytest.raises(ValueError):
            sim.tranche_statistics([5.0], 0.07, 0.03)
