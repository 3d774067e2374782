"""Collateral (CSA), funding (FVA), and dynamic initial margin (IM/MVA)
tests — the XVA completion layer on the exposure engines
(finmath_tpu/models/lmm/exposure.py).

Design checks, not golden numbers: degenerate CSAs must reproduce the
uncollateralized profile exactly (infinite thresholds, prohibitive MTA),
zero-threshold margining must collapse the residual exposure to the
margin-period move, FVA/MVA must reduce to hand-computed rectangle
rules on the profile arrays, and the clean-P&L IM must vanish when the
model's volatility does (the discriminating test that the known
cashflow roll-off was added back correctly)."""

import numpy as np
import pytest

from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
from finmath_tpu.models.lmm.exposure import (
    CSA,
    NettingSetExposureEngine,
    SwapTrade,
    cva_from_profile,
    fva_from_profile,
    mva_from_im_profile,
)

N_PATHS = 6000


@pytest.fixture(scope="module")
def setup():
    return build_atm_calibration(num_paths=N_PATHS, num_factors=1)


@pytest.fixture(scope="module")
def params(setup):
    return setup.covariance.initial_parameters


TRADES = [SwapTrade(1, 12, 0.02, payer=True)]
# forward-starting swap observed BEFORE its first cashflow: in this
# window the netted value moves only with the market (no coupon
# roll-off), so collateral-ordering properties hold cleanly. Struck
# near the 5y-into-5y par rate (~0.00715 on this curve) so gross EE is
# volatility-driven — a deep-OTM trade would make the two-way CSA's
# posted-collateral exposure DOMINATE the (tiny) gross EE, which is
# physical but defeats the "collateral reduces exposure" orderings.
TRADES_FWD = [SwapTrade(10, 20, 0.00715, payer=True)]
OBS_FWD = tuple(range(1, 10))


def engine(setup, csa=None, trades=TRADES, **kw):
    kw.setdefault("num_paths", N_PATHS)
    kw.setdefault("seed", 20260818)
    return NettingSetExposureEngine(setup.model, trades, csa=csa, **kw)


def fwd_engine(setup, csa=None, **kw):
    return engine(setup, csa=csa, trades=TRADES_FWD,
                  observation_indices=OBS_FWD, **kw)


@pytest.fixture(scope="module")
def gross(setup, params):
    return engine(setup).profile(params)


@pytest.fixture(scope="module")
def gross_fwd(setup, params):
    return fwd_engine(setup).profile(params)


class TestCSA:
    def test_infinite_thresholds_match_uncollateralized(self, setup,
                                                        params, gross):
        prof = engine(setup, CSA(threshold=np.inf, threshold_own=np.inf,
                                 margin_lag=1)).profile(params)
        np.testing.assert_allclose(prof.ee, gross.ee, rtol=1e-12)
        np.testing.assert_allclose(prof.ene, gross.ene, rtol=1e-12)
        for q in prof.pfe:
            np.testing.assert_allclose(prof.pfe[q], gross.pfe[q],
                                       rtol=1e-12, atol=1e-15)

    def test_prohibitive_mta_matches_uncollateralized(self, setup,
                                                      params, gross):
        """A transfer amount no margin call ever reaches: the balance
        stays at zero forever."""
        prof = engine(setup, CSA(mta=1e6, margin_lag=1)).profile(params)
        np.testing.assert_allclose(prof.ee, gross.ee, rtol=1e-12)
        np.testing.assert_allclose(prof.ene, gross.ene, rtol=1e-12)

    def test_gross_rows_reproduce_the_plain_profile(self, setup, params,
                                                    gross):
        prof = engine(setup, CSA(margin_lag=1)).profile(params)
        np.testing.assert_allclose(prof.ee_gross, gross.ee, rtol=1e-12)
        np.testing.assert_allclose(prof.ene_gross, gross.ene, rtol=1e-12)

    def test_zero_threshold_collateral_crushes_ee(self, setup, params,
                                                  gross_fwd):
        """Full two-way zero-threshold margining with a one-period lag,
        on the cashflow-free window: residual EE is the one-period
        market move — a small fraction of the uncollateralized level,
        but nonzero (the gap risk of the margin period)."""
        prof = fwd_engine(setup, CSA(margin_lag=1)).profile(params)
        assert np.max(prof.ee) < 0.5 * np.max(gross_fwd.ee)
        assert np.max(prof.ee) > 0.0

    def test_lag_zero_two_way_is_perfect(self, setup, params):
        """Instantaneous zero-threshold margining removes ALL exposure."""
        prof = engine(setup, CSA(margin_lag=0)).profile(params)
        np.testing.assert_allclose(prof.ee, 0.0, atol=1e-12)
        np.testing.assert_allclose(prof.ene, 0.0, atol=1e-12)
        for q in prof.pfe:
            np.testing.assert_allclose(prof.pfe[q], 0.0, atol=1e-12)

    def test_cashflow_spike_inside_the_margin_period(self, setup, params,
                                                     gross):
        """Margining is on the DIRTY close-out value: a coupon that pays
        inside the margin period moves the value while the collateral
        balance is stale, so residual exposure SPIKES around payment
        dates (Pykhtin's margin-period cashflow spikes). On the seasoned
        swap the residual EE must therefore NOT be small everywhere —
        the effect is physical, not a bug."""
        prof = engine(setup, CSA(margin_lag=1)).profile(params)
        # spikes can exceed the (deep-OTM) uncollateralized EE early on
        assert np.max(prof.ee) > 0.0
        # and the profile documents them as gross rows for comparison
        assert prof.ee_gross is not None

    def test_longer_lag_more_exposure(self, setup, params):
        p1 = fwd_engine(setup, CSA(margin_lag=1)).profile(params)
        p3 = fwd_engine(setup, CSA(margin_lag=3)).profile(params)
        assert p3.epe() > p1.epe()

    def test_one_way_csa_only_helps(self, setup, params):
        """threshold_own = inf: we never post, so collateral >= 0 and
        EE can only fall — pointwise, even across cashflow spikes."""
        prof = engine(setup, CSA(threshold=0.0, threshold_own=np.inf,
                                 margin_lag=1)).profile(params)
        assert np.all(prof.ee <= prof.ee_gross + 1e-15)
        assert np.all(prof.collateral_benefit >= -1e-15)

    def test_independent_amount_reduces_ee(self, setup, params, gross):
        prof = engine(setup, CSA(threshold=np.inf, threshold_own=np.inf,
                                 independent_amount=0.01,
                                 margin_lag=1)).profile(params)
        assert np.all(prof.ee <= gross.ee + 1e-15)
        assert np.max(prof.ee) < np.max(gross.ee)
        # the IA makes the residual MORE negative on the liability side
        assert np.min(prof.ene) < np.min(gross.ene)

    def test_threshold_bounds_the_benefit(self, setup, params, gross_fwd):
        """One-way CSAs: a larger threshold means pointwise less
        collateral, hence pointwise more residual exposure."""
        lo = fwd_engine(setup, CSA(threshold=0.0, threshold_own=np.inf,
                                   margin_lag=1)).profile(params)
        mid = fwd_engine(setup, CSA(threshold=0.005, threshold_own=np.inf,
                                    margin_lag=1)).profile(params)
        assert np.all(lo.ee <= mid.ee + 1e-15)
        assert np.all(mid.ee <= gross_fwd.ee + 1e-15)

    def test_tiny_mta_matches_full_margining(self, setup, params):
        full = fwd_engine(setup, CSA(margin_lag=1)).profile(params)
        mta = fwd_engine(setup, CSA(mta=1e-9,
                                    margin_lag=1)).profile(params)
        np.testing.assert_allclose(mta.ee, full.ee, rtol=1e-3,
                                   atol=1e-12)

    def test_cva_on_residual_is_smaller(self, setup, params, gross_fwd):
        prof = fwd_engine(setup, CSA(threshold=0.0, threshold_own=np.inf,
                                     margin_lag=1)).profile(params)
        assert (cva_from_profile(prof, hazard_rate=0.02)
                < cva_from_profile(gross_fwd, hazard_rate=0.02))

    def test_csa_composes_with_the_mesh(self, setup, params):
        """The margin balance is path-local: the meshed CSA profile must
        equal the single-device one on the same injected increments."""
        from finmath_tpu.models.qmc import sobol_brownian_increments
        from finmath_tpu.parallel import make_path_mesh

        paths = 2048
        mesh = make_path_mesh(8)
        sim = setup.model.sim_times
        inc = sobol_brownian_increments(sim[1:] - sim[:-1], 1, paths,
                                        seed=13)
        kw = dict(num_paths=paths, increments=inc,
                  csa=CSA(margin_lag=1),
                  observation_indices=OBS_FWD)
        em = NettingSetExposureEngine(setup.model, TRADES_FWD, mesh=mesh,
                                      **kw)
        es = NettingSetExposureEngine(setup.model, TRADES_FWD, **kw)
        pm, ps = em.profile(params), es.profile(params)
        np.testing.assert_allclose(pm.ee, ps.ee, atol=1e-12)
        np.testing.assert_allclose(pm.ene, ps.ene, atol=1e-12)
        np.testing.assert_allclose(pm.ee_gross, ps.ee_gross, atol=1e-12)
        np.testing.assert_allclose(pm.pfe[0.99], ps.pfe[0.99], atol=1e-12)

    def test_collateral_benefit_requires_csa(self, gross):
        with pytest.raises(ValueError, match="CSA"):
            gross.collateral_benefit

    def test_validation(self, setup):
        with pytest.raises(ValueError, match="thresholds"):
            CSA(threshold=-1.0)
        with pytest.raises(ValueError, match="mta"):
            CSA(mta=-0.1)
        with pytest.raises(ValueError, match="margin_lag"):
            CSA(margin_lag=-1)
        with pytest.raises(TypeError, match="CSA"):
            engine(setup, csa={"threshold": 0.0})

    def test_cva_deltas_guarded_under_csa(self, setup, params):
        eng = engine(setup, CSA(margin_lag=1))
        with pytest.raises(NotImplementedError, match="UNCOLLATERALIZED"):
            eng.cva_forward_deltas(params, hazard_rate=0.02)


class TestFVA:
    def test_zero_spread_zero(self, gross):
        assert fva_from_profile(gross, 0.0) == 0.0

    def test_matches_hand_computed_rectangle_rule(self, gross):
        t = gross.times
        dt = np.diff(np.concatenate([[0.0], t]))
        sb, sl, hc, ho = 0.01, 0.004, 0.02, 0.01
        surv = np.exp(-(hc + ho) * t)
        expect = (np.sum(sb * gross.ee * surv * dt)
                  - np.sum(sl * (-gross.ene) * surv * dt))
        got = fva_from_profile(gross, sb, sl, counterparty_hazard_rate=hc,
                               own_hazard_rate=ho)
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_symmetric_spread_prices_the_forward_value(self, gross):
        """With s_b = s_l = s and no survival weighting, FVA = s * sum
        (EE + ENE) dt = s * time-integral of the forward value."""
        s = 0.007
        t = gross.times
        dt = np.diff(np.concatenate([[0.0], t]))
        expect = s * np.sum((gross.ee + gross.ene) * dt)
        np.testing.assert_allclose(fva_from_profile(gross, s), expect,
                                   rtol=1e-12)

    def test_survival_weighting_shrinks_magnitude(self, gross):
        base = fva_from_profile(gross, 0.01, 0.0)
        weighted = fva_from_profile(gross, 0.01, 0.0,
                                    counterparty_hazard_rate=0.05)
        assert 0.0 < weighted < base

    def test_per_date_spreads(self, gross):
        s = np.linspace(0.01, 0.002, gross.times.shape[0])
        t = gross.times
        dt = np.diff(np.concatenate([[0.0], t]))
        expect = np.sum(s * gross.ee * dt)
        np.testing.assert_allclose(fva_from_profile(gross, s, 0.0),
                                   expect, rtol=1e-12)

    def test_collateral_shrinks_funding(self, setup, params, gross_fwd):
        prof = fwd_engine(setup, CSA(threshold=0.0, threshold_own=np.inf,
                                     margin_lag=1)).profile(params)
        assert (fva_from_profile(prof, 0.01, 0.0)
                < fva_from_profile(gross_fwd, 0.01, 0.0))


class TestDynamicIM:
    @pytest.fixture(scope="class")
    def im(self, setup, params):
        return engine(setup).im_profile(params, quantile=0.99,
                                        mpr=14.0 / 365.0)

    def test_im_nonnegative(self, im):
        assert np.all(im.expected_im >= 0.0)
        assert np.all(im.expected_im_tmoney >= 0.0)
        assert im.peak_im() > 0.0

    def test_discounting_follows_the_curve(self, setup, im):
        """E[IM/N]N(0) vs E[IM] must differ by (approximately) the
        curve's discount factor — on this EUR 2016 curve rates are
        NEGATIVE out to ~5y, so the discounted profile sits ABOVE the
        undiscounted one (df > 1); 'discounting shrinks' is exactly the
        wrong assertion here. The residual wiggle is the IM-numeraire
        correlation, well inside 0.5% at these vols."""
        df = setup.model.discount_curve.get_discount_factor(im.times)
        np.testing.assert_allclose(im.expected_im,
                                   im.expected_im_tmoney * df, rtol=5e-3)
        assert np.all((df > 1.0) == (im.expected_im
                                     > im.expected_im_tmoney))

    def test_monotone_in_quantile(self, setup, params):
        eng = engine(setup)
        lo = eng.im_profile(params, quantile=0.95)
        hi = eng.im_profile(params, quantile=0.99)
        assert np.all(hi.expected_im >= lo.expected_im - 1e-15)
        # the Gaussian map makes the ratio exactly z_99 / z_95
        from statistics import NormalDist
        ratio = NormalDist().inv_cdf(0.99) / NormalDist().inv_cdf(0.95)
        np.testing.assert_allclose(hi.expected_im,
                                   lo.expected_im * ratio, rtol=1e-10)

    def test_brownian_scaling_in_mpr(self, setup, params):
        eng = engine(setup)
        a = eng.im_profile(params, mpr=10.0 / 365.0)
        b = eng.im_profile(params, mpr=40.0 / 365.0)
        np.testing.assert_allclose(b.expected_im, a.expected_im * 2.0,
                                   rtol=1e-10)

    def test_clean_pnl_vanishes_without_volatility(self, setup, params):
        """The discriminating test of the cashflow add-back: with the
        model's volatility scaled to ~0 the forwards are deterministic,
        so CLEAN one-period P&L has no conditional variance — a dirty
        P&L (the value drop when a coupon pays) would NOT vanish."""
        eng = engine(setup)
        p0 = np.asarray(params, dtype=np.float64) * 1e-6
        dead = eng.im_profile(p0)
        live = eng.im_profile(params)
        assert np.max(dead.expected_im_tmoney) \
            < 1e-3 * np.max(live.expected_im_tmoney)

    def test_mva_matches_hand_computed(self, im):
        s, hc = 0.008, 0.03
        surv = np.exp(-hc * im.times)
        expect = np.sum(s * im.expected_im * surv * im.dts)
        got = mva_from_im_profile(im, s, counterparty_hazard_rate=hc)
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_mva_method_consistent(self, setup, params, im):
        got = engine(setup).mva(params, 0.008)
        np.testing.assert_allclose(got, mva_from_im_profile(im, 0.008),
                                   rtol=1e-12)

    def test_validation(self, setup, params):
        eng = engine(setup)
        with pytest.raises(ValueError, match="quantile"):
            eng.im_profile(params, quantile=0.4)
        with pytest.raises(ValueError, match="mpr"):
            eng.im_profile(params, mpr=0.0)
        with pytest.raises(ValueError, match="basis_degree"):
            eng.im_profile(params, basis_degree=0)
        sparse = NettingSetExposureEngine(
            setup.model, TRADES, num_paths=N_PATHS,
            observation_indices=[1, 3, 5])
        with pytest.raises(ValueError, match="consecutive"):
            sparse.im_profile(params)
