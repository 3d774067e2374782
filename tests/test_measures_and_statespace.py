"""Measure / state-space / simulation-grid switches of the LMM engine.

finmath exposes these as LIBORMarketModelFromCovarianceModel properties
("measure" SPOT|TERMINAL, "stateSpace" NORMAL|LOGNORMAL, ATM test
:311-314) and allows a simulation grid finer than the tenor grid; the
reference workloads only exercise SPOT+NORMAL on the tenor grid, so these
tests pin the additional semantics:

* cross-measure consistency — the same swaption prices the same (within
  Monte-Carlo error) under the spot and the terminal measure;
* LOGNORMAL state space — a one-period swaption (caplet) under log-Euler
  with constant volatility reprices the Black formula;
* a finer simulation grid changes only the discretization error.
"""

import numpy as np
import pytest

from finmath_tpu.models.analytic import black_formula
from finmath_tpu.models.curves import (DiscountCurveFromForwardCurve,
                                       ForwardCurveFromForwards,
                                       par_swap_rate)
from finmath_tpu.models.lmm.covariance import (
    LIBORCorrelationModelExponentialDecay,
    LIBORCovarianceModelFromVolatilityAndCorrelation,
    LIBORVolatilityModelPiecewiseConstant,
)
from finmath_tpu.models.lmm.model import (LIBORMarketModelTPU,
                                          LMMValuationEngine,
                                          SwaptionProduct)
from finmath_tpu.models.time_discretization import TimeDiscretization

HORIZON, DT = 5.0, 0.5
FLAT_FORWARD = 0.025


def _setup(measure="spot", state_space="normal", sim_dt=None, vol=0.30,
           products=None, num_paths=60_000, seed=4242):
    n = int(HORIZON / DT)
    fc = ForwardCurveFromForwards(
        np.arange(0.0, HORIZON + DT, DT),
        np.full(int(HORIZON / DT) + 1, FLAT_FORWARD), DT)
    dc = DiscountCurveFromForwardCurve(fc, horizon=HORIZON)
    libor_td = TimeDiscretization(initial=0.0, num_steps=n, step=DT)
    sim_td = (TimeDiscretization(initial=0.0,
                                 num_steps=int(HORIZON / sim_dt), step=sim_dt)
              if sim_dt else libor_td)
    vol_model = LIBORVolatilityModelPiecewiseConstant(
        sim_td, libor_td, time_grid=np.asarray([0.0]),
        maturity_grid=np.asarray([0.0]), initial_volatility=vol)
    corr = LIBORCorrelationModelExponentialDecay(libor_td, 1, decay=0.0)
    cov = LIBORCovarianceModelFromVolatilityAndCorrelation(vol_model, corr)
    model = LIBORMarketModelTPU(
        libor_td, fc, dc, cov, measure=measure, state_space=state_space,
        use_numeraire_adjustment=False, simulation_td=sim_td)
    if products is None:
        tenor = model.tenor_times
        strike = par_swap_rate(fc, dc, tenor[4:9])
        products = [SwaptionProduct(4, 4, strike, 0.0, value_unit="VALUE")]
    engine = LMMValuationEngine(model, products, num_paths, 1, seed)
    return model, engine


class TestMeasures:
    def test_spot_vs_terminal_same_price(self):
        """Same payoff, same covariance, same paths count: the measure is
        an implementation detail of the numeraire — prices must agree
        within Monte-Carlo error (finmath Measure.SPOT/TERMINAL)."""
        _, eng_spot = _setup(measure="spot")
        _, eng_term = _setup(measure="terminal")
        p0 = np.asarray([0.30])
        v_spot = float(eng_spot.values(p0)[0])
        v_term = float(eng_term.values(p0)[0])
        # both are MC estimates with ~0.5-1% relative stderr at 60k paths
        assert v_term == pytest.approx(v_spot, rel=0.04)

    def test_terminal_measure_zero_bond_consistency(self):
        """Under the terminal measure, E[1/P(T_e, T_n)] * P(0, T_n) must
        reprice P(0, T_e) (the numeraire-adjustment identity)."""
        import jax

        model, eng = _setup(measure="terminal")
        p0 = np.asarray([0.30])
        vals, mean_inv = jax.jit(eng._simulate_and_value)(p0)
        e = eng.products[0].exercise_index
        df_e = float(model.discount_curve.get_discount_factor(
            float(model.tenor_times[e])))
        assert float(mean_inv[0]) == pytest.approx(df_e, rel=0.01)


class TestLognormalStateSpace:
    def test_caplet_reprices_black(self):
        """One-period swaption under LOGNORMAL state space with constant
        sigma is (up to the frozen-drift discretization) a Black caplet."""
        n = int(HORIZON / DT)
        fc = ForwardCurveFromForwards(
            np.arange(0.0, HORIZON + DT, DT),
            np.full(n + 1, FLAT_FORWARD), DT)
        dc = DiscountCurveFromForwardCurve(fc, horizon=HORIZON)
        e = 6
        strike = FLAT_FORWARD
        products = [SwaptionProduct(e, 1, strike, 0.0, value_unit="VALUE")]
        _, eng = _setup(state_space="lognormal", products=products,
                        num_paths=200_000)
        sigma = 0.30
        v = float(eng.values(np.asarray([sigma]))[0])
        t_e = e * DT
        fwd = FLAT_FORWARD
        df_pay = float(dc.get_discount_factor(t_e + DT))
        analytic = DT * df_pay * black_formula(fwd, strike, sigma, t_e)
        assert v == pytest.approx(analytic, rel=0.02)

    def test_lognormal_forwards_stay_positive(self):
        """exp state space cannot cross zero (unlike NORMAL)."""
        products = [SwaptionProduct(4, 2, FLAT_FORWARD, 0.0,
                                    value_unit="VALUE")]
        _, eng = _setup(state_space="lognormal", products=products,
                        num_paths=5_000, vol=0.8)
        v = float(eng.values(np.asarray([0.8]))[0])
        assert np.isfinite(v) and v > 0


class TestFinerSimulationGrid:
    def test_finer_grid_consistent_price(self):
        """dt=0.25 simulation on a dt=0.5 tenor grid: same product, price
        differs only by discretization + MC error."""
        _, eng_coarse = _setup()
        _, eng_fine = _setup(sim_dt=0.25)
        p0 = np.asarray([0.30])
        v_c = float(eng_coarse.values(p0)[0])
        v_f = float(eng_fine.values(p0)[0])
        assert v_f == pytest.approx(v_c, rel=0.05)

    def test_tenor_must_refine_simulation(self):
        with pytest.raises(ValueError, match="simulation grid"):
            _setup(sim_dt=0.4)  # 0.5-tenor points not on the 0.4 grid

    def test_vol_table_grid_mismatch_rejected(self):
        """Covariance built on the tenor grid + engine on a finer grid is
        a configuration error the engine must name."""
        n = int(HORIZON / DT)
        fc = ForwardCurveFromForwards(
            np.arange(0.0, HORIZON + DT, DT), np.full(n + 1, FLAT_FORWARD), DT)
        dc = DiscountCurveFromForwardCurve(fc, horizon=HORIZON)
        libor_td = TimeDiscretization(initial=0.0, num_steps=n, step=DT)
        sim_td = TimeDiscretization(initial=0.0, num_steps=n * 2, step=DT / 2)
        vol_model = LIBORVolatilityModelPiecewiseConstant(
            libor_td, libor_td, np.asarray([0.0]), np.asarray([0.0]), 0.3)
        corr = LIBORCorrelationModelExponentialDecay(libor_td, 1, 0.0)
        cov = LIBORCovarianceModelFromVolatilityAndCorrelation(vol_model, corr)
        model = LIBORMarketModelTPU(libor_td, fc, dc, cov,
                                    use_numeraire_adjustment=False,
                                    simulation_td=sim_td)
        eng = LMMValuationEngine(
            model, [SwaptionProduct(4, 2, FLAT_FORWARD, 0.0,
                                    value_unit="VALUE")], 1_000, 1)
        with pytest.raises(ValueError, match="simulation"):
            eng.values(np.asarray([0.3]))
