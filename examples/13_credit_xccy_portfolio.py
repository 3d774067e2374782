"""Round-3 capability tour, part 2: the credit and multi-currency
layers — CDS bootstrap, CIR++ doubly-stochastic default intensity,
wrong-way-risk CVA (joint Hull-White x CIR++ simulation), the exact
two-economy cross-currency model (FX options under stochastic rates,
CCS par identities), and one-factor copula portfolio credit (CDO
tranches, kth-to-default) at index scale.

Run: python examples/13_credit_xccy_portfolio.py   (CPU or TPU)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATHS = 200_000

T_GRID = np.arange(0.0, 31.0)


def _curves():
    from finmath_tpu.models.curves import DiscountCurve
    dc_d = DiscountCurve(T_GRID, np.exp(-0.03 * T_GRID))
    dc_f = DiscountCurve(T_GRID, np.exp(-0.01 * T_GRID))
    return dc_d, dc_f


def single_name_credit():
    from finmath_tpu.models import (CIRPPIntensityModel, CIRPPSimulation,
                                    TimeDiscretization,
                                    bootstrap_survival_curve,
                                    cds_par_spread, cds_value)
    dc, _ = _curves()
    mats = [1.0, 3.0, 5.0, 7.0, 10.0]
    spreads = [0.006, 0.009, 0.012, 0.014, 0.016]
    curve = bootstrap_survival_curve(dc, mats, spreads, recovery=0.4)
    worst = max(abs(cds_value(dc, curve, m, s))
                for m, s in zip(mats, spreads))
    print(f"[cds]      bootstrapped 5 quotes; worst reprice {worst:.1e}; "
          f"hazards {np.round(curve.hazards * 1e4).astype(int)} bp")
    print(f"[cds]      4y par spread (interpolated credit): "
          f"{1e4 * cds_par_spread(dc, curve, 4.0, recovery=0.4):.1f} bp")

    intensity = CIRPPIntensityModel(curve, kappa=0.5, theta=0.015,
                                    sigma=0.08, y0=0.01)
    td = TimeDiscretization(initial=0.0, num_steps=40, step=0.25)
    sim = CIRPPSimulation(intensity, td, num_paths=PATHS, seed=7,
                          antithetic=True, substeps=4)
    for t in (5.0, 10.0):
        print(f"[cir++]    E[S({t:.0f}y)] = {sim.expected_survival(t):.6f}"
              f" vs market {float(curve.get_survival_probability(t)):.6f}"
              " (doubly-stochastic martingale)")
    return dc, curve, intensity


def wrong_way_cva(dc, intensity):
    from finmath_tpu.models import (HullWhiteModel, WrongWayRiskCVAEngine,
                                    par_swap_rate)
    hw = HullWhiteModel(dc, mean_reversion=0.1, volatility=0.01)
    pay = np.arange(1, 21) * 0.5
    k = par_swap_rate(dc, pay)
    print(f"[wwr]      10y semiannual par payer swap, K = {k:.4%}")
    for rho in (0.0, 0.6, -0.6):
        eng = WrongWayRiskCVAEngine(hw, intensity, pay, k,
                                    num_paths=PATHS, correlation=rho,
                                    recovery=0.4, seed=31,
                                    antithetic=True, substeps=4)
        r = eng.compute()
        print(f"[wwr]      rho={rho:+.1f}: CVA {1e4 * r.cva:.2f} bp "
              f"(vs independent {1e4 * r.cva_independent:.2f} bp, "
              f"ratio {r.wwr_ratio:.3f})")


def cross_currency(dc_d, dc_f):
    from finmath_tpu.models import (CrossCurrencyModel,
                                    CrossCurrencySimulation,
                                    HullWhiteModel, TimeDiscretization)
    m = CrossCurrencyModel(HullWhiteModel(dc_d, 0.1, 0.01),
                           HullWhiteModel(dc_f, 0.05, 0.008),
                           fx_spot=1.25, fx_vol=0.10, rho_df=0.3,
                           rho_dx=-0.2, rho_fx=0.25)
    td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
    sim = CrossCurrencySimulation(m, td, num_paths=PATHS, seed=5,
                                  antithetic=True)
    d = sim.martingale_diagnostics(5.0, 10.0)
    print(f"[xccy]     covered interest parity rel err "
          f"{abs(d['covered_parity'][0] / d['covered_parity'][1] - 1):.1e}"
          " (exact joint transitions)")
    strikes = [1.0, 1.25, 1.5]
    _, prices, se = sim.mc_fx_option_prices(5.0, strikes)
    for k, p, s in zip(strikes, prices, se):
        cf = m.fx_option(5.0, k)
        print(f"[xccy]     5y FX call K={k}: MC {p:.5f} +- {s:.5f} vs "
              f"hump-vol closed form {cf:.5f}")
    dom, fgn = sim.mc_ccs_legs(np.arange(1, 11) * 1.0)
    print(f"[xccy]     CCS legs: domestic {dom:.5f} (par 1), foreign/X0 "
          f"{fgn / 1.25:.5f} (par 1)")


def portfolio_credit(dc):
    from finmath_tpu.models import (GaussianCopulaPortfolio,
                                    GaussianCopulaSimulation,
                                    SurvivalCurve,
                                    lhp_expected_tranche_loss)
    rng = np.random.default_rng(1)
    hazards = rng.uniform(0.005, 0.06, 125)
    betas = rng.uniform(0.3, 0.7, 125)
    pf = GaussianCopulaPortfolio(
        [SurvivalCurve([0.0], [h]) for h in hazards], betas=betas,
        recoveries=0.4, notionals=np.full(125, 1 / 125))
    for a, d in ((0.0, 0.03), (0.03, 0.07), (0.07, 0.15)):
        s = pf.tranche_par_spread(dc, a, d, 5.0)
        print(f"[cdo]      {a:.0%}-{d:.0%} tranche 5y par spread "
              f"{1e4 * s:.0f} bp (exact recursion)")
    sim = GaussianCopulaSimulation(pf, num_paths=PATHS, seed=7)
    st = sim.tranche_statistics([5.0], 0.03, 0.07, ks=(1, 10))
    ex = pf.expected_tranche_loss(5.0, 0.03, 0.07)
    print(f"[cdo]      MC 3-7% ETL(5y) {st['etl'][0]:.6f} +- "
          f"{st['etl_stderr'][0]:.6f} vs exact {ex:.6f}")
    hom = GaussianCopulaPortfolio([SurvivalCurve([0.0], [0.02])] * 200,
                                  betas=0.5, notionals=1 / 200)
    pd5 = float(1 - math.exp(-0.02 * 5.0))
    print(f"[cdo]      200-name exact vs Vasicek LHP: "
          f"{hom.expected_tranche_loss(5.0, 0.03, 0.07):.6f} vs "
          f"{lhp_expected_tranche_loss(pd5, 0.5, 0.03, 0.07):.6f}")


if __name__ == "__main__":
    t0 = time.time()
    dc, curve, intensity = single_name_credit()
    print(f"--- single_name_credit: {time.time() - t0:.1f} s\n")
    for step, args in ((wrong_way_cva, (dc, intensity)),
                       (cross_currency, _curves()),
                       (portfolio_credit, (dc,))):
        t0 = time.time()
        step(*args)
        print(f"--- {step.__name__}: {time.time() - t0:.1f} s\n")
