"""Round-3 capability tour, part 3: inflation (Jarrow-Yildirim),
commodities (Schwartz-Smith), and the market-risk engine.

Run: python examples/14_inflation_commodity_risk.py   (CPU or TPU)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATHS = 200_000


def inflation():
    from finmath_tpu.models import (HullWhiteModel, JarrowYildirimModel,
                                    JarrowYildirimSimulation,
                                    TimeDiscretization)
    from finmath_tpu.models.curves import DiscountCurve

    t = np.arange(0.0, 21.0)
    nominal = HullWhiteModel(DiscountCurve(t, np.exp(-0.03 * t)), 0.1, 0.01)
    real = HullWhiteModel(DiscountCurve(t, np.exp(-0.01 * t)), 0.2, 0.006)
    jy = JarrowYildirimModel(nominal, real, cpi_initial=100.0,
                             cpi_vol=0.012, rho_nr=0.3, rho_ni=0.1,
                             rho_ri=-0.3)
    print(f"[infl]  ZCIS par rates: "
          + ", ".join(f"{T:.0f}y {jy.zcis_par_rate(T):.4%}"
                      for T in (2.0, 5.0, 10.0)))
    k = jy.yoy_swap_par_rate(np.arange(1.0, 11.0))
    print(f"[infl]  10y YoY swap par rate {k:.4%} (convexity-corrected)")
    naive = float(real.df(5.0) / real.df(4.0)
                  * nominal.df(4.0) / nominal.df(5.0))
    print(f"[infl]  YoY fwd 4y-5y {jy.yoy_forward(4.0, 5.0):.6f} vs "
          f"naive ratio {naive:.6f} (the JY convexity correction)")
    td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
    sim = JarrowYildirimSimulation(jy, td, num_paths=PATHS, seed=3)
    mc, se = sim.mc_yoy_forward(4.0, 5.0)
    print(f"[infl]  exact MC confirms: {mc:.6f} +- {se:.6f}")
    for strike in (0.01, 0.03):
        an = jy.yoy_caplet(4.0, 5.0, strike)
        mc_c, se_c = sim.mc_yoy_caplet(4.0, 5.0, strike)
        print(f"[infl]  YoY caplet k={strike:.0%}: analytic {an:.6f} "
              f"MC {mc_c:.6f} +- {se_c:.6f}")


def commodity():
    from finmath_tpu.models import (SchwartzSmithModel,
                                    SchwartzSmithSimulation,
                                    TimeDiscretization)

    m = SchwartzSmithModel(chi0=0.1, xi0=math.log(60.0), kappa=1.5,
                           sigma_chi=0.35, sigma_xi=0.15, rho=0.3,
                           mu_star=0.01, lambda_chi=0.05)
    mats = np.array([0.25, 0.5, 1.0, 2.0, 5.0])
    print("[cmdty] futures curve:",
          ", ".join(f"{T}y {float(m.futures_price(T)):.2f}"
                    for T in mats))
    # Samuelson: near futures are the most volatile
    vols = [math.sqrt(m.log_futures_variance(0.25, 0.25 + u) / 0.25)
            for u in (0.0, 1.0, 4.0)]
    print(f"[cmdty] 3m-horizon futures vols by maturity gap 0/1/4y: "
          + "/".join(f"{v:.1%}" for v in vols) + " (Samuelson)")
    td = TimeDiscretization(initial=0.0, num_steps=24, step=1 / 12)
    sim = SchwartzSmithSimulation(m, td, num_paths=PATHS, seed=2)
    pr, se = sim.mc_option_on_future(1.0, 2.0, [55.0, 65.0], 0.97)
    for k, p, s in zip((55.0, 65.0), pr, se):
        print(f"[cmdty] option on F(1,2) K={k}: MC {p:.4f} +- {s:.4f} "
              f"vs Black {m.option_on_future(1.0, 2.0, k, 0.97):.4f}")
    sp, spe = sim.mc_calendar_spread(1.0, 1.5, 2.0, 0.0, 0.97)
    print(f"[cmdty] calendar spread (1.5y vs 2y): MC {sp:.4f} +- "
          f"{spe:.4f} vs Margrabe "
          f"{m.calendar_spread_margrabe(1.0, 1.5, 2.0, 0.97):.4f}")


def risk():
    from finmath_tpu.models import (MarketRiskEngine, OptionBook,
                                    kupiec_pvalue)

    book = OptionBook(spots=[100.0, 50.0], rate=0.02,
                      underlying_index=[0, 0, 1, 1],
                      strikes=[100.0, 110.0, 50.0, 45.0],
                      expiries=[0.5, 1.0, 0.25, 1.0],
                      vols=[0.2, 0.22, 0.3, 0.28],
                      notionals=[100.0, -50.0, 80.0, 40.0],
                      is_call=[True, True, True, False])
    cov = np.array([[0.04, 0.012], [0.012, 0.09]])
    eng = MarketRiskEngine(book, horizon=1 / 252)
    rep = eng.parametric_mc(cov, num_scenarios=PATHS, quantile=0.99,
                            seed=5, vol_covariance=np.diag([0.5, 0.5]))
    print(f"[risk]  1-day VaR99 {rep.var:.2f} +- {rep.stderr_var:.2f}, "
          f"ES {rep.expected_shortfall:.2f} (full revaluation, spot+vol "
          "shocks)")
    names = ["call 100", "call 110 (short)", "call 50", "put 45"]
    for n, c in zip(names, rep.component_es):
        print(f"[risk]    ES component {n}: {c:+.2f}")
    dn = eng.delta_normal_var(cov, 0.99)
    print(f"[risk]  delta-normal control {dn:.2f} (long-gamma book "
          "prices below it)")
    print(f"[risk]  Kupiec p-value for 10 breaches / 1000 days: "
          f"{kupiec_pvalue(10, 1000, 0.99):.3f} (model accepted)")


if __name__ == "__main__":
    for step in (inflation, commodity, risk):
        t0 = time.time()
        step()
        print(f"--- {step.__name__}: {time.time() - t0:.1f} s\n")
