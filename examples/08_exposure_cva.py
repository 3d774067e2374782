"""Counterparty exposure profiles and CVA on the LIBOR Market Model.

The exposure collector rides the SAME fused simulation as the pricer: one
device program produces EE(t) / ENE(t) / PFE quantiles at every tenor date
plus the CVA integral — no per-observation re-simulation.

Run: python examples/08_exposure_cva.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.exposure import SwapExposureEngine

    # the ATM workload's 40Y EUR model (bootstrapped curves + piecewise
    # vol); exposure of a 2Y-forward-starting 8Y payer swap struck at par
    setup = build_atm_calibration(num_paths=20_000, num_factors=1)
    params = setup.covariance.initial_parameters

    from finmath_tpu.models.curves import par_swap_rate

    model = setup.model
    par = par_swap_rate(model.forward_curve, model.discount_curve,
                        model.tenor_times[4:21])
    print(f"par rate of the underlying swap: {par * 100:.4f}%")

    engine = SwapExposureEngine(
        setup.model, first_index=4, last_index=20, strike=par,
        payer=True, notional=1_000_000.0, num_paths=20_000,
        num_factors=1, quantiles=(0.95, 0.99))

    prof = engine.profile(params)
    analytic = engine.analytic_forward_values()

    print(f"{'t':>5} {'EE':>12} {'ENE':>12} {'fwd value':>12} "
          f"{'analytic':>12} {'PFE 95%':>12} {'PFE 99%':>12}")
    for i, t in enumerate(prof.times):
        print(f"{t:5.1f} {prof.ee[i]:12.0f} {prof.ene[i]:12.0f} "
              f"{prof.forward_value[i]:12.0f} {analytic[i]:12.0f} "
              f"{prof.pfe[0.95][i]:12.0f} {prof.pfe[0.99][i]:12.0f}")

    print(f"\npeak EE {np.max(prof.ee):,.0f} at t={prof.times[np.argmax(prof.ee)]}")
    print(f"peak PFE(99%) {prof.max_pfe(0.99):,.0f}")
    print(f"martingale check: max |fwd - analytic| = "
          f"{np.max(np.abs(prof.forward_value - analytic)):,.1f} "
          f"(Monte-Carlo error on a {engine.notional:,.0f} notional)")

    # unilateral CVA against a 120 bp flat-hazard counterparty, 40% recovery
    for h in (0.004, 0.012, 0.03):
        cva = engine.cva(params, hazard_rate=h, recovery=0.4)
        print(f"CVA @ hazard {h * 1e4:5.0f} bp: {cva:12,.0f}")

    # ---- netting set: offsetting trades share one close-out value -------
    from finmath_tpu.models.lmm.exposure import (NettingSetExposureEngine,
                                                 SwapTrade)

    netting = NettingSetExposureEngine(
        model,
        trades=[
            SwapTrade(4, 20, par, payer=True, notional=1_000_000.0),
            SwapTrade(2, 12, 0.002, payer=False, notional=700_000.0),
            SwapTrade(6, 16, 0.004, payer=True, notional=300_000.0),
        ],
        num_paths=20_000, num_factors=1)
    nprof = netting.profile(params)
    print("\nnetting set (3 trades):")
    print(f"  peak netted EE     {np.max(nprof.ee):12,.0f}")
    print(f"  peak standalone EE {np.max(nprof.ee_standalone):12,.0f}")
    print(f"  peak netting benefit {np.max(nprof.netting_benefit):10,.0f}")
    print(f"  netted CVA @120bp  "
          f"{netting.cva(params, hazard_rate=0.012):12,.0f}")

    # ---- CVA delta ladder: one reverse pass, all curve buckets ----------
    cva, ladder = netting.cva_forward_deltas(params, hazard_rate=0.012)
    hot = int(np.argmax(np.abs(ladder)))
    print(f"  CVA delta ladder ({ladder.shape[0]} buckets, one reverse "
          f"pass): hottest bucket T={model.tenor_times[hot]:.1f}y "
          f"dCVA/dL0 = {ladder[hot]:,.0f}")

    # ---- mixed netting set: swaps + swaptions share one close-out -------
    from finmath_tpu.models.lmm.exposure import (SwaptionTrade,
                                                 bilateral_cva_from_profile)

    k10 = par_swap_rate(model.forward_curve, model.discount_curve,
                        model.tenor_times[10:21])
    mixed = NettingSetExposureEngine(
        model,
        trades=[
            SwapTrade(4, 20, par, payer=True, notional=1_000_000.0),
            SwaptionTrade(10, 10, float(k10), notional=600_000.0,
                          physical=True),
            SwaptionTrade(6, 6, 0.004, notional=-400_000.0,
                          physical=False),
        ],
        num_paths=20_000, num_factors=1)
    mprof = mixed.profile(params)
    print("\nmixed netting set (swap + long physical swaption + short "
          "cash swaption):")
    print(f"  peak netted EE {np.max(mprof.ee):12,.0f}   "
          f"peak benefit {np.max(mprof.netting_benefit):10,.0f}")
    print(f"  bilateral CVA (cpty 200bp / own 80bp): "
          f"{bilateral_cva_from_profile(mprof, 0.02, 0.008):10,.0f}")

    # ---- swaption exposure: conditional value by LS regression ----------
    from finmath_tpu.models.lmm.exposure import SwaptionExposureEngine

    x, m_per = 10, 10
    k_sw = par_swap_rate(model.forward_curve, model.discount_curve,
                         model.tenor_times[x:x + m_per + 1])
    sw = SwaptionExposureEngine(model, x, m_per, float(k_sw), physical=True,
                                notional=1_000_000.0, num_paths=20_000,
                                num_factors=1)
    sprof = sw.profile(params)
    ev_x = sw._ev_x
    print(f"\n5Y-into-5Y payer swaption (physical): value "
          f"{sprof.forward_value[ev_x]:,.0f}")
    print(f"  EE at first obs / expiry / after exercise: "
          f"{sprof.ee[0]:,.0f} / {sprof.ee[ev_x]:,.0f} / "
          f"{sprof.ee[ev_x + 1]:,.0f}")
    print(f"  post-exercise ENE (two-way swap): {sprof.ene[-1]:,.0f}")


if __name__ == "__main__":
    main()
