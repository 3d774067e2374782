"""Exercise-aware Bermudan exposure, netting, and the regulatory stack
(SA-CCR EAD -> capital -> KVA).

The hard exposure problem: a Bermudan swaption's close-out value depends
on an exercise POLICY. The netting engine fits it by Longstaff-Schwartz
backward induction inside the one fused profile program; every path then
carries its stopping time, post-exercise paths expose the underlying
swap, alive paths the regressed continuation value. The profile feeds
the whole adjustment family: CVA, and — via SA-CCR — the capital profile
and KVA.

Run: python examples/15_bermudan_exposure_kva.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from finmath_tpu.models.curves import par_swap_rate
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.bermudan import (BermudanSwaption,
                                                 BermudanSwaptionPricer)
    from finmath_tpu.models.lmm.exposure import (BermudanSwaptionTrade,
                                                 NettingSetExposureEngine,
                                                 SwapTrade,
                                                 cva_from_profile)
    from finmath_tpu.models.regulatory import (SACCRTrade,
                                               ccr_capital_profile,
                                               cva_capital_profile, kva,
                                               kva_from_capital_profile,
                                               saccr_ead_profile)

    setup = build_atm_calibration(num_paths=20_000, num_factors=1)
    params = setup.covariance.initial_parameters
    model = setup.model
    notional = 1_000_000.0

    # 4Y-into-8Y Bermudan payer swaption, annual exercise, struck at par
    x0, last = 8, 24
    par = float(par_swap_rate(model.forward_curve, model.discount_curve,
                              model.tenor_times[x0:last + 1]))
    exercises = tuple(range(x0, last, 2))         # every year (0.5y grid)
    print(f"underlying par rate: {par * 100:.4f}%  "
          f"exercises at tenor indices {exercises}")

    # -- exposure profile of the Bermudan alone ------------------------
    berm = BermudanSwaptionTrade(exercises, last, par, notional=notional)
    eng = NettingSetExposureEngine(model, [berm], num_paths=20_000,
                                   num_factors=1, seed=42)
    prof = eng.profile(params)
    t = prof.times
    print(f"\nBermudan t=0 value (forward_value[0]): "
          f"{prof.forward_value[0]:,.0f}")

    # cross-check against the dedicated pricer's duality bracket
    pricer = BermudanSwaptionPricer(
        model, BermudanSwaption(exercises, last, par),
        num_paths=20_000, num_factors=1, seed=42)
    lo, hi = pricer.get_value_bounds(params)
    print(f"BermudanSwaptionPricer bracket: [{lo * notional:,.0f}, "
          f"{hi * notional:,.0f}]")

    peak = int(np.argmax(prof.ee))
    print(f"peak EE {prof.ee[peak]:,.0f} at t={t[peak]:.1f}y; "
          f"post-exercise ENE (two-way swap) min {np.min(prof.ene):,.0f}")
    cva = cva_from_profile(prof, hazard_rate=0.02, recovery=0.4)
    print(f"CVA (2% hazard, 40% recovery): {cva:,.0f}")

    # -- netting: Bermudan + offsetting receiver swap ------------------
    nset = NettingSetExposureEngine(
        model, [berm, SwapTrade(x0, last, par, payer=False,
                                notional=notional)],
        num_paths=20_000, num_factors=1, seed=42)
    nprof = nset.profile(params)
    print(f"\nnetting benefit (peak): {np.max(nprof.netting_benefit):,.0f}"
          f"  netted CVA: {cva_from_profile(nprof, hazard_rate=0.02):,.0f}")

    # -- SA-CCR EAD profile -> capital -> KVA ---------------------------
    tenor = model.tenor_times
    trades = [SACCRTrade(notional, float(tenor[x0]), float(tenor[last]),
                         delta=0.6, hedging_set="EUR")]
    ead = saccr_ead_profile(prof, trades)
    cap = (ccr_capital_profile(ead, risk_weight=1.0)
           + cva_capital_profile(ead, t, maturity=float(tenor[last])))
    print(f"\nSA-CCR EAD at first obs: {ead[0]:,.0f}; "
          f"peak capital: {np.max(cap):,.0f}")
    k = kva_from_capital_profile(t, cap, cost_of_capital=0.10,
                                 counterparty_hazard_rate=0.02)
    print(f"KVA (10% cost of capital): {k:,.0f}")
    print(f"one-call kva(): {kva(prof, trades, counterparty_hazard_rate=0.02):,.0f}")


if __name__ == "__main__":
    main()
