"""Exotic product layer: path-dependent payoffs (digital, Asian,
barrier, lookback) over any equity facade, multi-asset rainbows
(exchange / Margrabe, best-of / Stulz, basket, spread / Kirk) over the
correlated-GBM facade, and the SABR smile (Hagan vols + MC +
calibration). Every product is ONE fused jitted program with one
packed (value, stderr) transfer, validated against an independent
closed form or a same-stream no-arbitrage identity.

Run: python examples/10_exotics_and_rainbows.py   (CPU or TPU)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

S0, R, SIG, T = 100.0, 0.05, 0.3, 1.0
N_PATHS = 500_000


def timed(fn):
    fn()
    t0 = time.time()
    out = fn()
    return out, (time.time() - t0) * 1e3


def path_dependent():
    from finmath_tpu.models import (AsianOption, BarrierOption,
                                    DigitalOption, LookbackOption)
    from finmath_tpu.models.analytic import (
        barrier_option_value, digital_option_value,
        geometric_asian_option_value, lookback_floating_strike_value)
    from finmath_tpu.models.black_scholes import (
        BlackScholesModel, EuropeanOption, MonteCarloBlackScholesModel)
    from finmath_tpu.models.time_discretization import TimeDiscretization

    n = 250
    td = TimeDiscretization(initial=0.0, num_steps=n, step=T / n)
    sim = MonteCarloBlackScholesModel(td, N_PATHS,
                                      BlackScholesModel(S0, R, SIG),
                                      seed=42)

    (v, e), ms = timed(lambda: DigitalOption(T, 105.0)
                       .get_value_and_error(sim))
    print(f"[digital]   {v:.5f} +- {e:.5f}   closed form "
          f"{digital_option_value(S0, R, SIG, T, 105.0):.5f}   {ms:.0f} ms")

    dates = [round((i + 1) * T / 12 / (T / n)) * (T / n) for i in range(12)]
    (vp, ep), _ = timed(lambda: AsianOption(dates, 100.0)
                        .get_value_and_error(sim))
    (vc, ec), ms = timed(lambda: AsianOption(
        dates, 100.0, control_variate="geometric")
        .get_value_and_error(sim))
    print(f"[asian]     plain {vp:.4f} +- {ep:.4f}  |  geometric-CV "
          f"{vc:.4f} +- {ec:.4f}  ({ep/ec:.0f}x stderr reduction, "
          f"geo oracle {geometric_asian_option_value(S0, R, SIG, dates, 100.0):.4f})   {ms:.0f} ms")

    (v, e), ms = timed(lambda: BarrierOption(
        T, 100.0, 130.0, "up-out", monitoring="bridge")
        .get_value_and_error(sim))
    an = barrier_option_value(S0, R, SIG, T, 100.0, 130.0, "up-out")
    print(f"[barrier]   up-out bridge {v:.5f} +- {e:.5f}   continuous "
          f"closed form {an:.5f}   {ms:.0f} ms")
    vi = BarrierOption(T, 100.0, 130.0, "up-in").get_value(sim)
    vo = BarrierOption(T, 100.0, 130.0, "up-out").get_value(sim)
    ve = EuropeanOption(T, 100.0).get_value(sim)
    print(f"            same-stream in+out parity: {vi+vo:.6f} vs "
          f"vanilla {ve:.6f}")

    (v, e), ms = timed(lambda: LookbackOption(T, "floating-call")
                       .get_value_and_error(sim))
    an = lookback_floating_strike_value(S0, R, SIG, T, True)
    print(f"[lookback]  floating call {v:.4f} +- {e:.4f}   continuous "
          f"GSG {an:.4f} (discrete < continuous by ~beta1*sig*sqrt(dt)*S)"
          f"   {ms:.0f} ms")


def rainbows():
    from finmath_tpu.models import (BasketOption, ExchangeOption,
                                    MonteCarloMultiAssetBlackScholesModel,
                                    MultiAssetBlackScholesModel,
                                    RainbowOption, SpreadOption)
    from finmath_tpu.models.multi_asset import (
        geometric_basket_option_value, kirk_spread_approximation,
        margrabe_exchange_value, stulz_rainbow_value)
    from finmath_tpu.models.time_discretization import TimeDiscretization

    s0 = [100.0, 95.0, 105.0]
    vols = [0.25, 0.35, 0.2]
    corr = [[1.0, 0.4, 0.2], [0.4, 1.0, 0.5], [0.2, 0.5, 1.0]]
    t = 1.5
    td = TimeDiscretization(initial=0.0, num_steps=30, step=t / 30)
    sim = MonteCarloMultiAssetBlackScholesModel(
        td, N_PATHS, MultiAssetBlackScholesModel(s0, R, vols, corr),
        seed=11)

    (v, e), ms = timed(lambda: ExchangeOption(t, 0, 1)
                       .get_value_and_error(sim))
    print(f"[exchange]  S1 for S2: {v:.4f} +- {e:.4f}   Margrabe "
          f"{margrabe_exchange_value(s0[0], s0[1], vols[0], vols[1], 0.4, t):.4f}   {ms:.0f} ms")

    (v, e), ms = timed(lambda: RainbowOption(
        t, 100.0, "call-on-min", asset_indices=[0, 1])
        .get_value_and_error(sim))
    an = stulz_rainbow_value(s0[0], s0[1], R, vols[0], vols[1], 0.4, t,
                             100.0, "call-on-min")
    print(f"[rainbow]   call-on-min(2): {v:.4f} +- {e:.4f}   Stulz "
          f"{an:.4f}   {ms:.0f} ms")
    v3 = RainbowOption(t, 100.0, "call-on-max").get_value(sim)
    print(f"            call-on-max over all 3 assets: {v3:.4f}")

    w = [0.4, 0.3, 0.3]
    (v, e), ms = timed(lambda: BasketOption(
        t, w, 100.0, control_variate="geometric")
        .get_value_and_error(sim))
    print(f"[basket]    arithmetic w/ geometric CV: {v:.4f} +- {e:.4f}"
          f"   (geo oracle "
          f"{geometric_basket_option_value(s0, R, vols, corr, w, t, 100.0):.4f})   {ms:.0f} ms")

    (v, e), ms = timed(lambda: SpreadOption(t, 10.0)
                       .get_value_and_error(sim))
    print(f"[spread]    K=10: {v:.4f} +- {e:.4f}   Kirk approx "
          f"{kirk_spread_approximation(s0[0], s0[1], R, vols[0], vols[1], 0.4, t, 10.0):.4f}   {ms:.0f} ms")


def sabr():
    from finmath_tpu.models import (SABRParams, calibrate_sabr,
                                    mc_sabr_implied_vols,
                                    sabr_lognormal_implied_volatility)

    f, t = 0.03, 2.0
    p = SABRParams(alpha=0.035, beta=0.5, rho=-0.3, nu=0.4)
    ks = np.array([0.02, 0.025, 0.03, 0.04])
    hagan = [sabr_lognormal_implied_volatility(p, f, k, t) for k in ks]
    mc, ms = timed(lambda: mc_sabr_implied_vols(
        p, f, t, ks, num_paths=N_PATHS, num_steps=64, seed=5))
    print(f"[sabr]      Hagan  {np.round(hagan, 4)}")
    print(f"            MC     {np.round(mc, 4)}   ({ms:.0f} ms)")
    fit = calibrate_sabr(f, t, ks, mc, beta=0.5)
    print(f"            refit of the MC smile: alpha {fit.params.alpha:.4f} "
          f"rho {fit.params.rho:+.3f} nu {fit.params.nu:.3f} "
          f"(true 0.035 / -0.300 / 0.400), rms {fit.rms_vol_error:.1e}")


if __name__ == "__main__":
    import jax
    print(f"devices: {jax.devices()}\n")
    path_dependent()
    print()
    rainbows()
    print()
    sabr()
