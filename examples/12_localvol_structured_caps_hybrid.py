"""Round-3 capability tour: Dupire local volatility from an SSVI
surface, autocallable notes, target redemption notes on Hull-White,
caplet-volatility stripping feeding the LMM, and the hybrid asset-LMM
(equity/FX/quanto under stochastic rates).

Run: python examples/12_localvol_structured_caps_hybrid.py   (CPU or TPU)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATHS = 200_000


def local_vol():
    from finmath_tpu.models.analytic import black_implied_volatility
    from finmath_tpu.models.local_vol import (
        LocalVolatilityModel, MonteCarloLocalVolModel, SSVISurface,
        european_call_values)
    from finmath_tpu.models.time_discretization import TimeDiscretization

    surf = SSVISurface(sigma0=0.22, sigma_inf=0.20, tau=2.0, rho=-0.65,
                       eta=1.2)
    surf.validate(t_max=3.0)          # calendar + butterfly arbitrage check
    td = TimeDiscretization(initial=0.0, num_steps=100, step=0.01)
    model = LocalVolatilityModel(100.0, 0.03, surf, td)
    mc = MonteCarloLocalVolModel(td, PATHS, model, seed=7)
    strikes = [80.0, 90.0, 100.0, 110.0, 120.0]
    out = np.asarray(european_call_values(mc, strikes, [1.0]))
    fwd, df = 100.0 * math.exp(0.03), math.exp(-0.03)
    print("[local vol] strike   SSVI-in   MC-round-trip")
    for j, k in enumerate(strikes):
        iv = black_implied_volatility(fwd, k, 1.0, float(out[0, j, 0]) / df)
        target = float(surf.implied_volatility(math.log(k / fwd), 1.0))
        print(f"[local vol] {k:6.1f}   {target:.4f}    {iv:.4f}"
              f"   ({abs(iv - target) * 1e4:.1f} bp)")


def structured():
    from finmath_tpu.models.black_scholes import (
        BlackScholesModel, MonteCarloBlackScholesModel)
    from finmath_tpu.models.structured_products import (
        AutocallableNote, autocallable_value_single_observation)
    from finmath_tpu.models.time_discretization import TimeDiscretization

    td = TimeDiscretization(initial=0.0, num_steps=10, step=0.1)
    sim = MonteCarloBlackScholesModel(td, PATHS,
                                      BlackScholesModel(100.0, 0.03, 0.25),
                                      seed=31)
    note = AutocallableNote(observation_dates=[0.5, 1.0],
                            autocall_levels=[105.0, 100.0],
                            coupons=[0.05, 0.08], protection_level=70.0)
    v, e = note.get_value_and_error(sim)
    an = autocallable_value_single_observation(
        100.0, 0.03, 0.25, 0.5, 1.0, autocall_level=105.0, coupon1=0.05,
        final_coupon_level=100.0, final_coupon=0.08, protection_level=70.0)
    print(f"[autocall]  MC {v:.5f} +- {e:.5f} vs bivariate closed {an:.5f}")

    memory = AutocallableNote(
        observation_dates=[0.2, 0.4, 0.6, 1.0],
        autocall_levels=[110.0] * 4, coupon_levels=[85.0] * 4,
        coupons=[0.02] * 4, protection_level=60.0, memory=True)
    v_mem, _ = memory.get_value_and_error(sim)
    print(f"[autocall]  4-date memory-coupon note: {v_mem:.5f}")


def tarn():
    from finmath_tpu.models.curves import DiscountCurve
    from finmath_tpu.models.hull_white import (HullWhiteModel,
                                               HullWhiteSimulation)
    from finmath_tpu.models.tarn import (TargetRedemptionNote,
                                         inverse_floater_value)
    from finmath_tpu.models.time_discretization import TimeDiscretization

    ts = np.array([0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0])
    zr = np.array([0.012, 0.014, 0.017, 0.019, 0.022, 0.024, 0.026])
    curve = DiscountCurve(list(ts), list(np.exp(-zr * ts)))
    model = HullWhiteModel(curve, 0.10, 0.011)
    td = TimeDiscretization(initial=0.0, num_steps=9, step=0.5)
    sim = HullWhiteSimulation(model, td, num_paths=PATHS, seed=13,
                              antithetic=True)
    fix = [0.5 * i for i in range(1, 9)]
    pay = [f + 0.5 for f in fix]
    uncapped = TargetRedemptionNote(fix, pay, 0.045, target=float("inf"),
                                    multiplier=2.0)
    v, e = uncapped.get_value_and_error(sim)
    an = inverse_floater_value(model, fix, pay, 0.045, multiplier=2.0)
    print(f"[TARN]      uncapped MC {v:.6f} +- {e:.1e} vs floorlet "
          f"portfolio {an:.6f}")
    for tgt in (0.10, 0.05, 0.02):
        vt, _ = TargetRedemptionNote(fix, pay, 0.045, target=tgt,
                                     multiplier=2.0).get_value_and_error(sim)
        print(f"[TARN]      target {tgt:.2f}: {vt:.6f}")


def caps():
    from finmath_tpu.models.caps import (
        cap_value, implied_flat_cap_volatility, make_cap_schedule,
        strip_caplet_volatilities)
    from finmath_tpu.models.curves import DiscountCurve, ForwardCurve

    ts = np.array([0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0, 12.0])
    zr = np.array([0.015, 0.017, 0.020, 0.022, 0.025, 0.027, 0.029, 0.030])
    dc = DiscountCurve(list(ts), list(np.exp(-zr * ts)))
    fc = ForwardCurve(dc, payment_offset=0.5)
    mats = np.array([1.0, 2.0, 3.0, 5.0, 7.0, 10.0])
    flats = np.array([0.44, 0.41, 0.37, 0.31, 0.27, 0.24])
    t0 = time.time()
    curve = strip_caplet_volatilities(dc, fc, mats, flats, 0.03, 0.5)
    wall = (time.time() - t0) * 1e3
    print(f"[caps]      stripped {len(mats)} maturities in {wall:.1f} ms "
          f"(host f64): {np.round(curve.volatilities, 4)}")
    for m, f in zip(mats[:3], flats[:3]):
        fx = make_cap_schedule(float(m), 0.5)
        tgt = cap_value(dc, fc, fx, 0.5, 0.03, float(f))
        got = cap_value(dc, fc, fx, 0.5, 0.03,
                        curve.get_caplet_volatility(fx))
        iv = implied_flat_cap_volatility(got, dc, fc, fx, 0.5, 0.03)
        print(f"[caps]      {m:4.1f}Y cap: quote {f:.2%} -> repriced flat "
              f"vol {iv:.2%} (price dev {abs(got - tgt):.2e})")


def hybrid():
    from finmath_tpu.models.analytic import black_formula
    from finmath_tpu.models.caps import (CapletVolatilityCurve,
                                         LIBORVolatilityModelFromCapletCurve)
    from finmath_tpu.models.curves import DiscountCurve, ForwardCurve
    from finmath_tpu.models.lmm.covariance import (
        LIBORCorrelationModelExponentialDecay,
        LIBORCovarianceModelFromVolatilityAndCorrelation)
    from finmath_tpu.models.lmm.hybrid import HybridAssetLMM
    from finmath_tpu.models.lmm.model import LIBORMarketModelTPU
    from finmath_tpu.models.time_discretization import TimeDiscretization

    ts = np.array([0.5, 1.0, 2.0, 3.0, 5.0])
    zr = np.array([0.045, 0.047, 0.050, 0.051, 0.052])
    dc = DiscountCurve(list(ts), list(np.exp(-zr * ts)))
    fc = ForwardCurve(dc, payment_offset=0.5)
    td = TimeDiscretization(initial=0.0, num_steps=10, step=0.5)
    vm = LIBORVolatilityModelFromCapletCurve(
        td, td, CapletVolatilityCurve([5.0], [0.40]))
    cov = LIBORCovarianceModelFromVolatilityAndCorrelation(
        vm, LIBORCorrelationModelExponentialDecay(td, 1))
    model = LIBORMarketModelTPU(td, fc, dc, cov, measure="spot",
                                state_space="lognormal")
    p0 = np.zeros(0)

    h = HybridAssetLMM(model, [100.0], [0.20], rate_correlations=[0.5],
                       num_paths=PATHS, num_factors=1, seed=11,
                       antithetic=True)
    v, se = h.european_option_value(p0, 6, 105.0)
    errs = h.martingale_errors(p0)
    print(f"[hybrid]    equity call under stochastic rates (rho=0.5): "
          f"{v:.4f} +- {se:.4f}; max martingale err "
          f"{np.nanmax(np.abs(errs)):.1e}")

    tf = np.linspace(0, 5, 11)
    fc_f = DiscountCurve(list(tf[1:]), list(np.exp(-0.02 * tf[1:])))
    rho, sig_s, sig_x = 0.6, 0.25, 0.12
    hq = HybridAssetLMM(
        model, [1.25, 80.0], [sig_x, sig_s],
        dividend_yields=[fc_f, 0.01], growth_curves=[None, fc_f],
        quanto_fx_indices=[None, 0],
        equity_correlation=[[1.0, rho], [rho, 1.0]],
        num_paths=PATHS, num_factors=1, seed=29, antithetic=True)
    fx_fwd, se_fx = hq.forward_value(p0, 6, asset_index=0)
    print(f"[hybrid]    FX forward (covered interest parity): "
          f"{fx_fwd:.6f} vs {1.25 * math.exp(-0.02 * 3.0):.6f}")
    vq, seq = hq.european_option_value(p0, 6, 82.0, asset_index=1)
    fq = 80.0 * math.exp((0.02 - 0.01 - rho * sig_s * sig_x) * 3.0)
    an = black_formula(fq, 82.0, sig_s, 3.0,
                       payoff_unit=float(dc.get_discount_factor(3.0)))
    print(f"[hybrid]    quanto call: MC {vq:.4f} +- {seq:.4f} vs closed "
          f"form {an:.4f}")


if __name__ == "__main__":
    for step in (local_vol, structured, tarn, caps, hybrid):
        t0 = time.time()
        step()
        print(f"--- {step.__name__}: {time.time() - t0:.1f} s\n")
