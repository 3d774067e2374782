"""Model-family zoo: Heston, Bates SVJ, Heston-SLV, Merton,
Variance-Gamma, Bachelier / displaced-lognormal, Hull-White and
American Longstaff-Schwartz — the
asset-model and short-rate families finmath-lib ships around the
reference repo, each as ONE fused jitted pricing program with a
host-f64 analytic oracle alongside.

Run: python examples/09_model_zoo.py         (CPU or TPU; auto-detects)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STRIKES = np.array([80.0, 90.0, 100.0, 110.0, 125.0])


def timed(fn, *args, **kw):
    fn(*args, **kw)                       # warm the compile
    t0 = time.time()
    out = fn(*args, **kw)
    return out, time.time() - t0


def heston():
    from finmath_tpu.models import (HestonParams, calibrate_heston,
                                    heston_characteristic_prices,
                                    mc_heston_european_prices)
    p = HestonParams(100.0, 0.03, v0=0.04, kappa=1.5, theta=0.05,
                     xi=0.6, rho=-0.7)
    ref = heston_characteristic_prices(p, 1.5, STRIKES)
    (px, fwd, _), wall = timed(mc_heston_european_prices, p, 1.5, STRIKES,
                               num_paths=500_000, num_steps=64,
                               scheme="qe", antithetic=True)
    print(f"[heston]   QE-M 500k x 64: {wall*1e3:6.0f} ms   "
          f"max rel dev vs CF {np.abs(px - ref).max() / ref.min():.2e}   "
          f"fwd err {fwd - 100:+.3f}")
    res = calibrate_heston(100.0, 0.03, [0.5, 1.5], [STRIKES, STRIKES],
                           [heston_characteristic_prices(p, t, STRIKES)
                            for t in (0.5, 1.5)])
    print(f"[heston]   surface calibration: rms {res.rms_price_error:.2e} "
          f"in {res.iterations} LM iterations")


def merton():
    from finmath_tpu.models import (MertonParams, mc_merton_european_prices,
                                    merton_series_prices)
    p = MertonParams(100.0, 0.05, 0.2, jump_intensity=0.6,
                     jump_size_mean=-0.15, jump_size_std=0.25)
    ref = merton_series_prices(p, 1.0, STRIKES)
    (px, fwd), wall = timed(mc_merton_european_prices, p, 1.0, STRIKES,
                            num_paths=500_000, num_steps=16,
                            antithetic=True)
    print(f"[merton]   jump-diffusion 500k x 16: {wall*1e3:6.0f} ms   "
          f"max rel dev vs series {np.abs(px - ref).max() / ref.min():.2e}")


def variance_gamma():
    from finmath_tpu.models import (VarianceGammaParams,
                                    mc_vg_european_prices,
                                    vg_analytic_prices)
    p = VarianceGammaParams(100.0, 0.04, sigma=0.18, theta=-0.14, nu=0.25)
    ref = vg_analytic_prices(p, 1.25, STRIKES)
    (px, fwd), wall = timed(mc_vg_european_prices, p, 1.25, STRIKES,
                            num_paths=500_000, num_steps=16,
                            antithetic=True)
    print(f"[vg]       gamma-subordinated 500k x 16: {wall*1e3:6.0f} ms   "
          f"max rel dev vs Fourier {np.abs(px - ref).max() / ref.min():.2e}")


def bachelier_and_displaced():
    from finmath_tpu.models import (BachelierParams,
                                    DisplacedLognormalParams,
                                    bachelier_analytic_price,
                                    displaced_analytic_price,
                                    mc_bachelier_european_prices,
                                    mc_displaced_european_prices)
    b = BachelierParams(100.0, 0.03, volatility=15.0)
    ks = np.array([-20.0, 80.0, 100.0, 120.0])     # negative strike!
    (px, _), wall = timed(mc_bachelier_european_prices, b, 1.25, ks,
                          num_paths=2_000_000, antithetic=True)
    ref = bachelier_analytic_price(b, 1.25, ks)
    print(f"[bachelier] exact-terminal 2M: {wall*1e3:6.0f} ms   "
          f"max abs dev {np.abs(px - ref).max():.4f} "
          "(incl. strike -20)")
    d = DisplacedLognormalParams(100.0, 0.03, 0.2, displacement=30.0)
    (px, _), wall = timed(mc_displaced_european_prices, d, 1.25, STRIKES,
                          num_paths=2_000_000, antithetic=True)
    ref = displaced_analytic_price(d, 1.25, STRIKES)
    print(f"[displaced] shifted-Black 2M: {wall*1e3:6.0f} ms   "
          f"max rel dev {(np.abs(px - ref) / ref).max():.2e}")


def hull_white():
    from finmath_tpu.models import HullWhiteModel, HullWhiteSimulation
    from finmath_tpu.models.curves import DiscountCurve
    from finmath_tpu.models.time_discretization import TimeDiscretization
    pil = np.array([0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0, 15.0, 20.0])
    zeros = np.array([0.010, 0.012, 0.015, 0.017, 0.020, 0.022, 0.024,
                      0.025, 0.0255])
    curve = DiscountCurve(list(pil), list(np.exp(-zeros * pil)))
    m = HullWhiteModel(curve, 0.12, [0.010, 0.014, 0.008],
                       vol_times=[0.0, 2.0, 5.0])
    td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
    sim = HullWhiteSimulation(m, td, num_paths=500_000, seed=7,
                              antithetic=True)
    got = sim.mc_bond_price(10.0)
    want = float(m.df(10.0))
    pts = [3.0, 3.5, 4.0, 4.5, 5.0]
    mc, wall = timed(sim.mc_swaption_price, 2.0, pts, 0.02)
    an = m.swaption(2.0, pts, 0.02)
    print(f"[hullwhite] curve fit E[1/N(10y)]: rel {(got-want)/want:+.1e}"
          f"   swaption MC vs Jamshidian: rel "
          f"{(mc-an)/an:+.1e} ({wall*1e3:.0f} ms)")


def american():
    from finmath_tpu.models import BermudanOption, crr_american_price
    from finmath_tpu.models.black_scholes import (
        BlackScholesModel, MonteCarloBlackScholesModel)
    from finmath_tpu.models.time_discretization import TimeDiscretization
    td = TimeDiscretization(initial=0.0, num_steps=50, step=0.02)
    sim = MonteCarloBlackScholesModel(td, 500_000,
                                      BlackScholesModel(100.0, 0.05, 0.3),
                                      seed=77)
    opt = BermudanOption([i * 0.02 for i in range(1, 51)], 110.0,
                         is_call=False)
    (v_err), wall = timed(opt.get_value_and_error, sim)
    v, err = v_err
    crr = crr_american_price(100.0, 0.05, 0.3, 1.0, 110.0, is_call=False)
    print(f"[american] LS put 500k x 50 dates: {wall*1e3:6.0f} ms   "
          f"LS {v:.4f}+-{err:.4f} vs CRR {crr:.4f}")


def bates():
    from finmath_tpu.models import (BatesParams,
                                    bates_characteristic_prices,
                                    mc_bates_european_prices)
    p = BatesParams(100.0, 0.03, v0=0.04, kappa=1.5, theta=0.05,
                    xi=0.6, rho=-0.7, jump_intensity=0.6,
                    jump_size_mean=-0.12, jump_size_std=0.18)
    cf = bates_characteristic_prices(p, 1.5, STRIKES)
    (px_fwd_ev), wall = timed(mc_bates_european_prices, p, 1.5, STRIKES,
                              num_paths=500_000, num_steps=96,
                              antithetic=True)
    px, fwd, _ = px_fwd_ev
    print(f"[bates]    SVJ MC 500k x 96:      {wall*1e3:6.0f} ms   "
          f"max |MC/CF-1| {np.abs(px/cf-1).max():.2e}  fwd dev "
          f"{fwd-100.0:+.3f}")


def slv():
    from finmath_tpu.models import (HestonParams, HestonSLVModel,
                                    MonteCarloHestonSLVModel)
    from finmath_tpu.models.local_vol import (SSVISurface,
                                              european_call_values)
    from finmath_tpu.models.time_discretization import TimeDiscretization
    surf = SSVISurface(sigma0=0.22, sigma_inf=0.20, tau=2.0, rho=-0.65,
                       eta=0.6, gamma=0.4)
    hp = HestonParams(100.0, 0.03, v0=0.04, kappa=1.5, theta=0.06,
                      xi=0.8, rho=-0.7)
    td = TimeDiscretization(initial=0.0, num_steps=100, step=0.01)
    model = HestonSLVModel(hp, surf, td)
    seeds = iter(range(31, 40))

    def run():
        mc = MonteCarloHestonSLVModel(td, 200_000, model,
                                      seed=next(seeds))
        return european_call_values(mc, [90.0, 100.0, 110.0], [1.0])

    out, wall = timed(run)
    from finmath_tpu.models.analytic import black_implied_volatility
    import math
    fwd, df = 100.0 * math.exp(0.03), math.exp(-0.03)
    devs = [black_implied_volatility(fwd, k, 1.0, out[0, j, 0] / df)
            - float(surf.implied_volatility(np.log(k / fwd), 1.0))
            for j, k in enumerate([90.0, 100.0, 110.0])]
    print(f"[slv]      particle 200k x 100:   {wall*1e3:6.0f} ms   "
          f"smile round-trip max |dIV| {max(abs(d) for d in devs)*1e4:.0f} bp"
          " (vol-of-vol on)")


if __name__ == "__main__":
    import jax
    print("devices:", jax.devices())
    heston()
    bates()
    slv()
    merton()
    variance_gamma()
    bachelier_and_displaced()
    hull_white()
    american()
