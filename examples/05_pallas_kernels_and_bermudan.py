"""Capabilities beyond the reference: Pallas path kernels + Bermudan LS.

Run: python examples/05_pallas_kernels_and_bermudan.py

1. The fused Black-Scholes Pallas kernel (whole Euler sweep VMEM-resident,
   hardware PRNG + Box-Muller on-core) vs the XLA-scan pricer and the
   analytic value. On the reference's GPU this workload took 0.09 s; the
   kernel's on-chip time is ~2.3 ms (BENCHMARKS.md).
2. The VMEM-resident LMM swaption kernel vs the differentiable scan
   engine (statistical agreement — different RNG streams).
3. A Bermudan swaption via on-device Longstaff-Schwartz regression — the
   reference CANNOT run this on GPU (its choose() returns null,
   RandomVariableCuda.java:1631-1635).

Note: on CPU the hardware-PRNG kernels are skipped (the Pallas
interpreter does not honor prng_seed); run on a TPU to see them.
"""

import os
import sys

# allow running straight from a source checkout (inserts the repo root;
# harmless when the package is pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    # the Pallas kernels are TPU-only (TPU memory spaces + PRNG
    # primitives); a GPU backend must not take this branch
    on_tpu = jax.devices()[0].platform == "tpu"

    # ---- 1. BS kernel vs scan vs analytic ---------------------------
    from finmath_tpu.models.analytic import black_scholes_option_value
    from finmath_tpu.models.black_scholes import mc_european_call_price

    S0, R, SIGMA, T, K = 1.0, 0.05, 0.30, 1.0, 1.05
    analytic = black_scholes_option_value(S0, R, SIGMA, T, K)
    v_scan = mc_european_call_price(7, 1_000_000, 100, S0, R, SIGMA, T, K)
    print(f"analytic {analytic:.6f} | XLA scan {v_scan:.6f}")
    if on_tpu:
        from finmath_tpu.ops.kernels import mc_european_call_price_pallas

        v_kernel = mc_european_call_price_pallas(7, 1_000_000, 100,
                                                 S0, R, SIGMA, T, K)
        print(f"Pallas kernel {v_kernel:.6f} (1M paths x 100 steps on-core)")
        assert abs(v_kernel - analytic) < 0.005

    # ---- 2. LMM swaption kernel vs scan engine ----------------------
    if on_tpu:
        import jax.numpy as jnp

        from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
        from finmath_tpu.models.lmm.model import (LMMValuationEngine,
                                                  SwaptionProduct)
        from finmath_tpu.ops.lmm_kernel import lmm_swaption_kernel

        a = build_atm_calibration(num_paths=256, num_factors=1)
        cov = a.model.covariance
        p0 = np.asarray(cov.initial_parameters)
        prep = cov.prepare(jnp.asarray(p0))
        vol1 = np.asarray(cov.vol_table(prep)) \
            * np.asarray(cov.factor_matrix(prep))[:, 0][None, :]
        e, m = 10, 20
        strike = next(p.strike for p in a.products
                      if p.exercise_index == e and p.num_periods == m)
        eng = LMMValuationEngine(
            a.model, [SwaptionProduct(e, m, strike, 0.0, value_unit="VALUE")],
            204_800, 1, 99)
        v_eng = float(eng.values(p0)[0])
        v_k = float(lmm_swaption_kernel(
            7, 204_800, a.model.num_libors, e, m, e, vol1,
            np.asarray(a.model.initial_forwards), np.asarray(a.model.deltas),
            0.5, strike))
        print(f"LMM 5Yx10Y swaption: engine {v_eng:.6f} | kernel {v_k:.6f} "
              f"(rel dev {abs(v_k - v_eng) / v_eng:.3%}, different streams)")

    # ---- 3. Bermudan swaption (Longstaff-Schwartz) ------------------
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.bermudan import (BermudanSwaption,
                                                 BermudanSwaptionPricer)

    setup = build_atm_calibration(num_paths=50_000, num_factors=1)
    p0 = setup.covariance.initial_parameters
    euro = BermudanSwaptionPricer(
        setup.model, BermudanSwaption((8,), 20, 0.01), 50_000, 1).get_value(p0)
    berm = BermudanSwaptionPricer(
        setup.model, BermudanSwaption((4, 8, 12, 16), 20, 0.01), 50_000, 1
    ).get_value(p0)
    print(f"payer swaption 4Yx6Y strike 1%: European {euro:.6f} | "
          f"Bermudan (4 rights) {berm:.6f}")
    assert berm >= euro - 1e-4  # more rights are worth more


if __name__ == "__main__":
    main()
