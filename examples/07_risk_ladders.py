"""AAD risk ladders: bucketed portfolio deltas w.r.t. the initial
forward curve from ONE reverse-mode pass through the full LMM Euler
sweep (drift, local/stochastic vol, payoff, numeraire).

The reference's AAD route for these numbers is finmath-lib's host-side
tape (RandomVariableDifferentiableAAD) over ~10^5 eagerly dispatched
device ops per valuation; here the whole pathwise adjoint is one fused
XLA program with jax.checkpoint bounding live memory to the per-step
[forwards, numeraire, variance] carries.

Run: python examples/07_risk_ladders.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def portfolio_ladder():
    """Equal-weight ATM swaption portfolio: value + all dV/dL_i(0)."""
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

    setup = build_atm_calibration(num_paths=20_000, num_factors=1, seed=3141)
    eng = setup.engine
    p0 = np.asarray(setup.covariance.initial_parameters)

    t0 = time.time()
    value, ladder = eng.forward_deltas(p0)     # one fwd + one bwd pass
    cold = time.time() - t0
    t0 = time.time()
    value, ladder = eng.forward_deltas(p0)
    warm = time.time() - t0

    print(f"portfolio of {len(eng.products)} swaptions, "
          f"{eng.model.num_libors} curve buckets")
    print(f"value {value:.6f}; ladder cold {cold:.1f}s warm {warm*1e3:.0f}ms")
    top = np.argsort(-np.abs(ladder))[:5]
    for i in top:
        print(f"  bucket {i:2d} (T={eng.model.tenor_times[i]:5.1f}y): "
              f"dV/dL = {ladder[i]:+.4f}")


def per_product_matrix():
    """[products, buckets] delta matrix — vmapped one-hot portfolios."""
    from finmath_tpu.models.lmm.benchmark_calibration import (
        build_benchmark_calibration,
    )

    setup = build_benchmark_calibration(num_paths=8_192, seed=7)
    eng = setup.engine
    p0 = np.asarray(setup.covariance.initial_parameters)

    M = eng.forward_delta_matrix(p0)           # P backward passes, one program
    _, g = eng.forward_deltas(p0)
    # f32 production engine: the vmapped one-hot rows and the single
    # equal-weight pass reduce in different orders, so agreement is at
    # f32 resolution here (bitwise at f64 — tests/test_risk_ladders.py)
    print(f"\nstoch-vol benchmark: delta matrix {M.shape}, "
          f"rows sum to portfolio ladder: "
          f"{np.allclose(M.sum(axis=0), g, rtol=1e-4, atol=1e-6)}")

    # hedging view: which bucket carries each product's risk
    for p in (0, 7, 14):
        i = int(np.argmax(np.abs(M[p])))
        print(f"  product {p:2d}: dominant bucket {i} "
              f"(dV/dL = {M[p, i]:+.5f})")


if __name__ == "__main__":
    portfolio_ladder()
    per_product_matrix()
