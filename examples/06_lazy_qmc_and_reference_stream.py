"""Round-3 capabilities: lazy-eager execution, quasi-Monte-Carlo paths,
the reference's bit-exact Brownian realization, and Bermudan bounds.

Run: python examples/06_lazy_qmc_and_reference_stream.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def lazy_eager():
    """Record eager ops, flush ONE fused program — the eager API without
    the per-op dispatch cost (ops/lazy.py)."""
    from finmath_tpu import (RandomVariableTPU, RandomVariableTPULazy,
                             averages)

    x = np.random.default_rng(0).uniform(0.5, 2.0, 100_000).astype(np.float32)
    lazy = RandomVariableTPULazy(0.0, x)

    # nothing dispatches here — the chain is recorded
    y = lazy.mult(1.01).add(0.02).exp().log().discount(lazy, 0.5)
    print("pending:", repr(y))
    # the reduction flushes one fused program and returns the f64 mean
    print("average:", y.get_average())

    # portfolio idiom: many products, ONE device round trip
    chains = [lazy.mult(k).exp().cap(3.0) for k in (0.5, 0.7, 0.9)]
    print("portfolio averages (one flush):", averages(*chains))

    # strict and lazy interoperate through finmath type priorities
    strict = RandomVariableTPU(0.0, x)
    mixed = strict.mult(2.0).add(lazy.exp())
    print("mixed strict/lazy type:", type(mixed).__name__)


def reference_realization():
    """Price on the EXACT Brownian realization the reference benchmark
    used — its host-Mersenne stream reconstructed bit-exactly and
    injected into the jitted engine (models/brownian_motion.py +
    LMMValuationEngine(increments=...))."""
    from finmath_tpu.models.lmm.benchmark_calibration import (
        build_benchmark_calibration)

    setup = build_benchmark_calibration(num_paths=4096,
                                        brownian="finmath_mersenne")
    x0 = setup.covariance.initial_parameters
    vols = setup.engine.implied_vols(x0)
    print("implied vols on finmath's own 4096-path realization:",
          np.round(vols[:5], 4))


def quasi_monte_carlo():
    """Scrambled Sobol + Brownian bridge (models/qmc.py): the terminal
    level of every path rides the best-stratified Sobol dimension."""
    from finmath_tpu.models.qmc import sobol_brownian_increments

    dts = np.full(16, 1.0 / 16)
    inc = sobol_brownian_increments(dts, 1, 4096, seed=7)
    w_T = inc.sum(axis=0)[0]
    print("QMC terminal variance (want 1.0):", round(float(w_T.var()), 5))

    from finmath_tpu.models.lmm.benchmark_calibration import (
        build_benchmark_calibration)

    setup = build_benchmark_calibration(num_paths=4096, brownian="sobol",
                                        antithetic=True)
    vols = setup.engine.implied_vols(setup.covariance.initial_parameters)
    print("stoch-vol quotes on QMC paths:", np.round(vols[:5], 4))


def bermudan_bounds():
    """Longstaff-Schwartz point estimate bracketed from both sides:
    out-of-sample policy (low) and Haugh-Kogan dual (high)."""
    from finmath_tpu.models.curves import par_swap_rate
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.bermudan import (BermudanSwaption,
                                                 BermudanSwaptionPricer)

    setup = build_atm_calibration(num_paths=8192, num_factors=1)
    model = setup.model
    strike = par_swap_rate(model.forward_curve, model.discount_curve,
                           model.tenor_times[8:17])
    pricer = BermudanSwaptionPricer(
        model, BermudanSwaption((8, 10, 12), 16, strike), 8192, 1)
    p0 = setup.covariance.initial_parameters
    v = pricer.get_value(p0)
    lo, hi = pricer.get_value_bounds(p0)
    print(f"Bermudan LS value {v:.6f}, bounds [{lo:.6f}, {hi:.6f}], "
          f"duality gap {hi - lo:.2e}")


def realization_swapping_and_aot():
    """Round 4: injected realizations are a traced ARGUMENT of the
    compiled programs — set_increments swaps the Sobol scrambling (or
    any same-shape stream) with ZERO recompilation, which is what makes
    multi-realization calibration and bootstrap resampling cheap; and
    export_aot/load_aot persist the lowered programs so a fresh process
    skips tracing + lowering entirely."""
    import tempfile
    import time

    import numpy as np

    from finmath_tpu.models.lmm.benchmark_calibration import (
        build_benchmark_calibration)
    from finmath_tpu.models.qmc import sobol_brownian_increments

    setup = build_benchmark_calibration(num_paths=4096, brownian="sobol",
                                        seed=0)
    p0 = setup.covariance.initial_parameters
    v0 = setup.engine.values(p0)
    t0 = time.perf_counter()
    for k in (1, 2, 3):     # three more scramblings, one compiled program
        setup.set_increments(np.asarray(sobol_brownian_increments(
            np.full(40, 0.5), setup.engine._n_rng_factors, 4096, seed=k)))
        vk = setup.engine.values(p0)
        print(f"scrambling {k}: first quote {vk[0]:.6f} "
              f"(vs {v0[0]:.6f} on scrambling 0)")
    print(f"3 realization swaps + revaluations: "
          f"{time.perf_counter() - t0:.2f} s, no retrace")

    with tempfile.TemporaryDirectory() as d:
        n = setup.export_aot(d)
        fresh = build_benchmark_calibration(num_paths=4096,
                                            brownian="sobol", seed=0)
        loaded = fresh.load_aot(d)
        print(f"AOT: exported {n} programs; fresh setup loaded={loaded} "
              f"(tracing + lowering skipped)")


if __name__ == "__main__":
    lazy_eager()
    reference_realization()
    quasi_monte_carlo()
    bermudan_bounds()
    realization_swapping_and_aot()
