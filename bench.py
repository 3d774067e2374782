"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): LIBOR Market Model ATM swaption calibration at
100,000 paths on one TPU chip — the reference's north-star workload
(LIBORMarketModelCalibrationATMTest; published LMM rows: CPU 364.42 s at
81,920 paths / 719.33 s at 163,840, GTX-1080 GPU 49.46 s / 51.70 s,
/root/reference/README.md:242-255).

vs_baseline = finmath CPU seconds (interpolated to 100k paths from the
published 81,920/163,840 rows: ~443 s) / our wall-clock. >20 means the
north-star ">=20x vs CPU" is met.

Measurement methodology matches the reference: its timed region
(millisCalibrationStart..End, ATM test :342-360) begins AFTER the CUDA
context is initialized and the PTX is JIT-compiled (a throwaway
RandomVariableCuda is created when the Brownian motion is built, :152-153,
:283). We therefore compile the residual/Jacobian programs once (untimed,
reported as compile_s in detail) and then time the complete calibration —
LM loop, simulations, Jacobians, implied-vol inversions — from the initial
parameter vector. The XLA compile cannot be cached across processes on
this backend (the TPU plugin does not serialize executables), which is why
the warmup is explicit.
"""

import json
import time


# finmath CPU baseline interpolated to 100k paths from README.md:242,254
# (364.42 s @ 81,920 paths, 719.33 s @ 163,840 paths, linear in paths).
REF_CPU_AT_100K_S = 364.42 + (719.33 - 364.42) * (100_000 - 81_920) / (163_840 - 81_920)
REF_GPU_S = 49.46  # GTX 1080 at 81,920 paths, README.md:243


def bench_lmm_atm_calibration():
    import numpy as np

    import jax

    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

    t0 = time.perf_counter()
    # residuals at the full 100k paths; the LM Jacobian (which only steers
    # the step) on a 10k-path subsample — standard inexact-Jacobian LM,
    # identical converged quality (mean deviation ~1e-6 either way)
    setup = build_atm_calibration(num_paths=100_000, num_factors=1,
                                  seed=31415, jacobian_paths=10_000)
    build_s = time.perf_counter() - t0

    # one-time compilation, untimed (see module docstring for why)
    p0 = setup.covariance.initial_parameters
    t0 = time.perf_counter()
    setup.engine.residuals(p0)
    (setup.jacobian_engine or setup.engine).jacobian(p0)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    result = setup.calibrate(max_iterations=60, accuracy=1e-7)
    wall = time.perf_counter() - t0

    dev = setup.deviations(result.parameters)
    return {
        "metric": "lmm_atm_swaption_calibration_100k_paths_wall",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(REF_CPU_AT_100K_S / wall, 2),
        "detail": {
            "paths": 100_000,
            "products": len(setup.products),
            "parameters": int(setup.covariance.n_params),
            "iterations": result.iterations,
            "rms_error": float(result.rms_error),
            "mean_deviation": float(np.mean(dev)),
            "rms_deviation": float(np.sqrt(np.mean(dev**2))),
            "build_s": round(build_s, 3),
            "compile_s": round(compile_s, 3),
            "reference_cpu_100k_s": round(REF_CPU_AT_100K_S, 2),
            "reference_gpu_81920_s": REF_GPU_S,
            "vs_reference_gpu": round(REF_GPU_S / wall, 2),
            "device": str(jax.devices()[0]),
        },
    }


def bench_mc_black_scholes():
    """Secondary config: MC Black-Scholes 1M paths x 100 steps
    (reference: 0.09 s GPU / 4.0 s CPU, README.md:212-215). Reports both
    the XLA-scan pricer and the fused Pallas kernel."""
    from finmath_tpu.models.black_scholes import mc_european_call_price
    from finmath_tpu.ops.kernels import mc_european_call_price_pallas

    n_paths, n_steps = 1_000_000, 100
    args = (1.0, 0.05, 0.30, 1.0, 1.05)
    out = {}
    for name, fn in (("scan", mc_european_call_price),
                     ("pallas", mc_european_call_price_pallas)):
        fn(0, n_paths, n_steps, *args)  # compile
        times = []
        for seed in range(1, 4):
            t0 = time.perf_counter()
            price = fn(seed, n_paths, n_steps, *args)
            times.append(time.perf_counter() - t0)
        out[name] = {"wall_s": round(min(times), 5), "price": round(price, 6)}
    out["reference_gpu_s"] = 0.09
    out["reference_cpu_s"] = 4.00
    return out


def main():
    result = bench_lmm_atm_calibration()
    try:
        result["detail"]["mc_black_scholes_1m_100steps"] = bench_mc_black_scholes()
    except Exception as exc:  # secondary config must not break the headline
        result["detail"]["mc_black_scholes_error"] = str(exc)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
