"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (matches BASELINE.md): Monte-Carlo valuation throughput on one TPU
chip vs the reference's published GPU numbers. Until the LMM calibration
stack lands, the headline is the MC Black-Scholes European call at 1M paths
x 100 Euler steps, which the reference benchmarks at 0.09 s on a GTX 1080
(/root/reference/README.md:215) and 4.00 s on CPU (:212).

vs_baseline is the speedup over the reference's published GPU time for the
same workload (>1.0 means faster than the reference GPU).
"""

import json
import sys
import time


def bench_mc_black_scholes():
    import jax

    from finmath_tpu.models.black_scholes import mc_european_call_price

    n_paths, n_steps = 1_000_000, 100
    args = (1.0, 0.05, 0.30, 1.0, 1.05)

    # warm up / compile
    mc_european_call_price(0, n_paths, n_steps, *args)

    times = []
    for seed in range(1, 6):
        t0 = time.perf_counter()
        price = mc_european_call_price(seed, n_paths, n_steps, *args)
        times.append(time.perf_counter() - t0)
    wall = min(times)

    ref_gpu_s = 0.09   # README.md:215, GTX 1080, same workload
    return {
        "metric": "mc_black_scholes_1m_paths_100_steps_wall",
        "value": round(wall, 5),
        "unit": "s",
        "vs_baseline": round(ref_gpu_s / wall, 2),
        "detail": {
            "price": round(price, 6),
            "paths": n_paths,
            "steps": n_steps,
            "reference_gpu_s": ref_gpu_s,
            "reference_cpu_s": 4.00,
            "device": str(jax.devices()[0]),
        },
    }


def main():
    result = bench_mc_black_scholes()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
