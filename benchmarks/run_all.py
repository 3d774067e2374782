"""Measure all five BASELINE.json configurations on the current device and
write BENCHMARKS.md. Run from the repo root: python benchmarks/run_all.py

Methodology: warm-start timing (one untimed compile pass), matching the
reference's timed regions (see bench.py docstring).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timed(fn, *args, repeats=3):
    fn(*args)  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        times.append(time.perf_counter() - t0)
    return min(times), out


def config_1_elementwise():
    """RandomVariable elementwise ops + getAverage on a 100k-path vector."""
    import jax

    from finmath_tpu import RandomVariableTPU

    rng = np.random.default_rng(0)
    x = RandomVariableTPU(0.0, rng.random(100_000).astype(np.float32))
    y = RandomVariableTPU(0.0, (rng.random(100_000) + 0.5).astype(np.float32))

    def chain():
        z = x.mult(y).add(0.5).exp().discount(y, 0.5).add_product(x, y)
        return z.get_average()

    wall, avg = timed(chain, repeats=5)
    return {"name": "RandomVariable eager op chain (6 ops) + getAverage, 100k paths",
            "wall_s": round(wall, 5), "value": round(avg, 6)}


def config_2_bs():
    from finmath_tpu.models.black_scholes import mc_european_call_price
    from finmath_tpu.ops.kernels import mc_european_call_price_pallas

    args = (1_000_000, 100, 1.0, 0.05, 0.30, 1.0, 1.05)
    w1, p1 = timed(lambda: mc_european_call_price(1, *args))
    w2, p2 = timed(lambda: mc_european_call_price_pallas(1, *args))
    return {"name": "MC Black-Scholes European call, 1M paths x 100 steps",
            "scan_wall_s": round(w1, 5), "pallas_wall_s": round(w2, 5),
            "price": round(p1, 6),
            "reference": {"cpu_s": 4.00, "gpu_s": 0.09}}


def config_3_bermudan():
    from finmath_tpu.models.curves import par_swap_rate
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.bermudan import (BermudanSwaption,
                                                 BermudanSwaptionPricer)

    setup = build_atm_calibration(num_paths=100_000, num_factors=1)
    model = setup.model
    p0 = setup.covariance.initial_parameters
    tenor = model.tenor_times
    e, m = 10, 10
    strike = par_swap_rate(model.forward_curve, model.discount_curve,
                           tenor[e : e + m + 1])
    pricer = BermudanSwaptionPricer(
        model, BermudanSwaption((e, e + 2, e + 4, e + 6), e + m, strike),
        100_000, 1,
    )
    wall, value = timed(lambda: pricer.get_value(p0))
    return {"name": "Longstaff-Schwartz Bermudan swaption (4 exercises), 100k paths",
            "wall_s": round(wall, 5), "value": round(value, 6),
            "note": "capability absent in the reference (choose() returns null)"}


def config_4_calibration():
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

    setup = build_atm_calibration(num_paths=100_000, num_factors=1,
                                  jacobian_paths=10_000)
    p0 = setup.covariance.initial_parameters
    setup.engine.residuals(p0)
    setup.jacobian_engine.jacobian(p0)  # compile, untimed
    t0 = time.perf_counter()
    res = setup.calibrate(max_iterations=60, accuracy=1e-7)
    wall = time.perf_counter() - t0
    dev = setup.deviations(res.parameters)
    return {"name": "LMM ATM swaption calibration, 144 products, 100k paths",
            "wall_s": round(wall, 3), "iterations": res.iterations,
            "mean_deviation": float(np.mean(dev)),
            "rms_deviation": float(np.sqrt(np.mean(dev**2))),
            "reference": {"cpu_100k_interp_s": 442.75, "gpu_81920_s": 49.46}}


def config_5_greeks():
    import jax
    import jax.numpy as jnp

    from finmath_tpu.models.black_scholes import _mc_bs_price_kernel

    n_paths, n_steps = 1_000_000, 100

    @jax.jit
    def delta_vega(s0, sigma):
        def price(s0_, sigma_):
            return _mc_bs_price_kernel(
                jax.random.PRNGKey(0), n_paths, n_steps, jnp.dtype(jnp.float32),
                s0_, jnp.float64(0.05), sigma_, jnp.float64(1.0), jnp.float64(1.05))
        g = jax.grad(price, argnums=(0, 1))(s0, sigma)
        return g

    wall, (delta, vega) = timed(
        lambda: jax.block_until_ready(
            delta_vega(jnp.float64(1.0), jnp.float64(0.30))
        )
    )
    return {"name": "AAD greeks (delta+vega) of 1M-path MC price via jax.grad",
            "wall_s": round(wall, 5),
            "delta": round(float(delta), 5), "vega": round(float(vega), 5)}


def main():
    import jax

    results = []
    for fn in (config_1_elementwise, config_2_bs, config_3_bermudan,
               config_4_calibration, config_5_greeks):
        try:
            r = fn()
        except Exception as exc:  # keep going; record the failure
            r = {"name": fn.__name__, "error": str(exc)}
        print(json.dumps(r), flush=True)
        results.append(r)

    device = str(jax.devices()[0])
    lines = [
        "# BENCHMARKS — measured on " + device,
        "",
        "All five BASELINE.json configurations, warm-start methodology",
        "(compilation excluded, like the reference's timed regions; see",
        "bench.py). Reference numbers from /root/reference/README.md.",
        "",
        "```json",
    ]
    lines += [json.dumps(r, indent=2) for r in results]
    lines += ["```", ""]
    (REPO / "BENCHMARKS.md").write_text("\n".join(lines))
    print("wrote BENCHMARKS.md", flush=True)


if __name__ == "__main__":
    main()
