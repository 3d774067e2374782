"""Path-count scaling study: eager CPU (float oracle) vs TPU.

Reproduces the reference's scaling characteristic (README.md:24-28:
"CPU/GPU break even at ~5,000 paths, GPU ~10x at 50,000, ~20x at 100,000")
on our stack: the CPU leg is the eager object API over the NumPy float
oracle driven by the host Brownian motion (the reference's CPU
configuration), the TPU leg is the fused jitted pricer.

Run from the repo root: python benchmarks/scaling.py
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

S0, R, SIGMA, T, K = 1.0, 0.05, 0.30, 1.0, 1.05
N_STEPS = 100


def cpu_eager_price(num_paths: int, seed: int = 3141) -> float:
    """Euler MC through the eager CPU float oracle, one op at a time —
    the reference's CPU leg (RandomVariableFloatFactory +
    BrownianMotionFromMersenneRandomNumbers)."""
    from finmath_tpu.models import BrownianMotionHostRandom, TimeDiscretization
    from finmath_tpu.ops.random_variable_float import RandomVariableFloat

    td = TimeDiscretization(initial=0.0, num_steps=N_STEPS, step=T / N_STEPS)
    bm = BrownianMotionHostRandom(td, 1, num_paths, seed)
    dt = T / N_STEPS
    drift = (R - 0.5 * SIGMA * SIGMA) * dt
    log_s = RandomVariableFloat(0.0, np.full(num_paths, np.log(S0), np.float32))
    for m in range(N_STEPS):
        dw = bm.get_brownian_increment(m, 0)
        log_s = log_s.add(drift).add_product(dw, SIGMA)
    payoff = log_s.exp().sub(K).floor(0.0)
    return payoff.get_average() * np.exp(-R * T)


def tpu_price(num_paths: int, seed: int = 3141) -> float:
    from finmath_tpu.models.black_scholes import mc_european_call_price

    return mc_european_call_price(seed, num_paths, N_STEPS, S0, R, SIGMA, T, K)


def timeit(fn, *args, repeats=3):
    fn(*args)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(*args)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    rows = []
    for n in (5_000, 50_000, 100_000, 1_000_000):
        t_cpu = timeit(cpu_eager_price, n, repeats=1 if n >= 1_000_000 else 2)
        t_tpu = timeit(tpu_price, n)
        rows.append((n, t_cpu, t_tpu, t_cpu / t_tpu))
        print(f"paths={n:>9,}: cpu_eager={t_cpu:8.3f}s tpu={t_tpu:8.4f}s "
              f"speedup={t_cpu/t_tpu:7.1f}x", flush=True)

    lines = ["", "## Path-count scaling (MC Black-Scholes, 100 steps)",
             "",
             "| paths | CPU eager (float oracle) | TPU (fused jit) | speedup |",
             "|---|---|---|---|"]
    for n, c, t, s in rows:
        lines.append(f"| {n:,} | {c:.3f} s | {t:.4f} s | {s:.1f}x |")
    lines.append("")
    lines.append("Reference scaling claim (README.md:24-28): break-even ~5k "
                 "paths, GPU 10x at 50k, 20x at 100k.")
    with open(REPO / "BENCHMARKS.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended scaling table to BENCHMARKS.md", flush=True)


if __name__ == "__main__":
    main()
