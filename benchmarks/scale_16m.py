"""Scale demonstration: 16M-path Monte-Carlo beyond one chip's workload.

The TPU analog of the reference's ">= 12 GB device memory" envelope for
large runs (/root/reference/README.md:31-35) and of its
BrownianMotionMemoryTest ramp: we shard the path axis over the device mesh
(8 devices here — virtual CPU devices in CI, a real pod slice in
production) and report the per-device HBM footprint. Two legs:

1. scan-engine MC (counter-based RNG drawn per step): per-device live
   memory is O(paths_per_device), INDEPENDENT of the step count — the
   structural reason the reference's 12 GB wall does not exist here;
2. materialized Brownian block [steps, factors, paths] (the reference's
   pre-generated-increments pattern): memory scales with steps x paths,
   sharded across devices.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scale_16m.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the axon TPU plugin can win platform selection even when
        # JAX_PLATFORMS=cpu is exported; pin it through the config too
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from finmath_tpu.models.analytic import black_scholes_option_value
    from finmath_tpu.parallel.mesh import (PATH_AXIS, make_path_mesh,
                                           mc_price_sharded)

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=16 * 1024 * 1024)
    ap.add_argument("--steps", type=int, default=100,
                    help="Euler steps (the per-device memory envelope is "
                         "independent of this — use a small value on the "
                         "single-core CI host)")
    args = ap.parse_args()

    n_dev = len(jax.devices())
    mesh = make_path_mesh(n_dev)
    TOTAL = args.paths
    STEPS = args.steps

    print(f"devices: {n_dev} x {jax.devices()[0].platform}")
    print(f"paths: {TOTAL:,} ({TOTAL // n_dev:,} per device), steps: {STEPS}")

    # leg 1: scan-engine MC — memory O(paths/device)
    t0 = time.perf_counter()
    price = float(mc_price_sharded(mesh, 7, TOTAL, STEPS,
                                   1.0, 0.05, 0.30, 1.0, 1.05))
    wall1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(mc_price_sharded(mesh, 7, TOTAL, STEPS, 1.0, 0.05, 0.30, 1.0, 1.05))
    warm1 = time.perf_counter() - t0
    analytic = float(black_scholes_option_value(1.0, 0.05, 0.30, 1.0, 1.05))
    err = abs(price - analytic)
    # MC standard error at 16M paths ~ 3.5e-5: assert within 4 sigma
    print(f"[scan MC] price={price:.6f} analytic={analytic:.6f} "
          f"|err|={err:.2e} wall={wall1:.2f}s (incl. compile), "
          f"warm={warm1:.2f}s")
    assert err < 2e-4, "16M-path MC price off"
    per_dev_bytes = TOTAL // n_dev * 4
    print(f"[scan MC] per-device live path state: {per_dev_bytes / 2**20:.0f}"
          " MiB (independent of step count)")

    # leg 2: materialized Brownian block, sharded [steps, factors, paths]
    from jax.sharding import NamedSharding, PartitionSpec as P

    steps_b, factors = 10, 6
    sharding = NamedSharding(mesh, P(None, None, PATH_AXIS))

    @jax.jit
    def gen_block(key):
        z = jax.random.normal(key, (steps_b, factors, TOTAL),
                              dtype=jnp.float32)
        return jax.lax.with_sharding_constraint(z, sharding)

    t0 = time.perf_counter()
    block = gen_block(jax.random.PRNGKey(3))
    block.block_until_ready()
    wall2 = time.perf_counter() - t0
    gbytes = block.size * 4 / 2**30
    print(f"[brownian block] {steps_b} steps x {factors} factors x "
          f"{TOTAL:,} paths = {gbytes:.2f} GiB global, "
          f"{gbytes / n_dev * 1024:.0f} MiB per device, wall={wall2:.2f}s")
    # statistical sanity on the sharded block — f64 ACCUMULATOR reductions
    # (dtype=... fuses the convert into the reduce; materializing an f64
    # copy of a 3.75 GiB block would double HBM and OOM a single chip)
    @jax.jit
    def block_stats(b):
        m = jnp.mean(b, dtype=jnp.float64)
        v = jnp.mean(b * b, dtype=jnp.float64) - m * m
        return m, v

    m, v = [float(x) for x in block_stats(block)]
    print(f"[brownian block] mean={m:.2e} var={v:.6f}")
    assert abs(m) < 1e-3 and abs(v - 1.0) < 1e-3

    stats = jax.local_devices()[0].memory_stats()
    if stats:
        print(f"[device 0] bytes_in_use={stats.get('bytes_in_use', 0)/2**20:.0f} MiB"
              f" / limit={stats.get('bytes_limit', 0)/2**30:.1f} GiB")
    print("scale_16m OK")


if __name__ == "__main__":
    main()
