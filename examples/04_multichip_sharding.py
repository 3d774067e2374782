"""Path-axis data parallelism over a device mesh.

Run (no multi-chip hardware needed):
  python examples/04_multichip_sharding.py        # 8 virtual CPU devices

On a real pod slice, run with JAX_PLATFORMS=tpu: any explicitly set
platform is respected, and the same code shards the Monte-Carlo path
axis over the mesh — each device folds its own RNG key, expectations
are a local f64 sum + psum over ICI, and gradients flow through the
collective (the reference is single-device; SURVEY.md §2/§5).
"""

import os
import sys

# allow running straight from a source checkout (inserts the repo root;
# harmless when the package is pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "JAX_PLATFORMS" not in os.environ:
    # default demo mode: 8 virtual CPU devices
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # some platform plugins win auto-selection over a late env default;
    # pin through jax.config as well
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

    if os.environ["JAX_PLATFORMS"] == "cpu":
        # the axon TPU plugin can win auto-selection even over an
        # explicit env cpu; honor the user's choice through the config
        jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh


def main():
    import jax.numpy as jnp

    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.model import LMMValuationEngine

    devices = jax.devices()
    print(f"{len(devices)} devices: {devices[0].platform}")
    mesh = Mesh(np.asarray(devices), ("paths",))

    setup = build_atm_calibration(num_paths=1600, num_factors=1)
    products = [p for p in setup.products if p.exercise_index <= 10]
    sharded = LMMValuationEngine(setup.model, products, 1600, 1,
                                 seed=31415, mesh=mesh)

    p0 = setup.covariance.initial_parameters
    r = sharded.residuals(p0)
    print(f"sharded residuals over {len(devices)} devices: "
          f"{len(r)} products, rms {np.sqrt((r**2).mean()):.2e}")

    # gradients through the psum collective (under jit, like a real
    # calibration step — see __graft_entry__.dryrun_multichip)
    fn = sharded._residual_fn  # the jitted, shard_mapped residual program
    g = jax.jit(jax.grad(lambda p: jnp.sum(fn(p) ** 2)))(jnp.asarray(p0))
    assert np.all(np.isfinite(np.asarray(g)))
    print(f"loss gradient through the collective: {len(np.asarray(g))} params, finite")

    # XVA under the same mesh: the exposure collector's expectations
    # psum over ICI and the PFE quantiles all_gather the netted values
    from finmath_tpu.models.lmm.exposure import SwapExposureEngine

    expo = SwapExposureEngine(setup.model, first_index=2, last_index=10,
                              strike=0.004, num_paths=1600, num_factors=1,
                              mesh=mesh)
    prof = expo.profile(p0)
    cva, ladder = expo.cva_forward_deltas(p0, hazard_rate=0.012)
    print(f"sharded exposure profile: {len(prof.times)} dates, peak EE "
          f"{prof.ee.max():.2e}, PFE99 {prof.max_pfe(0.99):.2e}")
    print(f"sharded CVA {cva:.3e} + {ladder.shape[0]}-bucket delta ladder "
          f"through the collective")


if __name__ == "__main__":
    main()
