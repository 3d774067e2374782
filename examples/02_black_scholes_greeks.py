"""Monte-Carlo Black-Scholes pricing + greeks, three ways.

Run: python examples/02_black_scholes_greeks.py

1. finmath-style object API (model + Euler scheme + product),
2. the fused jitted pricer (one XLA program from seed to price),
3. greeks via jax.grad AND via the eager AAD tape.
"""

import os
import sys

# allow running straight from a source checkout (inserts the repo root;
# harmless when the package is pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

import numpy as np

S0, R, SIGMA, T, K = 1.0, 0.05, 0.30, 1.0, 1.05


def main():
    from finmath_tpu.models.analytic import black_scholes_option_value
    from finmath_tpu.models.black_scholes import (
        BlackScholesModel, EuropeanOption, MonteCarloBlackScholesModel,
        mc_european_call_price,
    )
    from finmath_tpu.models.time_discretization import TimeDiscretization

    analytic = black_scholes_option_value(S0, R, SIGMA, T, K)

    # 1. object API (the reference's MonteCarloBlackScholesModelTest shape)
    td = TimeDiscretization(initial=0.0, num_steps=100, step=T / 100)
    sim = MonteCarloBlackScholesModel(td, 200_000,
                                      BlackScholesModel(S0, R, SIGMA))
    v_obj = EuropeanOption(T, K).get_value(sim)

    # 2. fused jitted pricer (1M paths x 100 steps in one program)
    v_fused = mc_european_call_price(seed=3141, num_paths=1_000_000,
                                     num_steps=100, initial_value=S0,
                                     risk_free_rate=R, volatility=SIGMA,
                                     maturity=T, strike=K)
    print(f"analytic {analytic:.6f} | object API {v_obj:.6f} | fused {v_fused:.6f}")
    assert abs(v_obj - analytic) < 0.005 and abs(v_fused - analytic) < 0.005

    # 3a. greeks via jax.grad through the fused pricer
    import jax
    import jax.numpy as jnp

    from finmath_tpu.models.black_scholes import _mc_bs_price_kernel

    def price(s0, sigma):
        return _mc_bs_price_kernel(jax.random.PRNGKey(0), 500_000, 50,
                                   jnp.dtype(jnp.float32), s0, jnp.float64(R),
                                   sigma, jnp.float64(T), jnp.float64(K))

    delta, vega = jax.grad(price, argnums=(0, 1))(jnp.float64(S0),
                                                  jnp.float64(SIGMA))
    print(f"jax.grad:  delta {float(delta):.4f}  vega {float(vega):.4f}")

    # 3b. eager AAD tape (finmath RandomVariableDifferentiableAAD style)
    from finmath_tpu.ops.aad import RandomVariableDifferentiable
    from finmath_tpu.ops.random_variable import RandomVariableTPU

    z = np.random.default_rng(0).standard_normal(500_000).astype(np.float32)
    growth = RandomVariableTPU(0.0, np.exp(
        (R - SIGMA**2 / 2) * T + SIGMA * math.sqrt(T) * z).astype(np.float32))
    s0 = RandomVariableDifferentiable(RandomVariableTPU(0.0, S0))
    v = s0.mult(growth).sub(K).floor(0.0).mult(math.exp(-R * T)).average()
    delta_aad = v.get_gradient([s0])[s0.get_id()].double_value()
    print(f"AAD tape:  delta {delta_aad:.4f}")
    assert abs(delta_aad - float(delta)) < 0.02


if __name__ == "__main__":
    main()
