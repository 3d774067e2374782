"""Tape-AAD through a FULL model valuation — the way finmath's AAD is used.

finmath's users inject RandomVariableDifferentiableAADFactory and price a
product; getGradient() then returns sensitivities w.r.t. any tape leaf
(model vol, initial forwards, ...). Here the same flow drives an LMM
swaption: every Euler step, drift sum, bond cumprod, annuity, payoff and
expectation runs eagerly on ``RandomVariableDifferentiable`` objects from
the factory (priority-30 dispatch), consuming the engine's EXACT Brownian
stream. That makes two strong cross-checks possible:

* the tape valuation reproduces the fused engine's Monte-Carlo value;
* the tape vega (reverse sweep) reproduces the engine's jacfwd derivative.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu.models.curves import (DiscountCurveFromForwardCurve,
                                       ForwardCurveFromForwards)
from finmath_tpu.models.lmm.covariance import (
    LIBORCorrelationModelExponentialDecay,
    LIBORCovarianceModelFromVolatilityAndCorrelation,
    LIBORVolatilityModelPiecewiseConstant,
)
from finmath_tpu.models.lmm.model import (LIBORMarketModelTPU,
                                          LMMValuationEngine,
                                          SwaptionProduct)
from finmath_tpu.models.time_discretization import TimeDiscretization
from finmath_tpu.ops.aad import (RandomVariableDifferentiable,
                                 RandomVariableDifferentiableFactory)

N_LIBORS, DT = 10, 0.5
FLAT = 0.025
E, PERIODS = 4, 4         # 2Y x 2Y payer swaption
PATHS, SEED = 20_000, 2024
SIGMA0 = 0.009            # absolute (normal-state-space) vol level


def _curves():
    times = np.arange(0.0, N_LIBORS * DT + DT, DT)
    fc = ForwardCurveFromForwards(times, np.full(len(times), FLAT), DT)
    dc = DiscountCurveFromForwardCurve(fc, horizon=N_LIBORS * DT)
    return fc, dc


def _engine(strike):
    fc, dc = _curves()
    libor_td = TimeDiscretization(initial=0.0, num_steps=N_LIBORS, step=DT)
    vol = LIBORVolatilityModelPiecewiseConstant(
        libor_td, libor_td, np.asarray([0.0]), np.asarray([0.0]), SIGMA0)
    corr = LIBORCorrelationModelExponentialDecay(libor_td, 1, decay=0.0)
    cov = LIBORCovarianceModelFromVolatilityAndCorrelation(vol, corr)
    model = LIBORMarketModelTPU(libor_td, fc, dc, cov,
                                use_numeraire_adjustment=False)
    products = [SwaptionProduct(E, PERIODS, strike, 0.0, value_unit="VALUE")]
    return LMMValuationEngine(model, products, PATHS, 1, SEED)


def _eager_tape_valuation(sigma_rv):
    """Price the swaption eagerly on the AAD tape: spot measure, NORMAL
    state space, the engine's exact per-step Threefry stream."""
    factory = RandomVariableDifferentiableFactory()
    deltas = [DT] * N_LIBORS
    L = [factory.create_random_variable(0.0, FLAT) for _ in range(N_LIBORS)]
    N = factory.create_random_variable(0.0, np.ones(PATHS, dtype=np.float32))
    base_key = jax.random.PRNGKey(SEED)
    sqrt_dt = float(np.sqrt(DT))

    for m in range(E):
        # numeraire accrues at the just-fixed forward (engine step order)
        N = N.accrue(L[m], deltas[m])
        dw_vals = np.asarray(
            jax.random.normal(jax.random.fold_in(base_key, m), (1, PATHS),
                              dtype=jnp.float32)
        )[0] * sqrt_dt
        dw = factory.create_random_variable((m + 1) * DT, dw_vals)
        # spot-measure drift prefix sum over alive libors (incl. own term)
        prefix = None
        new_L = list(L)
        for i in range(m + 1, N_LIBORS):
            mt = L[i].mult(deltas[i]).add(1.0).invert().mult(deltas[i])
            c = mt.mult(sigma_rv)                     # mt * lambda_i
            prefix = c if prefix is None else prefix.add(c)
            drift = sigma_rv.mult(prefix)
            new_L[i] = L[i].add(drift.mult(DT)).add(sigma_rv.mult(dw))
        L = new_L

    # collect at T_E: bond cumprod, annuity, terminal bond, payoff
    strike = _STRIKE
    cp = None
    bonds = {}
    for j in range(E, E + PERIODS):
        r = L[j].mult(deltas[j]).add(1.0).invert()
        cp = r if cp is None else cp.mult(r)
        bonds[j] = cp
    ann = None
    for j in range(E, E + PERIODS):
        term = bonds[j].mult(deltas[j])
        ann = term if ann is None else ann.add(term)
    p_end = bonds[E + PERIODS - 1]
    swap = p_end.mult(-1.0).add(1.0).sub(ann.mult(strike))
    payoff = swap.floor(0.0)
    return payoff.div(N).average()


_STRIKE = FLAT  # ATM-ish on a flat curve


class TestAADThroughModelValuation:
    @pytest.fixture(scope="class")
    def engine(self):
        return _engine(_STRIKE)

    def test_tape_value_matches_fused_engine(self, engine):
        sigma = RandomVariableDifferentiable(
            np.float32(SIGMA0), time=0.0)
        price = _eager_tape_valuation(sigma)
        v_engine = float(engine.values(np.asarray([SIGMA0]))[0])
        assert price.double_value() == pytest.approx(v_engine, rel=2e-4)

    def test_tape_vega_matches_jacfwd(self, engine):
        """Reverse-sweep dPrice/dsigma vs the engine's forward-mode
        Jacobian — both exact derivatives of the same Monte-Carlo program
        on the same stream."""
        sigma = RandomVariableDifferentiable(np.float32(SIGMA0), time=0.0)
        price = _eager_tape_valuation(sigma)
        grads = price.get_gradient([sigma])
        vega_tape = float(grads[sigma.get_id()].double_value())
        vega_jacfwd = float(engine.jacobian(np.asarray([SIGMA0]))[0, 0])
        assert vega_tape == pytest.approx(vega_jacfwd, rel=5e-3)
        # sanity: a 2Yx2Y ATM swaption has materially positive vega
        assert vega_tape > 0.1
