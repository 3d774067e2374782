"""AAD (adjoint differentiation) tests.

The reference's AAD story is the RandomVariableDifferentiableAAD wrapper
with type priority above the device class (README.md:50-52); greeks for the
baseline config "AAD greeks: delta/vega via custom-vjp" (BASELINE.md). We
test both the eager tape (finmath-style workflow) and the jax.grad path on
the jitted pricer.
"""

import math

import numpy as np
import pytest

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.ops.aad import (
    RandomVariableDifferentiable,
    RandomVariableDifferentiableFactory,
)
from finmath_tpu.ops.conditional_expectation import monomial_basis
from finmath_tpu.ops.random_variable import RandomVariableTPU

S0, R, SIGMA, T, K = 1.0, 0.05, 0.30, 1.0, 1.05
N_PATHS = 100_000


def _growth_factor(seed=0):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal(N_PATHS).astype(np.float32)
    return RandomVariableTPU(
        0.0,
        np.exp((R - SIGMA**2 / 2) * T + SIGMA * math.sqrt(T) * z).astype(np.float32),
    )


class TestTape:
    def test_elementwise_gradient(self):
        x = RandomVariableDifferentiable(
            RandomVariableTPU(0.0, np.asarray([1.0, 2.0, 3.0], dtype=np.float32))
        )
        y = x.mult(2.0).add(3.0).squared().average()
        g = y.get_gradient([x])[x.get_id()]
        expected = 4.0 * (2 * np.asarray([1.0, 2.0, 3.0]) + 3) / 3
        np.testing.assert_allclose(
            np.asarray(g.get_realizations()), expected, rtol=1e-6
        )

    def test_unary_chain_rules(self):
        vals = np.asarray([0.5, 1.0, 2.0], dtype=np.float32)
        x = RandomVariableDifferentiable(RandomVariableTPU(0.0, vals))
        # d/dx mean(exp(log(x) * 2)) = d/dx mean(x^2) = 2x/n
        y = x.log().mult(2.0).exp().average()
        g = y.get_gradient([x])[x.get_id()]
        np.testing.assert_allclose(
            np.asarray(g.get_realizations()), 2 * vals / 3, rtol=1e-4
        )

    def test_deterministic_leaf_adjoint_is_summed(self):
        """The adjoint of a broadcast scalar must be summed over paths."""
        s = RandomVariableDifferentiable(RandomVariableTPU(0.0, 2.0))
        v = RandomVariableTPU(0.0, np.asarray([1.0, 2.0, 3.0], dtype=np.float32))
        y = s.mult(v).average()  # = s * mean(v); dy/ds = mean(v) = 2
        g = y.get_gradient([s])[s.get_id()]
        assert g.is_deterministic()
        assert g.double_value() == pytest.approx(2.0, rel=1e-6)

    def test_type_priority_promotion(self):
        x = RandomVariableDifferentiable(
            RandomVariableTPU(0.0, np.asarray([1.0, 2.0], dtype=np.float32))
        )
        plain = RandomVariableTPU(0.0, np.asarray([5.0, 5.0], dtype=np.float32))
        mixed = plain.sub(x)  # plain has lower priority -> promotes
        assert isinstance(mixed, RandomVariableDifferentiable)
        np.testing.assert_allclose(np.asarray(mixed.get_realizations()), [4.0, 3.0])
        g = mixed.average().get_gradient([x])[x.get_id()]
        # the adjoint is constant across paths, so it may come back in the
        # deterministic (broadcast) representation
        if g.is_deterministic():
            assert g.double_value() == pytest.approx(-0.5)
        else:
            np.testing.assert_allclose(np.asarray(g.get_realizations()), [-0.5, -0.5])


class TestGreeks:
    def test_aad_delta_matches_analytic(self):
        s0 = RandomVariableDifferentiable(RandomVariableTPU(0.0, S0))
        price = (
            s0.mult(_growth_factor())
            .sub(K)
            .floor(0.0)
            .mult(math.exp(-R * T))
            .average()
        )
        delta = price.get_gradient([s0])[s0.get_id()].double_value()
        eps = 1e-4
        analytic_delta = (
            black_scholes_option_value(S0 + eps, R, SIGMA, T, K)
            - black_scholes_option_value(S0 - eps, R, SIGMA, T, K)
        ) / (2 * eps)
        # pathwise delta has MC error ~ 1/sqrt(N)
        assert delta == pytest.approx(analytic_delta, abs=0.01)

    def test_factory_roundtrip(self):
        f = RandomVariableDifferentiableFactory()
        rv = f.create_random_variable(1.0, 3.0)
        assert isinstance(rv, RandomVariableDifferentiable)
        assert rv.get_filtration_time() == 1.0
        assert rv.double_value() == 3.0

    def test_jax_grad_path_vega(self):
        """The TPU-first greek path: jax.grad through the fused pricer."""
        import jax
        import jax.numpy as jnp

        from finmath_tpu.models.black_scholes import _mc_bs_price_kernel

        def price(sigma):
            return _mc_bs_price_kernel(
                jax.random.PRNGKey(0), 200_000, 20, jnp.dtype(jnp.float32),
                jnp.float64(S0), jnp.float64(R), sigma,
                jnp.float64(T), jnp.float64(K),
            )

        vega = float(jax.grad(price)(jnp.float64(SIGMA)))
        eps = 1e-3
        analytic_vega = (
            black_scholes_option_value(S0, R, SIGMA + eps, T, K)
            - black_scholes_option_value(S0, R, SIGMA - eps, T, K)
        ) / (2 * eps)
        assert vega == pytest.approx(analytic_vega, rel=0.05)


class TestModelValuationAAD:
    """Tape AAD driven through a FULL model valuation — the eager LMM
    swaption sweep of ``finmath_tpu.models.lmm.eager`` priced under
    ``RandomVariableDifferentiableFactory``, the way finmath's AAD gets
    used (inject the differentiable factory, value, ask for greeks)."""

    # tenor grid: 6 semiannual periods; swaption 1y into 2y
    DELTAS = [0.5] * 6
    L0 = [0.020, 0.025, 0.030, 0.032, 0.034, 0.036]
    E, M, STRIKE = 2, 4, 0.030
    VOL = 0.012
    PATHS = 20_000

    @classmethod
    def _increments(cls):
        rng = np.random.default_rng(7)
        return (rng.standard_normal((cls.E, cls.PATHS)) * math.sqrt(0.5)).astype(
            np.float32
        )

    @classmethod
    def _replica_price(cls, sig, incs):
        """Pure-jnp replica of the eager sweep, for jacfwd cross-check.
        Mirrors eager_swaption_valuation's arithmetic step for step."""
        import jax.numpy as jnp

        n = len(cls.DELTAS)
        sig = sig.astype(jnp.float32)
        libors = [jnp.full((cls.PATHS,), f, dtype=jnp.float32) for f in cls.L0]
        numeraire = jnp.ones((cls.PATHS,), dtype=jnp.float32)
        for s in range(cls.E):
            dt = cls.DELTAS[s]
            numeraire = numeraire * (1.0 + libors[s] * dt)
            dw = jnp.asarray(incs[s])
            acc = None
            new = list(libors)
            for i in range(s + 1, n):
                c = sig * cls.DELTAS[i] / (libors[i] * cls.DELTAS[i] + 1.0)
                acc = c if acc is None else acc + c
                new[i] = libors[i] + (sig * acc) * dt + sig * dw
            libors = new
        swap = None
        bond = jnp.ones((cls.PATHS,), dtype=jnp.float32)
        for i in range(cls.E, cls.E + cls.M):
            bond = bond / (1.0 + libors[i] * cls.DELTAS[i])
            leg = (libors[i] - cls.STRIKE) * cls.DELTAS[i] * bond
            swap = leg if swap is None else swap + leg
        payoff = jnp.maximum(swap, 0.0)
        return jnp.mean((payoff / numeraire).astype(jnp.float64))

    def test_eager_value_matches_jitted_replica(self):
        from finmath_tpu.models.lmm.eager import eager_swaption_valuation
        from finmath_tpu.ops.random_variable import RandomVariableTPUFactory

        import jax.numpy as jnp

        incs = self._increments()
        rv = eager_swaption_valuation(
            RandomVariableTPUFactory(), self.L0, self.DELTAS, self.VOL,
            incs, self.E, self.M, self.STRIKE,
        )
        ref = float(self._replica_price(jnp.float64(self.VOL), incs))
        assert rv.get_average() == pytest.approx(ref, rel=1e-4)

    def test_eager_value_matches_cpu_float_oracle(self):
        from finmath_tpu.models.lmm.eager import eager_swaption_valuation
        from finmath_tpu.ops.random_variable import RandomVariableTPUFactory
        from finmath_tpu.ops.random_variable_float import RandomVariableFloatFactory

        incs = self._increments()
        v_tpu = eager_swaption_valuation(
            RandomVariableTPUFactory(), self.L0, self.DELTAS, self.VOL,
            incs, self.E, self.M, self.STRIKE,
        ).get_average()
        v_cpu = eager_swaption_valuation(
            RandomVariableFloatFactory(), self.L0, self.DELTAS, self.VOL,
            np.asarray(incs), self.E, self.M, self.STRIKE,
        ).get_average()
        assert v_tpu == pytest.approx(v_cpu, rel=1e-5)

    def test_tape_vega_matches_jacfwd(self):
        """The VERDICT round-1 gap: get_gradient through an LMM valuation,
        cross-checked against jacfwd of the identical computation."""
        import jax
        import jax.numpy as jnp

        from finmath_tpu.models.lmm.eager import eager_swaption_valuation

        incs = self._increments()
        factory = RandomVariableDifferentiableFactory()
        sigma = factory.create_random_variable(0.0, self.VOL)
        value = eager_swaption_valuation(
            factory, self.L0, self.DELTAS, sigma, incs,
            self.E, self.M, self.STRIKE,
        ).average()
        vega = value.get_gradient([sigma])[sigma.get_id()].double_value()

        vega_ref = float(jax.jacfwd(self._replica_price)(
            jnp.float64(self.VOL), incs))
        assert vega_ref != 0.0
        assert vega == pytest.approx(vega_ref, rel=2e-3)


class TestConditionalExpectation:
    def test_regression_recovers_function(self):
        rng = np.random.default_rng(0)
        xs = rng.uniform(-1, 1, 50_000).astype(np.float32)
        noise = (rng.standard_normal(50_000) * 0.1).astype(np.float32)
        target = RandomVariableTPU(0.0, xs * xs + noise)
        est = monomial_basis(RandomVariableTPU(0.0, xs), 3)
        fitted = target.get_conditional_expectation(est)
        err = np.max(np.abs(np.asarray(fitted.get_realizations()) - xs * xs))
        assert err < 0.01

    def test_deterministic_passthrough(self):
        est = monomial_basis(RandomVariableTPU(0.0, np.ones(10, np.float32)), 2)
        det = RandomVariableTPU(0.0, 5.0)
        assert det.get_conditional_expectation(est).double_value() == 5.0


class TestContractDelegation:
    """RandomVariableDifferentiable must expose the full RandomVariable
    contract that both sibling implementations provide (regression: a
    factory-injected AAD variable used to AttributeError on
    get_sample_variance/apply/get_histogram/equals/...)."""

    def _rv(self):
        vals = np.linspace(0.5, 2.0, 64).astype(np.float32)
        return RandomVariableDifferentiable(RandomVariableTPU(0.0, vals)), vals

    def test_statistics_delegate(self):
        rv, vals = self._rv()
        assert rv.get_sample_variance() == pytest.approx(
            float(np.var(vals.astype(np.float64), ddof=1)), rel=1e-5)
        assert rv.get_quantile_expectation(0.25, 0.75) == pytest.approx(
            rv.values.get_quantile_expectation(0.25, 0.75))
        pts = [0.6, 1.0, 1.5]
        assert np.allclose(rv.get_histogram(interval_points=pts),
                           rv.values.get_histogram(interval_points=pts))
        assert rv.get_operator() == rv.values.get_operator()
        assert list(rv.get_realizations_stream())[:3] == \
            list(rv.values.get_realizations_stream())[:3]
        assert rv.equals(rv.values)

    def test_apply_enters_tape_as_constant(self):
        rv, vals = self._rv()
        applied = rv.apply(lambda x: x * 2.0)
        assert isinstance(applied, RandomVariableDifferentiable)
        assert applied.get_average() == pytest.approx(
            2.0 * rv.get_average(), rel=1e-6)
        # no gradient edge: the applied result does not depend on rv's id
        grads = applied.mult(1.0).average().get_gradient([rv])
        g = grads.get(rv.get_id())
        assert g is None or abs(g.get_average()) == 0.0
