"""Monte-Carlo conditional expectation by least-squares regression
(Longstaff-Schwartz).

Equivalent of finmath-lib's ``MonteCarloConditionalExpectationRegression``
— the estimator behind ``RandomVariable.getConditionalExpectation``
(/root/reference/.../RandomVariableFromFloatArray.java:860-864; the
reference's device class has the hook but no estimator). The regression
solves the normal equations in float64 on device — the TPU-native analog
of the reference's (planned) device-side least squares.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .random_variable import ACC_DTYPE, FLOAT_DTYPE, RandomVariable, RandomVariableTPU


@jax.jit
def regression_fit_predict(basis: jax.Array, y: jax.Array) -> jax.Array:
    """basis [B, paths] f32, y [paths] -> fitted E[y | basis] [paths] f32.

    Normal equations with Tikhonov jitter in f64 (B is small: a handful of
    basis functions; paths is large). One matmul pair on the MXU.
    """
    X = basis.astype(ACC_DTYPE)                      # [B, P]
    yd = y.astype(ACC_DTYPE)
    gram = X @ X.T                                   # [B, B]
    rhs = X @ yd                                     # [B]
    eye = jnp.eye(gram.shape[0], dtype=ACC_DTYPE)
    beta = jnp.linalg.solve(gram + 1e-12 * jnp.trace(gram) * eye, rhs)
    return (beta @ X).astype(FLOAT_DTYPE)


class MonteCarloConditionalExpectationRegression:
    """Estimator usable as the argument of
    ``RandomVariable.get_conditional_expectation``."""

    def __init__(self, basis_functions: Sequence[RandomVariable]):
        if not basis_functions:
            raise ValueError("need at least one basis function")
        self.basis_functions = list(basis_functions)

    def _basis_matrix(self) -> jax.Array:
        cols = []
        size = max(b.size() for b in self.basis_functions)
        for b in self.basis_functions:
            rv = RandomVariableTPU.from_random_variable(b)
            if rv.is_deterministic():
                cols.append(jnp.full((size,), float(rv.values), dtype=FLOAT_DTYPE))
            else:
                cols.append(rv.values)
        return jnp.stack(cols)  # [B, paths]

    def get_conditional_expectation(self, rv: RandomVariable) -> RandomVariableTPU:
        target = RandomVariableTPU.from_random_variable(rv)
        if target.is_deterministic():
            return target
        fitted = regression_fit_predict(self._basis_matrix(), target.values)
        return RandomVariableTPU.of(target.get_filtration_time(), fitted)

    getConditionalExpectation = get_conditional_expectation


def monomial_basis(underlying: RandomVariable, degree: int
                   ) -> MonteCarloConditionalExpectationRegression:
    """Convenience: regression on {1, x, x^2, ..., x^degree} of an
    underlying state variable (the classic Longstaff-Schwartz choice)."""
    basis = [RandomVariableTPU(0.0, 1.0)]
    x = RandomVariableTPU.from_random_variable(underlying)
    p = x
    for _ in range(degree):
        basis.append(p)
        p = p.mult(x)
    return MonteCarloConditionalExpectationRegression(basis)
