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


def _cholesky_solve_small(gram: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve an SPD system of small static size with an unrolled Cholesky.

    TPU's f64 emulation supports elementwise arithmetic but NOT the
    LuDecomposition op behind jnp.linalg.solve ("Only F32 and C64 types are
    implemented in LuDecomposition"), so the tiny (basis x basis) solve is
    spelled out; B <= ~10 keeps the unrolled graph trivial."""
    B = gram.shape[0]
    L = [[None] * B for _ in range(B)]
    for i in range(B):
        for j in range(i + 1):
            s = gram[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-300))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L z = rhs
    z = [None] * B
    for i in range(B):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * z[k]
        z[i] = s / L[i][i]
    # back substitution L^T beta = z
    beta = [None] * B
    for i in reversed(range(B)):
        s = z[i]
        for k in range(i + 1, B):
            s = s - L[k][i] * beta[k]
        beta[i] = s / L[i][i]
    return jnp.stack(beta)


def _regression_fit(basis: jax.Array, y: jax.Array,
                    axis_name=None) -> jax.Array:
    """Unjitted body of ``regression_fit`` — callable inside shard_map
    with ``axis_name`` set: the normal equations' moments (gram, rhs) are
    local partial sums over the device's path shard, psum'd over ICI
    before the tiny solve, so every device solves the identical GLOBAL
    regression (the distributed Longstaff-Schwarz the single-device
    engines get for free)."""
    X = basis.astype(ACC_DTYPE)                      # [B, P_local]
    yd = y.astype(ACC_DTYPE)
    gram = X @ X.T                                   # [B, B]
    rhs = X @ yd                                     # [B]
    if axis_name is not None:
        gram = jax.lax.psum(gram, axis_name)
        rhs = jax.lax.psum(rhs, axis_name)
    eye = jnp.eye(gram.shape[0], dtype=ACC_DTYPE)
    return _cholesky_solve_small(
        gram + 1e-12 * jnp.trace(gram) * eye, rhs
    )


@jax.jit
def regression_fit(basis: jax.Array, y: jax.Array) -> jax.Array:
    """basis [B, paths], y [paths] -> f64 coefficients beta [B].

    Normal equations with Tikhonov jitter in f64 (B is small: a handful of
    basis functions; paths is large). One matmul pair on the MXU; the tiny
    SPD solve is an unrolled Cholesky (TPU-safe for f64). Exposed
    separately from prediction so a Longstaff-Schwartz policy can be
    FITTED on one path set and APPLIED to an independent one (the
    out-of-sample lower bound of the Bermudan pricer). For a sharded path
    axis inside shard_map, use ``_regression_fit(basis, y, axis_name)``
    (psum'd moments)."""
    return _regression_fit(basis, y)


def regression_predict(basis: jax.Array, beta: jax.Array) -> jax.Array:
    """basis [B, paths], beta [B] -> predicted E[y | basis] [paths] f32."""
    return (beta @ basis.astype(ACC_DTYPE)).astype(FLOAT_DTYPE)


@jax.jit
def regression_fit_predict(basis: jax.Array, y: jax.Array) -> jax.Array:
    """basis [B, paths] f32, y [paths] -> fitted E[y | basis] [paths] f32."""
    return regression_predict(basis, regression_fit(basis, y))


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
