"""Tridiagonal solver: prefix (associative-scan) path vs numpy and vs the
sequential Thomas sweep, including batching, gradients, and the
diagonally-dominant regime the theta-scheme produces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu.ops.tridiagonal import tridiagonal_matvec, tridiagonal_solve


def _random_system(rng, batch, n, dominance=2.5):
    lo = rng.standard_normal((*batch, n))
    up = rng.standard_normal((*batch, n))
    di = (np.abs(lo) + np.abs(up) + dominance
          + rng.random((*batch, n))) * np.where(
              rng.random((*batch, n)) > 0.5, 1.0, -1.0)
    rhs = rng.standard_normal((*batch, n))
    lo[..., 0] = 0.0
    up[..., -1] = 0.0
    return lo, di, up, rhs


def _dense_solve(lo, di, up, rhs):
    n = di.shape[-1]
    flat = [v.reshape(-1, n) for v in (lo, di, up, rhs)]
    out = np.empty_like(flat[3])
    for b in range(flat[0].shape[0]):
        a = np.zeros((n, n))
        a[np.arange(n), np.arange(n)] = flat[1][b]
        a[np.arange(1, n), np.arange(n - 1)] = flat[0][b][1:]
        a[np.arange(n - 1), np.arange(1, n)] = flat[2][b][:-1]
        out[b] = np.linalg.solve(a, flat[3][b])
    return out.reshape(rhs.shape)


@pytest.mark.parametrize("method", ["prefix", "scan"])
@pytest.mark.parametrize("n", [2, 3, 17, 128, 513])
def test_matches_dense_solve(method, n):
    rng = np.random.default_rng(7 + n)
    lo, di, up, rhs = _random_system(rng, (3,), n)
    x = tridiagonal_solve(jnp.asarray(lo), jnp.asarray(di),
                          jnp.asarray(up), jnp.asarray(rhs), method=method)
    expected = _dense_solve(lo, di, up, rhs)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-11,
                               atol=1e-12)


def test_prefix_agrees_with_scan_large():
    rng = np.random.default_rng(3)
    lo, di, up, rhs = _random_system(rng, (4, 5), 801)
    args = [jnp.asarray(v) for v in (lo, di, up, rhs)]
    xp = tridiagonal_solve(*args, method="prefix")
    xs = tridiagonal_solve(*args, method="scan")
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xs), rtol=1e-11,
                               atol=1e-13)


def test_residual_and_matvec_roundtrip():
    rng = np.random.default_rng(11)
    lo, di, up, rhs = _random_system(rng, (2,), 257)
    args = [jnp.asarray(v) for v in (lo, di, up, rhs)]
    x = tridiagonal_solve(*args)
    back = tridiagonal_matvec(args[0], args[1], args[2], x)
    np.testing.assert_allclose(np.asarray(back), rhs, rtol=1e-10,
                               atol=1e-11)


def test_weak_dominance_crank_nicolson_regime():
    # the actual matrices the theta scheme builds: I - 0.5*dt*L with L a
    # convection-diffusion stencil; barely dominant rows
    n = 401
    dx = 8.0 / (n - 1)
    dt = 1.0 / 200
    x = np.linspace(-4.0, 4.0, n)
    sig2, r = 0.4 ** 2, 0.05
    drift = r - 0.5 * sig2
    lo = -0.5 * dt * (0.5 * sig2 / dx ** 2 - drift / (2 * dx)) * np.ones(n)
    up = -0.5 * dt * (0.5 * sig2 / dx ** 2 + drift / (2 * dx)) * np.ones(n)
    di = 1.0 - 0.5 * dt * (-sig2 / dx ** 2 - r) * np.ones(n)
    rhs = np.maximum(np.exp(x) - 1.0, 0.0)
    lo[0] = up[-1] = 0.0
    got = tridiagonal_solve(jnp.asarray(lo), jnp.asarray(di),
                            jnp.asarray(up), jnp.asarray(rhs))
    expected = _dense_solve(lo, di, up, rhs)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12,
                               atol=1e-14)


def test_gradients_flow_through_solver():
    rng = np.random.default_rng(5)
    lo, di, up, rhs = _random_system(rng, (), 33)

    def loss(di_v, rhs_v, method):
        x = tridiagonal_solve(jnp.asarray(lo), di_v, jnp.asarray(up),
                              rhs_v, method=method)
        return jnp.sum(x ** 2)

    gp = jax.grad(loss, argnums=(0, 1))(jnp.asarray(di), jnp.asarray(rhs),
                                        "prefix")
    gs = jax.grad(loss, argnums=(0, 1))(jnp.asarray(di), jnp.asarray(rhs),
                                        "scan")
    for a, b in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9,
                                   atol=1e-10)
    # and against finite differences on a coordinate
    eps = 1e-6
    d0 = np.asarray(di, dtype=np.float64)
    dp, dm = d0.copy(), d0.copy()
    dp[13] += eps
    dm[13] -= eps
    fd = (loss(jnp.asarray(dp), jnp.asarray(rhs), "prefix")
          - loss(jnp.asarray(dm), jnp.asarray(rhs), "prefix")) / (2 * eps)
    np.testing.assert_allclose(float(gp[0][13]), float(fd), rtol=1e-5)


def test_jit_and_vmap():
    rng = np.random.default_rng(9)
    lo, di, up, rhs = _random_system(rng, (6,), 65)
    args = [jnp.asarray(v) for v in (lo, di, up, rhs)]
    direct = tridiagonal_solve(*args)
    jitted = jax.jit(tridiagonal_solve, static_argnames="method")(*args)
    vmapped = jax.vmap(lambda *a: tridiagonal_solve(*a))(*args)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(direct),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(direct),
                               rtol=1e-11, atol=1e-12)
