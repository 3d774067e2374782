"""TPU-native tridiagonal solver via parallel prefix (associative scan).

The finite-difference layer (`finmath_tpu.models.pde`, the TPU analog of
finmath-lib's ``net.finmath.finitedifference``) needs thousands of
tridiagonal solves per pricing: one per time step, batched over scenario /
strike / orthogonal-grid axes.  ``jnp.linalg.solve`` is dense (O(n^3)) and
has no f64 TPU kernel, and a sequential Thomas sweep serializes the grid
axis.  This module reformulates the Thomas algorithm as three associative
scans so XLA can schedule the grid axis in O(log n) depth while every
combine stays a fully vectorized elementwise op over the batch axes:

* forward elimination of the superdiagonal is a Moebius (linear-fractional)
  recurrence  c_i = up_i / (di_i - lo_i * c_{i-1}); composing Moebius maps
  is 2x2 matrix multiplication, which is associative,
* the forward-substituted RHS and the back substitution are first-order
  affine recurrences  y_i = a_i * y_{i-1} + b_i, composed as
  (a2, b2) o (a1, b1) = (a2*a1, a2*b1 + b2).

Both representations are normalized inside the combine (a Moebius map is
scale-invariant) so prefix products cannot over/underflow.  Everything is
elementwise arithmetic, so the solver runs in emulated float64 on TPU
(unlike LuDecomposition) and is transparently differentiable — PDE Greeks
come from ``jax.grad`` straight through the scans.

A sequential ``lax.scan`` Thomas sweep (``method="scan"``) is kept as the
cross-check and as the better choice for tiny batch counts where the
prefix tree's extra flops aren't amortized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["tridiagonal_solve", "tridiagonal_matvec"]


def tridiagonal_matvec(lo: jax.Array, di: jax.Array, up: jax.Array,
                       x: jax.Array) -> jax.Array:
    """y_i = lo_i x_{i-1} + di_i x_i + up_i x_{i+1} along the last axis.

    lo[..., 0] and up[..., -1] are ignored (outside the band).
    """
    y = di * x
    y = y.at[..., 1:].add(lo[..., 1:] * x[..., :-1])
    y = y.at[..., :-1].add(up[..., :-1] * x[..., 1:])
    return y


def _affine_combine(left, right):
    """Compose affine maps: apply ``left`` first, then ``right``."""
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def _affine_prefix(a: jax.Array, b: jax.Array, reverse: bool = False):
    """Inclusive prefix of y_i = a_i y_prev + b_i with y_start = 0.

    Forward: y_i over i = 0..n-1 with y_{-1} = 0.  Reverse: the same
    recurrence run from the other end (y_i = a_i y_{i+1} + b_i, y_n = 0).
    Scanned along the LAST axis; batch axes broadcast elementwise.
    """
    # positive axis: lax.rev (used by reverse=True) rejects negative dims
    _, y = lax.associative_scan(_affine_combine, (a, b), axis=a.ndim - 1,
                                reverse=reverse)
    return y


def _moebius_combine(left, right):
    """Compose Moebius maps (2x2 matrices, right @ left) and renormalize.

    The map c -> (A c + B) / (C c + D) is invariant under scaling the
    matrix, so dividing by the largest entry keeps prefix products in
    range regardless of n."""
    a1, b1, c1, d1 = left
    a2, b2, c2, d2 = right
    a = a2 * a1 + b2 * c1
    b = a2 * b1 + b2 * d1
    c = c2 * a1 + d2 * c1
    d = c2 * b1 + d2 * d1
    norm = jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b)),
                       jnp.maximum(jnp.abs(c), jnp.abs(d)))
    norm = jnp.where(norm > 0, norm, 1.0)
    return a / norm, b / norm, c / norm, d / norm


def _solve_prefix(lo, di, up, rhs):
    """Thomas algorithm as three associative scans along the last axis."""
    # --- forward elimination of the superdiagonal -------------------------
    # c_i = up_i / (di_i - lo_i c_{i-1}),  c_{-1} = 0: Moebius map with
    # matrix [[0, up_i], [-lo_i, di_i]] applied to the projective point
    # (0 : 1).  The inclusive prefix matrix [[A,B],[C,D]] gives c_i = B/D.
    zeros = jnp.zeros_like(di)
    _, B, _, D = lax.associative_scan(
        _moebius_combine, (zeros, up, -lo, di), axis=di.ndim - 1)
    c = B / D
    c_prev = jnp.concatenate([zeros[..., :1], c[..., :-1]], axis=-1)
    # pivot of the eliminated system; diagonal dominance (theta-scheme
    # matrices are strictly dominant) keeps it away from zero
    m = di - lo * c_prev
    # --- forward substitution: d_i = (rhs_i - lo_i d_{i-1}) / m_i ---------
    d = _affine_prefix(-lo / m, rhs / m)
    # --- back substitution: x_i = d_i - c_i x_{i+1},  x_n = 0 -------------
    return _affine_prefix(-c, d, reverse=True)


def _solve_scan(lo, di, up, rhs):
    """Sequential Thomas sweep via lax.scan (grid on the last axis)."""
    # scan over the grid axis; carries are the batch-shaped running terms
    def fwd(carry, row):
        c_prev, d_prev = carry
        lo_i, di_i, up_i, r_i = row
        m = di_i - lo_i * c_prev
        c_i = up_i / m
        d_i = (r_i - lo_i * d_prev) / m
        return (c_i, d_i), (c_i, d_i)

    elems = tuple(jnp.moveaxis(v, -1, 0) for v in (lo, di, up, rhs))
    batch_zero = jnp.zeros_like(di[..., 0])
    _, (c, d) = lax.scan(fwd, (batch_zero, batch_zero), elems)

    def bwd(x_next, row):
        c_i, d_i = row
        x_i = d_i - c_i * x_next
        return x_i, x_i

    _, x = lax.scan(bwd, batch_zero, (c, d), reverse=True)
    return jnp.moveaxis(x, 0, -1)


def tridiagonal_solve(lo: jax.Array, di: jax.Array, up: jax.Array,
                      rhs: jax.Array, method: str = "prefix") -> jax.Array:
    """Solve lo_i x_{i-1} + di_i x_i + up_i x_{i+1} = rhs_i on the last axis.

    All four arrays share one shape ``[..., n]``; leading axes are batch
    (each batch element is an independent system).  ``lo[..., 0]`` and
    ``up[..., -1]`` lie outside the band and are ignored.

    method="prefix" (default): O(log n)-depth associative scans — the TPU
    path.  method="scan": sequential Thomas, the reference implementation.
    Both are jit- and grad-compatible.
    """
    lo, di, up, rhs = jnp.broadcast_arrays(lo, di, up, rhs)
    if method == "prefix":
        return _solve_prefix(lo, di, up, rhs)
    if method == "scan":
        return _solve_scan(lo, di, up, rhs)
    raise ValueError(f"unknown method {method!r}; use 'prefix' or 'scan'")
