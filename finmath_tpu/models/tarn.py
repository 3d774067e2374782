"""Target-redemption note (TARN) on the exact Hull-White simulation:
one fused lax.scan over the coupon schedule carrying (alive, cumulative
coupon) per path, with the pathwise exact numeraire discounting.

Capability map: finmath-lib prices TARNs as
``TermStructureMonteCarloProduct`` compositions (coupon legs +
trigger logic through the RandomVariable API on its interest-rate
simulations); the reference's device backend exists to execute exactly
this pathwise logic per path on the accelerator — but its broken
``choose`` (RandomVariableCuda.java:1631-1635 returns null) blocked
trigger products on the GPU class. Here the whole note — inverse-floater
coupons, target accrual, knock-out redemption, exact-numeraire
discounting — is ONE jitted program and one packed (value, stderr)
host transfer.

Conventions (the two market-standard target caps):

* ``cap_mode="exact"`` — the breaching coupon is truncated so the paid
  total equals the target exactly;
* ``cap_mode="full"``  — the breaching coupon is paid in full (total
  may exceed the target).

Oracles (tests/test_tarn.py): with ``target=inf`` the TARN is exactly a
portfolio of floorlets (put-call parity on the Hull-White analytic
caplet layer) plus the redemption zero bond; with a tiny target and a
deep-in-the-money inverse floater it degenerates to the first payment
date's zero bond; an op-by-op RandomVariable-API reimplementation on
the SAME path realization cross-checks the fused kernel (the
same-stream rigor lever, BENCHMARKS.md).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random_variable import ACC_DTYPE
from .hull_white import HullWhiteModel, HullWhiteSimulation


# ---------------------------------------------------------------------------
# analytic oracle: the uncapped inverse floater
# ---------------------------------------------------------------------------

def inverse_floater_value(model: HullWhiteModel,
                          fixing_times: Sequence[float],
                          payment_times: Sequence[float],
                          strike: float, multiplier: float = 1.0,
                          notional: float = 1.0) -> float:
    """Closed-form value of the UNCAPPED inverse floater + notional
    redemption at the last payment: each coupon
    delta_i * max(K - m L_i, 0) is m floorlets struck at K/m, valued by
    put-call parity off the Hull-White analytic caplet
    (floorlet = caplet - P(0,fix) + (1 + delta K') P(0,pay)).
    This is the ``target = inf`` limit of the TARN."""
    k_eff = strike / multiplier
    total = 0.0
    for tf, tp in zip(fixing_times, payment_times):
        delta = tp - tf
        cap = model.caplet(float(tf), float(tp), k_eff)
        floor = (cap - float(model.df(tf))
                 + (1.0 + delta * k_eff) * float(model.df(tp)))
        total += multiplier * floor
    total += float(model.df(payment_times[-1]))
    return notional * total


# ---------------------------------------------------------------------------
# fused kernel
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(9,))
def _tarn_kernel(xs_fix, ys_pay, a_int_pay, leads, bbs, deltas,
                 strike, multiplier, target, cap_full: bool, notional):
    """[dates, paths] pathwise sweep: libor from the affine bond
    reconstitution, coupon/target/knock logic branchless, discounting
    by the exact pathwise numeraire. Assembly in f64 (the collection
    contract: coupon differences cancel O(1) terms)."""

    def step(carry, inp):
        alive, cum, acc = carry
        x, y, a_int, lead, bb, delta = inp
        xa = x.astype(ACC_DTYPE)
        p_fp = lead * jnp.exp(-bb * xa)            # P(t_fix, t_pay; x)
        libor = (1.0 / p_fp - 1.0) / delta
        coupon_raw = delta * jnp.maximum(strike - multiplier * libor, 0.0)
        room = jnp.maximum(target - cum, 0.0)
        paid = coupon_raw if cap_full else jnp.minimum(coupon_raw, room)
        knock = (cum + coupon_raw >= target).astype(ACC_DTYPE)
        inv_n = jnp.exp(-y.astype(ACC_DTYPE) - a_int)
        acc = acc + inv_n * alive * (paid + knock)
        cum = cum + alive * coupon_raw
        alive = alive * (1.0 - knock)
        return (alive, cum, acc), None

    paths = xs_fix.shape[1]
    alive0 = jnp.ones((paths,), dtype=ACC_DTYPE)
    cum0 = jnp.zeros((paths,), dtype=ACC_DTYPE)
    acc0 = jnp.zeros((paths,), dtype=ACC_DTYPE)
    (alive, _, acc), _ = jax.lax.scan(
        step, (alive0, cum0, acc0),
        (xs_fix, ys_pay, a_int_pay, leads, bbs, deltas))
    # never knocked: notional back at the last payment date
    inv_n_last = jnp.exp(-ys_pay[-1].astype(ACC_DTYPE) - a_int_pay[-1])
    pay = (acc + alive * inv_n_last) * notional
    n = paths
    mean = jnp.sum(pay) / n
    var = jnp.sum((pay - mean) ** 2) / (n - 1)
    return jnp.stack([mean, jnp.sqrt(var / n)])


# ---------------------------------------------------------------------------
# product
# ---------------------------------------------------------------------------

class TargetRedemptionNote:
    """TARN paying inverse-floater coupons
    ``delta_i * max(strike - multiplier * L(t_i, t_i, t_{i+1}), 0)``
    at each payment date until the cumulative coupon reaches ``target``,
    at which point the note redeems the notional (breaching coupon per
    ``cap_mode``); notional back at the final payment if never
    triggered."""

    def __init__(self, fixing_times: Sequence[float],
                 payment_times: Sequence[float], strike: float,
                 target: float, multiplier: float = 1.0,
                 cap_mode: str = "exact", notional: float = 1.0):
        if cap_mode not in ("exact", "full"):
            raise ValueError("cap_mode must be 'exact' or 'full'")
        ft = [float(t) for t in fixing_times]
        pt = [float(t) for t in payment_times]
        if len(ft) != len(pt) or not ft:
            raise ValueError("need matching, non-empty fixing/payment times")
        for tf, tp in zip(ft, pt):
            if not 0.0 <= tf < tp:
                raise ValueError("each fixing must precede its payment")
        if sorted(ft) != ft:
            raise ValueError("fixing_times must be ascending")
        self.fixing_times = ft
        self.payment_times = pt
        self.strike = float(strike)
        self.target = float(target)
        self.multiplier = float(multiplier)
        self.cap_mode = cap_mode
        self.notional = float(notional)

    def packed_value_and_error(self, sim: HullWhiteSimulation):
        """Traced [2] (value, stderr) on device — no host transfer; the
        building block of ``price_portfolio``'s one-transfer book
        (models/equity_products.py)."""
        n = len(self.fixing_times)
        fix_idx = [sim._index(t) for t in self.fixing_times]
        pay_idx = [sim._index(t) for t in self.payment_times]
        leads = np.empty(n)
        bbs = np.empty(n)
        for j, (i, tp) in enumerate(zip(fix_idx, self.payment_times)):
            lead, bb = sim._bond_coeffs(i, tp)
            leads[j], bbs[j] = lead[0], bb[0]
        deltas = np.asarray(self.payment_times) - np.asarray(
            self.fixing_times)
        return _tarn_kernel(
            sim._xs[np.asarray(fix_idx)], sim._ys[np.asarray(pay_idx)],
            jnp.asarray(sim._a_int[np.asarray(pay_idx)]),
            jnp.asarray(leads), jnp.asarray(bbs), jnp.asarray(deltas),
            jnp.float64(self.strike), jnp.float64(self.multiplier),
            jnp.float64(self.target), self.cap_mode == "full",
            jnp.float64(self.notional))

    def get_value_and_error(self, sim: HullWhiteSimulation) -> tuple:
        out = np.asarray(self.packed_value_and_error(sim))
        return float(out[0]), float(out[1])

    def get_value(self, sim: HullWhiteSimulation) -> float:
        return self.get_value_and_error(sim)[0]

    getValue = get_value
