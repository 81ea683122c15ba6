"""Fused Pallas kernel: complete BLS12-377 G1 Jacobian add in one launch.

The composed path (:mod:`.g1_limb`) issues ~50 Pallas/XLA ops per point
add — 25 Montgomery muls plus add/sub/select glue — so a Pippenger scan
step pays tens of kernel launches and HBM round-trips per [24, B] tile
while the arithmetic itself is ~60 µs.  This kernel computes the entire
complete add (general + doubling + identity/opposite handling) inside
VMEM in ONE ``pallas_call``: inputs are the six coordinate arrays
[24, B] of 16-bit Fq Montgomery limbs, outputs the three result
coordinates.

Bit-exact with :func:`g1_limb.add` (tests/test_msm_device.py, interpret
mode on CPU; live comparison on TPU).  Enabled on TPU via
``SWTPU_FUSED_ADD`` (default on); the composed path remains the oracle.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.bls12_377 import Fq, FQ_MODULUS
from ..fields.device import LIMB_BITS, LIMB_MASK, int_to_limbs

Q = FQ_MODULUS
L = 24
TILE = 256


def _emit_field_ops(p, mask, n0_u, zero_row):
    """Field-op helpers over [L, T] uint32 limb arrays, traced inline."""

    def norm_rows(rows):
        # rows: list of L+1 [1, T] partial rows with carries -> L normalized
        res, carry = [], zero_row
        for i in range(L):
            v = rows[i] + carry
            res.append(v & mask)
            carry = v >> LIMB_BITS
        return res, rows[L] + carry  # (limbs, overflow row)

    def sub_p(rows):
        out, borrow = [], zero_row
        for i in range(L):
            d = rows[i] - p[i : i + 1, :] - borrow
            borrow = (d >> 31) & 1
            out.append(d & mask)
        return out, borrow

    def select_rows(cond, a_rows, b_rows):
        return [jnp.where(cond, a, b) for a, b in zip(a_rows, b_rows)]

    def mul(a_rows, b_rows):
        """Montgomery product of two limb-row lists -> limb-row list."""
        t = [zero_row for _ in range(2 * L + 1)]
        b_arr = jnp.concatenate(b_rows, axis=0)  # [L, T]
        for i in range(L):
            prod = a_rows[i] * b_arr  # [L, T]
            lo = prod & mask
            hi = prod >> LIMB_BITS
            for j in range(L):
                t[i + j] = t[i + j] + lo[j : j + 1, :]
                t[i + j + 1] = t[i + j + 1] + hi[j : j + 1, :]
        p_arr = p
        for i in range(L):
            m = ((t[i] & mask) * n0_u) & mask
            prod = m * p_arr
            lo = prod & mask
            hi = prod >> LIMB_BITS
            for j in range(L):
                t[i + j] = t[i + j] + lo[j : j + 1, :]
                t[i + j + 1] = t[i + j + 1] + hi[j : j + 1, :]
            t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
        res, extra = norm_rows(t[L : 2 * L + 1])
        diff, borrow = sub_p(res)
        use_diff = (extra > 0) | (borrow == 0)
        return select_rows(use_diff, diff, res)

    def add(a_rows, b_rows):
        rows = [a_rows[i] + b_rows[i] for i in range(L)] + [zero_row]
        res, carry = norm_rows(rows)
        diff, borrow = sub_p(res)
        return select_rows((carry > 0) | (borrow == 0), diff, res)

    def sub(a_rows, b_rows):
        diff, borrow = [], zero_row
        for i in range(L):
            d = a_rows[i] - b_rows[i] - borrow
            borrow = (d >> 31) & 1
            diff.append(d & mask)
        plus, carry = [], zero_row
        for i in range(L):
            v = diff[i] + p[i : i + 1, :] + carry
            plus.append(v & mask)
            carry = v >> LIMB_BITS
        return select_rows(borrow == 1, plus, diff)

    def is_zero(rows):
        acc = rows[0]
        for r in rows[1:]:
            acc = acc | r
        return acc == 0  # [1, T] bool

    return mul, add, sub, is_zero, select_rows


def _fused_add_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                     p_ref, one_ref, ox_ref, oy_ref, oz_ref, *, n0: int):
    mask = jnp.uint32(LIMB_MASK)
    n0_u = jnp.uint32(n0)
    p = p_ref[...]  # [L, 1]
    T = x1_ref.shape[1]
    zero_row = jnp.zeros((1, T), jnp.uint32)
    mul, add, sub, is_zero, select_rows = _emit_field_ops(p, mask, n0_u, zero_row)

    def rows(ref):
        a = ref[...]
        return [a[i : i + 1, :] for i in range(L)]

    X1, Y1, Z1 = rows(x1_ref), rows(y1_ref), rows(z1_ref)
    X2, Y2, Z2 = rows(x2_ref), rows(y2_ref), rows(z2_ref)

    # ---- general addition (add-2007-bl shape, as in g1_limb.add) ----
    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    rr = sub(S2, S1)
    rr2 = add(rr, rr)
    H2 = add(H, H)
    I = mul(H2, H2)
    J = mul(H, I)
    V = mul(U1, I)
    X3 = sub(sub(mul(rr2, rr2), J), add(V, V))
    SJ = mul(S1, J)
    Y3 = sub(mul(rr2, sub(V, X3)), add(SJ, SJ))
    Zsum = add(Z1, Z2)
    Z3 = mul(sub(sub(mul(Zsum, Zsum), Z1Z1), Z2Z2), H)

    # ---- doubling of P (dbl-2009-l shape, a = 0) ----
    A = mul(X1, X1)
    B = mul(Y1, Y1)
    C = mul(B, B)
    t = add(X1, B)
    D = sub(sub(mul(t, t), A), C)
    D = add(D, D)
    E = add(add(A, A), A)
    F = mul(E, E)
    Xd = sub(F, add(D, D))
    c8 = add(C, C)
    c8 = add(c8, c8)
    c8 = add(c8, c8)
    Yd = sub(mul(E, sub(D, Xd)), c8)
    Zd = mul(add(Y1, Y1), Z1)

    # ---- case selection (identical policy to g1_limb.add) ----
    h_zero = is_zero(H)
    r_zero = is_zero(rr)
    p_ident = is_zero(Z1)
    q_ident = is_zero(Z2)

    one = one_ref[...]  # [L, 1] Montgomery one
    ident_x = [jnp.broadcast_to(one[i : i + 1, :], (1, T)) for i in range(L)]
    ident_z = [zero_row for _ in range(L)]

    outs = []
    for gen, dbl, ident, pp, qq in (
        (X3, Xd, ident_x, X1, X2),
        (Y3, Yd, ident_x, Y1, Y2),
        (Z3, Zd, ident_z, Z1, Z2),
    ):
        o = select_rows(h_zero & r_zero, dbl, gen)
        o = select_rows(h_zero & ~r_zero & ~p_ident & ~q_ident, ident, o)
        o = select_rows(q_ident, pp, o)
        o = select_rows(p_ident, qq, o)
        outs.append(jnp.concatenate(o, axis=0))

    ox_ref[...] = outs[0]
    oy_ref[...] = outs[1]
    oz_ref[...] = outs[2]


def _madd_math(X1, Y1, Z1, X2, Y2, one_rows, zero_row, mul, add, sub, is_zero,
               select_rows):
    """Complete mixed add (madd-2007-bl + doubling + identity cascade) on
    limb-row lists — the math shared by the fused Pallas kernel and the
    eager CPU oracle test (tests/test_pallas.py); mirrors
    :func:`g1_limb.madd` exactly."""
    T = X1[0].shape[1]
    # ---- general mixed addition (Z2 = 1) ----
    Z1Z1 = mul(Z1, Z1)
    U2 = mul(X2, Z1Z1)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, X1)
    rr = sub(S2, Y1)
    HH = mul(H, H)
    I = add(add(HH, HH), add(HH, HH))
    J = mul(H, I)
    r2 = add(rr, rr)
    V = mul(X1, I)
    X3 = sub(sub(mul(r2, r2), J), add(V, V))
    YJ = mul(Y1, J)
    Y3 = sub(mul(r2, sub(V, X3)), add(YJ, YJ))
    Zsum = add(Z1, H)
    Z3 = sub(sub(mul(Zsum, Zsum), Z1Z1), HH)

    # ---- doubling of P (dbl-2009-l shape, a = 0) ----
    A = mul(X1, X1)
    B = mul(Y1, Y1)
    C = mul(B, B)
    t = add(X1, B)
    D = sub(sub(mul(t, t), A), C)
    D = add(D, D)
    E = add(add(A, A), A)
    F = mul(E, E)
    Xd = sub(F, add(D, D))
    c8 = add(C, C)
    c8 = add(c8, c8)
    c8 = add(c8, c8)
    Yd = sub(mul(E, sub(D, Xd)), c8)
    Zd = mul(add(Y1, Y1), Z1)

    # ---- case selection (identical policy to g1_limb.madd) ----
    h_zero = is_zero(H)
    r_zero = is_zero(rr)
    p_ident = is_zero(Z1)
    q_ident = is_zero(X2) & is_zero(Y2)

    ident_x = [jnp.broadcast_to(one_rows[i], (1, T)) for i in range(L)]
    ident_z = [zero_row for _ in range(L)]
    one_bcast = ident_x

    outs = []
    for gen, dbl, ident, pp, qq in (
        (X3, Xd, ident_x, X1, X2),
        (Y3, Yd, ident_x, Y1, Y2),
        (Z3, Zd, ident_z, Z1, one_bcast),
    ):
        o = select_rows(h_zero & r_zero & ~p_ident & ~q_ident, dbl, gen)
        o = select_rows(h_zero & ~r_zero & ~p_ident & ~q_ident, ident, o)
        o = select_rows(p_ident, qq, o)
        o = select_rows(q_ident, pp, o)
        outs.append(o)
    return outs


def _fused_madd_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
                       p_ref, one_ref, ox_ref, oy_ref, oz_ref, *, n0: int):
    mask = jnp.uint32(LIMB_MASK)
    n0_u = jnp.uint32(n0)
    p = p_ref[...]  # [L, 1]
    T = x1_ref.shape[1]
    zero_row = jnp.zeros((1, T), jnp.uint32)
    mul, add, sub, is_zero, select_rows = _emit_field_ops(p, mask, n0_u, zero_row)

    def rows(ref):
        a = ref[...]
        return [a[i : i + 1, :] for i in range(L)]

    one = one_ref[...]
    one_rows = [one[i : i + 1, :] for i in range(L)]
    outs = _madd_math(rows(x1_ref), rows(y1_ref), rows(z1_ref),
                      rows(x2_ref), rows(y2_ref), one_rows, zero_row,
                      mul, add, sub, is_zero, select_rows)
    ox_ref[...] = jnp.concatenate(outs[0], axis=0)
    oy_ref[...] = jnp.concatenate(outs[1], axis=0)
    oz_ref[...] = jnp.concatenate(outs[2], axis=0)


@lru_cache(maxsize=4)
def make_fused_madd(tile: int = TILE):
    """Fused complete mixed add: fn(p3, (x2, y2)) on [24, B] limb arrays
    (B % tile == 0) — ~18 Montgomery muls in ONE ``pallas_call`` vs the
    composed madd's ~30 separate kernel launches."""
    p_limbs_np = np.asarray(int_to_limbs(Q, L)).reshape(L, 1)
    one_np = np.asarray(int_to_limbs(Fq.PARAMS.montgomery_r % Q, L)).reshape(L, 1)
    n0 = (-pow(Q, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    kernel = partial(_fused_madd_kernel, n0=n0)

    @jax.jit
    def fused_madd(p3, q2):
        X1, Y1, Z1 = p3
        X2, Y2 = q2
        B = X1.shape[1]
        if B % tile:
            raise ValueError(f"batch {B} not divisible by tile {tile}")
        grid = (B // tile,)
        coord_spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        const_spec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, B), jnp.uint32) for _ in range(3)
            ),
            grid=grid,
            in_specs=[coord_spec] * 5 + [const_spec, const_spec],
            out_specs=(coord_spec, coord_spec, coord_spec),
            interpret=jax.default_backend() != "tpu",
        )(X1, Y1, Z1, X2, Y2, jnp.asarray(p_limbs_np), jnp.asarray(one_np))
        return out

    return fused_madd


def madd_math_eager(p3_np, q2_np):
    """Run the madd math EAGERLY (no jit, no Pallas) on numpy [24, B] limb
    arrays — the CPU-feasible oracle for the fused kernel's arithmetic
    (the fused kernel itself only compiles tractably on TPU)."""
    p_limbs = jnp.asarray(np.asarray(int_to_limbs(Q, L)).reshape(L, 1))
    one_np = np.asarray(int_to_limbs(Fq.PARAMS.montgomery_r % Q, L)).reshape(L, 1)
    n0 = (-pow(Q, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    B = p3_np[0].shape[1]
    zero_row = jnp.zeros((1, B), jnp.uint32)
    mul, add, sub, is_zero, select_rows = _emit_field_ops(
        p_limbs, jnp.uint32(LIMB_MASK), jnp.uint32(n0), zero_row
    )

    def rows(a):
        a = jnp.asarray(a)
        return [a[i : i + 1, :] for i in range(L)]

    one_rows = rows(one_np)
    outs = _madd_math(rows(p3_np[0]), rows(p3_np[1]), rows(p3_np[2]),
                      rows(q2_np[0]), rows(q2_np[1]), one_rows, zero_row,
                      mul, add, sub, is_zero, select_rows)
    return tuple(np.concatenate([np.asarray(r) for r in o], axis=0) for o in outs)


@lru_cache(maxsize=4)
def make_fused_add(tile: int = TILE):
    """Returns fn(p3, q3) on ([24, B],)*3 coordinate tuples (B % tile == 0)."""
    p_limbs_np = np.asarray(int_to_limbs(Q, L)).reshape(L, 1)
    one_np = np.asarray(int_to_limbs(Fq.PARAMS.montgomery_r % Q, L)).reshape(L, 1)
    n0 = (-pow(Q, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    kernel = partial(_fused_add_kernel, n0=n0)

    @jax.jit
    def fused_add(p3, q3):
        X1, Y1, Z1 = p3
        X2, Y2, Z2 = q3
        B = X1.shape[1]
        if B % tile:
            raise ValueError(f"batch {B} not divisible by tile {tile}")
        grid = (B // tile,)
        coord_spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        const_spec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, B), jnp.uint32) for _ in range(3)
            ),
            grid=grid,
            in_specs=[coord_spec] * 6 + [const_spec, const_spec],
            out_specs=(coord_spec, coord_spec, coord_spec),
            # non-TPU backends (tests, virtual meshes) can't lower Mosaic;
            # run the same kernel under the Pallas interpreter there
            interpret=jax.default_backend() != "tpu",
        )(X1, Y1, Z1, X2, Y2, Z2, jnp.asarray(p_limbs_np), jnp.asarray(one_np))
        return out

    return fused_add
