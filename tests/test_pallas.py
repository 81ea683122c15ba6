"""Pallas mont-mul kernel vs the host/jnp oracles (interpret mode on CPU)."""

import random

import numpy as np
import pytest

from simpleworks_tpu.fields.bls12_377 import Fr, FR_MODULUS
from simpleworks_tpu.fields.pack import pack_standard, unpack_standard

rnd = random.Random(11)


def test_pallas_mont_mul_matches_host():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from simpleworks_tpu.ops.mont_mul_pallas import make_mont_mul

    P, R = FR_MODULUS, Fr.PARAMS.montgomery_r
    B = 512
    av = [rnd.randrange(P) for _ in range(B)]
    bv = [rnd.randrange(P) for _ in range(B)]
    a = jnp.asarray(pack_standard([v * R % P for v in av], Fr.PARAMS)).T
    b = jnp.asarray(pack_standard([v * R % P for v in bv], Fr.PARAMS)).T
    mul = make_mont_mul(Fr.PARAMS)
    with pltpu.force_tpu_interpret_mode():
        out = mul(a, b)
    res = unpack_standard(np.asarray(out).T, Fr.PARAMS)
    rinv = pow(R, -1, P)
    assert [v * rinv % P for v in res] == [x * y % P for x, y in zip(av, bv)]


def test_fq_limb_pads_odd_batches():
    """FqLimb must zero-pad non-tile-multiple batches up to the Pallas tile
    (regression: an odd SRS length 524283 produced a tile-1 block spec the
    TPU lowering rejects).  Interpret mode exercises the real kernel path."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from simpleworks_tpu.fields.bls12_377 import Fq, FQ_MODULUS as Q
    from simpleworks_tpu.ops.g1_limb import L, FqLimb

    R = Fq.PARAMS.montgomery_r
    B = 13  # odd, far below the tile
    av = [rnd.randrange(Q) for _ in range(B)]
    bv = [rnd.randrange(Q) for _ in range(B)]

    def to_lm(vals):
        arr = np.zeros((L, len(vals)), np.uint32)
        for i, v in enumerate(vals):
            m = v * R % Q
            for t in range(L):
                arr[t, i] = (m >> (16 * t)) & 0xFFFF
        return jnp.asarray(arr)

    f = FqLimb(tile=128)  # smallest legal Pallas lane tile — keeps interpret mode fast
    f._use_pallas = True  # CPU default is the XLA path; force the kernel
    rinv = pow(R, -1, Q)

    def from_lm(arr):
        x = np.asarray(arr)
        return [
            sum(int(x[t, i]) << (16 * t) for t in range(L)) * rinv % Q
            for i in range(x.shape[1])
        ]

    with pltpu.force_tpu_interpret_mode():
        got_mul = from_lm(f.mul(to_lm(av), to_lm(bv)))
        got_add = from_lm(f.add(to_lm(av), to_lm(bv)))
        got_sub = from_lm(f.sub(to_lm(av), to_lm(bv)))
    assert got_mul == [x * y % Q for x, y in zip(av, bv)]
    assert got_add == [(x + y) % Q for x, y in zip(av, bv)]
    assert got_sub == [(x - y) % Q for x, y in zip(av, bv)]


def test_fused_madd_math_matches_composed_and_host():
    """The fused mixed-add kernel's arithmetic (ops/g1_fused_pallas
    _madd_math) — run EAGERLY, the CPU-feasible oracle since the fused
    kernel only compiles tractably on TPU — is bit-exact with the composed
    g1_limb.madd and the host point law, including identity/double/inverse
    edge cases."""
    from simpleworks_tpu.curves.bls12_377 import G1Point
    from simpleworks_tpu.ops import g1_limb
    from simpleworks_tpu.ops.g1_fused_pallas import madd_math_eager

    g = G1Point.generator()
    pts_p = [g.scalar_mul(i * 7919 + 3) for i in range(8)]
    pts_q = [g.scalar_mul(i * 104729 + 11) for i in range(8)]
    pts_p[0] = G1Point.identity()
    pts_q[1] = G1Point.identity()
    pts_q[2] = pts_p[2]          # doubling
    pts_q[3] = pts_p[3].neg()    # P + (-P) = identity
    pts_p[4] = G1Point.identity()
    pts_q[4] = G1Point.identity()
    P3 = g1_limb.points_to_limb_major(pts_p)        # arbitrary Jacobian acc
    Q2 = g1_limb.points_to_limb_major_affine(pts_q)[:2]
    import numpy as np

    eager = madd_math_eager(tuple(np.asarray(a) for a in P3),
                            tuple(np.asarray(a) for a in Q2))
    got = g1_limb.points_from_limb_major(eager)
    composed = g1_limb.points_from_limb_major(g1_limb._madd_composed(P3, Q2))
    host = [a.add(b) for a, b in zip(pts_p, pts_q)]
    assert got == composed == host
