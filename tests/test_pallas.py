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
