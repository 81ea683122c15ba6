"""Field-layer tests: host exact arithmetic, serde round-trips
(reference src/fields/serialization.rs), and device limb kernels vs the
host oracle (SURVEY.md §4 'gadget vs native oracle' pattern applied to
kernels)."""

import random

import numpy as np
import pytest

from simpleworks_tpu.fields.bls12_377 import (
    FQ_MODULUS,
    FR_MODULUS,
    FR_ED_MODULUS,
    Fq,
    Fr,
    FrEd,
    TWO_ADIC_ROOT_OF_UNITY_FR,
    TWO_ADICITY_FR,
    fr_root_of_unity,
)
from simpleworks_tpu.fields.device import DeviceField, int_to_limbs, limbs_to_int
from simpleworks_tpu.utils.rng import test_rng

rnd = random.Random(1729)


def test_moduli_are_prime_shape():
    assert FR_MODULUS.bit_length() == 253
    assert FQ_MODULUS.bit_length() == 377
    assert FR_ED_MODULUS.bit_length() == 251
    assert (FR_MODULUS - 1) % (1 << 47) == 0
    assert (FQ_MODULUS - 1) % (1 << 46) == 0


def test_two_adic_root_of_unity():
    w = TWO_ADIC_ROOT_OF_UNITY_FR
    assert pow(w, 1 << TWO_ADICITY_FR, FR_MODULUS) == 1
    assert pow(w, 1 << (TWO_ADICITY_FR - 1), FR_MODULUS) == FR_MODULUS - 1
    w8 = fr_root_of_unity(8)
    assert pow(w8, 8, FR_MODULUS) == 1
    assert pow(w8, 4, FR_MODULUS) != 1


@pytest.mark.parametrize("F", [Fr, Fq, FrEd])
def test_field_arithmetic_basics(F):
    a = F(rnd.randrange(F.PARAMS.modulus))
    b = F(rnd.randrange(F.PARAMS.modulus))
    assert (a + b) - b == a
    assert (a * b) / b == a if not b.is_zero() else True
    assert a * F.one() == a
    assert a + F.zero() == a
    assert (-a) + a == F.zero()
    assert a.square() == a * a
    assert (a.inverse() * a).is_one()


@pytest.mark.parametrize("F", [Fr, Fq])
def test_sqrt(F):
    a = F(rnd.randrange(F.PARAMS.modulus))
    sq = a.square()
    root = sq.sqrt()
    assert root is not None
    assert root.square() == sq


def test_serialize_round_trip():
    # reference src/fields/serialization.rs:5-16 — LE bytes of byte_size len
    a = Fr.rand(test_rng())
    data = a.serialize()
    assert len(data) == 32
    assert Fr.deserialize(data) == a
    b = Fq.rand(test_rng())
    data = b.serialize()
    assert len(data) == 48
    assert Fq.deserialize(data) == b


def test_to_bytes_raw_lengths():
    assert len(Fr(1).to_bytes_raw()) == 32
    assert len(Fq(1).to_bytes_raw()) == 48


def test_rand_is_deterministic_and_valid():
    a = Fr.rand(test_rng())
    b = Fr.rand(test_rng())
    assert a == b
    assert 0 <= a.value < FR_MODULUS
    # consuming the stream moves on
    rng = test_rng()
    c, d = Fr.rand(rng), Fr.rand(rng)
    assert c != d


def test_from_str_wraps_mod_p():
    # Poseidon constants are bls381-fr decimal strings reduced mod Fr
    s = "43228725308391137369947362226390319299014033584574058394339561338097152657858"
    assert Fr.from_str(s).value == int(s) % FR_MODULUS


def test_from_le_bytes_mod_order():
    data = bytes(range(48))
    assert Fr.from_le_bytes_mod_order(data).value == int.from_bytes(data, "little") % FR_MODULUS


# ---------------------------------------------------------------- device ----


@pytest.mark.parametrize("F", [Fr, Fq])
def test_limb_pack_round_trip(F):
    df = DeviceField(F.PARAMS)
    v = rnd.randrange(F.PARAMS.modulus)
    limbs = int_to_limbs(v, df.n_limbs)
    assert limbs_to_int(limbs) == v


@pytest.mark.parametrize("F", [Fr, Fq])
def test_device_mont_round_trip(F):
    df = DeviceField(F.PARAMS)
    vals = [rnd.randrange(F.PARAMS.modulus) for _ in range(8)]
    arr = df.to_mont(vals)
    assert df.from_mont(arr) == vals


@pytest.mark.parametrize("F", [Fr, Fq])
def test_device_add_sub_neg_vs_host(F):
    p = F.PARAMS.modulus
    df = DeviceField(F.PARAMS)
    a = [rnd.randrange(p) for _ in range(32)] + [0, p - 1, 1]
    b = [rnd.randrange(p) for _ in range(32)] + [0, 1, p - 1]
    da, db = df.to_mont(a), df.to_mont(b)
    assert df.from_mont(df.add(da, db)) == [(x + y) % p for x, y in zip(a, b)]
    assert df.from_mont(df.sub(da, db)) == [(x - y) % p for x, y in zip(a, b)]
    assert df.from_mont(df.neg(da)) == [(-x) % p for x in a]


@pytest.mark.parametrize("F", [Fr, Fq])
def test_device_mul_vs_host(F):
    p = F.PARAMS.modulus
    df = DeviceField(F.PARAMS)
    a = [rnd.randrange(p) for _ in range(64)] + [0, 1, p - 1, p - 1]
    b = [rnd.randrange(p) for _ in range(64)] + [p - 1, p - 1, p - 1, 1]
    da, db = df.to_mont(a), df.to_mont(b)
    assert df.from_mont(df.mul(da, db)) == [x * y % p for x, y in zip(a, b)]


def test_device_pow_and_select():
    p = Fr.PARAMS.modulus
    df = DeviceField(Fr.PARAMS)
    a = [rnd.randrange(p) for _ in range(8)]
    da = df.to_mont(a)
    assert df.from_mont(df.pow_host_exponent(da, 5)) == [pow(x, 5, p) for x in a]
    cond = np.array([True, False] * 4)
    sel = df.select(cond, da, df.to_mont([0] * 8))
    assert df.from_mont(sel) == [x if c else 0 for x, c in zip(a, cond)]
