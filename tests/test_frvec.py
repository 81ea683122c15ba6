"""FrVec (numpy limb vector) vs Python-bigint oracle, native and fallback."""

import numpy as np
import pytest

from simpleworks_tpu.fields.bls12_377 import FR_MODULUS as P
from simpleworks_tpu.fields.frvec import FrVec
from simpleworks_tpu import native

rng = np.random.default_rng(7)


def rand_ints(n):
    return [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]


@pytest.mark.parametrize("use_native", [True, False])
def test_roundtrip_and_binops(use_native, monkeypatch):
    if not use_native:
        monkeypatch.setenv("SWTPU_NATIVE", "0")
    elif not native.available():
        pytest.skip("native lib not built")
    xs, ys = rand_ints(33), rand_ints(33)
    a, b = FrVec.from_ints(xs), FrVec.from_ints(ys)
    assert a.to_ints() == xs
    assert (a + b).to_ints() == [(x + y) % P for x, y in zip(xs, ys)]
    assert (a - b).to_ints() == [(x - y) % P for x, y in zip(xs, ys)]
    assert (a * b).to_ints() == [x * y % P for x, y in zip(xs, ys)]
    assert a.mul_add(b, a).to_ints() == [(x * y + x) % P for x, y in zip(xs, ys)]
    assert a.scale(xs[0]).to_ints() == [x * xs[0] % P for x in xs]
    assert a.rsub_scalar(5).to_ints() == [(5 - x) % P for x in xs]
    assert a.sum() == sum(xs) % P
    assert a.neg().to_ints() == [(-x) % P for x in xs]


def test_inverse_with_zeros():
    xs = rand_ints(20)
    xs[3] = 0
    xs[17] = 0
    inv = FrVec.from_ints(xs).inv().to_ints()
    for x, i in zip(xs, inv):
        assert i == (pow(x, P - 2, P) if x else 0)


def test_powers_horner_divlinear():
    base = rand_ints(1)[0]
    pw = FrVec.powers(base, 17).to_ints()
    assert pw == [pow(base, i, P) for i in range(17)]
    coeffs = rand_ints(50)
    z = rand_ints(1)[0]
    v = FrVec.from_ints(coeffs)
    expected = 0
    for c in reversed(coeffs):
        expected = (expected * z + c) % P
    assert v.horner(z) == expected
    quot, rem = v.div_linear(z)
    assert rem == expected
    # (X-z)*q + rem == p
    q = quot.to_ints()
    recon = [0] * len(coeffs)
    recon[0] = (rem - z * q[0]) % P
    for i in range(1, len(coeffs) - 1):
        recon[i] = (q[i - 1] - z * q[i]) % P
    recon[-1] = q[-1]
    assert recon == coeffs


def test_spmv_matches_loop():
    n_terms, out_len, x_len = 200, 37, 29
    rows = rng.integers(0, out_len, n_terms).astype(np.uint32)
    cols = rng.integers(0, x_len, n_terms).astype(np.uint32)
    coeffs = rand_ints(n_terms)
    xs = rand_ints(x_len)
    out = FrVec.spmv(rows, cols, FrVec.from_ints(coeffs), FrVec.from_ints(xs), out_len)
    expected = [0] * out_len
    for r, c, v in zip(rows, cols, coeffs):
        expected[int(r)] = (expected[int(r)] + v * xs[int(c)]) % P
    assert out.to_ints() == expected


def test_structural_and_device_bridge():
    xs = rand_ints(10) + [0, 0]
    v = FrVec.from_ints(xs)
    assert v.nonzero_length() == 10
    assert v.pad_to(20).to_ints() == xs + [0] * 8
    assert FrVec.concat([v, v]).to_ints() == xs + xs
    limbs = v.to_device_limbs()
    assert limbs.shape == (12, 16) and limbs.dtype == np.uint32
    assert FrVec.from_device_limbs(limbs).to_ints() == xs
    # limb semantics: limb t = bits [16t, 16t+16) of the Montgomery repr
    from simpleworks_tpu.fields.bls12_377 import Fr

    R = Fr.PARAMS.montgomery_r
    m = xs[0] * R % P
    assert [int(limbs[0, t]) for t in range(16)] == [(m >> (16 * t)) & 0xFFFF for t in range(16)]
