"""Native (C++) runtime kernels vs the exact Python oracles."""

import random

import pytest

from simpleworks_tpu import native
from simpleworks_tpu.curves.bls12_377 import G1Point
from simpleworks_tpu.fields.bls12_377 import FQ_MODULUS, FR_MODULUS
from simpleworks_tpu.kzg.msm import msm
from simpleworks_tpu.poly.domain import Radix2Domain

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")
rnd = random.Random(99)


@pytest.mark.parametrize("field,p", [("fr", FR_MODULUS), ("fq", FQ_MODULUS)])
def test_native_fp_mul(field, p):
    a = [rnd.randrange(p) for _ in range(64)] + [0, 1, p - 1]
    b = [rnd.randrange(p) for _ in range(64)] + [p - 1, p - 1, p - 1]
    got = native.fp_mul_batch(field, a, b)
    assert got == [x * y % p for x, y in zip(a, b)]


@pytest.mark.parametrize("n", [8, 256])
def test_native_ntt_matches_host(n):
    values = [rnd.randrange(FR_MODULUS) for _ in range(n)]
    domain = Radix2Domain(n)
    got = native.ntt_fr(values, domain.group_gen)
    assert got == domain.fft(values)
    # inverse
    back = native.ntt_fr(got, domain.group_gen_inv, scale=domain.size_inv)
    assert back == values


def test_native_msm_matches_python():
    g = G1Point.generator()
    points = [g.scalar_mul(i + 1) for i in range(50)]
    scalars = [rnd.randrange(FR_MODULUS) for _ in range(50)]
    got = native.g1_msm(points, scalars)
    assert got == msm(points, scalars)


def test_native_fixed_base():
    g = G1Point.generator()
    scalars = [1, 2, 255, 256, 257, rnd.randrange(FR_MODULUS)]
    got = native.g1_fixed_base(g, scalars)
    for s, p in zip(scalars, got):
        assert p == g.scalar_mul(s)


def test_native_combine_and_horner():
    p = FR_MODULUS
    polys = [
        ([rnd.randrange(p) for _ in range(20)], rnd.randrange(p)),
        ([rnd.randrange(p) for _ in range(35)], rnd.randrange(p)),
    ]
    got = native.fr_combine(polys)
    expected = [0] * 35
    for coeffs, w in polys:
        for i, c in enumerate(coeffs):
            expected[i] = (expected[i] + w * c) % p
    assert got == expected

    coeffs = [rnd.randrange(p) for _ in range(50)]
    z = rnd.randrange(p)
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % p
    assert native.fr_horner(coeffs, z) == acc


def test_native_msm_raw_matches():
    g = G1Point.generator()
    points = [g.scalar_mul(i + 2) for i in range(40)]
    scalars = [rnd.randrange(FR_MODULUS) for _ in range(40)]
    pts_native = native._points_to_native(points)
    got = native.g1_msm_raw(pts_native, scalars)
    assert got == msm(points, scalars)


def test_native_msm_affine_matches_jacobian():
    """Batch-affine Pippenger (bucket adds in affine coordinates with one
    batched inversion per round) == Jacobian Pippenger == Python oracle,
    across window sizes, including zero/unit scalars, duplicate points
    (bucket doublings) and identity rows."""
    from simpleworks_tpu.fields.frvec import FrVec

    g = G1Point.generator()
    n = 200
    points = [g.scalar_mul(i + 2) for i in range(n)]
    points[5] = points[4]                      # duplicate -> bucket doubling
    scalars = [rnd.randrange(FR_MODULUS) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[3] = scalars[2]
    pts = native._points_to_native(points)
    norm = native.g1_ensure_normalized(pts.copy())
    norm[7] = 0                                # identity row
    jac = norm.copy()                          # Z==1 is valid Jacobian input
    std = FrVec.from_ints(scalars).to_std_array()
    for wb in (2, 8, 13):
        a = native.g1_msm_arr(jac, std, window_bits=wb)
        b = native.g1_msm_affine_arr(norm, std, window_bits=wb)
        assert a == b, wb
    # normalization is detected and skipped on an already-normalized table
    again = native.g1_ensure_normalized(norm)
    assert again is norm
