"""Device polynomial plane (fields/dvec) vs FrVec host oracles —
bit-exact elementwise ops, log-depth division/evaluation reformulations,
and transforms (SURVEY.md §4 pattern 1 applied to the device plane)."""

import numpy as np
import pytest

from simpleworks_tpu.fields import dvec
from simpleworks_tpu.fields.bls12_377 import FR_MODULUS as P
from simpleworks_tpu.fields.frvec import FrVec
from simpleworks_tpu.poly.domain import Radix2Domain

rng = np.random.default_rng(21)


def rand_vec(n):
    return FrVec.from_ints(
        [int.from_bytes(rng.bytes(33), "little") % P for _ in range(n)]
    )


def roundtrip_equal(dv, vec):
    return np.array_equal(dvec.to_frvec(dv).a, vec.a)


def test_from_to_frvec_roundtrip():
    v = rand_vec(37)
    assert roundtrip_equal(dvec.from_frvec(v), v)


@pytest.mark.parametrize("n", [1, 5, 130])
def test_elementwise_matches_frvec(n):
    a, b = rand_vec(n), rand_vec(n)
    da, db = dvec.from_frvec(a), dvec.from_frvec(b)
    assert roundtrip_equal(dvec.mul(da, db), a * b)
    assert roundtrip_equal(dvec.add(da, db), a + b)
    assert roundtrip_equal(dvec.sub(da, db), a - b)


def test_scale_rsub_inv():
    a = rand_vec(19)
    da = dvec.from_frvec(a)
    s = 123456789
    assert roundtrip_equal(dvec.scale(da, dvec.mont_scalar_np(s)), a.scale(s))
    assert roundtrip_equal(dvec.rsub_scalar(da, dvec.mont_scalar_np(s)), a.rsub_scalar(s))
    withzero = FrVec.from_ints([0] + a.to_ints()[1:])
    assert roundtrip_equal(dvec.inv(dvec.from_frvec(withzero)), withzero.inv())


def test_sum_and_evaluate():
    a = rand_vec(23)
    da = dvec.from_frvec(a)
    assert dvec.scalar_to_int(dvec.sum_reduce(da)) == a.sum()
    z = 987654321
    assert dvec.scalar_to_int(dvec.evaluate(da, z)) == a.horner(z)


def test_powers_vec():
    base = 31337
    got = dvec.to_frvec(dvec.powers_vec(base, 11))
    assert got.to_ints() == FrVec.powers(base, 11).to_ints()


@pytest.mark.parametrize("n,ell", [(40, 8), (17, 4), (8, 8), (129, 16)])
def test_divide_by_vanishing(n, ell):
    a = rand_vec(n)
    q, r = dvec.divide_by_vanishing(dvec.from_frvec(a), ell)
    qh, rh = Radix2Domain(ell).divide_by_vanishing_vec(a)
    assert dvec.to_frvec(q).to_ints() == qh.to_ints()
    got_r = dvec.to_frvec(r).to_ints()
    want_r = rh.to_ints() + [0] * (len(got_r) - len(rh))
    assert got_r == want_r


def test_divide_by_linear():
    a = rand_vec(33)
    z = 424242
    q, r = dvec.divide_by_linear(dvec.from_frvec(a), dvec.mont_scalar_np(z), z_int=z)
    qh, rh = a.div_linear(z)
    assert dvec.to_frvec(q).to_ints() == qh.to_ints()
    assert dvec.scalar_to_int(r) == rh


@pytest.mark.parametrize("n", [8, 64, 256])
def test_fft_ifft_matches_domain(n):
    dom = Radix2Domain(n)
    a = rand_vec(n)
    da = dvec.from_frvec(a)
    assert dvec.to_frvec(dvec.fft(da, n)).to_ints() == dom.fft_vec(a).to_ints()
    assert dvec.to_frvec(dvec.ifft(da, n)).to_ints() == dom.ifft_vec(a).to_ints()
    # short input is zero-padded like the host fft
    short = rand_vec(n // 2)
    assert (
        dvec.to_frvec(dvec.fft(dvec.from_frvec(short), n)).to_ints()
        == dom.fft_vec(short).to_ints()
    )


def test_sum_limbs_raw_large_no_overflow():
    """Chunked raw limb sums stay exact at widths where a u32 (or silently
    downcast u64) accumulator would wrap — the σ₂-corruption regression
    caught at m = 2^18 on the real prover."""
    n = 1 << 15
    a = FrVec.from_ints([P - 1 - i for i in range(n)])
    raw = np.asarray(dvec.sum_limbs_raw(dvec.from_frvec(a)))
    assert dvec.limb_sums_to_int(raw) == a.sum()
