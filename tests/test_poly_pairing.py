"""Polynomial stack + BLS12-377 group/pairing tests (oracle checks for the
Marlin prover's building blocks)."""

import random

import pytest

from simpleworks_tpu.curves.bls12_377 import (
    G1_COFACTOR,
    G2_COFACTOR,
    G1Point,
    G2Point,
)
from simpleworks_tpu.curves.fq_tower import Fq2, Fq12
from simpleworks_tpu.curves.pairing import multi_pairing, pairing
from simpleworks_tpu.fields.bls12_377 import FQ_MODULUS, FR_MODULUS
from simpleworks_tpu.poly.dense import DensePoly
from simpleworks_tpu.poly.domain import Radix2Domain

P = FR_MODULUS
rnd = random.Random(42)


# ------------------------------------------------------------- poly -------


def test_fft_round_trip():
    domain = Radix2Domain(16)
    coeffs = [rnd.randrange(P) for _ in range(16)]
    evals = domain.fft(coeffs)
    assert domain.ifft(evals) == coeffs


def test_fft_matches_naive_eval():
    domain = Radix2Domain(8)
    coeffs = [rnd.randrange(P) for _ in range(5)]
    poly = DensePoly(coeffs)
    evals = domain.fft(coeffs)
    for i, x in enumerate(domain.elements()):
        assert evals[i] == poly.evaluate(x)


def test_coset_fft():
    domain = Radix2Domain(8)
    shift = 22
    coeffs = [rnd.randrange(P) for _ in range(8)]
    poly = DensePoly(coeffs)
    evals = domain.coset_fft(coeffs, shift)
    for i, x in enumerate(domain.elements()):
        assert evals[i] == poly.evaluate(shift * x % P)
    assert domain.coset_ifft(evals, shift) == coeffs


def test_poly_mul_matches_schoolbook():
    a = DensePoly([rnd.randrange(P) for _ in range(70)])
    b = DensePoly([rnd.randrange(P) for _ in range(90)])
    big = a * b  # NTT path
    # schoolbook oracle
    out = [0] * (70 + 90 - 1)
    for i, x in enumerate(a.coeffs):
        for j, y in enumerate(b.coeffs):
            out[i + j] = (out[i + j] + x * y) % P
    assert big.coeffs == DensePoly(out).coeffs


def test_divide_by_vanishing():
    domain = Radix2Domain(8)
    q = DensePoly([rnd.randrange(P) for _ in range(5)])
    r = DensePoly([rnd.randrange(P) for _ in range(8)])
    p = q.mul_by_vanishing(domain) + r
    q2, r2 = domain.divide_by_vanishing(p.coeffs)
    assert q2 == q.coeffs and r2 == r.coeffs


def test_divide_by_linear():
    p = DensePoly([rnd.randrange(P) for _ in range(10)])
    z = rnd.randrange(P)
    q, rem = p.divide_by_linear(z)
    assert rem == p.evaluate(z)
    # p(X) = q(X)(X - z) + rem
    recon = q * DensePoly([(-z) % P, 1]) + DensePoly([rem])
    assert recon.coeffs == p.coeffs


def test_lagrange_coeffs():
    domain = Radix2Domain(8)
    evals = [rnd.randrange(P) for _ in range(8)]
    poly = DensePoly(domain.ifft(evals))
    z = rnd.randrange(P)
    lag = domain.lagrange_coeffs_at(z)
    got = sum(l * e for l, e in zip(lag, evals)) % P
    assert got == poly.evaluate(z)


# ------------------------------------------------------------- groups -----


def test_g1_generator_order():
    g = G1Point.generator()
    assert g.scalar_mul(FR_MODULUS - 1).add(g).is_identity()
    assert not g.scalar_mul(12345).is_identity()


def test_g1_group_laws():
    g = G1Point.generator()
    assert g.add(g) == g.double()
    a, b = g.scalar_mul(7), g.scalar_mul(11)
    assert a.add(b) == g.scalar_mul(18)
    assert a.add(a.neg()).is_identity()


def test_g1_serde():
    g = G1Point.generator().scalar_mul(99)
    data = g.serialize_compressed()
    assert len(data) == 48
    assert G1Point.deserialize_compressed(data) == g
    ident = G1Point.identity().serialize_compressed()
    assert G1Point.deserialize_compressed(ident).is_identity()


def test_fq2_arithmetic():
    a = Fq2(rnd.randrange(FQ_MODULUS), rnd.randrange(FQ_MODULUS))
    b = Fq2(rnd.randrange(FQ_MODULUS), rnd.randrange(FQ_MODULUS))
    assert (a * b) * a.inverse() == b
    assert a * a.inverse() == Fq2.one()
    s = a.square().sqrt()
    assert s is not None and s.square() == a.square()


def test_g2_generator_order():
    g = G2Point.generator()
    assert not g.is_identity()
    assert g.scalar_mul_unreduced(FR_MODULUS).is_identity()


def test_g2_group_laws():
    g = G2Point.generator()
    assert g.add(g) == g.double()
    a, b = g.scalar_mul(5), g.scalar_mul(9)
    assert a.add(b) == g.scalar_mul(14)


# ------------------------------------------------------------- pairing ----


def test_pairing_nondegenerate():
    e = pairing(G1Point.generator(), G2Point.generator())
    assert e != Fq12.one()
    # order r in GT
    assert e.pow(FR_MODULUS) == Fq12.one()


def test_pairing_bilinear():
    g1, g2 = G1Point.generator(), G2Point.generator()
    a, b = 6723, 994
    lhs = pairing(g1.scalar_mul(a), g2.scalar_mul(b))
    rhs = pairing(g1, g2).pow(a * b % FR_MODULUS)
    assert lhs == rhs
    # linearity in the first argument
    assert pairing(g1.scalar_mul(a + b), g2) == pairing(g1.scalar_mul(a), g2) * pairing(
        g1.scalar_mul(b), g2
    )


def test_multi_pairing_product():
    g1, g2 = G1Point.generator(), G2Point.generator()
    pairs = [(g1.scalar_mul(3), g2.scalar_mul(4)), (g1.scalar_mul(12).neg(), g2)]
    # e(3G,4H) · e(-12G,H) = e(G,H)^(12-12) = 1
    assert multi_pairing(pairs) == Fq12.one()
