"""Dense univariate polynomials over Fr, backed by FrVec limb vectors.

Replaces ``ark_poly::univariate::DensePolynomial`` (SURVEY.md §2.3).  The
coefficient storage is a numpy ``[N, 4]`` u64 Montgomery array
(:class:`simpleworks_tpu.fields.frvec.FrVec`) so every arithmetic path runs
through the native/device batch kernels instead of Python bigints.
Multiplication routes through domain NTTs beyond a schoolbook cutoff.
"""

from __future__ import annotations

from ..fields.bls12_377 import FR_MODULUS
from ..fields.frvec import FrVec
from .domain import Radix2Domain

P = FR_MODULUS

_SCHOOLBOOK_CUTOFF = 64


class DensePoly:
    __slots__ = ("vec",)

    def __init__(self, coeffs):
        """``coeffs``: list of ints, or an FrVec (trimmed either way)."""
        if isinstance(coeffs, FrVec):
            v = coeffs
        else:
            v = FrVec.from_ints(list(coeffs))
        n = v.nonzero_length()
        self.vec = v if n == len(v) else v[:n]

    @property
    def coeffs(self) -> list[int]:
        """Standard-form coefficient list (compat/serde path — converts)."""
        return self.vec.to_ints()

    @staticmethod
    def zero() -> "DensePoly":
        return DensePoly(FrVec.zeros(0))

    @staticmethod
    def constant(c: int) -> "DensePoly":
        return DensePoly([c])

    def degree(self) -> int:
        return len(self.vec) - 1

    def is_zero(self) -> bool:
        return len(self.vec) == 0

    def evaluate(self, point: int) -> int:
        return self.vec.horner(point % P)

    def __add__(self, other: "DensePoly") -> "DensePoly":
        n = max(len(self.vec), len(other.vec))
        return DensePoly(self.vec.pad_to(n) + other.vec.pad_to(n))

    def __sub__(self, other: "DensePoly") -> "DensePoly":
        n = max(len(self.vec), len(other.vec))
        return DensePoly(self.vec.pad_to(n) - other.vec.pad_to(n))

    def scale(self, s: int) -> "DensePoly":
        return DensePoly(self.vec.scale(s % P))

    def __mul__(self, other: "DensePoly") -> "DensePoly":
        if self.is_zero() or other.is_zero():
            return DensePoly.zero()
        la, lb = len(self.vec), len(other.vec)
        if min(la, lb) <= _SCHOOLBOOK_CUTOFF and max(la, lb) <= 4 * _SCHOOLBOOK_CUTOFF:
            a, b = self.vec.to_ints(), other.vec.to_ints()
            out = [0] * (la + lb - 1)
            for i, x in enumerate(a):
                if x:
                    for j, y in enumerate(b):
                        out[i + j] = (out[i + j] + x * y) % P
            return DensePoly(out)
        domain = Radix2Domain.new_for(la + lb - 1)
        ea = domain.fft_vec(self.vec)
        eb = domain.fft_vec(other.vec)
        return DensePoly(domain.ifft_vec(ea * eb))

    def mul_by_vanishing(self, domain: Radix2Domain) -> "DensePoly":
        """p(X)·(X^n − 1)."""
        n = domain.size
        k = len(self.vec)
        hi = self.vec.pad_to(k + n)  # p(X) at offset 0, to be shifted
        shifted = FrVec.concat([FrVec.zeros(n), self.vec])
        return DensePoly(shifted - hi)

    def divide_by_linear(self, z: int) -> tuple["DensePoly", int]:
        """(quotient, remainder) of division by (X − z) — synthetic division.
        The KZG witness polynomial computation."""
        if self.is_zero():
            return DensePoly.zero(), 0
        quot, rem = self.vec.div_linear(z % P)
        return DensePoly(quot), rem

    @staticmethod
    def from_evals(domain: Radix2Domain, evals) -> "DensePoly":
        v = evals if isinstance(evals, FrVec) else FrVec.from_ints(list(evals))
        return DensePoly(domain.ifft_vec(v.pad_to(domain.size)))

    def __repr__(self):
        return f"DensePoly(deg={self.degree()})"
