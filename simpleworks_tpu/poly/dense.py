"""Dense univariate polynomials over Fr (coefficient form, Python ints).

Replaces ``ark_poly::univariate::DensePolynomial`` (SURVEY.md §2.3).
Multiplication routes through domain NTTs beyond a schoolbook cutoff.
"""

from __future__ import annotations

from ..fields.bls12_377 import FR_MODULUS
from .domain import Radix2Domain

P = FR_MODULUS

_SCHOOLBOOK_CUTOFF = 64


def _trim(coeffs: list[int]) -> list[int]:
    out = [c % P for c in coeffs]
    while out and out[-1] == 0:
        out.pop()
    return out


class DensePoly:
    __slots__ = ("coeffs",)

    def __init__(self, coeffs: list[int]):
        self.coeffs = _trim(list(coeffs))

    @staticmethod
    def zero() -> "DensePoly":
        return DensePoly([])

    @staticmethod
    def constant(c: int) -> "DensePoly":
        return DensePoly([c])

    def degree(self) -> int:
        return len(self.coeffs) - 1 if self.coeffs else -1

    def is_zero(self) -> bool:
        return not self.coeffs

    def evaluate(self, point: int) -> int:
        if len(self.coeffs) >= 1024:
            from ..native import available as native_available, fr_horner

            if native_available():
                return fr_horner(self.coeffs, point % P)
        acc = 0
        for c in reversed(self.coeffs):
            acc = (acc * point + c) % P
        return acc

    def __add__(self, other: "DensePoly") -> "DensePoly":
        n = max(len(self.coeffs), len(other.coeffs))
        a = self.coeffs + [0] * (n - len(self.coeffs))
        b = other.coeffs + [0] * (n - len(other.coeffs))
        return DensePoly([(x + y) % P for x, y in zip(a, b)])

    def __sub__(self, other: "DensePoly") -> "DensePoly":
        n = max(len(self.coeffs), len(other.coeffs))
        a = self.coeffs + [0] * (n - len(self.coeffs))
        b = other.coeffs + [0] * (n - len(other.coeffs))
        return DensePoly([(x - y) % P for x, y in zip(a, b)])

    def scale(self, s: int) -> "DensePoly":
        return DensePoly([c * s % P for c in self.coeffs])

    def __mul__(self, other: "DensePoly") -> "DensePoly":
        if self.is_zero() or other.is_zero():
            return DensePoly.zero()
        la, lb = len(self.coeffs), len(other.coeffs)
        if min(la, lb) <= _SCHOOLBOOK_CUTOFF:
            out = [0] * (la + lb - 1)
            for i, a in enumerate(self.coeffs):
                if a:
                    for j, b in enumerate(other.coeffs):
                        out[i + j] = (out[i + j] + a * b) % P
            return DensePoly(out)
        domain = Radix2Domain.new_for(la + lb - 1)
        ea = domain.fft(self.coeffs)
        eb = domain.fft(other.coeffs)
        return DensePoly(domain.ifft([x * y % P for x, y in zip(ea, eb)]))

    def mul_by_vanishing(self, domain: Radix2Domain) -> "DensePoly":
        """p(X)·(X^n − 1)."""
        n = domain.size
        out = [0] * (len(self.coeffs) + n)
        for i, c in enumerate(self.coeffs):
            out[i + n] = (out[i + n] + c) % P
            out[i] = (out[i] - c) % P
        return DensePoly(out)

    def divide_by_linear(self, z: int) -> tuple["DensePoly", int]:
        """(quotient, remainder) of division by (X − z) — synthetic division.
        The KZG witness polynomial computation."""
        if self.is_zero():
            return DensePoly.zero(), 0
        d = len(self.coeffs) - 1
        quotient = [0] * d
        acc = 0
        for i in range(d, 0, -1):
            acc = (self.coeffs[i] + acc * z) % P
            quotient[i - 1] = acc
        remainder = (self.coeffs[0] + acc * z) % P
        return DensePoly(quotient), remainder

    @staticmethod
    def from_evals(domain: Radix2Domain, evals: list[int]) -> "DensePoly":
        return DensePoly(domain.ifft(list(evals) + [0] * (domain.size - len(evals))))

    def shift_up(self, k: int) -> "DensePoly":
        """X^k · p(X) (degree-bound shift for MarlinKZG)."""
        if self.is_zero():
            return self
        return DensePoly([0] * k + self.coeffs)

    def __repr__(self):
        return f"DensePoly(deg={self.degree()})"
