"""Radix-2 evaluation domains over BLS12-377 Fr (2-adicity 47).

Replaces ``ark_poly::GeneralEvaluationDomain`` for the Marlin prover
(SURVEY.md §2.3 'Dense univariate polys + radix-2 FFT domains').  The host
NTT here is the exact oracle; the TPU path is
:mod:`simpleworks_tpu.poly.ntt_device` (same twiddle/ordering conventions,
natural-order outputs).
"""

from __future__ import annotations

from functools import lru_cache

from ..errors import ensure
from ..fields.bls12_377 import FR_MODULUS, fr_root_of_unity

P = FR_MODULUS


def _bit_reverse_permute(values: list[int]) -> list[int]:
    n = len(values)
    bits = n.bit_length() - 1
    out = [0] * n
    for i, v in enumerate(values):
        j = int(bin(i)[2:].zfill(bits)[::-1], 2)
        out[j] = v
    return out


def ntt_host(values: list[int], omega: int) -> list[int]:
    """Iterative radix-2 Cooley-Tukey; natural-order in/out.

    Routes to the native C++ kernel when built (bit-exact; tested); the
    pure-Python path below is the oracle."""
    n = len(values)
    assert n & (n - 1) == 0
    if n >= 64:
        from ..native import available as native_available, ntt_fr

        if native_available():
            return ntt_fr([v % P for v in values], omega % P)
    a = _bit_reverse_permute([v % P for v in values])
    length = 2
    while length <= n:
        w_len = pow(omega, n // length, P)
        half = length // 2
        for start in range(0, n, length):
            w = 1
            for j in range(start, start + half):
                u = a[j]
                t = a[j + half] * w % P
                a[j] = (u + t) % P
                a[j + half] = (u - t) % P
                w = w * w_len % P
        length <<= 1
    return a


class Radix2Domain:
    """Multiplicative subgroup H = <g> of size 2^k with FFT/coset helpers."""

    def __init__(self, size: int):
        ensure(size & (size - 1) == 0 and size >= 1, "domain size must be a power of two")
        self.size = size
        self.group_gen = fr_root_of_unity(size) if size > 1 else 1
        self.group_gen_inv = pow(self.group_gen, P - 2, P)
        self.size_inv = pow(size, P - 2, P)

    @staticmethod
    def new_for(num_points: int) -> "Radix2Domain":
        size = 1
        while size < num_points:
            size <<= 1
        return Radix2Domain(size)

    @lru_cache(maxsize=None)
    def _elements_cached(self):
        out = []
        cur = 1
        for _ in range(self.size):
            out.append(cur)
            cur = cur * self.group_gen % P
        return out

    def elements(self) -> list[int]:
        return list(self._elements_cached())

    def element(self, i: int) -> int:
        return pow(self.group_gen, i, P)

    # -- transforms ----------------------------------------------------------

    def fft(self, coeffs: list[int]) -> list[int]:
        """coefficients -> evaluations over H (natural order)."""
        padded = list(coeffs) + [0] * (self.size - len(coeffs))
        ensure(len(padded) == self.size, "poly degree exceeds domain")
        return ntt_host(padded, self.group_gen)

    def ifft(self, evals: list[int]) -> list[int]:
        ensure(len(evals) == self.size, "evaluation count != domain size")
        coeffs = ntt_host(evals, self.group_gen_inv)
        return [c * self.size_inv % P for c in coeffs]

    def coset_fft(self, coeffs: list[int], shift: int) -> list[int]:
        """Evaluations over the coset shift·H."""
        padded = list(coeffs) + [0] * (self.size - len(coeffs))
        shifted = []
        cur = 1
        for c in padded:
            shifted.append(c * cur % P)
            cur = cur * shift % P
        return ntt_host(shifted, self.group_gen)

    def coset_ifft(self, evals: list[int], shift: int) -> list[int]:
        coeffs = self.ifft(evals)
        shift_inv = pow(shift, P - 2, P)
        out = []
        cur = 1
        for c in coeffs:
            out.append(c * cur % P)
            cur = cur * shift_inv % P
        return out

    # -- vanishing polynomial v_H(X) = X^n - 1 ------------------------------------

    def evaluate_vanishing(self, point: int) -> int:
        return (pow(point, self.size, P) - 1) % P

    def divide_by_vanishing(self, coeffs: list[int]) -> tuple[list[int], list[int]]:
        """(quotient, remainder) of division by X^n - 1 (sparse fold)."""
        n = self.size
        work = list(coeffs)
        if len(work) < n:
            return [], work
        quotient = [0] * (len(work) - n)
        for i in range(len(work) - 1, n - 1, -1):
            quotient[i - n] = work[i]
            work[i - n] = (work[i - n] + work[i]) % P
            work[i] = 0
        remainder = work[:n]
        while remainder and remainder[-1] == 0:
            remainder.pop()
        while quotient and quotient[-1] == 0:
            quotient.pop()
        return quotient, remainder

    # -- Lagrange / sums -----------------------------------------------------------

    def lagrange_coeffs_at(self, point: int) -> list[int]:
        """L_i(point) for all i, barycentric: L_i(z) = v_H(z)·g^i / (n·(z - g^i))."""
        v = self.evaluate_vanishing(point)
        if v == 0:
            # point is in H: indicator vector
            elements = self.elements()
            idx = elements.index(point % P)
            out = [0] * self.size
            out[idx] = 1
            return out
        out = []
        n_inv = self.size_inv
        for g_i in self.elements():
            denom = (point - g_i) % P
            out.append(v * g_i % P * n_inv % P * pow(denom, P - 2, P) % P)
        return out
