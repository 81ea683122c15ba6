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

    # -- FrVec transforms (the prover data plane; list API above is the oracle) --

    @lru_cache(maxsize=None)
    def elements_vec(self):
        """FrVec of [1, g, g², ..., g^(n-1)]."""
        from ..fields.frvec import FrVec

        return FrVec.powers(self.group_gen, self.size)

    def _transform_vec(self, v, omega: int, scale: int | None = None):
        """Natural-order NTT of a full-size FrVec; routes
        sharded/device/native/python — every route is bit-exact."""
        from ..fields.frvec import FrVec
        from ..ops import accel

        if accel.use_sharded_ntt(self.size) and omega in (
            self.group_gen, self.group_gen_inv,
        ):
            mesh_axis = accel.prover_mesh()
            if mesh_axis is not None:
                from ..parallel.ntt_sharded import (
                    sharded_transform_supported,
                    sharded_transform_vec,
                )

                mesh, axis = mesh_axis
                if sharded_transform_supported(mesh, axis, self.size):
                    out = sharded_transform_vec(
                        mesh, axis, v, inverse=omega == self.group_gen_inv
                    )
                    return out if scale is None else out.scale(scale)

        if accel.use_device_ntt(self.size):
            import numpy as _np
            import jax
            import jax.numpy as jnp

            # MXU DFT-as-matmul NTT on real TPUs; the XLA butterfly NTT on
            # CPU/virtual meshes (same conventions, no Pallas lowering
            # needed there — routing stays proof-invisible either way,
            # tests/test_accel_routing.py)
            on_tpu = jax.default_backend() == "tpu"
            if on_tpu:
                from ..ops.ntt_mxu import get_mxu_ntt

                ntt = get_mxu_ntt(self.size)
                x = jnp.asarray(_np.ascontiguousarray(v.to_device_limbs().T))
            else:
                from .ntt_device import get_device_ntt

                ntt = get_device_ntt(self.size)
                x = jnp.asarray(v.to_device_limbs())

            def _back(y):
                arr = _np.asarray(jax.device_get(y))
                return FrVec.from_device_limbs(arr.T if on_tpu else arr)

            inverse = omega == self.group_gen_inv
            if inverse and (scale == self.size_inv or scale is None):
                y = ntt.ifft_mont(x)  # 1/n folded into the inverse tables
                out = _back(y)
                if scale is None:  # caller wanted no scaling: undo
                    out = out.scale(self.size)
                return out
            if not inverse and scale is None and omega == self.group_gen:
                y = ntt.fft_mont(x)
                return _back(y)
            # fall through for exotic omega/scale combinations

        from .. import native

        if native.available():
            return FrVec(native.fr_ntt_arr(v.a, omega, scale=scale))
        out = ntt_host(v.to_ints(), omega)
        if scale is not None:
            out = [c * scale % P for c in out]
        return FrVec.from_ints(out)

    def fft_vec(self, v):
        """coefficients -> evaluations over H (natural order); v is an FrVec
        of length <= n."""
        ensure(len(v) <= self.size, "poly degree exceeds domain")
        return self._transform_vec(v.pad_to(self.size), self.group_gen)

    def ifft_vec(self, v):
        ensure(len(v) == self.size, "evaluation count != domain size")
        return self._transform_vec(v, self.group_gen_inv, scale=self.size_inv)

    def coset_fft_vec(self, v, shift: int):
        """Evaluations over the coset shift·H."""
        from ..fields.frvec import FrVec

        ensure(len(v) <= self.size, "poly degree exceeds domain")
        padded = v.pad_to(self.size)
        shifted = padded * FrVec.powers(shift, self.size)
        return self._transform_vec(shifted, self.group_gen)

    def coset_ifft_vec(self, v, shift: int):
        from ..fields.frvec import FrVec

        coeffs = self.ifft_vec(v)
        shift_inv = pow(shift, P - 2, P)
        return coeffs * FrVec.powers(shift_inv, self.size)

    def divide_by_vanishing_vec(self, v):
        """(quotient, remainder) FrVecs of division by X^n − 1 (blockwise
        top-down fold; same recurrence as the list oracle below)."""
        from ..fields.frvec import FrVec

        n = self.size
        if len(v) < n:
            return FrVec.zeros(0), v
        work = v.copy()
        top = len(work)
        # fold block [bn, min((b+1)n, top)) into [(b-1)n, ...) from the top
        b = (top - 1) // n
        while b >= 1:
            lo, hi = b * n, min((b + 1) * n, top)
            seg = FrVec(work.a[lo:hi]) + FrVec(work.a[lo - n : hi - n])
            work.a[lo - n : hi - n] = seg.a
            b -= 1
        return FrVec(work.a[n:].copy()), FrVec(work.a[:n].copy())

    def lagrange_coeffs_vec(self, point: int):
        """FrVec of L_i(point) (barycentric; batch-inverted)."""
        from ..fields.frvec import FrVec

        v = self.evaluate_vanishing(point)
        elements = self.elements_vec()
        if v == 0:
            idx = self.elements().index(point % P)
            out = FrVec.zeros(self.size)
            out.a[idx] = FrVec.mont_scalar(1)[0]
            return out
        denoms = elements.rsub_scalar(point)  # point - g^i
        return (denoms.inv() * elements).scale(v * self.size_inv % P)

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
