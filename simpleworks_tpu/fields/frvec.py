"""FrVec: the prover's vector data plane over BLS12-377 Fr.

Replaces Python-bigint lists in every polynomial/AHP hot loop (the
reference's equivalents are arkworks' `Vec<Fr>` slices inside ark-poly /
ark-marlin, consumed at ``/root/reference/src/marlin/mod.rs:75``).

Representation: a numpy ``[N, 4]`` little-endian uint64 limb array holding
**Montgomery-form** residues (R = 2^256).  This layout is simultaneously

* the native C++ runtime's ABI (``csrc/swtpu_native.cpp``) — batch ops run
  at memory speed with zero conversion, and
* a free bridge to the device kernels: ``arr.view(uint16)`` *is* the
  16-bit-limb layout of :mod:`simpleworks_tpu.fields.device` /
  :mod:`simpleworks_tpu.ops.ntt_mxu` (transpose to limb-major, done).

All ops route to the native library when built; a pure-Python bigint
fallback keeps every op correct (and identical) without it.
"""

from __future__ import annotations

import numpy as np

from .bls12_377 import FR_MODULUS, Fr

P = FR_MODULUS
R = Fr.PARAMS.montgomery_r
R_INV = pow(R, -1, P)
N_LIMBS = 4


def _native():
    from .. import native

    return native if native.available() else None


def _ints_to_arr(values) -> np.ndarray:
    buf = b"".join((int(v) % P).to_bytes(32, "little") for v in values)
    return np.frombuffer(buf, dtype="<u8").reshape(-1, N_LIMBS).copy()


def _arr_to_ints(arr: np.ndarray) -> list[int]:
    data = np.ascontiguousarray(arr, dtype="<u8").tobytes()
    return [int.from_bytes(data[i * 32 : (i + 1) * 32], "little") for i in range(arr.shape[0])]


class FrVec:
    """Immutable-by-convention vector of Fr elements (Montgomery form)."""

    __slots__ = ("a",)

    def __init__(self, mont_arr: np.ndarray):
        assert mont_arr.ndim == 2 and mont_arr.shape[1] == N_LIMBS, mont_arr.shape
        self.a = np.ascontiguousarray(mont_arr, dtype="<u8")

    # -- construction ---------------------------------------------------------

    @staticmethod
    def from_ints(values) -> "FrVec":
        std = _ints_to_arr(values)
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_to_mont_arr(std))
        return FrVec(_ints_to_arr([int(v) % P * R % P for v in values]))

    @staticmethod
    def from_std_array(std: np.ndarray) -> "FrVec":
        """[N, 4] u64 standard-form limbs -> FrVec (values must be < p)."""
        std = np.ascontiguousarray(std, dtype="<u8")
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_to_mont_arr(std))
        return FrVec.from_ints(_arr_to_ints(std))

    def to_std_array(self) -> np.ndarray:
        """[N, 4] u64 standard-form limbs (also the 32B-LE serde bytes)."""
        nat = _native()
        if nat is not None:
            return nat.fr_from_mont_arr(self.a)
        return _ints_to_arr(self.to_ints())

    @staticmethod
    def zeros(n: int) -> "FrVec":
        return FrVec(np.zeros((n, N_LIMBS), dtype="<u8"))

    @staticmethod
    def mont_scalar(value: int) -> np.ndarray:
        """[1, 4] Montgomery encoding of one int (for scale/horner calls)."""
        return _ints_to_arr([int(value) % P * R % P])

    @staticmethod
    def powers(base: int, count: int) -> "FrVec":
        """[1, base, base², ...] — domain elements, coset shifts."""
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_powers_arr(FrVec.mont_scalar(base), count))
        vals, cur = [], 1
        for _ in range(count):
            vals.append(cur)
            cur = cur * base % P
        return FrVec.from_ints(vals)

    # -- conversion -----------------------------------------------------------

    def to_ints(self) -> list[int]:
        nat = _native()
        if nat is not None:
            return _arr_to_ints(nat.fr_from_mont_arr(self.a))
        return [v * R_INV % P for v in _arr_to_ints(self.a)]

    def __len__(self) -> int:
        return self.a.shape[0]

    def __getitem__(self, i) -> int:
        if isinstance(i, slice):
            return FrVec(self.a[i])
        return _arr_to_ints(self.a[i : i + 1])[0] * R_INV % P

    def copy(self) -> "FrVec":
        return FrVec(self.a.copy())

    # -- elementwise ops (Montgomery in/out) -----------------------------------

    def _binop(self, other: "FrVec", op: str) -> "FrVec":
        assert len(self) == len(other), (len(self), len(other))
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_binop_arr(op, self.a, other.a))
        x, y = _arr_to_ints(self.a), _arr_to_ints(other.a)
        if op == "mul":
            return FrVec(_ints_to_arr([a * b % P * R_INV % P for a, b in zip(x, y)]))
        if op == "add":
            return FrVec(_ints_to_arr([(a + b) % P for a, b in zip(x, y)]))
        return FrVec(_ints_to_arr([(a - b) % P for a, b in zip(x, y)]))

    def __add__(self, other: "FrVec") -> "FrVec":
        return self._binop(other, "add")

    def __sub__(self, other: "FrVec") -> "FrVec":
        return self._binop(other, "sub")

    def __mul__(self, other: "FrVec") -> "FrVec":
        return self._binop(other, "mul")

    def mul_add(self, other: "FrVec", addend: "FrVec") -> "FrVec":
        """self·other + addend, fused."""
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_mul_add_arr(self.a, other.a, addend.a))
        return self * other + addend

    def scale(self, s: int) -> "FrVec":
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_scale_arr(self.a, FrVec.mont_scalar(s)))
        return FrVec.from_ints([v * s % P for v in self.to_ints()])

    def neg(self) -> "FrVec":
        return FrVec.zeros(len(self)) - self

    def inv(self) -> "FrVec":
        """Batch inversion; zeros map to zero (arkworks batch_inversion)."""
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_inv_arr(self.a))
        return FrVec.from_ints(
            [pow(v, P - 2, P) if v else 0 for v in self.to_ints()]
        )

    def rsub_scalar(self, s: int) -> "FrVec":
        """s − self, elementwise (the (α − h^i) builder)."""
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_scalar_sub_arr(FrVec.mont_scalar(s), self.a))
        return FrVec.from_ints([(s - v) % P for v in self.to_ints()])

    def sum(self) -> int:
        """Σ elements (standard-form int)."""
        nat = _native()
        a = self.a
        if nat is None or len(self) < 64:
            return sum(self.to_ints()) % P
        while a.shape[0] > 1:
            n = a.shape[0]
            half = n // 2
            lo, hi = a[:half], a[half : 2 * half]
            s = nat.fr_binop_arr("add", lo, hi)
            if n % 2:
                a = np.concatenate([s, a[n - 1 :]])
            else:
                a = s
        return _arr_to_ints(a)[0] * R_INV % P

    # -- structural ------------------------------------------------------------

    def pad_to(self, n: int) -> "FrVec":
        if len(self) >= n:
            return self
        out = np.zeros((n, N_LIMBS), dtype="<u8")
        out[: len(self)] = self.a
        return FrVec(out)

    @staticmethod
    def concat(parts: list["FrVec"]) -> "FrVec":
        return FrVec(np.concatenate([p.a for p in parts]))

    def nonzero_length(self) -> int:
        """Length after trimming trailing zeros (degree+1 for coeff vectors)."""
        nz = np.flatnonzero(self.a.any(axis=1))
        return int(nz[-1]) + 1 if nz.size else 0

    def is_zero(self) -> bool:
        return not self.a.any()

    # -- polynomial helpers ------------------------------------------------------

    def horner(self, z: int) -> int:
        """Evaluate Σ self[i]·z^i at a standard-form point; returns int."""
        if len(self) == 0:
            return 0
        nat = _native()
        if nat is not None:
            out = nat.fr_horner_arr(self.a, FrVec.mont_scalar(z))
            return _arr_to_ints(out)[0] * R_INV % P
        acc = 0
        for v in reversed(self.to_ints()):
            acc = (acc * z + v) % P
        return acc

    def div_linear(self, z: int) -> tuple["FrVec", int]:
        """(quotient, remainder) of division by (X − z)."""
        if len(self) == 0:
            return FrVec.zeros(0), 0
        nat = _native()
        if nat is not None:
            quot, rem = nat.fr_div_linear_arr(self.a, FrVec.mont_scalar(z))
            return FrVec(quot), _arr_to_ints(rem)[0] * R_INV % P
        coeffs = self.to_ints()
        d = len(coeffs) - 1
        quotient = [0] * d
        acc = 0
        for i in range(d, 0, -1):
            acc = (coeffs[i] + acc * z) % P
            quotient[i - 1] = acc
        return FrVec.from_ints(quotient), (coeffs[0] + acc * z) % P

    # -- sparse accumulate --------------------------------------------------------

    @staticmethod
    def spmv(rows: np.ndarray, cols: np.ndarray, coeffs: "FrVec", x: "FrVec",
             out_len: int) -> "FrVec":
        """out[rows[i]] += coeffs[i]·x[cols[i]] — the AHP scatter kernel
        (z_M = M·z and the t-evaluation accumulation)."""
        nat = _native()
        if nat is not None:
            return FrVec(nat.fr_spmv_arr(rows, cols, coeffs.a, x.a, out_len))
        out = [0] * out_len
        cs = coeffs.to_ints()
        xs = x.to_ints()
        for r, c, v in zip(rows, cols, cs):
            out[int(r)] = (out[int(r)] + v * xs[int(c)]) % P
        return FrVec.from_ints(out)

    # -- device bridge -------------------------------------------------------------

    def to_device_limbs(self) -> np.ndarray:
        """[N, 16] uint32 16-bit limbs (Montgomery) — DeviceField layout."""
        return self.a.view("<u2").astype(np.uint32)

    @staticmethod
    def from_device_limbs(limbs: np.ndarray) -> "FrVec":
        """[N, 16] uint32 (or uint16) 16-bit Montgomery limbs -> FrVec."""
        u16 = np.ascontiguousarray(np.asarray(limbs).astype("<u2"))
        return FrVec(u16.view("<u8").reshape(-1, N_LIMBS).copy())

    def __repr__(self):
        return f"FrVec(len={len(self)})"
