"""EXPERIMENTAL Pallas radix-2 NTT: fused butterfly stages in VMEM.

Status: correct but currently slower than the XLA path (strided per-stage
reshapes dominate); kept for the round-2 fused-whole-transform rework.
The production device NTT is poly/ntt_device.py.

Each stage runs ONE Pallas kernel computing (lo + w·hi, lo − w·hi) with the
Montgomery multiply, carry normalization and conditional subtracts all in
VMEM — against the XLA path's per-op HBM round-trips.  Stage twiddles are
pre-expanded to full [L, N/2] arrays so the kernel is a pure elementwise
pipe; data is limb-major [L, N].

Bit-exact with the host NTT (tests/test_pallas.py) and used by the TPU
benchmark as the prover-core kernel.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.bls12_377 import FR_MODULUS, Fr, fr_root_of_unity
from ..fields.device import LIMB_BITS, LIMB_MASK, int_to_limbs
from ..fields.pack import pack_standard, unpack_standard

P = FR_MODULUS
L = 16  # Fr limbs
TILE = 512


def _butterfly_kernel(lo_ref, hi_ref, tw_ref, p_ref, out_lo_ref, out_hi_ref, *, n0: int):
    mask = jnp.uint32(LIMB_MASK)
    lo = lo_ref[...]     # [L, T]
    hi = hi_ref[...]
    tw = tw_ref[...]
    p = p_ref[...]       # [L, 1]
    T = lo.shape[1]
    zero_row = jnp.zeros((1, T), jnp.uint32)

    # ---- t = mont_mul(hi, tw) ------------------------------------------------
    t = [zero_row for _ in range(2 * L + 1)]
    for i in range(L):
        prod = hi[i : i + 1, :] * tw
        plo = prod & mask
        phi = prod >> LIMB_BITS
        for j in range(L):
            t[i + j] = t[i + j] + plo[j : j + 1, :]
            t[i + j + 1] = t[i + j + 1] + phi[j : j + 1, :]
    n0_u = jnp.uint32(n0)
    for i in range(L):
        m = ((t[i] & mask) * n0_u) & mask
        prod = m * p
        plo = prod & mask
        phi = prod >> LIMB_BITS
        for j in range(L):
            t[i + j] = t[i + j] + plo[j : j + 1, :]
            t[i + j + 1] = t[i + j + 1] + phi[j : j + 1, :]
        t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
    res = []
    carry = zero_row
    for i in range(L):
        v = t[L + i] + carry
        res.append(v & mask)
        carry = v >> LIMB_BITS
    extra = t[2 * L] + carry
    prod_arr = jnp.concatenate(res, axis=0)

    def sub_limbs(a_arr, b_arr):
        out = []
        borrow = zero_row
        for i in range(L):
            d = a_arr[i : i + 1, :] - b_arr[i : i + 1, :] - borrow
            borrow = (d >> 31) & 1
            out.append(d & mask)
        return jnp.concatenate(out, axis=0), borrow

    def add_limbs(a_arr, b_arr):
        out = []
        carry_l = zero_row
        for i in range(L):
            s = a_arr[i : i + 1, :] + b_arr[i : i + 1, :] + carry_l
            out.append(s & mask)
            carry_l = s >> LIMB_BITS
        return jnp.concatenate(out, axis=0)

    p_full = jnp.broadcast_to(p, (L, T))
    diff, borrow = sub_limbs(prod_arr, p_full)
    prod_arr = jnp.where(((extra > 0) | (borrow == 0)), diff, prod_arr)

    # ---- out_lo = lo + t (mod p), out_hi = lo - t (mod p) ---------------------
    s = add_limbs(lo, prod_arr)
    s_diff, s_borrow = sub_limbs(s, p_full)
    out_lo_ref[...] = jnp.where((s_borrow == 0), s_diff, s)

    # lo - t: if borrowed, add p back (addition with carries)
    d, d_borrow = sub_limbs(lo, prod_arr)
    d_fixed = add_limbs(d, p_full)
    out_hi_ref[...] = jnp.where((d_borrow == 1), d_fixed, d)


@lru_cache(maxsize=8)
def _stage_kernel(tile: int):
    p_limbs = jnp.asarray(np.asarray(int_to_limbs(P, L)).reshape(L, 1))
    n0 = (-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    kernel = partial(_butterfly_kernel, n0=n0)

    @jax.jit
    def run(lo, hi, tw):
        B = lo.shape[1]
        grid = (B // tile,)
        spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((L, B), jnp.uint32),
                jax.ShapeDtypeStruct((L, B), jnp.uint32),
            ),
            grid=grid,
            in_specs=[spec, spec, spec,
                      pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=(spec, spec),
        )(lo, hi, tw, p_limbs)

    return run


class PallasNTT:
    """Radix-2 NTT on limb-major [L, N] Montgomery arrays (natural order
    in/out; same conventions as poly/ntt_device.DeviceNTT)."""

    def __init__(self, n: int, tile: int = TILE):
        assert n & (n - 1) == 0 and n >= 2 * tile
        self.n = n
        self.tile = tile
        omega = fr_root_of_unity(n)
        omega_inv = pow(omega, P - 2, P)
        self.rev = jnp.asarray(_bit_reverse_indices(n))
        self.tw_fwd = self._full_stage_twiddles(omega)
        self.tw_inv = self._full_stage_twiddles(omega_inv)
        R = Fr.PARAMS.montgomery_r
        n_inv = pow(n, P - 2, P)
        self.n_inv_mont = jnp.asarray(
            pack_standard([n_inv * R % P], Fr.PARAMS)[0]
        ).reshape(L, 1)
        self._run = _stage_kernel(tile)

    def _full_stage_twiddles(self, omega: int):
        """Per stage: the twiddle for every butterfly, [L, n/2], limb-major."""
        R = Fr.PARAMS.montgomery_r
        tables = []
        length = 2
        while length <= self.n:
            half = length // 2
            w = pow(omega, self.n // length, P)
            base = []
            cur = 1
            for _ in range(half):
                base.append(cur * R % P)
                cur = cur * w % P
            tiled = base * (self.n // length)  # one copy per block
            packed = pack_standard(tiled, Fr.PARAMS).T.copy()  # [L, n/2]
            tables.append(jnp.asarray(packed))
            length <<= 1
        return tables

    def _transform(self, x: jnp.ndarray, tables) -> jnp.ndarray:
        n = self.n
        x = jnp.take(x, self.rev, axis=1)
        for stage, tw in enumerate(tables):
            m = 2 << stage
            half = m // 2
            y = x.reshape(L, n // m, m)
            lo = y[:, :, :half].reshape(L, n // 2)
            hi = y[:, :, half:].reshape(L, n // 2)
            out_lo, out_hi = self._run(lo, hi, tw)
            y = jnp.concatenate(
                [out_lo.reshape(L, n // m, half), out_hi.reshape(L, n // m, half)],
                axis=2,
            )
            x = y.reshape(L, n)
        return x

    def fft_mont(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._transform(x, self.tw_fwd)

    def ifft_mont(self, x: jnp.ndarray) -> jnp.ndarray:
        from .mont_mul_pallas import make_mont_mul

        out = self._transform(x, self.tw_inv)
        mul = make_mont_mul(Fr.PARAMS, tile=self.tile)
        return mul(out, jnp.broadcast_to(self.n_inv_mont, out.shape))

    # host int API for validation
    def fft(self, coeffs: list[int]) -> list[int]:
        padded = list(coeffs) + [0] * (self.n - len(coeffs))
        R = Fr.PARAMS.montgomery_r
        x = jnp.asarray(pack_standard([v * R % P for v in padded], Fr.PARAMS).T.copy())
        out = np.asarray(self.fft_mont(x)).T
        rinv = pow(R, -1, P)
        return [v * rinv % P for v in unpack_standard(out, Fr.PARAMS)]


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1).astype(np.int32) << (bits - 1 - b)
    return rev
