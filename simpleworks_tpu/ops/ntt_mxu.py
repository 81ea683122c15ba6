"""MXU-native NTT: DFT-as-matmul over 8-bit limbs (the TPU-first design).

Replaces butterfly networks entirely.  The radix-2 NTT's hot loop is a bad
fit for the TPU's tiling model (strided lane/sublane shuffles per stage);
the 4-step decomposition turns the transform into two MODULAR MATMULS that
ride the MXU, plus one elementwise twiddle multiply:

    A' = reduce( Ŵ1 @ X )  ⊙  T   ;   A = reduce( A' @ Ŵ2 ) , transposed

with N = N1·N2 (N1, N2 ≤ 256), X the input viewed as [N1, N2],
Ŵ1[k1,n1] = ω_N1^{k1·n1}·2^272 mod p, T[k1,n2] = ω^{k1·n2} (Montgomery),
Ŵ2[n2,k2] = ω_N2^{n2·k2}·2^272 mod p (·N⁻¹ for the inverse transform).

**Modular matmul on the MXU**: field elements (Montgomery residues < p)
are decomposed into 32 8-bit limbs held in bfloat16 (integers ≤ 255 are
exact in bf16).  A limb-wise matmul accumulates in f32: each partial sum
is Σ over ≤256 terms of byte×byte products ≤ 255·255·256 < 2^24 — exactly
representable in f32, so the arithmetic is exact.  The 63 partial-limb
planes are then recombined and Montgomery-reduced by 2^272 in one Pallas
VPU kernel (`_reduce_kernel`): since Ŵ carries a 2^272 factor, the REDC
yields exactly the Montgomery representation of the result, and
V < 256·p·2^253 < p·2^272 keeps the single-REDC bound.

No bit-reversal anywhere (matmul DFT is order-free); natural order in and
out.  Output needs one [N1,N2]→[N2,N1] transpose (fused into XLA).

Replaces the per-stage butterfly path for the Marlin prover's domain sizes
(reference call sites: ark-poly FFTs inside ``MarlinInst::prove``,
reference ``src/marlin/mod.rs:75`` — SURVEY.md §2.3 'Dense univariate
polys + radix-2 FFT domains').
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
from .accel import enable_persistent_compile_cache
from .mont_mul_pallas import make_mont_mul

enable_persistent_compile_cache()

P = FR_MODULUS
L = 16            # 16-bit limbs per element (u32 storage)
L8 = 32           # 8-bit limbs per element (bf16 storage for the MXU)
REDC_K = 17       # reduce by 2^(16*17) = 2^272
ACC_LIMBS = REDC_K + L + 1  # 34 u16-limbs cover the 514-bit matmul sum

_LANE_TILE = 512


def _to_u8_limbs_host(values: list[int]) -> np.ndarray:
    """[len, 32] uint8 limb decomposition (little-endian bytes)."""
    out = np.zeros((len(values), L8), dtype=np.uint8)
    for i, v in enumerate(values):
        out[i] = np.frombuffer(int(v).to_bytes(32, "little"), dtype=np.uint8)
    return out


def _u32_to_bf16_limbs(x: jnp.ndarray) -> jnp.ndarray:
    """[16, ...] u32 16-bit limbs -> [32, ...] bf16 8-bit limbs."""
    lo = (x & 0xFF).astype(jnp.bfloat16)
    hi = ((x >> 8) & 0xFF).astype(jnp.bfloat16)
    # interleave: limb8[2t] = lo[t], limb8[2t+1] = hi[t]
    stacked = jnp.stack([lo, hi], axis=1)  # [16, 2, ...]
    return stacked.reshape((L8,) + x.shape[1:])


def _limb_matmul(lhs8: jnp.ndarray, rhs8: jnp.ndarray) -> jnp.ndarray:
    """Exact limb-plane matmul: out[l] = Σ_{p+q=l} lhs8[p] @ rhs8[q].

    lhs8: [32, I, K] bf16, rhs8: [32, K, J] bf16 -> [63, I, J] int32.
    Each of the 32 MXU dots contracts K with f32 accumulation (exact:
    per-dot sums < 2^24); cross-plane accumulation is int32 (sums reach
    2^29, beyond f32's exact-integer range)."""
    I, J = lhs8.shape[1], rhs8.shape[2]
    out = jnp.zeros((2 * L8 - 1, I, J), jnp.int32)
    for p0 in range(L8):
        r = jax.lax.dot_general(
            lhs8[p0], rhs8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [I, 32, J]
        out = out.at[p0 : p0 + L8].add(jnp.moveaxis(r, 1, 0).astype(jnp.int32))
    return out


def _reduce_kernel(c_ref, p_ref, out_ref, *, n0: int):
    """Recombine 63 int32 partial-limb planes into u16 limbs and Montgomery-
    reduce by 2^272.  c_ref: [63, T] int32 (values < 2^29), out: [16, T] u32."""
    mask = jnp.uint32(LIMB_MASK)
    T = c_ref.shape[1]
    zero = jnp.zeros((1, T), jnp.uint32)
    c = c_ref[...].astype(jnp.uint32)
    p = p_ref[...]  # [16, 1]

    # --- recombine: acc[t] (u16-limb t) = C_{2t} + low8(C_{2t-1}>>? ) ... ---
    # each C_l sits at bit offset 8l; limb t covers bits [16t, 16t+16):
    #   acc[t] = C_{2t} + ((C_{2t+1} << 8) & 0xffff) + (C_{2t-1} >> 8)
    # addends < 2^29 + 2^16 + 2^21 — no u32 overflow; the subsequent
    # carry-propagation pass absorbs everything above bit 16.
    acc = []
    for t in range(ACC_LIMBS):
        v = zero
        le, lo_odd, hi_odd = 2 * t, 2 * t + 1, 2 * t - 1
        if le < 2 * L8 - 1:
            v = v + c[le : le + 1, :]
        if lo_odd < 2 * L8 - 1:
            v = v + ((c[lo_odd : lo_odd + 1, :] << 8) & mask)
        if 0 <= hi_odd < 2 * L8 - 1:
            v = v + (c[hi_odd : hi_odd + 1, :] >> 8)
        acc.append(v)
    # carry-normalize to u16 limbs
    t_limbs = []
    carry = zero
    for t in range(ACC_LIMBS):
        v = acc[t] + carry
        t_limbs.append(v & mask)
        carry = v >> LIMB_BITS
    # carry must end zero (value < 2^(16*34)); drop it.

    # --- REDC by 2^(16*17): 17 rounds of m = t[i]·n0 mod 2^16; t += m·p·2^16i
    n0_u = jnp.uint32(n0)
    t = t_limbs + [zero]  # headroom limb
    for i in range(REDC_K):
        m = ((t[i] & mask) * n0_u) & mask
        prod = m * p  # [16, T]
        plo = prod & mask
        phi = prod >> LIMB_BITS
        for j in range(L):
            t[i + j] = t[i + j] + plo[j : j + 1, :]
            t[i + j + 1] = t[i + j + 1] + phi[j : j + 1, :]
        t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)

    res = []
    carry = zero
    for i in range(L):
        v = t[REDC_K + i] + carry
        res.append(v & mask)
        carry = v >> LIMB_BITS
    extra = t[REDC_K + L] + carry  # 0 or 1 (result < 2p)
    res_arr = jnp.concatenate(res, axis=0)

    borrow = zero
    diff = []
    for i in range(L):
        d = res_arr[i : i + 1, :] - p[i : i + 1, :] - borrow
        borrow = (d >> 31) & 1
        diff.append(d & mask)
    diff_arr = jnp.concatenate(diff, axis=0)
    out_ref[...] = jnp.where((extra > 0) | (borrow == 0), diff_arr, res_arr)


@lru_cache(maxsize=8)
def _make_reduce(tile: int = _LANE_TILE):
    p_limbs = jnp.asarray(np.asarray(int_to_limbs(P, L)).reshape(L, 1))
    n0 = (-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    kernel = partial(_reduce_kernel, n0=n0)

    @jax.jit
    def reduce_fn(c):  # [63, B] f32 -> [16, B] u32
        B = c.shape[1]
        grid = (B // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * L8 - 1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(c, p_limbs)

    return reduce_fn


def _pack_mont_u32(values: list[int]) -> np.ndarray:
    """[16, len] u32 16-bit-limb array of Montgomery representations."""
    out = np.zeros((L, len(values)), dtype=np.uint32)
    R = Fr.PARAMS.montgomery_r
    for i, v in enumerate(values):
        m = v * R % P
        for t in range(L):
            out[t, i] = (m >> (16 * t)) & 0xFFFF
    return out


MAX_BASE = 256  # f32-exactness bound: matmul contraction length ≤ 256


def _dft_limb_table(size: int, omega: int, scale: int) -> jnp.ndarray:
    """Ŵ[k, j] = ω^{kj}·scale·2^272 mod p as [32, size, size] bf16 limbs."""
    shift = pow(2, 16 * REDC_K, P)
    w = [pow(omega, (k * j) % size, P) * scale % P * shift % P
         for k in range(size) for j in range(size)]
    w8 = _to_u8_limbs_host(w).reshape(size, size, L8).transpose(2, 0, 1)
    return jnp.asarray(w8.astype(np.float32)).astype(jnp.bfloat16)


def _build_level_tables(n: int, omega: int, base_scale: int):
    """Recursive 4-step table tree.  The base level's DFT matrix carries
    ``base_scale`` (the iNTT 1/n — each element crosses the base exactly
    once)."""
    if n <= MAX_BASE:
        return ("base", n, _dft_limb_table(n, omega, base_scale))
    k = n.bit_length() - 1
    n1 = min(MAX_BASE, 1 << ((k + 1) // 2))
    n2 = n // n1
    w1_8 = _dft_limb_table(n1, pow(omega, n2, P), 1)
    t = [pow(omega, (k1 * j2) % n, P) for k1 in range(n1) for j2 in range(n2)]
    t_mont = jnp.asarray(_pack_mont_u32(t))  # [16, n], k1-major
    sub = _build_level_tables(n2, pow(omega, n1, P), base_scale)
    return ("split", n1, n2, w1_8, t_mont, sub)


class MXUNTT:
    """NTT of any power-of-two size on [16, N] (or batched [16, B, N]) u32
    Montgomery limb arrays, natural order in/out.  Recursive 4-step: every
    level is a modular matmul on the MXU + one twiddle Hadamard."""

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n >= 4
        self.n = n
        omega = fr_root_of_unity(n)
        omega_inv = pow(omega, P - 2, P)
        n_inv = pow(n, P - 2, P)
        self._fwd = _build_level_tables(n, omega, 1)
        self._inv = _build_level_tables(n, omega_inv, n_inv)
        tile = min(_LANE_TILE, n)
        self._reduce = _make_reduce(tile)
        self._mul = make_mont_mul(Fr.PARAMS, tile=tile)

    def _run(self, x: jnp.ndarray, tables) -> jnp.ndarray:
        """x: [L, B, n] -> [L, B, n]."""
        B = x.shape[1]
        if tables[0] == "base":
            _, n, w8 = tables
            x8 = _u32_to_bf16_limbs(x)                # [32, B, n]
            rhs = x8.transpose(0, 2, 1)               # [32, n, B]
            y = self._reduce(_limb_matmul(w8, rhs).reshape(2 * L8 - 1, -1))
            return y.reshape(L, n, B).transpose(0, 2, 1)
        _, n1, n2, w1_8, t_mont, sub = tables
        # phase A: column NTTs over j1 (contraction n1), free axis (B, j2)
        x8 = _u32_to_bf16_limbs(x.reshape(L, B, n1, n2))
        rhs = x8.transpose(0, 2, 1, 3).reshape(L8, n1, B * n2)
        y = self._reduce(_limb_matmul(w1_8, rhs).reshape(2 * L8 - 1, -1))
        # twiddle Hadamard: T[k1, j2] broadcast over B
        t_full = jnp.broadcast_to(
            t_mont.reshape(L, n1, 1, n2), (L, n1, B, n2)
        ).reshape(L, -1)
        y = self._mul(y, t_full)
        # phase B: row NTTs of size n2, batched over (k1, B)
        z = self._run(y.reshape(L, n1 * B, n2), sub)
        # out[b, k2·n1 + k1] = z[k1, b, k2]
        z = z.reshape(L, n1, B, n2).transpose(0, 2, 3, 1)
        return z.reshape(L, B, n1 * n2)

    def fft_mont(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._run(x[:, None, :], self._fwd)[:, 0, :]

    def ifft_mont(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._run(x[:, None, :], self._inv)[:, 0, :]

    # batched transforms ([16, B, n]) for the DP/sharded paths
    def fft_mont_batched(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._run(x, self._fwd)

    def ifft_mont_batched(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._run(x, self._inv)


@lru_cache(maxsize=8)
def get_mxu_ntt(n: int) -> MXUNTT:
    return MXUNTT(n)
