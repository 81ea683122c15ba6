"""Pallas TPU kernel: batched Montgomery multiplication in VMEM.

The XLA path (fields/device.py) materializes ~2000 intermediate [B]-vectors
per multiply through HBM; this kernel keeps the whole schoolbook + REDC
pipeline in VMEM per batch tile, making the op compute-bound instead of
bandwidth-bound.

Layout: limb-major [L, B] uint32 (lanes = batch).  Grid over batch tiles.
All intermediates are kept 2D ([1, T] / [L, T]) for Mosaic.
Bit-exact with ``DeviceField.mul`` (tests/test_pallas.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.device import LIMB_BITS, LIMB_MASK, int_to_limbs
from ..fields.host import FieldParams

TILE = 512


def _mul_body(a, b, p, *, n_limbs: int, n0: int):
    """Schoolbook + REDC Montgomery product of [L, T] limb tiles (the
    shared in-VMEM body of the mul and pow kernels).

    Accumulation runs on whole [L, T] / [L+1, T] arrays at static row
    offsets via a sliding window: VPU tiles are (8, 128), so a [1, T] row
    op uses 1/8 of the sublanes — the per-limb-row formulation spent ~6000
    row ops per product where this one spends ~50 full-height ops plus the
    short carry chains.  Limb bound: each u32 entry accumulates ≤ 4L
    16-bit-limb products (< 2^23), so no intra-phase carries are needed.
    Bit-exact with DeviceField.mul (tests/test_pallas.py)."""
    L = n_limbs
    mask = jnp.uint32(LIMB_MASK)
    T = a.shape[1]
    zero_row = jnp.zeros((1, T), jnp.uint32)
    n0_u = jnp.uint32(n0)

    # ---- phase 1: t = a·b over 2L+1 u32 limb rows -----------------------
    # window holds t rows i..i+L at the top of iteration i; row i is final
    # after iteration i (later products only touch offsets > i).
    window = jnp.zeros((L + 1, T), jnp.uint32)
    finals = []
    for i in range(L):
        prod = a[i : i + 1, :] * b  # [L, T]
        lo = prod & mask
        hi = prod >> LIMB_BITS
        u = (
            jnp.concatenate([lo, zero_row], axis=0)
            + jnp.concatenate([zero_row, hi], axis=0)
        )  # contributions to rows i..i+L
        window = window + u
        finals.append(window[0:1, :])
        window = jnp.concatenate([window[1:, :], zero_row], axis=0)
    t = jnp.concatenate(finals + [window], axis=0)  # [2L+1, T]

    # ---- phase 2: REDC, m_i = t_i·n0 mod 2^16; m_i·p lands on rows
    # i..i+L, with row i folded into a deferred carry chain --------------
    carry = zero_row
    w = t[0 : L + 1, :]  # rows i..i+L
    for i in range(L):
        ti = w[0:1, :] + carry
        m = ((ti & mask) * n0_u) & mask  # [1, T]
        prod = m * p  # [L, T]
        lo = prod & mask
        hi = prod >> LIMB_BITS
        carry = (ti + lo[0:1, :]) >> LIMB_BITS  # low 16 bits cancel by REDC
        u = jnp.concatenate([lo[1:, :], zero_row], axis=0) + hi  # rows i+1..i+L
        w = w[1:, :] + u
        if i < L - 1:
            w = jnp.concatenate([w, t[i + L + 1 : i + L + 2, :]], axis=0)

    # ---- normalize result limbs (w = rows L..2L-1) + top carry ----------
    res = []
    for i in range(L):
        v = w[i : i + 1, :] + carry
        res.append(v & mask)
        carry = v >> LIMB_BITS
    extra = t[2 * L : 2 * L + 1, :] + carry  # [1, T], 0 or 1

    res_arr = jnp.concatenate(res, axis=0)  # [L, T]

    def sub_p(arr):
        out = []
        borrow = zero_row
        for i in range(L):
            d = arr[i : i + 1, :] - p[i : i + 1, :] - borrow
            borrow = (d >> 31) & 1
            out.append(d & mask)
        return jnp.concatenate(out, axis=0), borrow

    # V = extra·2^(16L) + res < 2p.  extra==1 ⇒ answer = res − p (mod 2^16L);
    # extra==0 ⇒ answer = res − p iff res ≥ p (no borrow).
    diff, borrow = sub_p(res_arr)
    use_diff = (extra > 0) | (borrow == 0)
    return jnp.where(use_diff, diff, res_arr)


def _mont_mul_kernel(a_ref, b_ref, p_ref, out_ref, *, n_limbs: int, n0: int):
    out_ref[...] = _mul_body(
        a_ref[...], b_ref[...], p_ref[...], n_limbs=n_limbs, n0=n0
    )


def _mont_pow_kernel(x_ref, bits_ref, p_ref, one_ref, out_ref, *,
                     n_limbs: int, n0: int, n_bits: int):
    """Elementwise x^e (fixed exponent, MSB-first square-and-multiply) on a
    [L, T] Montgomery tile, the whole chain inside ONE kernel — the root
    inversion of the batched-affine MSM's Montgomery trick would otherwise
    cost ~750 separate kernel launches per scan step."""
    x = x_ref[...]
    p = p_ref[...]
    one = jnp.broadcast_to(one_ref[...], x.shape)

    def body(i, acc):
        sq = _mul_body(acc, acc, p, n_limbs=n_limbs, n0=n0)
        withx = _mul_body(sq, x, p, n_limbs=n_limbs, n0=n0)
        bit = bits_ref[i]
        return jnp.where(bit > 0, withx, sq)

    out_ref[...] = jax.lax.fori_loop(0, n_bits, body, one)


def _mod_add_kernel(a_ref, b_ref, p_ref, out_ref, *, n_limbs: int):
    """(a + b) mod p on [L, T] 16-bit limbs (carry chain in VMEM)."""
    L = n_limbs
    a = a_ref[...]
    b = b_ref[...]
    p = p_ref[...]
    mask = jnp.uint32(LIMB_MASK)
    zero_row = jnp.zeros((1, a.shape[1]), jnp.uint32)
    res, carry = [], zero_row
    for i in range(L):
        v = a[i : i + 1, :] + b[i : i + 1, :] + carry
        res.append(v & mask)
        carry = v >> LIMB_BITS
    res_arr = jnp.concatenate(res, axis=0)
    diff, borrow = [], zero_row
    for i in range(L):
        d = res_arr[i : i + 1, :] - p[i : i + 1, :] - borrow
        diff.append(d & mask)
        borrow = (d >> 31) & 1
    diff_arr = jnp.concatenate(diff, axis=0)
    # sum < 2p: subtract p when carry-out set or res >= p (no borrow)
    out_ref[...] = jnp.where((carry > 0) | (borrow == 0), diff_arr, res_arr)


def _mod_sub_kernel(a_ref, b_ref, p_ref, out_ref, *, n_limbs: int):
    """(a - b) mod p on [L, T] 16-bit limbs."""
    L = n_limbs
    a = a_ref[...]
    b = b_ref[...]
    p = p_ref[...]
    mask = jnp.uint32(LIMB_MASK)
    zero_row = jnp.zeros((1, a.shape[1]), jnp.uint32)
    diff, borrow = [], zero_row
    for i in range(L):
        d = a[i : i + 1, :] - b[i : i + 1, :] - borrow
        diff.append(d & mask)
        borrow = (d >> 31) & 1
    diff_arr = jnp.concatenate(diff, axis=0)
    plus, carry = [], zero_row
    for i in range(L):
        v = diff_arr[i : i + 1, :] + p[i : i + 1, :] + carry
        plus.append(v & mask)
        carry = v >> LIMB_BITS
    plus_arr = jnp.concatenate(plus, axis=0)
    out_ref[...] = jnp.where(borrow == 1, plus_arr, diff_arr)


@lru_cache(maxsize=8)
def make_mod_addsub(params: FieldParams, tile: int = TILE):
    """Pallas (add, sub) mod-p pair on limb-major [L, B] uint32 arrays."""
    import numpy as np

    L = params.repr_bits // LIMB_BITS
    p_limbs_np = np.asarray(int_to_limbs(params.modulus, L)).reshape(L, 1)

    def build(kernel_fn):
        kernel = partial(kernel_fn, n_limbs=L)

        @jax.jit
        def op(a, b):
            B = a.shape[1]
            if B % tile:
                raise ValueError(f"batch {B} not divisible by tile {tile}")
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
                grid=(B // tile,),
                in_specs=[
                    pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            )(a, b, jnp.asarray(p_limbs_np))

        return op

    return build(_mod_add_kernel), build(_mod_sub_kernel)


@lru_cache(maxsize=8)
def make_mont_pow(params: FieldParams, exponent: int, tile: int = TILE):
    """Returns fn(x) computing elementwise x^exponent on limb-major [L, B]
    uint32 Montgomery arrays (B % tile == 0), as a single Pallas kernel
    with the square-and-multiply chain in VMEM."""
    import numpy as np

    L = params.repr_bits // LIMB_BITS
    p_limbs_np = np.asarray(int_to_limbs(params.modulus, L)).reshape(L, 1)
    one_np = np.asarray(
        int_to_limbs(params.montgomery_r % params.modulus, L)
    ).reshape(L, 1)
    n0 = (-pow(params.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    bits_np = np.asarray(
        [int(b) for b in bin(exponent)[2:]], dtype=np.int32
    )  # MSB first
    n_bits = bits_np.shape[0]

    kernel = partial(_mont_pow_kernel, n_limbs=L, n0=n0, n_bits=n_bits)

    @jax.jit
    def mont_pow(x):
        B = x.shape[1]
        if B % tile:
            raise ValueError(f"batch {B} not divisible by tile {tile}")
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
            grid=(B // tile,),
            in_specs=[
                pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(x, jnp.asarray(bits_np), jnp.asarray(p_limbs_np), jnp.asarray(one_np))

    return mont_pow


@lru_cache(maxsize=4)
def make_mont_mul(params: FieldParams, tile: int = TILE):
    """Returns fn(a, b) on limb-major [L, B] uint32 Montgomery arrays
    (B % tile == 0)."""
    L = params.repr_bits // LIMB_BITS
    import numpy as np

    # numpy, not jnp: this closure is lru_cached, and a jnp constant created
    # while tracing one jit would leak as a tracer into later traces
    p_limbs_np = np.asarray(int_to_limbs(params.modulus, L)).reshape(L, 1)
    n0 = (-pow(params.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    kernel = partial(_mont_mul_kernel, n_limbs=L, n0=n0)

    @jax.jit
    def mont_mul(a, b):
        B = a.shape[1]
        if B % tile:
            # a floor-div grid would silently skip the remainder lanes
            raise ValueError(f"batch {B} not divisible by tile {tile}")
        grid = (B // tile,)
        p_limbs = jnp.asarray(p_limbs_np)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(a, b, p_limbs)

    return mont_mul
