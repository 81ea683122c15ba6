"""Batched TPU field arithmetic: base-2^16 limbs in uint32 lanes.

This is the compute path for every hot loop in the framework (NTT butterflies,
MSM point arithmetic, Poseidon rounds, batched satisfiability) — the TPU-native
replacement for arkworks' Montgomery bigint kernels (SURVEY.md §2.3 row 1).

Representation
--------------
A field element is a vector of ``L`` uint32 limbs, each holding 16 bits
(little-endian limb order), so products of two limbs fit exactly in uint32 and
column sums have ~10 bits of headroom.  Elements on device are kept in
**Montgomery form** (R = 2^(16 L)), matching the host representation width
(Fr: L=16 → R=2^256; Fq: L=24 → R=2^384), so host<->device conversion is a
pure base change without Montgomery conversion.

All functions are shape-polymorphic over leading batch dimensions:
``[..., L] -> [..., L]`` and are jit/vmap/shard_map friendly (static shapes,
unrolled fixed-trip loops over limb indices).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .host import FieldParams

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(value: int, n_limbs: int) -> np.ndarray:
    out = np.zeros(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = (value >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_int(limbs) -> int:
    arr = np.asarray(limbs, dtype=np.uint64)
    value = 0
    for i in range(arr.shape[-1] - 1, -1, -1):
        value = (value << LIMB_BITS) | int(arr[..., i])
    return value


class DeviceField:
    """Precomputed constants + batched ops for one prime field on device."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.n_limbs = params.repr_bits // LIMB_BITS
        L = self.n_limbs
        p = params.modulus
        self.p_int = p
        # Constants are kept as *numpy* arrays: DeviceField instances are
        # lru_cached by callers, and a cached jnp constant created inside one
        # trace (e.g. a shard_map body) would leak as a tracer into the next.
        # numpy constants are trace-neutral — jnp ops lift them fresh each use.
        self.p_limbs = int_to_limbs(p, L)
        self.r_int = params.montgomery_r
        self.r2_int = params.montgomery_r**2 % p
        self.r_limbs = int_to_limbs(self.r_int, L)
        self.r2_limbs = int_to_limbs(self.r2_int, L)
        # n0 = -p^{-1} mod 2^16 for REDC
        self.n0 = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.zero = np.zeros((L,), dtype=np.uint32)
        self.one_mont = int_to_limbs(self.r_int, L)  # 1 in Montgomery form

    # -- host <-> device ----------------------------------------------------

    def to_mont(self, values: list[int] | np.ndarray) -> jnp.ndarray:
        """Pack standard-form Python ints -> Montgomery-form device array [N, L]."""
        vals = values if isinstance(values, (list, tuple)) else [int(v) for v in np.atleast_1d(values)]
        p, R = self.p_int, self.r_int
        arr = np.stack([int_to_limbs(v * R % p, self.n_limbs) for v in vals])
        return jnp.asarray(arr)

    def from_mont(self, arr) -> list[int]:
        """Montgomery-form device array [N, L] -> standard-form Python ints."""
        np_arr = np.asarray(arr)
        rinv = pow(self.r_int, -1, self.p_int)
        flat = np_arr.reshape(-1, self.n_limbs)
        return [limbs_to_int(row) * rinv % self.p_int for row in flat]

    # -- limb plumbing -------------------------------------------------------

    def normalize(self, t: jnp.ndarray) -> jnp.ndarray:
        """Carry-propagate so every limb is < 2^16 (top carries dropped —
        caller must guarantee no overflow past the last limb).

        Implemented as a lax.scan over limb columns: the unrolled chain of
        dependent add/shift ops is a pattern XLA's algebraic simplifier
        re-walks superlinearly when many muls are inlined in one graph
        (50-pass 'circular simplification loop' on the multi-chip dryrun)."""
        import jax

        cols = jnp.moveaxis(t, -1, 0)

        def step(carry, col):
            v = col + carry
            return v >> LIMB_BITS, v & LIMB_MASK

        _carry, out = jax.lax.scan(step, jnp.zeros_like(cols[0]), cols)
        return jnp.moveaxis(out, 0, -1)

    def _sub_with_borrow(self, a: jnp.ndarray, b: jnp.ndarray):
        """a - b limbwise (both normalized); returns (diff, borrow_out)."""
        import jax

        a = jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
        b = jnp.broadcast_to(b, a.shape)
        cols = (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0))

        def step(borrow, ab):
            ai, bi = ab
            d = ai - bi - borrow
            return (d >> 31) & 1, d & LIMB_MASK  # underflow wraps: top bit set

        borrow, out = jax.lax.scan(step, jnp.zeros_like(a[..., 0]), cols)
        return jnp.moveaxis(out, 0, -1), borrow

    def _cond_sub_p(self, a: jnp.ndarray) -> jnp.ndarray:
        """If a >= p, return a - p, else a (a normalized, < 2p)."""
        diff, borrow = self._sub_with_borrow(a, jnp.broadcast_to(self.p_limbs, a.shape))
        keep = (borrow == 1)[..., None]
        return jnp.where(keep, a, diff)

    # -- modular ops (Montgomery form in, Montgomery form out) ----------------

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._cond_sub_p(self.normalize(a + b))

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        diff, borrow = self._sub_with_borrow(a, b)
        # If borrowed, add p back.
        plus_p = self.normalize(diff + self.p_limbs)
        return jnp.where((borrow == 1)[..., None], plus_p, diff)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        diff, _ = self._sub_with_borrow(jnp.broadcast_to(self.p_limbs, a.shape), a)
        return jnp.where(is_zero, a, diff)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: REDC(a * b) — schoolbook + interleaved reduction.

        ~2 L^2 uint32 multiplies per element, vectorized over the batch on
        the VPU.  The accumulator is one ``[.., 2L+1]`` array updated with
        shifted (padded) row adds, so the traced graph is O(L) nodes — the
        earlier per-column formulation emitted O(L^2) HLO ops, which blew up
        XLA compile times inside scan/shard_map (multi-minute compiles and
        algebraic-simplifier loops on the multi-chip dry run).
        """
        import jax

        L = self.n_limbs
        a = jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
        b = jnp.broadcast_to(b, a.shape)
        batch_shape = a.shape[:-1]
        nd = len(batch_shape)
        pad_cfg_lo = [(0, 0)] * nd + [(0, 1)]  # row at offset 0 of an L+1 window
        pad_cfg_hi = [(0, 0)] * nd + [(1, 0)]  # row at offset 1

        # Both phases are lax.scan loops over limb index i with a sliding
        # dynamic window into the [.., 2L+1] accumulator.  Each mul instance
        # is then a ~50-node subgraph no matter how many are inlined by the
        # caller (point adds, MSM ladders, shard_map bodies) — the unrolled
        # O(L^2) formulation made XLA's algebraic simplifier loop for minutes.
        # Column bound: <= 2L contributions of < 2^16 each — fits u32 easily.

        def prod_step(t, xs):
            ai, i = xs
            prod = ai[..., None] * b  # [.., L] uint32, exact 16x16 products
            seg = jax.lax.dynamic_slice_in_dim(t, i, L + 1, axis=-1)
            seg = (
                seg
                + jnp.pad(prod & LIMB_MASK, pad_cfg_lo)
                + jnp.pad(prod >> LIMB_BITS, pad_cfg_hi)
            )
            return jax.lax.dynamic_update_slice_in_dim(t, seg, i, axis=-1), None

        # derive the accumulator from `a` so it inherits any shard_map
        # varying axes (a plain jnp.zeros carry breaks scan-vma typing)
        t0 = jnp.pad(jnp.zeros_like(a), [(0, 0)] * nd + [(0, L + 1)])
        a_cols = jnp.moveaxis(a, -1, 0)  # [L, ..]
        t, _ = jax.lax.scan(prod_step, t0, (a_cols, jnp.arange(L)))

        # Interleaved REDC: retire one low column per step.
        n0 = jnp.uint32(self.n0)
        p = self.p_limbs

        def redc_step(t, i):
            seg = jax.lax.dynamic_slice_in_dim(t, i, L + 1, axis=-1)
            m = ((seg[..., 0] & LIMB_MASK) * n0) & LIMB_MASK
            prod = m[..., None] * p  # [.., L]
            seg = (
                seg
                + jnp.pad(prod & LIMB_MASK, pad_cfg_lo)
                + jnp.pad(prod >> LIMB_BITS, pad_cfg_hi)
            )
            # column i is ≡ 0 mod 2^16 now; push its carry up
            seg = seg.at[..., 1].add(seg[..., 0] >> LIMB_BITS)
            return jax.lax.dynamic_update_slice_in_dim(t, seg, i, axis=-1), None

        t, _ = jax.lax.scan(redc_step, t, jnp.arange(L))
        res = t[..., L : 2 * L]
        # propagate carries; the final carry joins column 2L (bounded: result < 2p)
        res = self._normalize_with_top(res, t[..., 2 * L])
        return self._cond_sub_p(res)

    def _normalize_with_top(self, res: jnp.ndarray, top: jnp.ndarray) -> jnp.ndarray:
        import jax

        cols = jnp.moveaxis(res, -1, 0)

        def step(carry, col):
            v = col + carry
            return v >> LIMB_BITS, v & LIMB_MASK

        carry, out = jax.lax.scan(step, jnp.zeros_like(cols[0]), cols)
        # Montgomery bound guarantees top + carry contributes < p at limb L;
        # fold it into an extended representation and reduce once.
        extra = top + carry
        # extra * 2^(16L) mod p == extra * R mod p; since result < 2p, extra
        # is 0 or 1 and extra*R mod p == R mod p... handled by subtracting p.
        # For extra == 1, result value = res + 2^(16L) => res - p (< p) because
        # result < 2p and 2^(16L) > p.  Implement via conditional subtract.
        has_extra = (extra > 0)[..., None]
        res_arr = jnp.moveaxis(out, 0, -1)
        diff, _ = self._sub_with_borrow(res_arr, jnp.broadcast_to(self.p_limbs, res_arr.shape))
        # res + 2^(16L) - p fits in L limbs: compute (res - p) mod 2^(16L)
        # which equals res + 2^(16L) - p exactly when res < p.
        return jnp.where(has_extra, diff, res_arr)

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def mul_scalar_mont(self, a: jnp.ndarray, scalar_mont: jnp.ndarray) -> jnp.ndarray:
        """Multiply batch by a single Montgomery-form scalar [L]."""
        return self.mul(a, jnp.broadcast_to(scalar_mont, a.shape))

    def pow_host_exponent(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """Square-and-multiply with a host-side (static) exponent."""
        result = jnp.broadcast_to(self.one_mont, a.shape)
        base = a
        while e > 0:
            if e & 1:
                result = self.mul(result, base)
            e >>= 1
            if e:
                base = self.square(base)
        return result

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Elementwise select: cond ? a : b.  cond shape [...] (no limb dim)."""
        return jnp.where(cond[..., None], a, b)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)
