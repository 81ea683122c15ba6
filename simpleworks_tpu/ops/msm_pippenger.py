"""Device Pippenger MSM over BLS12-377 G1 (the KZG commit kernel).

Replaces the MSM inside every polynomial commitment (reference:
``ark_poly_commit::marlin_pc`` consumed at
``/root/reference/src/marlin/mod.rs:12``; SURVEY.md §2.3/§2.4
'Distributed Pippenger MSM').

TPU-first decomposition — all data-dependent control flow happens on the
HOST at schedule time; the device program is static-shape batched point
arithmetic:

1. **Host schedule**: scalars (numpy ``[N, 4]`` u64, standard form) are cut
   into W = ⌈256/c⌉ windows of c bits.  For each window the points are
   counting-sorted by digit into a ``[D, B]`` gather grid (B = 2^c buckets,
   column d = the points with digit d, identity-padded to the max bucket
   occupancy D).  Digit extraction + sort are cheap numpy; the grid is the
   entire "scatter" problem solved ahead of time.
2. **Device accumulate**: one ``lax.scan`` of D steps; each step gathers a
   ``[W·B]``-lane point batch and does one masked complete Jacobian add
   (~23 Pallas Fq muls — compute-bound in VMEM).  Work = D·W·B lane-adds
   ≈ the W·N sequential-Pippenger optimum times a small padding factor.
3. **Device bucket combine**: Σ_d d·S_d per window via inclusive suffix
   sums (Hillis-Steele over the bucket axis, c batched adds) and a tree
   reduction — 2c adds over W·B lanes.
4. **Host window fold**: W window sums return to host; Horner with c
   doublings per window (W·c ≈ 256 cheap host point ops).

Bit-exact vs the host/native Pippenger (same group elements; tested in
tests/test_msm_device.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.bls12_377 import G1Point
from . import g1_limb

SCALAR_BITS = 256


def window_digits(scalars_std: np.ndarray, c: int) -> np.ndarray:
    """[N, 4] u64 standard-form scalars -> [W, N] int64 window digits."""
    std = np.ascontiguousarray(scalars_std, dtype="<u8")
    n = std.shape[0]
    w_count = (SCALAR_BITS + c - 1) // c
    mask = np.uint64((1 << c) - 1)
    out = np.zeros((w_count, n), dtype=np.int64)
    for w in range(w_count):
        lo = w * c
        l0, off = divmod(lo, 64)
        d = std[:, l0] >> np.uint64(off)
        if off + c > 64 and l0 + 1 < 4:
            spill = off + c - 64
            high = std[:, l0 + 1] & np.uint64((1 << spill) - 1)
            d = d | (high << np.uint64(64 - off))
        out[w] = (d & mask).astype(np.int64)
    return out


def _round_up_depth(d: int) -> int:
    """Quantize the grid depth to limit distinct jit shapes (≤25% padding)."""
    if d <= 8:
        return 8
    step = 1 << max(3, d.bit_length() - 3)
    return ((d + step - 1) // step) * step


def build_schedule(scalars_std: np.ndarray, c: int, offset: int = 0):
    """-> (idx [D, W·B] int32, valid [D, W·B] bool).  Column w·B + d of the
    grid lists the indices (``offset``-shifted) of points whose window-w
    digit is d; digit 0 contributes weight 0 and gets no column entries."""
    n = scalars_std.shape[0]
    b = 1 << c
    digits = window_digits(scalars_std, c)
    w_count = digits.shape[0]
    per_window = []
    depth = 0
    for w in range(w_count):
        dw = digits[w]
        order = np.argsort(dw, kind="stable")
        sd = dw[order]
        counts = np.bincount(sd, minlength=b)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ranks = np.arange(n) - starts[sd]
        keep = sd > 0
        d_w = int(ranks[keep].max()) + 1 if keep.any() else 0
        depth = max(depth, d_w)
        per_window.append((order[keep], sd[keep], ranks[keep]))
    depth = _round_up_depth(max(depth, 1))
    idx = np.zeros((depth, w_count, b), dtype=np.int32)
    valid = np.zeros((depth, w_count, b), dtype=bool)
    for w, (point_idx, sd, ranks) in enumerate(per_window):
        idx[ranks, w, sd] = point_idx + offset
        valid[ranks, w, sd] = True
    return idx.reshape(depth, w_count * b), valid.reshape(depth, w_count * b)


@lru_cache(maxsize=16)
def _make_accumulate(n_points: int, depth: int, w_count: int, b: int):
    """Jitted: (X, Y, Z [24, n_points], idx, valid) -> [24, W] window sums."""

    def run(X, Y, Z, idx, valid):
        acc = g1_limb.identity(w_count * b)

        def step(acc, xs):
            idx_d, valid_d = xs
            pts = (
                jnp.take(X, idx_d, axis=1),
                jnp.take(Y, idx_d, axis=1),
                jnp.take(Z, idx_d, axis=1),
            )
            added = g1_limb.add(acc, pts)
            return g1_limb.select_point(valid_d, added, acc), None

        acc, _ = jax.lax.scan(step, acc, (idx, valid))

        # suffix sums over the bucket axis: T_j = Σ_{d≥j} S_d
        # (Σ_{j≥1} T_j = Σ_d d·S_d — the running-sum trick, batched)
        t = acc
        k = 1
        while k < b:
            shifted = tuple(
                jnp.concatenate(
                    [a.reshape(24, w_count, b)[:, :, k:], i.reshape(24, w_count, b)[:, :, :k]],
                    axis=2,
                ).reshape(24, w_count * b)
                for a, i in zip(t, g1_limb.identity(w_count * b))
            )
            t = g1_limb.add(t, shifted)
            k <<= 1
        # drop T_0 (digit 0 has weight 0)
        lane_digit = jnp.tile(jnp.arange(b), w_count)
        t = g1_limb.select_point(lane_digit == 0, g1_limb.identity(w_count * b), t)
        # tree-reduce the bucket axis to one point per window
        lanes = b
        while lanes > 1:
            half = lanes // 2
            t3 = tuple(a.reshape(24, w_count, lanes) for a in t)
            left = tuple(a[:, :, :half].reshape(24, w_count * half) for a in t3)
            right = tuple(a[:, :, half:].reshape(24, w_count * half) for a in t3)
            t = g1_limb.add(left, right)
            lanes = half
        return t  # ([24, W],)*3

    return jax.jit(run)


def msm_device(points_lm, scalars_std: np.ndarray, c: int = 8,
               offset: int = 0) -> G1Point:
    """MSM of ``scalars_std`` ([N, 4] u64 standard form) against points
    ``offset..offset+N`` of the ([24, M],)*3 limb-major device array."""
    n = scalars_std.shape[0]
    if n == 0:
        return G1Point.identity()
    b = 1 << c
    w_count = (SCALAR_BITS + c - 1) // c
    idx, valid = build_schedule(scalars_std, c, offset=offset)
    X, Y, Z = points_lm
    fn = _make_accumulate(X.shape[1], idx.shape[0], w_count, b)
    wins = fn(X, Y, Z, jnp.asarray(idx), jnp.asarray(valid))
    window_points = g1_limb.points_from_limb_major(wins)
    total = G1Point.identity()
    for wp in reversed(window_points):
        for _ in range(c):
            total = total.double()
        total = total.add(wp)
    return total
