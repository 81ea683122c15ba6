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
   ``[W·B]``-lane AFFINE point batch (x, y only — the SRS is normalized to
   Z = 1) and does one masked complete mixed add (``g1_limb.madd``,
   11 Pallas Fq muls vs 16 for the Jacobian-Jacobian add).  Work = D·W·B
   lane-adds ≈ the W·N sequential-Pippenger optimum times a small padding
   factor.
3. **Device bucket combine**: Σ_d d·S_d per window via inclusive suffix
   sums (Hillis-Steele over the bucket axis, c batched adds) and a tree
   reduction — 2c adds over W·B lanes.
4. **Host window fold**: W window sums return to host; Horner with c
   doublings per window (W·c ≈ 256 cheap host point ops).

Bit-exact vs the host/native Pippenger (same group elements; tested in
tests/test_msm_device.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.bls12_377 import G1Point
from . import g1_limb

SCALAR_BITS = 256
TILE_PAD = 512  # mont_mul_pallas.TILE: device-scalar batches pad to this


def default_accum() -> str:
    """Scan-step accumulate mode when ``SWTPU_MSM_ACCUM`` is unset:
    batch-affine on real TPUs (the ~6-vs-11-mul win, with the inversion
    tree in Pallas tiles), the Jacobian mixed add elsewhere — on the XLA
    CPU fallback every tree level's width compiles a separate scan-based
    mul program, which blows the test/dryrun compile budget for no
    benefit."""
    import os

    flag = os.environ.get("SWTPU_MSM_ACCUM")
    if flag:
        return flag
    try:
        return "affine" if jax.default_backend() == "tpu" else "madd"
    except Exception:
        return "madd"


def window_digits(scalars_std: np.ndarray, c: int) -> np.ndarray:
    """[N, 4] u64 standard-form scalars -> [W, N] window digits.

    For c = 8/16 the digits ARE the scalar's little-endian bytes/u16 words,
    so the result is a zero-compute reinterpret-view transpose (the general
    shift loop costs ~0.5 s at N = 2^17 on a 2-vCPU host — it was the
    single largest term in the device-MSM end-to-end time)."""
    std = np.ascontiguousarray(scalars_std, dtype="<u8")
    n = std.shape[0]
    if c == 8:
        return std.view(np.uint8).reshape(n, 32).T
    if c == 16:
        return std.view("<u2").reshape(n, 16).T
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


_TARGET_LANES = 32768  # scan-step width target: wider steps amortize the
# per-step gather/dispatch overhead that dominates the accumulate program
# (measured on v5e at N=2^17/c=8: 1.64 s e2e at 4096 lanes -> 1.47 s at
# 32768; beyond that padding outweighs the win)


def _round_up_depth(d: int) -> int:
    """Quantize the grid depth to limit distinct jit shapes (≤25% padding)."""
    if d <= 8:
        return 8
    step = 1 << max(3, d.bit_length() - 3)
    return ((d + step - 1) // step) * step


def build_schedule(scalars_std: np.ndarray, c: int, offset: int = 0):
    """-> list of (window_ids, b_g, idx [D_g, |g|·b_g] int32, valid …bool).

    Column w·B + d of a group's grid lists the indices (``offset``-shifted)
    of points whose window-w digit is d; digit 0 contributes weight 0 and
    gets no column entries.  Windows are *grouped by bucket-occupancy
    depth*: the top window's digits span only the scalar's leading bits
    (2^5 values for 253-bit scalars at c=8), so its depth is ~B/live
    larger than the uniform windows' — one global depth would pad every
    other window to it (the 11× blow-up seen at N=2^17)."""
    n = scalars_std.shape[0]
    b = 1 << c
    digits = window_digits(scalars_std, c)
    w_count = digits.shape[0]
    per_window = []
    for w in range(w_count):
        dw = digits[w]
        order = np.argsort(dw, kind="stable")
        sd = dw[order]
        counts = np.bincount(sd, minlength=b)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ranks = np.arange(n) - starts[sd]
        keep = sd > 0
        d_w = int(ranks[keep].max()) + 1 if keep.any() else 0
        per_window.append((w, d_w, order[keep], sd[keep], ranks[keep]))

    # group windows whose depth is within 2x of the group's minimum
    per_window.sort(key=lambda t: t[1])
    groups: list[list[tuple]] = []
    for entry in per_window:
        if groups and entry[1] <= max(2 * max(groups[-1][0][1], 8), 64):
            groups[-1].append(entry)
        else:
            groups.append([entry])

    out = []
    for group in groups:
        raw_depth = max(max(e[1] for e in group), 1)
        g = len(group)
        # per-group bucket count: the top window's digits span only the
        # scalar's leading bits — give it 2^(bits used) buckets, not 2^c
        max_digit = max((int(e[3].max()) if e[3].size else 1) for e in group)
        b_g = 1
        while b_g <= max_digit:
            b_g <<= 1
        b_g = max(b_g, 2)
        # depth folding: a deep-narrow grid (the top window: depth ~N/live,
        # a handful of lanes) pays the per-scan-step overhead D times for
        # tiny steps — split each bucket column into S segments that
        # accumulate in parallel lanes and tree-combine on device.
        segs = 1
        while g * b_g * segs < _TARGET_LANES and segs * 2 <= raw_depth:
            segs <<= 1
        depth = _round_up_depth((raw_depth + segs - 1) // segs)
        idx = np.zeros((depth, g, segs, b_g), dtype=np.int32)
        valid = np.zeros((depth, g, segs, b_g), dtype=bool)
        window_ids = []
        for slot, (w, _d, point_idx, sd, ranks) in enumerate(group):
            seg = ranks // depth
            row = ranks % depth
            idx[row, slot, seg, sd] = point_idx + offset
            valid[row, slot, seg, sd] = True
            window_ids.append(w)
        out.append(
            (window_ids, segs, b_g,
             idx.reshape(depth, g * segs * b_g), valid.reshape(depth, g * segs * b_g))
        )
    return out


def accumulate_windows(XYZ, idx, valid, w_count: int, segs: int, b: int,
                       axis_name: str | None = None, accum: str | None = None):
    """(XYZ [2+, 24, n_local] X/Y planes, idx [D, W·S·B], valid) -> ([24, W],)*3 window
    sums.  The graph stays small — a handful of point-add subgraphs —
    because the D accumulation steps (lax.scan), the log₂(S) segment folds
    (unrolled halving), and the 2·log₂(B) bucket-combine steps
    (lax.fori_loop with a dynamic-slice shift) each trace their point add
    once.  ``axis_name``: set inside shard_map so loop carries acquire the
    mesh-varying type.

    ``accum`` selects the scan-step point add (env ``SWTPU_MSM_ACCUM``):
    ``"affine"`` (default) keeps the accumulator affine and does
    batch-affine adds — ~4 muls + one shared batched inversion
    (~3 muls/lane + a single Fermat-powering kernel) per step vs the
    ``"madd"`` path's 11-mul Jacobian mixed add (kept as the oracle) —
    the device analogue of the host C++ batch-affine scheme
    (VERDICT r3 #3)."""
    if accum is None:
        accum = default_accum()
    log_b = b.bit_length() - 1

    def vary(t3):
        if axis_name is None:
            return t3
        return tuple(jax.lax.pvary(a, (axis_name,)) for a in t3)

    def suffix_pass(t):
        """Inclusive suffix sums along the bucket axis of ([24, W, B],)*3:
        T_j ← Σ_{d≥j} T_d.  Shift-by-k slides in identity via a padded
        dynamic slice (no wraparound, no mask)."""
        pad = tuple(
            a.reshape(24, w_count, b) for a in vary(g1_limb.identity(w_count * b))
        )

        def body(i, t):
            k = jnp.int32(1) << i
            shifted = tuple(
                jax.lax.dynamic_slice_in_dim(
                    jnp.concatenate([a, p], axis=2), k, b, axis=2
                ).reshape(24, w_count * b)
                for a, p in zip(t, pad)
            )
            flat = tuple(a.reshape(24, w_count * b) for a in t)
            summed = g1_limb.add(flat, shifted)
            return tuple(a.reshape(24, w_count, b) for a in summed)

        return jax.lax.fori_loop(0, log_b, body, t)

    lanes = w_count * segs * b

    # Row-major copy for the scan's gathers: TPU gathers are fast along the
    # LEADING axis (whole point rows) and ~6x slower along the lane (minor)
    # axis — measured 0.7 ms vs 4.4 ms per 63k-point gather on v5e.  Points
    # are AFFINE (Z == 1 by the limb-major packing invariant; identity rows
    # x = y = 0), so only X, Y are gathered (192 bytes/row, −33%).
    rows = XYZ[:2].reshape(2 * 24, -1).T  # [n, 48]

    if accum == "affine":
        zero = jnp.zeros((24, lanes), jnp.uint32)
        acc2 = (zero, zero)  # affine identity = (0, 0)
        if axis_name is not None:
            acc2 = tuple(jax.lax.pvary(a, (axis_name,)) for a in acc2)

        def step2(acc2, xs):
            idx_d, valid_d = xs
            g = jnp.take(rows, idx_d, axis=0)  # [lanes, 48]
            pts2 = g.T.reshape(2, 24, -1)
            return g1_limb.affine_madd(acc2, (pts2[0], pts2[1]), valid_d), None

        acc2, _ = jax.lax.scan(step2, acc2, (idx, valid))
        acc = g1_limb.affine_to_jacobian(acc2)
    else:
        acc = vary(g1_limb.identity(lanes))

        def step(acc, xs):
            idx_d, valid_d = xs
            g = jnp.take(rows, idx_d, axis=0)  # [lanes, 48]
            pts2 = g.T.reshape(2, 24, -1)
            added = g1_limb.madd(acc, (pts2[0], pts2[1]))
            return g1_limb.select_point(valid_d, added, acc), None

        acc, _ = jax.lax.scan(step, acc, (idx, valid))

    # fold the segment axis: [24, W, S, B] -> [24, W, B]
    s = segs
    while s > 1:
        half = s // 2
        t4 = tuple(a.reshape(24, w_count, s, b) for a in acc)
        left = tuple(a[:, :, :half].reshape(24, w_count * half * b) for a in t4)
        right = tuple(a[:, :, half:].reshape(24, w_count * half * b) for a in t4)
        acc = g1_limb.add(left, right)
        s = half

    # Σ_d d·S_d per window via two suffix passes: first T_j = Σ_{d≥j} S_d,
    # then (with T_0 zeroed — digit 0 has weight 0) lane 0 of a second
    # suffix pass is Σ_{j≥1} T_j = Σ_d d·S_d.
    t = suffix_pass(tuple(a.reshape(24, w_count, b) for a in acc))
    ident = tuple(
        a.reshape(24, w_count, b) for a in vary(g1_limb.identity(w_count * b))
    )
    t = tuple(
        jnp.concatenate([i[:, :, :1], a[:, :, 1:]], axis=2)
        for a, i in zip(t, ident)
    )
    t = suffix_pass(t)
    return tuple(a[:, :, 0] for a in t)  # ([24, W],)*3


@lru_cache(maxsize=64)
def _make_accumulate(n_points: int, depth: int, w_count: int, segs: int, b: int,
                     accum: str = "affine"):
    """Jitted single-chip wrapper around :func:`accumulate_windows`."""

    def run(XYZ, idx, valid):
        return accumulate_windows(XYZ, idx, valid, w_count, segs, b, accum=accum)

    return jax.jit(run)


# ------------------------------------------- device-built schedule ----------
#
# The [D, lanes] gather grids are ~20x larger than the digits they encode
# (int32 idx + bool valid vs one byte per (window, point)); on link-limited
# hosts (the axon tunnel moves ~40 MB/s) shipping grids dominates the MSM
# end-to-end time.  This path uploads only the u8 digit matrix and builds
# the same grids on device: per-window argsort groups points by digit,
# searchsorted yields bucket starts/counts, and the grid is pure gather
# arithmetic (no scatter — TPU-friendly).  Bit-exact with the host path.


def window_counts(digits: np.ndarray, b: int) -> np.ndarray:
    """[W, N] digits -> [W, b] bucket counts (cheap host bincount)."""
    w_count = digits.shape[0]
    out = np.zeros((w_count, b), dtype=np.int64)
    for w in range(w_count):
        out[w] = np.bincount(digits[w], minlength=b)
    return out


def build_schedule_meta(digits: np.ndarray, c: int):
    """Grouping/shape decisions only (the data-dependent part the host must
    know for static shapes): -> [(window_ids, segs, b_g, depth)], same
    policy as :func:`build_schedule` but from bincounts — no argsort, no
    grid materialization."""
    b = 1 << c
    counts = window_counts(digits, b)
    w_count = digits.shape[0]
    per_window = []
    for w in range(w_count):
        nz = counts[w, 1:]  # digit 0 contributes nothing
        d_w = int(nz.max()) if nz.size else 0
        live = np.nonzero(counts[w])[0]
        max_digit = int(live.max()) if live.size else 1
        per_window.append((w, d_w, max_digit))
    return _meta_from_stats(per_window)


def _meta_from_stats(per_window: list):
    """Shared grouping policy: [(w, max_bucket_occupancy, max_digit)] ->
    [(window_ids, segs, b_g, depth)] (see build_schedule for rationale)."""
    per_window = sorted(per_window, key=lambda t: t[1])
    groups: list[list[tuple]] = []
    for entry in per_window:
        if groups and entry[1] <= max(2 * max(groups[-1][0][1], 8), 64):
            groups[-1].append(entry)
        else:
            groups.append([entry])

    out = []
    for group in groups:
        raw_depth = max(max(e[1] for e in group), 1)
        g = len(group)
        max_digit = max(max(e[2], 1) for e in group)
        b_g = 1
        while b_g <= max_digit:
            b_g <<= 1
        b_g = max(b_g, 2)
        segs = 1
        while g * b_g * segs < _TARGET_LANES and segs * 2 <= raw_depth:
            segs <<= 1
        depth = _round_up_depth((raw_depth + segs - 1) // segs)
        out.append(([e[0] for e in group], segs, b_g, depth))
    return out


def device_grid_from_digits(digits_g: jnp.ndarray, n: int, depth: int,
                            segs: int, b: int, offset):
    """[g, N] int32 digits -> (idx [D, g·S·B] int32, valid [D, g·S·B] bool),
    the exact layout :func:`build_schedule` produces (modulo within-bucket
    point order, which point addition doesn't observe)."""
    g = digits_g.shape[0]
    order = jnp.argsort(digits_g, axis=1)  # [g, N] points grouped by digit
    sorted_d = jnp.take_along_axis(digits_g, order, axis=1)
    targets = jnp.arange(b + 1, dtype=digits_g.dtype)
    starts = jax.vmap(lambda sd: jnp.searchsorted(sd, targets))(sorted_d)  # [g, b+1]
    counts = starts[:, 1:] - starts[:, :-1]  # [g, b]

    row = jnp.arange(depth, dtype=jnp.int32).reshape(1, depth, 1, 1)
    seg = jnp.arange(segs, dtype=jnp.int32).reshape(1, 1, segs, 1)
    dig = jnp.arange(b, dtype=jnp.int32).reshape(1, 1, 1, b)
    k = seg * depth + row  # rank within the bucket               [1, D, S, B]
    pos = starts[:, :-1].astype(jnp.int32).reshape(g, 1, 1, b) + k  # [g, D, S, B]
    valid = (k < counts.astype(jnp.int32).reshape(g, 1, 1, b)) & (dig > 0)
    pos = jnp.clip(pos, 0, n - 1)
    idx = jax.vmap(jnp.take)(order.astype(jnp.int32), pos.reshape(g, -1))
    idx = idx.reshape(g, depth, segs, b) + jnp.asarray(offset, jnp.int32)
    # [g, D, S, B] -> [D, g, S, B] -> [D, g·S·B] (the scan layout)
    idx = jnp.moveaxis(idx, 0, 1).reshape(depth, g * segs * b)
    valid = jnp.moveaxis(valid, 0, 1).reshape(depth, g * segs * b)
    return idx, valid


@lru_cache(maxsize=32)
def _make_accumulate_multi(n_points: int, n_scalars: int, meta_key: tuple,
                           accum: str = "affine"):
    """Jitted: (XYZ, offset, *[g_i, N] digit arrays) -> [3, 24, ΣW]
    concatenated window sums — ALL bucket groups in ONE program with ONE
    result fetch.  On a high-latency link each per-group dispatch+fetch
    pays ~2 round trips (~70 ms measured); an MSM has 2-3 groups, so
    fusing them saves ~0.2 s per call.  ``meta_key``:
    ((g, segs, b, depth), ...); ``offset`` is runtime (see above)."""

    def run(XYZ, offset, *digit_arrays):
        outs = []
        for d_g, (g, segs, b, depth) in zip(digit_arrays, meta_key):
            idx, valid = device_grid_from_digits(
                d_g.astype(jnp.int32), n_scalars, depth, segs, b, offset
            )
            outs.append(
                accumulate_windows(XYZ, idx, valid, g, segs, b, accum=accum)
            )
        return jnp.stack(
            [jnp.concatenate([o[k] for o in outs], axis=1) for k in range(3)]
        )

    return jax.jit(run)


def _auto_window_bits(n: int) -> int:
    """Window size minimizing scan work (N·W) + bucket-combine work
    (2c·W·2^c): larger windows win once N amortizes the combine.
    Override with ``SWTPU_MSM_C``."""
    import os

    flag = os.environ.get("SWTPU_MSM_C")
    if flag:
        return int(flag)
    return 13 if n >= (1 << 19) else 8


# ----------------------------------- device-resident scalars ---------------
#
# The prover's polynomial coefficients live (or can live) on the device in
# the NTT's [16, N]-u32 Montgomery limb layout.  This entry derives the
# Pippenger digits ON DEVICE from that representation — one Pallas
# Montgomery multiply by literal 1 (mont→standard, canonical) plus limb
# reinterpretation — so a commit consumes device-resident round output
# with only a [W, 2]-int stats fetch and the tiny window sums crossing the
# link.  Bit-exact with msm_device (same accumulate programs).


def _digits_from_std16(std16: jnp.ndarray, c: int) -> jnp.ndarray:
    """[16, N] u32 standard-form 16-bit limbs -> [W, N] int32 digits
    (traced; c = 16/8 are pure reinterpretations)."""
    if c == 16:
        return std16.astype(jnp.int32)
    if c == 8:
        lo = std16 & 0xFF
        hi = std16 >> 8
        return (
            jnp.stack([lo, hi], axis=1).reshape(32, std16.shape[1]).astype(jnp.int32)
        )
    mask = jnp.uint32((1 << c) - 1)
    w_count = (SCALAR_BITS + c - 1) // c
    rows = []
    for w in range(w_count):
        l0, off = divmod(w * c, 16)
        d = std16[l0] >> off
        if off + c > 16 and l0 + 1 < 16:
            d = d | (std16[l0 + 1] << (16 - off))
        rows.append(d & mask)
    return jnp.stack(rows).astype(jnp.int32)


@lru_cache(maxsize=32)
def _make_mont_digits(qn: int, c: int):
    """Jitted: [16, qn] u32 Montgomery limbs -> (digits [W, qn] i32,
    occupancy [W] i32, max_live_digit [W] i32).  Stats come from a sorted
    count pass (searchsorted over the 2^c bucket boundaries), the only
    data-dependent shape information the host needs."""
    from ..fields.bls12_377 import Fr

    b = 1 << c
    one_np = np.zeros((16, 1), np.uint32)
    one_np[0, 0] = 1  # literal 1: montmul(v·R, 1) = v, canonical
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from .mont_mul_pallas import make_mont_mul

        mul = make_mont_mul(Fr.PARAMS)
    else:
        from ..fields.device import DeviceField

        df = DeviceField(Fr.PARAMS)

        def mul(a, bb):  # pure-XLA twin on the CPU/virtual backend
            return df.mul(a.T, bb.T).T

    def run(mont_u32):
        ones = jnp.broadcast_to(jnp.asarray(one_np), mont_u32.shape)
        std16 = mul(mont_u32, ones)
        digits = _digits_from_std16(std16, c)
        sd = jnp.sort(digits, axis=1)
        targets = jax.lax.iota(jnp.int32, b + 1).reshape(b + 1, 1)
        starts = jax.vmap(lambda row: jnp.searchsorted(row, targets[:, 0]))(sd)
        counts = starts[:, 1:] - starts[:, :-1]  # [W, b]
        occ = jnp.max(counts[:, 1:], axis=1)
        live = jnp.max(
            jnp.where(counts > 0, jax.lax.iota(jnp.int32, b)[None, :], 0), axis=1
        )
        return digits, jnp.stack([occ, live], axis=1)

    return jax.jit(run)


def msm_device_mont(points_lm, coeffs, offset: int = 0, c: int | None = None) -> G1Point:
    """MSM of Montgomery-form coefficients against points
    ``offset..offset+N`` of the limb-major device table.

    ``coeffs``: an FrVec (host [N, 4] u64 Montgomery limbs — uploaded as
    u16, half the bytes of standard-form digits at c=8), or a [16, N] u32
    device array already resident from an NTT chain (zero upload)."""
    from ..fields.frvec import FrVec

    if isinstance(coeffs, FrVec):
        n = len(coeffs)
        mont = None if n == 0 else coeffs.a.view("<u2").reshape(n, 16).T
    else:
        mont = coeffs
        n = int(mont.shape[1])
    if n == 0:
        return G1Point.identity()
    if c is None:
        c = _auto_window_bits(n)
    accum = default_accum()
    w_count = (SCALAR_BITS + c - 1) // c
    qn = _quantize_n(n)
    qn = ((qn + TILE_PAD - 1) // TILE_PAD) * TILE_PAD  # Pallas tile multiple
    if isinstance(mont, np.ndarray):
        if qn != n:
            mont = np.concatenate(
                [mont, np.zeros((16, qn - n), mont.dtype)], axis=1
            )
        mont_dev = jnp.asarray(mont).astype(jnp.uint32)
    else:
        if qn != n:
            mont = jnp.pad(mont, ((0, 0), (0, qn - n)))
        mont_dev = mont.astype(jnp.uint32)

    digits, stats = _make_mont_digits(qn, c)(mont_dev)
    stats_np = np.asarray(stats)  # ONE tiny fetch: [W, 2]
    per_window = [
        (w, int(stats_np[w, 0]), max(int(stats_np[w, 1]), 1))
        for w in range(w_count)
    ]
    metas = _meta_from_stats(per_window)
    meta_key = tuple((len(ids), segs, b_g, depth) for ids, segs, b_g, depth in metas)
    XYZ = points_lm if not isinstance(points_lm, tuple) else jnp.stack(points_lm)
    fn = _make_accumulate_multi(XYZ.shape[2], qn, meta_key, accum)
    stacked = np.asarray(
        fn(
            XYZ,
            jnp.int32(offset),
            *(digits[jnp.asarray(ids, dtype=jnp.int32)] for ids, *_ in metas),
        )
    )
    window_points = [G1Point.identity()] * w_count
    col = 0
    for window_ids, *_ in metas:
        g = len(window_ids)
        wins = tuple(stacked[k, :, col : col + g] for k in range(3))
        col += g
        for w, pt in zip(window_ids, g1_limb.points_from_limb_major(wins)):
            window_points[w] = pt
    total = G1Point.identity()
    for wp in reversed(window_points):
        for _ in range(c):
            total = total.double()
        total = total.add(wp)
    return total


def _quantize_n(n: int) -> int:
    """Round the scalar count up to a 2-significant-bit grid (1, 1.25,
    1.5, 1.75 × 2^k): a Marlin prove issues MSMs at a dozen distinct poly
    sizes, and every distinct size is a fresh accumulate jit (~15-60 s of
    TPU compile each — prove[0] paid ~990 s before this).  Padding digits
    with zeros is free at accumulate time (digit 0 owns no bucket
    entries), costs ≤25% extra digit upload, and collapses the shapes to
    ≤4 per octave shared across proves."""
    if n <= 4096:
        return n
    step = 1 << (n.bit_length() - 3)
    return ((n + step - 1) // step) * step


def msm_device(points_lm, scalars_std: np.ndarray, c: int | None = None,
               offset: int = 0, schedule: str | None = None) -> G1Point:
    """MSM of ``scalars_std`` ([N, 4] u64 standard form) against points
    ``offset..offset+N`` of the ([24, M],)*3 limb-major device array.

    ``c``: window bits (default: size-scaled).  ``schedule``: ``"device"``
    (default) uploads only the u8/u16 digit matrix (~c·N/8 bytes/point)
    and builds the gather grids on device; ``"host"`` ships pre-built
    int32 grids (the original path, kept as the bit-exactness oracle).
    Env override: ``SWTPU_MSM_SCHEDULE``.
    """
    import os

    n = scalars_std.shape[0]
    if n == 0:
        return G1Point.identity()
    if c is None:
        c = _auto_window_bits(n)
    if schedule is None:
        schedule = os.environ.get("SWTPU_MSM_SCHEDULE", "device")
    accum = default_accum()
    w_count = (SCALAR_BITS + c - 1) // c
    XYZ = points_lm if not isinstance(points_lm, tuple) else jnp.stack(points_lm)
    window_points = [G1Point.identity()] * w_count
    # dispatch every group's accumulate before fetching any result: the
    # device overlaps group k+1's digit upload with group k's compute, and
    # the (serializing) host fetches all happen against finished buffers
    pending = []
    if schedule == "device":
        digits = window_digits(scalars_std, c)
        d_small = digits.astype(np.uint8 if c <= 8 else np.uint16)
        qn = _quantize_n(n)
        if qn != n:
            # zero digits own no bucket entries: the schedule meta, depths
            # and window sums are unchanged — only the upload grows
            pad = np.zeros((d_small.shape[0], qn - n), d_small.dtype)
            d_small = np.concatenate([d_small, pad], axis=1)
        metas = build_schedule_meta(digits, c)
        meta_key = tuple(
            (len(w_ids), segs, b_g, depth) for w_ids, segs, b_g, depth in metas
        )
        fn = _make_accumulate_multi(XYZ.shape[2], qn, meta_key, accum)
        stacked = np.asarray(
            fn(
                XYZ,
                jnp.int32(offset),
                *(jnp.asarray(d_small[w_ids]) for w_ids, *_ in metas),
            )
        )
        col = 0
        for window_ids, *_ in metas:
            g = len(window_ids)
            wins = tuple(stacked[k, :, col : col + g] for k in range(3))
            col += g
            for w, pt in zip(window_ids, g1_limb.points_from_limb_major(wins)):
                window_points[w] = pt
    else:
        for window_ids, segs, b_g, idx, valid in build_schedule(
            scalars_std, c, offset=offset
        ):
            fn = _make_accumulate(
                XYZ.shape[2], idx.shape[0], len(window_ids), segs, b_g, accum
            )
            pending.append((window_ids, fn(XYZ, jnp.asarray(idx), jnp.asarray(valid))))
    for window_ids, wins in pending:
        for w, pt in zip(window_ids, g1_limb.points_from_limb_major(wins)):
            window_points[w] = pt
    total = G1Point.identity()
    for wp in reversed(window_points):
        for _ in range(c):
            total = total.double()
        total = total.add(wp)
    return total
