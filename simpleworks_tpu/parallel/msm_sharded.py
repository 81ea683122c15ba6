"""Mesh-sharded Pippenger MSM over BLS12-377 G1 (SURVEY.md §2.4
'Distributed Pippenger MSM'; the KZG commit under
``/root/reference/src/marlin/mod.rs:12`` at pod scale).

Points are sharded across the mesh axis; each device runs the single-chip
bucket accumulation (:func:`simpleworks_tpu.ops.msm_pippenger.
accumulate_windows` — host-sorted gather grids, one masked complete-add
scan, suffix-sum bucket combine) over ITS shard of every Pippenger
window.  Window sums leave the shard_map region *sharded*
(``P(axis, ...)`` — statically checkable, no replication inference) and
the cross-device combine is a small Jacobian tree reduction in the
enclosing jit, riding ICI via XLA's resharding.  A final Horner fold over
windows happens on the host (W·c cheap point ops).

The round-1 ladder (253 sequential double-and-add steps, O(bits·N) point
ops) is replaced wholesale: per-device work is now the Pippenger optimum
W·N/P lane-adds times a small padding factor.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..curves.bls12_377 import G1Point
from ..fields.bls12_377 import FR_MODULUS
from ..fields.frvec import FrVec
from ..ops import g1_limb
from .multihost import fetch_global, put_global
from ..ops.msm_pippenger import (
    SCALAR_BITS,
    _round_up_depth,
    accumulate_windows,
    default_accum,
    device_grid_from_digits,
    window_counts,
    window_digits,
)


def build_sharded_schedule(scalars_std: np.ndarray, c: int, n_shards: int):
    """Per-shard gather grids with a COMMON shape across shards (one SPMD
    program): scalars are split into ``n_shards`` contiguous shards; window
    grouping / bucket counts / depths are computed globally (max over
    shards) so every device runs the same accumulate.

    -> (w_count, [(window_ids, segs, b_g, idx [n_shards, D, lanes],
        valid [n_shards, D, lanes])]).
    """
    from ..ops.msm_pippenger import _TARGET_LANES

    n = scalars_std.shape[0]
    assert n % n_shards == 0, "pad the scalar count to the shard count"
    per = n // n_shards
    digits = window_digits(scalars_std, c)  # [W, n]
    w_count = digits.shape[0]
    b = 1 << c

    # per (shard, window): sorted entries + depth
    entries: list[list[tuple]] = [[] for _ in range(w_count)]
    depth_w = [0] * w_count
    max_digit_w = [1] * w_count
    for s in range(n_shards):
        lo, hi = s * per, (s + 1) * per
        for w in range(w_count):
            dw = digits[w, lo:hi]
            order = np.argsort(dw, kind="stable")
            sd = dw[order]
            counts = np.bincount(sd, minlength=b)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            ranks = np.arange(per) - starts[sd]
            keep = sd > 0
            if keep.any():
                depth_w[w] = max(depth_w[w], int(ranks[keep].max()) + 1)
                max_digit_w[w] = max(max_digit_w[w], int(sd.max()))
            entries[w].append((order[keep], sd[keep], ranks[keep]))

    # group windows by depth (same policy as the single-chip scheduler)
    ordered = sorted(range(w_count), key=lambda w: depth_w[w])
    groups: list[list[int]] = []
    for w in ordered:
        if groups and depth_w[w] <= max(2 * max(depth_w[groups[-1][0]], 8), 64):
            groups[-1].append(w)
        else:
            groups.append([w])

    out = []
    for group in groups:
        raw_depth = max(max(depth_w[w] for w in group), 1)
        g = len(group)
        max_digit = max(max_digit_w[w] for w in group)
        b_g = 1
        while b_g <= max_digit:
            b_g <<= 1
        b_g = max(b_g, 2)
        segs = 1
        while g * b_g * segs < _TARGET_LANES and segs * 2 <= raw_depth:
            segs <<= 1
        depth = _round_up_depth((raw_depth + segs - 1) // segs)
        idx = np.zeros((n_shards, depth, g, segs, b_g), dtype=np.int32)
        valid = np.zeros((n_shards, depth, g, segs, b_g), dtype=bool)
        for slot, w in enumerate(group):
            for s in range(n_shards):
                point_idx, sd, ranks = entries[w][s]
                seg = ranks // depth
                row = ranks % depth
                idx[s, row, slot, seg, sd] = point_idx  # shard-local indices
                valid[s, row, slot, seg, sd] = True
        lanes = g * segs * b_g
        out.append(
            (group, segs, b_g,
             idx.reshape(n_shards, depth, lanes),
             valid.reshape(n_shards, depth, lanes))
        )
    return w_count, out


def _tree_reduce_parts(parts, n_dev: int, w_count: int):
    """[n_dev, 3, 24, W] sharded window partials -> ([24, W],)*3 totals;
    a log2(n_dev) Jacobian tree reduction the compiler schedules over ICI."""
    n = n_dev
    while n > 1:
        half = n // 2
        left = tuple(
            jnp.moveaxis(parts[:half, i], 0, -1).reshape(24, half * w_count)
            for i in range(3)
        )
        right = tuple(
            jnp.moveaxis(parts[half:n, i], 0, -1).reshape(24, half * w_count)
            for i in range(3)
        )
        summed = g1_limb.add(left, right)
        parts = jnp.stack(
            [jnp.moveaxis(a.reshape(24, w_count, half), -1, 0) for a in summed],
            axis=1,
        )
        n = half
    return tuple(parts[0, i] for i in range(3))  # ([24, W],)*3


def make_sharded_msm(mesh: Mesh, axis_name: str, w_count: int, segs: int, b: int,
                     accum: str = "affine"):
    """Jitted SPMD MSM stage for one window group: (XYZ [3, 24, N] sharded
    on points, idx/valid [n_dev, D, lanes] sharded on the leading axis) ->
    ([24, W],)*3 combined window sums (replicated small output)."""
    n_dev = mesh.shape[axis_name]

    def local_step(xyz, idx, valid):
        wins = accumulate_windows(
            xyz, idx[0], valid[0], w_count, segs, b, axis_name=axis_name,
            accum=accum,
        )
        return jnp.stack(wins)[None]  # [1, 3, 24, W]

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(None, None, axis_name), P(axis_name, None, None),
                  P(axis_name, None, None)),
        out_specs=P(axis_name, None, None, None),
    )

    def run(xyz, idx, valid):
        return _tree_reduce_parts(sharded(xyz, idx, valid), n_dev, w_count)

    return jax.jit(run)


from functools import lru_cache


@lru_cache(maxsize=32)
def make_sharded_msm_digits(mesh: Mesh, axis_name: str, n_local: int,
                            w_count: int, segs: int, b: int, depth: int,
                            accum: str = "affine"):
    """Digits-schedule SPMD MSM stage: (XYZ [3, 24, N] sharded on points,
    digits [n_dev, g, per] u8/u16 sharded on the leading axis) ->
    ([24, W],)*3 combined window sums.  Each device argsorts its local
    digit block and builds its gather grid on device — the host ships
    1 B/point/window instead of ~20x that in grids, and does no sorting."""
    n_dev = mesh.shape[axis_name]

    def local_step(xyz, digits_local):
        idx, valid = device_grid_from_digits(
            digits_local[0].astype(jnp.int32), n_local, depth, segs, b, 0
        )
        wins = accumulate_windows(
            xyz, idx, valid, w_count, segs, b, axis_name=axis_name, accum=accum
        )
        return jnp.stack(wins)[None]  # [1, 3, 24, W]

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(None, None, axis_name), P(axis_name, None, None)),
        out_specs=P(axis_name, None, None, None),
    )

    def run(xyz, digits):
        return _tree_reduce_parts(sharded(xyz, digits), n_dev, w_count)

    return jax.jit(run)


def build_sharded_meta(digits: np.ndarray, c: int, n_shards: int):
    """Shape decisions for the digits schedule: per-shard bucket counts ->
    global (max-over-shards) depth per window -> the single-chip grouping
    policy.  -> [(window_ids, segs, b_g, depth)] with one COMMON shape
    across shards (one SPMD program)."""
    from ..ops.msm_pippenger import _TARGET_LANES

    n = digits.shape[1]
    per = n // n_shards
    b = 1 << c
    w_count = digits.shape[0]
    depth_w = [0] * w_count
    max_digit_w = [1] * w_count
    for s in range(n_shards):
        counts = window_counts(digits[:, s * per:(s + 1) * per], b)
        for w in range(w_count):
            nz = counts[w, 1:]
            if nz.size:
                depth_w[w] = max(depth_w[w], int(nz.max()))
            live = np.nonzero(counts[w])[0]
            if live.size:
                max_digit_w[w] = max(max_digit_w[w], int(live.max()))

    ordered = sorted(range(w_count), key=lambda w: depth_w[w])
    groups: list[list[int]] = []
    for w in ordered:
        if groups and depth_w[w] <= max(2 * max(depth_w[groups[-1][0]], 8), 64):
            groups[-1].append(w)
        else:
            groups.append([w])

    out = []
    for group in groups:
        raw_depth = max(max(depth_w[w] for w in group), 1)
        g = len(group)
        max_digit = max(max_digit_w[w] for w in group)
        b_g = 1
        while b_g <= max_digit:
            b_g <<= 1
        b_g = max(b_g, 2)
        segs = 1
        while g * b_g * segs < _TARGET_LANES and segs * 2 <= raw_depth:
            segs <<= 1
        depth = _round_up_depth((raw_depth + segs - 1) // segs)
        out.append((group, segs, b_g, depth))
    return out


def sharded_msm_native(mesh: Mesh, axis_name: str, powers_native: np.ndarray,
                       scalars_std: np.ndarray, offset: int = 0,
                       c: int | None = None) -> G1Point:
    """SPMD MSM over a native [M, 18] SRS table slice — the prover's commit
    path when a mesh is configured (ops/accel.py: use_sharded_msm).  Ships
    sharded digit blocks, builds gather grids per device, tree-reduces the
    window partials over the mesh; bit-identical group output to
    msm_device/the native Pippenger (test_prove_bytes_1_vs_8)."""
    from .. import native
    from ..ops.msm_pippenger import _auto_window_bits

    n = scalars_std.shape[0]
    if n == 0:
        return G1Point.identity()
    if c is None:
        c = _auto_window_bits(n)
    if native.available():
        powers_native = native.g1_ensure_normalized(powers_native)
    n_dev = mesh.shape[axis_name]
    # quantize the per-device lane count so nearby MSM sizes share one SPMD
    # program (compiles are minutes on small hosts): power-of-two up to
    # 1024 lanes/device, then 1024-multiples (<=0.1% padding at scale) —
    # zero-scalar pad lanes are mathematically free
    per_raw = max(1, (n + n_dev - 1) // n_dev)
    if per_raw <= 1024:
        per = 8
        while per < per_raw:
            per <<= 1
    else:
        per = ((per_raw + 1023) // 1024) * 1024
    target = per * n_dev
    pts = np.zeros((target, 18), dtype="<u8")  # all-zero rows = identity
    pts[:n] = powers_native[offset : offset + n]
    std = np.zeros((target, 4), dtype="<u8")
    std[:n] = scalars_std
    xyz_dev = put_global(
        g1_limb.native_points_to_limb_major(pts),
        NamedSharding(mesh, P(None, None, axis_name)),
    )
    grid_spec = NamedSharding(mesh, P(axis_name, None, None))
    w_count = (SCALAR_BITS + c - 1) // c
    digits = window_digits(std, c)
    d_small = digits.astype(np.uint8 if c <= 8 else np.uint16)
    blocks = d_small.reshape(w_count, n_dev, per).transpose(1, 0, 2)
    window_points = [G1Point.identity()] * w_count
    for window_ids, segs, b_g, depth in build_sharded_meta(digits, c, n_dev):
        run = make_sharded_msm_digits(
            mesh, axis_name, per, len(window_ids), segs, b_g, depth,
            default_accum(),
        )
        wins = run(
            xyz_dev,
            put_global(
                jnp.asarray(np.ascontiguousarray(blocks[:, window_ids])), grid_spec
            ),
        )
        wins = [fetch_global(a) for a in wins]
        for w, pt in zip(window_ids, g1_limb.points_from_limb_major(wins)):
            window_points[w] = pt
    total = G1Point.identity()
    for wp in reversed(window_points):
        for _ in range(c):
            total = total.double()
        total = total.add(wp)
    return total


def sharded_msm_host(mesh: Mesh, axis_name: str, points: list[G1Point],
                     scalars: list[int], c: int = 8,
                     schedule: str | None = None) -> G1Point:
    """Host wrapper: pad to a device-divisible point count, run every window
    group over the mesh, fold windows.  ``schedule`` as in
    :func:`simpleworks_tpu.ops.msm_pippenger.msm_device`: ``"device"``
    (default) ships sharded digit blocks and builds grids per device;
    ``"host"`` ships pre-built per-shard grids (oracle path)."""
    import os

    if schedule is None:
        schedule = os.environ.get("SWTPU_MSM_SCHEDULE", "device")
    n_dev = mesh.shape[axis_name]
    n = len(points)
    target = max(n_dev, ((n + n_dev - 1) // n_dev) * n_dev)
    pts = list(points) + [G1Point.identity()] * (target - n)
    scs = [int(s) % FR_MODULUS for s in scalars] + [0] * (target - n)
    std = FrVec.from_ints(scs).to_std_array()
    xyz = np.stack([np.asarray(a) for a in _points_to_stacked(pts)])
    xyz_dev = put_global(
        jnp.asarray(xyz), NamedSharding(mesh, P(None, None, axis_name))
    )
    grid_spec = NamedSharding(mesh, P(axis_name, None, None))
    w_count = (SCALAR_BITS + c - 1) // c
    window_points = [G1Point.identity()] * w_count
    if schedule == "device":
        per = target // n_dev
        digits = window_digits(std, c)  # [W, target]
        d_small = digits.astype(np.uint8 if c <= 8 else np.uint16)
        # [W, n_dev, per] -> [n_dev, W, per]: shard-local digit blocks
        blocks = d_small.reshape(w_count, n_dev, per).transpose(1, 0, 2)
        for window_ids, segs, b_g, depth in build_sharded_meta(digits, c, n_dev):
            run = make_sharded_msm_digits(
                mesh, axis_name, per, len(window_ids), segs, b_g, depth,
                default_accum(),
            )
            wins = run(
                xyz_dev,
                put_global(
                    jnp.asarray(np.ascontiguousarray(blocks[:, window_ids])),
                    grid_spec,
                ),
            )
            wins = [fetch_global(a) for a in wins]
            for w, pt in zip(window_ids, g1_limb.points_from_limb_major(wins)):
                window_points[w] = pt
    else:
        w_count, groups = build_sharded_schedule(std, c, n_dev)
        for window_ids, segs, b_g, idx, valid in groups:
            run = make_sharded_msm(
                mesh, axis_name, len(window_ids), segs, b_g,
                default_accum(),
            )
            wins = run(
                xyz_dev,
                put_global(jnp.asarray(idx), grid_spec),
                put_global(jnp.asarray(valid), grid_spec),
            )
            wins = [fetch_global(a) for a in wins]
            for w, pt in zip(window_ids, g1_limb.points_from_limb_major(wins)):
                window_points[w] = pt
    total = G1Point.identity()
    for wp in reversed(window_points):
        for _ in range(c):
            total = total.double()
        total = total.add(wp)
    return total


def _points_to_stacked(points: list[G1Point]):
    return g1_limb.points_to_limb_major_affine(points)
