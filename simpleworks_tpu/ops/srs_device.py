"""Device fixed-base MSM: SRS powers-of-tau generation on the TPU.

The reference's ``universal_setup`` (``/root/reference/src/marlin/
mod.rs:45-55``) samples a powers-of-tau table — at the reference scale
(degree ~3.1M) that is millions of fixed-base scalar muls, ~65 µs/point
single-threaded on the host runtime.  Device version: the host builds the
tiny 32×256 window table d·2^{8w}·G once (8k point ops), the device runs
one ``lax.scan`` of 32 gather+add steps over all N lanes (~7 µs/point of
compute), and results come back as 16-bit limbs (half the d2h bytes).

Per-point link traffic is 32 B in (scalar limbs) + 216 B out (Jacobian
u16 limbs) against ~58 µs/point saved — the device wins from ~1 MB/s of
link bandwidth, i.e. always (``accel.use_device_fixed_base``).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.bls12_377 import G1Point
from . import g1_limb

WINDOW_BITS = 8
NUM_WINDOWS = 32  # 256 / 8
CHUNK = 1 << 19   # lanes per device dispatch (memory / latency balance)


def _window_table(base: G1Point) -> list[G1Point]:
    """[w*256 + d] = d · 2^(8w) · base (row 0 of each window = identity)."""
    table: list[G1Point] = []
    cur = base
    for _w in range(NUM_WINDOWS):
        table.append(G1Point.identity())
        acc = cur
        for _d in range(255):
            table.append(acc)
            acc = acc.add(cur)
        cur = acc  # 256 · cur — the next window's base
    return table


@lru_cache(maxsize=4)
def _make_kernel(n_lanes: int):
    @jax.jit
    def run(table_xyz, sc_u32):
        """table_xyz: [3, 24, 8192]; sc_u32: [n_lanes, 8] -> acc ([24,n],)*3
        as uint16 limbs."""
        acc = g1_limb.identity(n_lanes)

        def step(acc, w):
            limb = w >> 2
            off = (w & 3) * 8
            col = jax.lax.dynamic_index_in_dim(sc_u32, limb, axis=1, keepdims=False)
            digit = ((col >> off) & 0xFF).astype(jnp.int32) + w.astype(jnp.int32) * 256
            pts3 = jnp.take(table_xyz, digit, axis=2)
            return g1_limb.add(acc, (pts3[0], pts3[1], pts3[2])), None

        acc, _ = jax.lax.scan(step, acc, jnp.arange(NUM_WINDOWS, dtype=jnp.uint32))
        return tuple(a.astype(jnp.uint16) for a in acc)

    return run


def fixed_base_powers_device(base: G1Point, scalars_std: np.ndarray) -> np.ndarray:
    """out[i] = scalars[i]·base as a native [N, 18] u64 Jacobian Montgomery
    array (the SRS storage format) — bit-exact vs native g1_fixed_base_raw."""
    n = scalars_std.shape[0]
    table_xyz = jax.device_put(
        jnp.stack(g1_limb.points_to_limb_major(_window_table(base)))
    )
    sc = np.ascontiguousarray(scalars_std, dtype="<u8").view("<u4").reshape(n, 8)
    out_u16 = np.empty((3, 24, n), dtype=np.uint16)
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        lanes = hi - lo
        run = _make_kernel(lanes)
        acc = run(table_xyz, jnp.asarray(sc[lo:hi]))
        for i, a in enumerate(acc):
            out_u16[i, :, lo:hi] = np.asarray(jax.device_get(a))
    # [3, 24, N] u16 -> [N, 3, 24] -> [N, 18] u64 (little-endian limbs)
    interleaved = np.ascontiguousarray(out_u16.transpose(2, 0, 1))
    return interleaved.reshape(n, 3 * 24).view("<u8")
