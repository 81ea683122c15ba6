"""Fast host<->device packing of field elements (bytes-based, avoids
per-limb Python loops)."""

from __future__ import annotations

import numpy as np

from .device import LIMB_BITS
from .host import FieldParams


def pack_standard(values: list[int], params: FieldParams) -> np.ndarray:
    """Python ints (standard form) -> [N, L] uint32 base-2^16 limbs."""
    nbytes = params.repr_bits // 8
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in values)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(values), nbytes // 2)
    return u16.astype(np.uint32)


def unpack_standard(arr: np.ndarray, params: FieldParams) -> list[int]:
    """[N, L] uint32 limbs -> Python ints."""
    u16 = np.asarray(arr).astype("<u2")
    data = u16.tobytes()
    nbytes = params.repr_bits // 8
    return [
        int.from_bytes(data[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(u16.shape[0])
    ]
