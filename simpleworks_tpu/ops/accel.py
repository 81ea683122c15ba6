"""Acceleration routing: decide when to run kernels on device.

Device paths are bit-exact with the host oracles (tested), so routing is a
pure performance decision: on TPU, large NTTs/MSMs go to device; on CPU
(tests), the host paths avoid XLA compile latency.

Env overrides: ``SWTPU_ACCEL=1`` forces device paths on any backend,
``SWTPU_ACCEL=0`` disables them.
"""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=1)
def device_available() -> bool:
    flag = os.environ.get("SWTPU_ACCEL")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        import jax

        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


NTT_DEVICE_THRESHOLD = int(os.environ.get("SWTPU_NTT_THRESHOLD", 4096))
MSM_DEVICE_THRESHOLD = int(os.environ.get("SWTPU_MSM_THRESHOLD", 8192))


def use_device_ntt(n: int) -> bool:
    return device_available() and n >= NTT_DEVICE_THRESHOLD


def use_device_msm(n: int) -> bool:
    return device_available() and n >= MSM_DEVICE_THRESHOLD
