"""Acceleration routing: decide when to run prover ops on the TPU.

Device kernels are bit-exact with the host oracles (tested), so routing is
a pure performance decision.  Two facts drive it:

* Per-call offload moves the operands over the host↔device link both ways
  (the prover's polynomial state lives on the host between rounds).  An
  NTT moves ~128 B/element round-trip but native compute is only
  ~0.5 µs/element, so the link must sustain roughly ≥400 MB/s before the
  chip wins; a Pippenger MSM ships a ~5·W·slack B/point gather schedule
  against ~10 µs/point of host compute, breaking even near ~40 MB/s.
* The link speed varies wildly by attachment: a co-located PCIe chip moves
  GB/s, an axon-tunneled chip ~40 MB/s (measured on this host).  It is
  therefore *probed once* (8 MB host→device, second run timed) and cached
  per device kind in a temp file, not assumed.

Env overrides: ``SWTPU_ACCEL=1`` forces device paths on any backend and
skips the probe, ``SWTPU_ACCEL=0`` disables them.  Thresholds:
``SWTPU_NTT_THRESHOLD``, ``SWTPU_MSM_THRESHOLD`` (element counts),
``SWTPU_NTT_MIN_MBPS``, ``SWTPU_MSM_MIN_MBPS`` (link gates).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from functools import lru_cache


@lru_cache(maxsize=1)
def device_available() -> bool:
    flag = os.environ.get("SWTPU_ACCEL")
    if flag == "0":
        return False
    if flag == "1":
        return True
    # honor an explicit CPU pin without touching jax: backend init over a
    # wedged device link can block the whole process (observed on the
    # tunneled worker), and a CPU-pinned run never wants the device anyway
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return False
    try:
        import jax

        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


def _forced() -> bool:
    return os.environ.get("SWTPU_ACCEL") == "1"


NTT_DEVICE_THRESHOLD = int(os.environ.get("SWTPU_NTT_THRESHOLD", 4096))
MSM_DEVICE_THRESHOLD = int(os.environ.get("SWTPU_MSM_THRESHOLD", 65536))
NTT_MIN_LINK_MBPS = float(os.environ.get("SWTPU_NTT_MIN_MBPS", 400.0))
MSM_MIN_LINK_MBPS = float(os.environ.get("SWTPU_MSM_MIN_MBPS", 40.0))

_PROBE_BYTES = 8 << 20


def _probe_link_mbps() -> float:
    import numpy as np
    import jax

    arr = np.ones(_PROBE_BYTES // 4, dtype=np.uint32)
    jax.device_put(arr).block_until_ready()  # warm the path
    t0 = time.perf_counter()
    jax.device_put(arr).block_until_ready()
    elapsed = time.perf_counter() - t0
    return _PROBE_BYTES / max(elapsed, 1e-9) / 1e6


@lru_cache(maxsize=1)
def link_bandwidth_mbps() -> float:
    """Host→device bandwidth in MB/s, probed once and cached per device
    kind in the temp dir (so short CLI runs skip the probe)."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.replace(" ", "_").replace("/", "_")
    except Exception:
        return 0.0
    cache = os.path.join(tempfile.gettempdir(), f"swtpu_link_{kind}.json")
    try:
        with open(cache) as f:
            return float(json.load(f)["mbps"])
    except Exception:
        pass
    mbps = _probe_link_mbps()
    try:
        with open(cache, "w") as f:
            json.dump({"mbps": mbps}, f)
    except OSError:
        pass
    return mbps


def use_device_ntt(n: int) -> bool:
    if not device_available() or n < NTT_DEVICE_THRESHOLD:
        return False
    return _forced() or link_bandwidth_mbps() >= NTT_MIN_LINK_MBPS


def use_device_msm(n: int) -> bool:
    if not device_available() or n < MSM_DEVICE_THRESHOLD:
        return False
    return _forced() or link_bandwidth_mbps() >= MSM_MIN_LINK_MBPS


FIXED_BASE_THRESHOLD = int(os.environ.get("SWTPU_FIXED_BASE_THRESHOLD", 1 << 16))
FIXED_BASE_MIN_LINK_MBPS = float(os.environ.get("SWTPU_FIXED_BASE_MIN_MBPS", 5.0))


def use_device_fixed_base(n: int) -> bool:
    """SRS powers-of-tau generation: ~250 B/point of link traffic buys
    ~58 µs/point of host compute — wins from ~5 MB/s of bandwidth."""
    if not device_available() or n < FIXED_BASE_THRESHOLD:
        return False
    return _forced() or link_bandwidth_mbps() >= FIXED_BASE_MIN_LINK_MBPS


#: sharded-prover routing (SURVEY.md §2.4 / §7 PR7): when a mesh is
#: configured, marlin.prove routes large NTTs through the 4-step sharded
#: NTT and commit/open MSMs through the sharded Pippenger.  Enable with
#: ``SWTPU_MESH=N`` (shard over the first N devices; 0/unset = off) or by
#: setting ``config.FrameworkConfig.mesh_devices``.  Routing is
#: proof-invisible (tests/test_parallel.py::test_prove_bytes_1_vs_8).
SHARDED_NTT_THRESHOLD = int(os.environ.get("SWTPU_SHARDED_NTT_THRESHOLD", 1 << 14))
SHARDED_MSM_THRESHOLD = int(os.environ.get("SWTPU_SHARDED_MSM_THRESHOLD", 1 << 16))

_PROVER_MESH_OVERRIDE: "list | None" = None  # [mesh, axis] or None (tests)


def set_prover_mesh(mesh, axis_name: str) -> None:
    """Force sharded-prover routing onto ``mesh`` (None mesh clears)."""
    global _PROVER_MESH_OVERRIDE
    _PROVER_MESH_OVERRIDE = None if mesh is None else [mesh, axis_name]


@lru_cache(maxsize=1)
def _env_mesh():
    n = int(os.environ.get("SWTPU_MESH", "0") or 0)
    if not n:
        from ..config import DEFAULT_CONFIG

        n = DEFAULT_CONFIG.mesh_devices or 0
    if n <= 1:
        return None
    try:
        import jax
        from jax.sharding import Mesh

        from ..config import DEFAULT_CONFIG

        devices = jax.devices()
        if len(devices) < n:
            return None
        return Mesh(devices[:n], (DEFAULT_CONFIG.mesh_axis,)), DEFAULT_CONFIG.mesh_axis
    except Exception:
        return None


def prover_mesh():
    """-> (Mesh, axis_name) when sharded proving is configured, else None."""
    if _PROVER_MESH_OVERRIDE is not None:
        return tuple(_PROVER_MESH_OVERRIDE)
    return _env_mesh()


def use_sharded_ntt(n: int) -> bool:
    return n >= SHARDED_NTT_THRESHOLD and prover_mesh() is not None


def use_sharded_msm(n: int) -> bool:
    return n >= SHARDED_MSM_THRESHOLD and prover_mesh() is not None


_CACHE_ENABLED = False


def enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a shared temp dir so the
    minutes-long Mosaic/XLA compiles of the MSM/NTT programs are paid once
    per machine, not once per process.  Safe to call repeatedly."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(tempfile.gettempdir(), "swtpu_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _CACHE_ENABLED = True
    except Exception:
        pass
