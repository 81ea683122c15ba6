"""The library must survive a wedged accelerator link (VERDICT r3 #1).

On the build host the axon-tunneled TPU can wedge such that any
in-process ``jax.devices()`` call blocks forever.  The routing layer
(ops/accel.py) therefore (a) checks op-size thresholds BEFORE any device
check, and (b) probes the backend only in a deadline-guarded subprocess.
These tests pin both properties by booby-trapping ``jax.devices`` and
asserting a small prove still completes — the reference's contract that
the examples are always runnable (reference README.md:11-17).
"""

import json

import pytest

from simpleworks_tpu import marlin
from simpleworks_tpu.examples import manual_constraints
from simpleworks_tpu.ops import accel


def _clear_caches():
    accel.device_available.cache_clear()
    accel._link_record.cache_clear()
    accel._env_mesh.cache_clear()


@pytest.fixture(autouse=True)
def _isolated_accel(monkeypatch, tmp_path):
    # keep the probe's disk cache out of the machine-wide temp dir
    monkeypatch.setattr(
        accel, "_probe_cache_path", lambda: str(tmp_path / "probe.json")
    )
    monkeypatch.delenv("SWTPU_ACCEL", raising=False)
    _clear_caches()
    yield
    _clear_caches()


def _bomb(*a, **k):
    raise AssertionError(
        "in-process jax.devices() — would block forever on a wedged link"
    )


def test_small_prove_never_touches_device(monkeypatch):
    """Sub-threshold ops must short-circuit on size alone: no probe, no
    device enumeration, even when the process is not CPU-pinned."""
    import jax

    monkeypatch.setattr(jax, "devices", _bomb)
    monkeypatch.setattr(accel, "_cpu_pinned", lambda: False)
    monkeypatch.setattr(accel, "_probe_device_subprocess", _bomb)
    monkeypatch.setattr(accel, "_pin_cpu", lambda: None)

    cs = manual_constraints.synthesize(5, 5)
    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    assert marlin.verify(vk, [5], proof)


def test_wedged_link_falls_back_to_host(monkeypatch):
    """With thresholds forced to 1 the probe path IS exercised; a wedged
    verdict must route everything to the host path, never enumerating
    devices in-process."""
    import jax

    monkeypatch.setattr(jax, "devices", _bomb)
    monkeypatch.setattr(accel, "_cpu_pinned", lambda: False)
    monkeypatch.setattr(accel, "_pin_cpu", lambda: None)
    calls = []

    def fake_probe():
        calls.append(1)
        return {"ok": False}

    monkeypatch.setattr(accel, "_probe_device_subprocess", fake_probe)
    monkeypatch.setattr(accel, "NTT_DEVICE_THRESHOLD", 1)
    monkeypatch.setattr(accel, "MSM_DEVICE_THRESHOLD", 1)
    monkeypatch.setattr(accel, "FIXED_BASE_THRESHOLD", 1)

    cs = manual_constraints.synthesize(7, 7)
    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    assert marlin.verify(vk, [7], proof)
    # probed once + one collision retry (a sibling process holding a
    # single-client tunnel looks like a wedge; see _cached_probe), then
    # lru + disk cache — verdict respected
    assert calls == [1, 1]
    assert not accel.use_device_ntt(1 << 20)
    assert not accel.use_device_msm(1 << 20)


def test_probe_subprocess_deadline(monkeypatch):
    """A probe subprocess that hangs is killed at the deadline and treated
    as a wedged link."""
    monkeypatch.setattr(accel, "PROBE_TIMEOUT", 1.0)
    monkeypatch.setattr(accel, "_PROBE_SRC", "import time; time.sleep(30)")
    assert accel._probe_device_subprocess() == {"ok": False, "timeout": True}


def test_probe_verdict_cached_on_disk(monkeypatch, tmp_path):
    """The disk cache short-circuits repeat probes within the TTL (a short
    CLI run must not re-pay the probe), and a healthy record is honored."""
    monkeypatch.setattr(accel, "_cpu_pinned", lambda: False)
    path = tmp_path / "probe2.json"
    monkeypatch.setattr(accel, "_probe_cache_path", lambda: str(path))
    import time as _time

    path.write_text(
        json.dumps({"ok": True, "platform": "tpu", "kind": "axon", "ts": _time.time()})
    )
    monkeypatch.setattr(accel, "_probe_device_subprocess", _bomb)
    _clear_caches()
    assert accel.device_available()
    # stale record → re-probe
    path.write_text(json.dumps({"ok": True, "platform": "tpu", "ts": 0}))
    _clear_caches()
    called = []

    def fake_probe():
        called.append(1)
        return {"ok": False}

    monkeypatch.setattr(accel, "_probe_device_subprocess", fake_probe)
    monkeypatch.setattr(accel, "_pin_cpu", lambda: None)
    assert not accel.device_available()
    # one probe + one collision retry (see _cached_probe)
    assert called == [1, 1]
