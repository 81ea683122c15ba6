"""Acceleration routing is proof-invisible: forcing every NTT/MSM in
``marlin.prove`` through the device kernels (MXU NTT, Pippenger MSM —
executed on this host's CPU backend, the same programs the TPU runs)
must produce byte-identical proofs to the pure host/native path.

This is the proof-level twin of the per-kernel oracle tests
(tests/test_ntt_mxu.py, tests/test_msm_device.py): it pins the CLAIM the
router relies on — routing is a pure performance decision
(ops/accel.py) — at the level the reference cares about, the serialized
artifact (reference determinism contract: src/marlin/mod.rs:33-35).
"""

import pytest

from simpleworks_tpu import marlin
from simpleworks_tpu.examples import manual_constraints
from simpleworks_tpu.marlin.serialization import serialize_proof
from simpleworks_tpu.ops import accel

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _reset_accel_cache():
    yield
    accel.device_available.cache_clear()


def test_prove_device_routing_bit_exact(monkeypatch):
    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    cs = manual_constraints.synthesize(3, 3)
    pk, vk = marlin.index(srs, cs)

    monkeypatch.setenv("SWTPU_ACCEL", "0")
    accel.device_available.cache_clear()
    host_proof = marlin.prove(pk, cs)
    host_bytes = serialize_proof(host_proof)

    monkeypatch.setenv("SWTPU_ACCEL", "1")
    monkeypatch.setattr(accel, "NTT_DEVICE_THRESHOLD", 1)
    monkeypatch.setattr(accel, "MSM_DEVICE_THRESHOLD", 1)
    accel.device_available.cache_clear()
    try:
        device_bytes = serialize_proof(marlin.prove(pk, cs))
    finally:
        accel.device_available.cache_clear()

    assert device_bytes == host_bytes
    assert marlin.verify(vk, [3], host_proof)


def test_prove_device_routing_bit_exact_midsize(monkeypatch):
    """Mid-size variant (SRS 1000/250/3000): domains large enough that the
    depth-grouping and multi-segment MSM schedule paths activate (toy sizes
    barely reach them) — same proof-byte invariance claim."""
    from simpleworks_tpu.fields.bls12_377 import ConstraintF, FR_MODULUS
    from simpleworks_tpu.r1cs.constraint_system import ONE, ConstraintSystem

    srs = marlin.universal_setup(1000, 250, 3000, marlin.generate_rand())
    cs = ConstraintSystem(ConstraintF)
    a = cs.new_input_variable(3)
    cur, cur_val = cs.new_witness_variable(3), 3
    cs.enforce_constraint(cs.lc((1, a)) - cs.lc((1, cur)), cs.lc((1, ONE)), cs.lc())
    for _ in range(900):
        nxt_val = cur_val * cur_val % FR_MODULUS
        nxt = cs.new_witness_variable(nxt_val)
        cs.enforce_constraint(cs.lc((1, cur)), cs.lc((1, cur)), cs.lc((1, nxt)))
        cur, cur_val = nxt, nxt_val
    pk, vk = marlin.index(srs, cs)

    monkeypatch.setenv("SWTPU_ACCEL", "0")
    accel.device_available.cache_clear()
    host_bytes = serialize_proof(marlin.prove(pk, cs))

    monkeypatch.setenv("SWTPU_ACCEL", "1")
    monkeypatch.setattr(accel, "NTT_DEVICE_THRESHOLD", 1)
    monkeypatch.setattr(accel, "MSM_DEVICE_THRESHOLD", 1)
    accel.device_available.cache_clear()
    try:
        device_bytes = serialize_proof(marlin.prove(pk, cs))
    finally:
        accel.device_available.cache_clear()

    assert device_bytes == host_bytes
