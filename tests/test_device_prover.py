"""Device-resident prover (marlin/device_prover) vs the host prover —
IDENTICAL proof bytes (same RNG draw order, same transcript, bit-exact
kernels), exercised on the CPU backend like the accel-routing pins
(tests/test_accel_routing.py pattern)."""

import numpy as np
import pytest

from simpleworks_tpu import marlin
from simpleworks_tpu.examples import manual_constraints
from simpleworks_tpu.fields.bls12_377 import ConstraintF, FR_MODULUS
from simpleworks_tpu.marlin.serialization import serialize_proof
from simpleworks_tpu.r1cs.constraint_system import ONE, ConstraintSystem


def _square_chain(n_constraints: int, x: int = 3):
    cs = ConstraintSystem(ConstraintF)
    a = cs.new_input_variable(x)
    cur_val = x
    cur = cs.new_witness_variable(cur_val)
    cs.enforce_constraint(cs.lc((1, a)) - cs.lc((1, cur)), cs.lc((1, ONE)), cs.lc())
    for _ in range(n_constraints):
        nxt_val = cur_val * cur_val % FR_MODULUS
        nxt = cs.new_witness_variable(nxt_val)
        cs.enforce_constraint(cs.lc((1, cur)), cs.lc((1, cur)), cs.lc((1, nxt)))
        cur, cur_val = nxt, nxt_val
    return cs, x


@pytest.mark.parametrize("builder", [
    pytest.param(lambda: (manual_constraints.synthesize(3, 3), 3), id="manual"),
    pytest.param(lambda: _square_chain(120), id="chain",
                 marks=pytest.mark.slow),  # larger domains: CPU-compile heavy
])
def test_device_prover_bytes_match_host(builder, monkeypatch):
    cs, x = builder()
    srs = marlin.universal_setup(256, 256, 1024, marlin.generate_rand())
    pk, vk = marlin.index(srs, cs)

    monkeypatch.setenv("SWTPU_DEVICE_PROVER", "0")
    host_proof = marlin.prove(pk, cs)
    host_bytes = serialize_proof(host_proof)

    monkeypatch.setenv("SWTPU_DEVICE_PROVER", "1")
    dev_proof = marlin.prove(pk, cs)
    assert serialize_proof(dev_proof) == host_bytes
    assert marlin.verify(vk, [x], dev_proof)


@pytest.mark.slow
def test_device_prover_zk_stream_matches(monkeypatch):
    """Custom (non-default) rng: the device prover must consume the exact
    same draw sequence as the host prover."""
    from simpleworks_tpu.utils.rng import chacha12_rng

    cs, x = _square_chain(50, x=7)
    srs = marlin.universal_setup(128, 128, 256, marlin.generate_rand())
    pk, vk = marlin.index(srs, cs)
    monkeypatch.setenv("SWTPU_DEVICE_PROVER", "0")
    p_host = marlin.prove(pk, cs, chacha12_rng(b"Z" * 32))
    monkeypatch.setenv("SWTPU_DEVICE_PROVER", "1")
    p_dev = marlin.prove(pk, cs, chacha12_rng(b"Z" * 32))
    assert serialize_proof(p_dev) == serialize_proof(p_host)
    assert marlin.verify(vk, [x], p_dev)
